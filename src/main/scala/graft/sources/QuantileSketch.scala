package graft.sources

/** Mergeable per-file VALUE-SAMPLE sketch for integer columns — a
  * bottom-k sample over distinct values (the KMV shape of Bar-Yossef et
  * al. 2002, used here for quantiles rather than cardinality): every
  * distinct value draws a deterministic 60-bit priority from md5, and
  * the sketch keeps the K smallest (priority, value) pairs. Because the
  * priority is a pure function of the value, the bottom-k of a UNION is
  * computable from the operands' bottom-k's alone:
  *
  *   sketch(A ∪ B) == merge(sketch(A), sketch(B))   bit-for-bit,
  *
  * at ANY split of the data — the property that lets bin-merge
  * compaction carry quantile statistics losslessly (the same contract
  * as [[NdvSketch]]'s register-max, where exact stats would have to be
  * dropped). The retained values are a uniform sample of the column's
  * DISTINCT values, so sorting them yields distribution quantiles with
  * ~1/√K relative rank error; the `db.t.stats` view serves q25/q50/q75
  * from the table-level merge.
  *
  * The md5 priority (not a faster mix) is deliberate: it is the
  * engine's one cross-engine-reproducible hash
  * ([[graft.functions.HashFunctions.md5Code60]]), so an external oracle
  * can replay the ENTIRE pipeline — per-file sketch, compaction merge,
  * table-level quantile — from the raw rows with plain SQL. Fixed cost:
  * ≤ K·16 bytes per (file, column) before base64, collected only for
  * columns opted in via TBLPROPERTIES 'quantile.columns'.
  */
private[sources] object QuantileSketch {
  /** Retained distinct values per (file, column). 64 → ~12% standard
    * rank error and ~1.4 KB of base64 per entry line — the stats-view
    * accuracy/metadata-size point; bump only with a format note. */
  val K = 64

  /** Deterministic 60-bit priority of a value — md5("qk:" + v), first
    * 15 hex chars, exactly [[graft.functions.HashFunctions.md5Code60]]
    * over the same string so DuckDB replays it with md5 + a hex fold. */
  def priority(v: Long): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val d = md.digest(("qk:" + v).getBytes(java.nio.charset.StandardCharsets.UTF_8))
    // first 15 hex chars == high 60 bits of the first 8 digest bytes
    var acc = 0L
    var i = 0
    while (i < 8) { acc = (acc << 8) | (d(i) & 0xffL); i += 1 }
    acc >>> 4
  }

  /** Streaming bottom-k collector for one column. Duplicate inserts are
    * no-ops (same value ⇒ same pair), so no seen-set is needed for
    * correctness; the small cache in the caller only saves md5 calls. */
  final class Collector {
    private val set = scala.collection.mutable.TreeSet.empty[(Long, Long)]
    def add(v: Long): Unit = {
      val p = priority(v)
      if (set.size < K) set.add((p, v))
      else if (Ordering[(Long, Long)].lt((p, v), set.last)) {
        set.add((p, v))
        if (set.size > K) set.remove(set.last)
      }
    }
    def entries: Seq[(Long, Long)] = set.toSeq
  }

  /** Bottom-k of the union: merge-dedup-take. Associative, commutative,
    * idempotent — a bin merge of any shape reproduces the sketch a
    * single writer over the concatenation would have produced. */
  def merge(a: Seq[(Long, Long)], b: Seq[(Long, Long)]): Seq[(Long, Long)] =
    (a ++ b).distinct.sorted.take(K)

  /** Quantile estimate at fraction q ∈ (0,1): the element at floor(q·n)
    * (clamped) of the sampled values in VALUE order — the convention
    * the oracle mirrors with row_number. None on an empty sketch. */
  def quantile(entries: Seq[(Long, Long)], num: Int, den: Int): Option[Long] = {
    if (entries.isEmpty) None
    else {
      val vs = entries.map(_._2).sorted
      val idx = math.min(vs.size - 1, vs.size.toLong * num / den).toInt
      Some(vs(idx))
    }
  }

  /** Manifest codec: base64 of big-endian (priority, value) longs in
    * sketch order — no ',' or '=' collisions with the entry-line kv
    * field (base64 may end in '=' padding; the parser splits limit-2
    * like the bloom field). */
  def encode(entries: Seq[(Long, Long)]): String = {
    val bb = java.nio.ByteBuffer.allocate(entries.size * 16)
    entries.foreach { case (p, v) => bb.putLong(p); bb.putLong(v) }
    java.util.Base64.getEncoder.encodeToString(bb.array())
  }

  def decode(s: String): Seq[(Long, Long)] = {
    val bytes = java.util.Base64.getDecoder.decode(s)
    val bb = java.nio.ByteBuffer.wrap(bytes)
    Seq.fill(bytes.length / 16)((bb.getLong(), bb.getLong()))
  }
}
