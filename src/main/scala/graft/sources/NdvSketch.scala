package graft.sources

/** Mergeable per-file distinct-count sketch — HyperLogLog (Flajolet et
  * al. 2007, "HyperLogLog: the analysis of a near-optimal cardinality
  * estimation algorithm"), the role NDV sketches play in Iceberg/Theta
  * metadata. The exact per-file integer distinct counts
  * ([[ManifestSink.FileEntry.ndvs]]) cannot merge — compaction used to
  * simply DROP them, and the table-level CBO fold could only sum
  * per-file counts to an overestimate. Registers merge by MAX, which is
  * exactly the sketch of the union at ANY split of the data, so:
  *
  *   - bin-merge compaction now PRESERVES distinct-count statistics
  *     (register-max over the members), instead of dropping them;
  *   - the table-level fold merges all files' sketches first and
  *     estimates ONCE — cross-file duplicates no longer inflate the
  *     CBO's NDV the way the per-file exact-count sum does.
  *
  * 2^P = 256 registers → ~6.5% standard error (1.04/√m), fixed 256
  * bytes per (file, column) at ANY file size — unlike the exact
  * distinct set, which is capped and goes silent past the cap. Sparse
  * files pair-encode nonzero registers so small files pay bytes
  * proportional to their cardinality, not the register count.
  */
private[sources] object NdvSketch {
  val P = 8
  val M: Int = 1 << P
  private val Alpha = 0.7213 / (1.0 + 1.079 / M)

  /** SplitMix64 finalizer (Steele et al. 2014; public domain) — the
    * avalanche mix that turns a raw column value into the uniform
    * 64-bit hash the estimator's geometric analysis assumes. */
  def mix(v: Long): Long = {
    var z = v + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  def empty(): Array[Byte] = new Array[Byte](M)

  def add(regs: Array[Byte], v: Long): Unit = {
    val h = mix(v)
    val idx = (h >>> (64 - P)).toInt
    val w = h << P // remaining 64-P bits, left-aligned
    val rank = (if (w == 0L) 64 - P
      else java.lang.Long.numberOfLeadingZeros(w)) + 1
    if (rank > regs(idx)) regs(idx) = rank.toByte
  }

  /** Register-wise max: sketch(A) ⊔ sketch(B) == sketch(A ∪ B)
    * bit-for-bit — the property that makes compaction lossless. */
  def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    val out = new Array[Byte](M)
    var i = 0
    while (i < M) { out(i) = if (a(i) >= b(i)) a(i) else b(i); i += 1 }
    out
  }

  /** Standard HLL estimator with the small-range linear-counting
    * correction; 64-bit hashes need no large-range correction. */
  def estimate(regs: Array[Byte]): Long = {
    var sum = 0.0
    var zeros = 0
    var i = 0
    while (i < M) {
      sum += java.lang.Math.pow(2.0, -regs(i).toDouble)
      if (regs(i) == 0) zeros += 1
      i += 1
    }
    val raw = Alpha * M.toDouble * M.toDouble / sum
    val e = if (raw <= 2.5 * M && zeros > 0) M * math.log(M.toDouble / zeros)
      else raw
    math.max(0L, math.round(e))
  }

  /** Manifest codec: 's' + base64 of (index, rank) byte pairs while
    * fewer than half the registers are set (small files pay for their
    * cardinality, not the register count); 'd' + base64 of all 256
    * bytes once dense. */
  def encode(regs: Array[Byte]): String = {
    var nz = 0
    var i = 0
    while (i < M) { if (regs(i) != 0) nz += 1; i += 1 }
    val b64 = java.util.Base64.getEncoder
    if (nz * 2 < M) {
      val bytes = new Array[Byte](nz * 2)
      var j = 0
      i = 0
      while (i < M) {
        if (regs(i) != 0) { bytes(j) = i.toByte; bytes(j + 1) = regs(i); j += 2 }
        i += 1
      }
      "s" + b64.encodeToString(bytes)
    } else "d" + b64.encodeToString(regs)
  }

  def decode(s: String): Array[Byte] = {
    val bytes = java.util.Base64.getDecoder.decode(s.substring(1))
    if (s.charAt(0) == 'd') bytes
    else {
      val regs = empty()
      var j = 0
      while (j < bytes.length) {
        regs(bytes(j) & 0xff) = bytes(j + 1)
        j += 2
      }
      regs
    }
  }
}
