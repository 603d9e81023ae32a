package graft.sources

import java.nio.file.{Files, Path}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Per-file bloom filters for string-equality skipping. Integer columns
  * prune by min/max; string columns by a 1024-bit bloom over each
  * file's values (TBLPROPERTIES 'bloom.columns'). Invariants:
  *  - `WHERE cat = 'x'` opens ONLY files whose bloom may contain 'x' —
  *    proved by physically deleting the other files;
  *  - DELETE candidate pruning uses the same blooms (candidateFiles
  *    counts only may-matching files);
  *  - compaction ORs member blooms; CoW rewrites recompute them;
  *  - blooms are pruning-only — a value absent everywhere returns an
  *    empty (not failing) result. */
class BloomSkipSpec extends AnyFunSuite {
  import graft.TestSpark.spark
  import spark.implicits._

  private val wh: Path = {
    val p = Files.createTempDirectory("graft-bloom")
    p.toFile.deleteOnExit()
    spark.conf.set("spark.sql.catalog.bcat", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.bcat.warehouse", p.toString)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS bcat.db")
    p
  }
  private def root(t: String): Path = wh.resolve("db").resolve(t)
  private def entries(t: String): Seq[ManifestSink.FileEntry] =
    ManifestSink.committedEntries(root(t), None)
  private def create(t: String): Unit =
    spark.sql(s"CREATE TABLE bcat.db.$t (id BIGINT, cat STRING) " +
      "TBLPROPERTIES ('bloom.columns' = 'cat')")
  private def insertCat(t: String, lo: Long, hi: Long, cat: String): Unit =
    spark.range(lo, hi).select($"id", lit(cat).as("cat"))
      .coalesce(1).writeTo(s"bcat.db.$t").append()

  test("writers collect per-file blooms; equality scan opens only may-matching files") {
    create("s")
    insertCat("s", 0, 10, "alpha")
    insertCat("s", 10, 20, "beta")
    insertCat("s", 20, 30, "gamma")
    val es = entries("s")
    assert(es.size == 3 && es.forall(_.blooms.contains("cat")))
    // physical proof: remove beta/gamma files — a scan for alpha that
    // opened them would throw
    es.filterNot(e =>
        ManifestSink.bloomMayContain(e.blooms("cat"), "alpha"))
      .foreach(e => Files.delete(root("s").resolve(e.name)))
    assert(spark.table("bcat.db.s").filter($"cat" === "alpha")
      .select($"id").as[Long].collect().sorted.toSeq == (0L until 10L))
    // IN-list with only surviving values also prunes
    assert(spark.table("bcat.db.s").filter($"cat".isin("alpha"))
      .count() == 10L)
  }

  test("a value present nowhere returns empty without failing") {
    create("e")
    insertCat("e", 0, 5, "alpha")
    assert(spark.table("bcat.db.e").filter($"cat" === "nope").count() == 0L)
  }

  test("DELETE candidate pruning consults the blooms") {
    create("d")
    insertCat("d", 0, 10, "alpha")
    insertCat("d", 10, 20, "beta")
    import org.apache.spark.sql.sources.EqualTo
    val res = ManifestSink.deleteWhere(root("d").toString, Seq(EqualTo("cat", "beta")))
    assert(res.candidateFiles == 1, s"bloom should exclude the alpha file: $res")
    assert(res.deletedRows == 10L)
    assert(spark.table("bcat.db.d").count() == 10L)
  }

  test("compaction ORs member blooms; the merged file still prunes") {
    create("c")
    insertCat("c", 0, 5, "alpha")
    insertCat("c", 5, 10, "beta")
    insertCat("c", 10, 15, "gamma")
    val res = ManifestSink.compact(root("c").toString, targetRows = 12L)
    assert(res.rewrittenFiles >= 2)
    val es = entries("c")
    val merged = es.find(_.rows > 5L).get
    assert(ManifestSink.bloomMayContain(merged.blooms("cat"), "alpha") ||
      ManifestSink.bloomMayContain(merged.blooms("cat"), "gamma"))
    // whatever got merged, a probe for a value in NO member of some file
    // still prunes: check via the delete candidate count for a fresh value
    import org.apache.spark.sql.sources.EqualTo
    val r2 = ManifestSink.deleteWhere(root("c").toString, Seq(EqualTo("cat", "zzz")))
    assert(r2.candidateFiles == 0 && r2.deletedRows == 0L, s"got $r2")
  }

  test("CoW delete rewrite recomputes the surviving file's bloom") {
    create("r")
    spark.range(0, 10)
      .select($"id", when($"id" < 5, "keepme").otherwise("dropme").as("cat"))
      .coalesce(1).writeTo("bcat.db.r").append()
    import org.apache.spark.sql.sources.EqualTo
    ManifestSink.deleteWhere(root("r").toString, Seq(EqualTo("cat", "dropme")))
    val e = entries("r").head
    assert(ManifestSink.bloomMayContain(e.blooms("cat"), "keepme"))
    assert(!ManifestSink.bloomMayContain(e.blooms("cat"), "dropme"),
      "rewritten bloom must reflect surviving rows only")
  }

  test("blooms size by NDV: a 10^5-distinct-value file still prunes (fpp < 5%)") {
    // the round-9 `weak`: a fixed 1024-bit filter saturates (fpp → 1)
    // at production distinct counts — correct but silently inert at
    // exactly the scale it exists for. NDV sizing keeps ~10 bits per
    // distinct value, so the measured false-positive rate stays ~1%.
    create("big")
    val n = 100000L
    spark.range(0, n).select($"id", concat(lit("u-"), $"id").as("cat"))
      .coalesce(1).writeTo("bcat.db.big").append()
    val bloom = entries("big").head.blooms("cat")
    val bits = java.util.Base64.getDecoder.decode(bloom).length * 8
    assert(bits >= n * 4, s"filter has $bits bits for $n distinct values — saturated")
    assert(bits <= ManifestSink.MaxBloomBits)
    val probes = 10000
    val fps = (0 until probes).count(i =>
      ManifestSink.bloomMayContain(bloom, s"absent-$i"))
    assert(fps.toDouble / probes < 0.05,
      s"measured fpp ${fps.toDouble / probes} at $n NDV — bloom is inert")
    // and present values always pass (no false negatives, ever)
    assert(Seq(0L, 1L, n / 2, n - 1).forall(i =>
      ManifestSink.bloomMayContain(bloom, s"u-$i")))
  }

  test("low-NDV files keep the compact floor size; sizes are self-describing") {
    create("small")
    insertCat("small", 0, 10, "alpha") // 1 distinct value
    val bloom = entries("small").head.blooms("cat")
    assert(java.util.Base64.getDecoder.decode(bloom).length * 8
      == ManifestSink.MinBloomBits,
      "a near-constant column must not pay a big filter")
    // legacy fixed-1024-bit payloads (pre-NDV-sizing manifests) decode
    // through the same probe — the byte length IS the size, no format
    // version bump
    val legacy = new Array[Long](ManifestSink.MinBloomBits / 64)
    ManifestSink.bloomAdd(legacy, "old-value")
    val b64 = ManifestSink.bloomEncode(legacy)
    assert(ManifestSink.bloomMayContain(b64, "old-value"))
    assert(!ManifestSink.bloomMayContain(b64, "definitely-absent-xyz"))
  }

  test("mixed-size compaction bins publish no bloom (honest absence, scan exact)") {
    create("mix")
    insertCat("mix", 0, 20, "alpha") // 1 distinct → floor-size filter
    spark.range(0, 20000)
      .select($"id", concat(lit("v-"), $"id").as("cat"))
      .coalesce(1).writeTo("bcat.db.mix").append() // 20k distinct → bigger filter
    val sizes = entries("mix").map(e =>
      java.util.Base64.getDecoder.decode(e.blooms("cat")).length).distinct
    assert(sizes.size == 2, s"fixture wants two filter sizes, got $sizes")
    ManifestSink.compact(root("mix").toString, targetRows = 50000L)
    val merged = entries("mix")
    assert(merged.size == 1, s"expected one merged file, got ${merged.size}")
    // different sizes share no bit positions: OR would be garbage, so
    // the merged entry carries none — and absence means may-match, so
    // the scan stays exact
    assert(!merged.head.blooms.contains("cat"),
      "mixed-size bloom union must publish NOTHING, not a wrong filter")
    assert(spark.table("bcat.db.mix").filter($"cat" === "alpha").count() == 20L)
    assert(spark.table("bcat.db.mix").filter($"cat" === "v-19999").count() == 1L)
  }

  test("beyond the cap's useful range the bloom is omitted entirely") {
    // > MaxBloomBits/4 distinct values: even a 128 KB filter would pass
    // ~every probe; the entry must carry NO bloom instead of a
    // saturated one that costs manifest bytes and prunes nothing
    create("huge")
    val n = ManifestSink.MaxBloomBits / 4 + 5000
    spark.range(0, n).select($"id", concat(lit("h-"), $"id").as("cat"))
      .coalesce(1).writeTo("bcat.db.huge").append()
    assert(!entries("huge").head.blooms.contains("cat"),
      "a bloom at this NDV would be saturated — omit, don't publish")
    // absence is may-match: the scan still answers exactly
    assert(spark.table("bcat.db.huge").filter($"cat" === "h-7").count() == 1L)
  }

  test("RENAME COLUMN moves the bloom column registration and per-file blooms") {
    create("rn")
    insertCat("rn", 0, 5, "alpha")
    spark.sql("ALTER TABLE bcat.db.rn RENAME COLUMN cat TO category")
    assert(ManifestSink.bloomColumns(root("rn"), None) == Seq("category"))
    val e = entries("rn").head
    assert(e.blooms.contains("category") && !e.blooms.contains("cat"))
    // new writes keep collecting under the new name
    spark.range(5, 8).select($"id", lit("beta").as("category"))
      .coalesce(1).writeTo("bcat.db.rn").append()
    assert(entries("rn").forall(_.blooms.contains("category")))
    // and pruning works under the new name
    import org.apache.spark.sql.sources.EqualTo
    val res = ManifestSink.deleteWhere(root("rn").toString,
      Seq(EqualTo("category", "beta")))
    assert(res.candidateFiles == 1 && res.deletedRows == 3L, s"got $res")
  }
}
