package graft.sources

import java.nio.file.{Files, Path}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** ANN index AT REST (q140): the LSH bucket column is the table's
  * physical layout — `write.sort-by = 'bucket'` clusters data files by
  * bucket range at write time, so a probe's bucket predicate prunes
  * FILES via ordinary integer min/max stats. Composition of two proven
  * features (WriteOrderingSpec's clustering, SkippingSpec's stats) into
  * an index with no sidecar to sync. */
class AnnAtRestSpec extends AnyFunSuite {
  import graft.TestSpark.spark
  import spark.implicits._

  private val wh: Path = {
    val p = Files.createTempDirectory("graft-annrest")
    p.toFile.deleteOnExit()
    spark.conf.set("spark.sql.catalog.arcat", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.arcat.warehouse", p.toString)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS arcat.db")
    p
  }
  private def root(t: String): Path = wh.resolve("db").resolve(t)
  private def entries(t: String): Seq[ManifestSink.FileEntry] =
    ManifestSink.committedEntries(root(t), None)

  test("bucket-clustered layout answers a probe bucket from its files only") {
    spark.sql("CREATE TABLE arcat.db.emb " +
      "(vec_id BIGINT, embedding ARRAY<FLOAT>, bucket BIGINT) " +
      "TBLPROPERTIES ('write.sort-by' = 'bucket')")
    // 8 buckets × 500 vectors, input scrambled so clustering comes from
    // the WRITE; AQE coalescing off to observe a multi-file layout
    val coalesceKey = "spark.sql.adaptive.coalescePartitions.enabled"
    val prev = spark.conf.get(coalesceKey, "true")
    spark.conf.set(coalesceKey, "false")
    try {
      spark.range(0, 4000)
        .select($"id".as("vec_id"),
          expr("array(cast(id % 7 as float), cast(1.0 as float))").as("embedding"),
          ($"id" % 8).as("bucket"))
        .repartition(8, expr("pmod(hash(vec_id), 8)"))
        .writeTo("arcat.db.emb").append()
    } finally spark.conf.set(coalesceKey, prev)
    val es = entries("emb").filter(_.rows > 0)
    assert(es.size > 1, "expected a multi-file clustered write")
    assert(es.forall(e => e.mins.contains("bucket") && e.maxs.contains("bucket")))
    // probe bucket 3: physically delete every file whose bucket range
    // excludes it — a scan that opened them would throw
    val keep = es.filter(e => e.mins("bucket") <= 3L && e.maxs("bucket") >= 3L)
    assert(keep.size < es.size, "bucket ranges must not all overlap bucket 3")
    es.filterNot(keep.contains)
      .foreach(e => Files.delete(root("emb").resolve(e.name)))
    val got = spark.table("arcat.db.emb").filter($"bucket" === 3L)
      .select($"vec_id").as[Long].collect().sorted.toSeq
    assert(got == (0L until 4000L).filter(_ % 8 == 3), "wrong probe answer")
    // an IN-set of probe buckets (the q140 shape) prunes the same way
    assert(spark.table("arcat.db.emb").filter($"bucket".isin(3L))
      .count() == 500L)
  }

  test("q140 matches q45 row for row — layout changes I/O, never the answer") {
    import graft.operators.SimilarityOps
    val dir = graft.TestSpark.sfDir
    val base = SimilarityOps.queries("q45_ann_lsh")(spark, dir).collect().toSeq
    val atRest = SimilarityOps.queries("q140_ann_at_rest")(spark, dir).collect().toSeq
    assert(base.nonEmpty)
    assert(atRest == base)
  }
}
