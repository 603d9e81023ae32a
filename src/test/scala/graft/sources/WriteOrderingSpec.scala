package graft.sources

import java.nio.file.{Files, Path}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Write-time sort clustering (TBLPROPERTIES 'write.sort-by'): appends
  * request a RANGE distribution + in-task ordering from Spark
  * (RequiresDistributionAndOrdering), so per-file min/max ranges come
  * out disjoint at write and range predicates prune files immediately —
  * clustering without an OPTIMIZE pass. */
class WriteOrderingSpec extends AnyFunSuite {
  import graft.TestSpark.spark
  import spark.implicits._

  private val wh: Path = {
    val p = Files.createTempDirectory("graft-order")
    p.toFile.deleteOnExit()
    spark.conf.set("spark.sql.catalog.ocat", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.ocat.warehouse", p.toString)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS ocat.db")
    p
  }
  private def root(t: String): Path = wh.resolve("db").resolve(t)
  private def entries(t: String): Seq[ManifestSink.FileEntry] =
    ManifestSink.committedEntries(root(t), None)

  test("one append produces disjoint per-file ranges; range scan prunes physically") {
    spark.sql("CREATE TABLE ocat.db.s (id BIGINT, v BIGINT) " +
      "TBLPROPERTIES ('write.sort-by' = 'id')")
    // scramble the input so any clustering comes from the WRITE, not
    // the source order; multiple input partitions force a real exchange.
    // AQE would rightly coalesce this kilobyte-scale shuffle into one
    // partition (at real scale each range partition is file-sized), so
    // pin coalescing off to observe the multi-file range layout.
    val coalesceKey = "spark.sql.adaptive.coalescePartitions.enabled"
    val prev = spark.conf.get(coalesceKey, "true")
    spark.conf.set(coalesceKey, "false")
    try {
      spark.range(0, 10000).select($"id", ($"id" * 7).as("v"))
        .repartition(8, expr("pmod(hash(id), 8)"))
        .writeTo("ocat.db.s").append()
    } finally spark.conf.set(coalesceKey, prev)
    val es = entries("s").filter(_.rows > 0)
    assert(es.size > 1, "expected a multi-file write")
    val ranges = es.map(e => (e.mins("id"), e.maxs("id"))).sortBy(_._1)
    ranges.sliding(2).foreach {
      case Seq((_, hi), (lo, _)) =>
        assert(hi < lo, s"file ranges must be disjoint after a sorted write: $ranges")
      case _ => ()
    }
    // physical pruning proof: a point read touches ONE file — delete
    // every other file and the query still answers
    val target = es.find(e => e.mins("id") <= 5000L && e.maxs("id") >= 5000L).get
    es.filterNot(_ == target)
      .foreach(e => Files.delete(root("s").resolve(e.name)))
    assert(spark.table("ocat.db.s").filter($"id" === 5000L)
      .select($"v").as[Long].head() == 35000L)
  }

  test("sort-by composes with partitioning: in-task order inside each partition") {
    spark.sql("CREATE TABLE ocat.db.p (id BIGINT, grp STRING) " +
      "PARTITIONED BY (grp) TBLPROPERTIES ('write.sort-by' = 'id')")
    spark.range(0, 1000)
      .select($"id", when($"id" % 2 === 0, "a").otherwise("b").as("grp"))
      .repartition(4, expr("pmod(hash(id), 4)"))
      .writeTo("ocat.db.p").append()
    val es = entries("p")
    assert(es.forall(e => e.parts.keySet == Set("grp")))
    assert(spark.table("ocat.db.p").count() == 1000L)
  }

  test("RENAME COLUMN follows the sort registration; DROP clears it") {
    spark.sql("CREATE TABLE ocat.db.r (id BIGINT, v BIGINT) " +
      "TBLPROPERTIES ('write.sort-by' = 'v')")
    spark.sql("ALTER TABLE ocat.db.r RENAME COLUMN v TO val")
    assert(ManifestSink.sortColumns(root("r"), None) == Seq("val"))
    spark.sql("ALTER TABLE ocat.db.r ADD COLUMN w BIGINT")
    spark.sql("ALTER TABLE ocat.db.r DROP COLUMN val")
    assert(ManifestSink.sortColumns(root("r"), None).isEmpty)
    // table still writable after the sort column vanished
    spark.range(0, 5).select($"id", $"id".as("w"))
      .coalesce(1).writeTo("ocat.db.r").append()
    assert(spark.table("ocat.db.r").count() == 5L)
  }
}
