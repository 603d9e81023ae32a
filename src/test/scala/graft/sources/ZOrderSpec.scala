package graft.sources

import java.nio.file.{Files, Path}

import org.apache.spark.sql.functions._
import org.apache.spark.sql.sources.{GreaterThanOrEqual, LessThanOrEqual}
import org.scalatest.funsuite.AnyFunSuite

/** OPTIMIZE ... ZORDER: the clustered rewrite must (a) be lossless,
  * (b) publish as dataChange=false (change feed / streams skip it, time
  * travel keeps the old layout), and (c) MEASURABLY improve file
  * skipping for a two-column box predicate — the before/after assertion
  * counts, via the same manifest-stats may-match the scan planner uses,
  * how many files survive pruning for a small (x, y) box. Arrival-order
  * layout leaves every file spanning the full y range, so a y-bounded
  * box matches many files; after ZORDER both columns' per-file ranges
  * are tight and the box prunes most of them. */
class ZOrderSpec extends AnyFunSuite {
  import graft.TestSpark.spark
  import spark.implicits._

  private val fmt = "graft.sources.ManifestSink"

  private def boxSurvivors(root: Path, loX: Long, hiX: Long,
      loY: Long, hiY: Long): Int = {
    val fs = Seq(GreaterThanOrEqual("x", loX), LessThanOrEqual("x", hiX),
      GreaterThanOrEqual("y", loY), LessThanOrEqual("y", hiY))
    ManifestSink.committedEntries(root, None)
      .count(e => fs.forall(f => ManifestSink.mayMatchEntry(e, f)))
  }

  private def checksum(root: Path): (Long, Long, Long) =
    spark.read.format(fmt).option("path", root.toString).load()
      .agg(count(lit(1)), sum($"v"), sum($"x" * 100000 + $"y"))
      .as[(Long, Long, Long)].head()

  test("zorder rewrite is lossless, dataChange=false, and improves box pruning") {
    val root = Files.createTempDirectory("graft-zorder").resolve("t")
    // 16 appends in x-slices: x is range-clustered by arrival order, y
    // spans its full domain in EVERY file — worst case for a y predicate
    (0 until 16).foreach { s =>
      spark.range(s * 4096, (s + 1) * 4096)
        .select((col("id") / 64).cast("long").as("x"), (col("id") % 64).as("y"),
          col("id").as("v"))
        .coalesce(1)
        .write.format(fmt).option("path", root.toString)
        .mode(if (s == 0) "overwrite" else "append").save()
    }
    assert(ManifestSink.committedEntries(root, None).size == 16)
    val sumsBefore = checksum(root)
    val vBefore = ManifestSink.currentVersion(root)
    // a y-bounded box (all x, y in 1/8 of its domain): arrival layout
    // cannot prune ANY file — y spans 0..63 everywhere
    assert(boxSurvivors(root, 0, Long.MaxValue, 0, 7) == 16)

    val res = ManifestSink.compactZOrder(spark, root.toString,
      Seq("x", "y"), targetRows = 4096L)
    assert(res.filesBefore == 16 && res.rewrittenRows == 16 * 4096L)

    // lossless: same count and checksums through the ordinary read path
    assert(checksum(root) == sumsBefore)
    // z-clustering: the same y-box now prunes most files
    val boxAfter = boxSurvivors(root, 0, Long.MaxValue, 0, 7)
    assert(boxAfter <= 8,
      s"y-box should prune at least half the z-ordered files, matched $boxAfter/${res.filesAfter}")
    // a two-column box prunes even harder
    assert(boxSurvivors(root, 0, 127, 0, 7) <= 4)

    // dataChange=false: the rewrite version is marked, and time travel
    // still reads the PRE-rewrite file set
    assert(ManifestSink.isRewriteVersion(root, res.version))
    assert(spark.read.format(fmt).option("path", root.toString)
      .option("versionAsOf", vBefore.toString).load().count() == 16 * 4096L)
  }

  test("CALL graft.system.optimize with zorder runs the clustered rewrite by name") {
    val wh = Files.createTempDirectory("graft-zcat")
    spark.conf.set("spark.sql.catalog.zcat", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.zcat.warehouse", wh.toString)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS zcat.db")
    spark.sql("CREATE TABLE zcat.db.t (x BIGINT, y BIGINT)")
    (0 until 4).foreach(_ =>
      spark.sql("INSERT INTO zcat.db.t SELECT id % 7, id % 11 FROM range(1000)"))
    val out = spark.sql(
      "CALL zcat.system.optimize(table => 'db.t', target_rows => 2000, zorder => 'x,y')")
      .collect().head
    assert(out.getAs[Int]("files_before") == 16) // 4 inserts × 4 tasks (local[4])
    assert(out.getAs[Long]("rewritten_rows") == 4000L)
    assert(spark.table("zcat.db.t").count() == 4000)
    // plain bin-packing path still reachable with no zorder argument
    val out2 = spark.sql(
      "CALL zcat.system.optimize(table => 'db.t', target_rows => 100000)")
      .collect().head
    assert(out2.getAs[Long]("version") >= out.getAs[Long]("version"))
  }

  test("zorder respects table partitions: files never cross partition tuples") {
    val wh = Files.createTempDirectory("graft-zpart")
    spark.conf.set("spark.sql.catalog.zpcat", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.zpcat.warehouse", wh.toString)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS zpcat.db")
    spark.sql("CREATE TABLE zpcat.db.t (x BIGINT, y BIGINT, grp STRING) PARTITIONED BY (grp)")
    (0 until 3).foreach(_ =>
      spark.sql("INSERT INTO zpcat.db.t " +
        "SELECT id % 13, id % 17, CASE WHEN id % 2 = 0 THEN 'a' ELSE 'b' END FROM range(600)"))
    val root = wh.resolve("db").resolve("t")
    ManifestSink.compactZOrder(spark, root.toString, Seq("x", "y"), targetRows = 10000L)
    val es = ManifestSink.committedEntries(root, None)
    assert(es.nonEmpty && es.forall(e => Set("a", "b").contains(e.parts("grp"))))
    assert(es.map(_.parts("grp")).distinct.size == 2)
    assert(spark.table("zpcat.db.t").count() == 1800)
    assert(spark.table("zpcat.db.t").filter($"grp" === "a").count() == 900)
  }
}
