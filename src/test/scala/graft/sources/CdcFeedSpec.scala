package graft.sources

import java.nio.file.{Files, Path}

import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

/** The ROW change feed (`changeFeedMode=cdc`): appended files arrive as
  * `insert` rows, merge-on-read deletes as `delete` row images read
  * back from the base file at the newly-vectored positions, with
  * `_change_type` appended. Copy-on-write rewrites in the window still
  * fail loudly; OPTIMIZE versions contribute nothing. */
class CdcFeedSpec extends AnyFunSuite {
  import graft.TestSpark.spark
  import spark.implicits._

  private val wh: Path = {
    val p = Files.createTempDirectory("graft-cdf")
    p.toFile.deleteOnExit()
    spark.conf.set("spark.sql.catalog.cdf", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.cdf.warehouse", p.toString)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS cdf.db")
    p
  }
  private def root(t: String): Path = wh.resolve("db").resolve(t)

  private def feed(t: String, from: Long, to: Long = -1L): DataFrame = {
    val r = spark.read.format("graft.sources.ManifestSink")
      .option("path", root(t).toString)
      .option("changesFromVersion", from.toString)
      .option("changeFeedMode", "cdc")
    (if (to >= 0) r.option("changesToVersion", to.toString) else r).load()
  }

  test("inserts and MoR deletes arrive as typed row images; windows compose") {
    spark.sql("CREATE TABLE cdf.db.t (id BIGINT, v STRING) " +
      "TBLPROPERTIES ('delete.mode' = 'merge-on-read')")
    spark.sql("INSERT INTO cdf.db.t SELECT id, concat('a', id) FROM range(10)") // v2
    spark.sql("INSERT INTO cdf.db.t SELECT id, concat('b', id) FROM range(10, 15)") // v3
    val v3 = ManifestSink.currentVersion(root("t"))
    spark.sql("DELETE FROM cdf.db.t WHERE id IN (3, 12)") // v4: DVs on two files
    val v4 = ManifestSink.currentVersion(root("t"))

    // full-history feed: 15 inserts + 2 deletes
    val all = feed("t", 0).select($"id", $"v", $"_change_type")
      .as[(Long, String, String)].collect().toSeq
    assert(all.count(_._3 == "insert") == 15)
    assert(all.filter(_._3 == "delete").map(r => (r._1, r._2)).toSet ==
      Set((3L, "a3"), (12L, "b12")), s"got $all")

    // the delete-only window carries exactly the two row images
    val deltas = feed("t", v3, v4).select($"id", $"_change_type")
      .as[(Long, String)].collect().toSeq
    assert(deltas.toSet == Set((3L, "delete"), (12L, "delete")))

    // column pruning: counting by change type reads no row content
    val byType = feed("t", 0).groupBy($"_change_type").count()
      .as[(String, Long)].collect().toMap
    assert(byType == Map("insert" -> 15L, "delete" -> 2L))
  }

  test("OPTIMIZE inside the window contributes nothing; the feed keeps flowing") {
    spark.sql("CREATE TABLE cdf.db.c (id BIGINT) " +
      "TBLPROPERTIES ('delete.mode' = 'merge-on-read')")
    spark.sql("INSERT INTO cdf.db.c SELECT id FROM range(10)")
    spark.sql("DELETE FROM cdf.db.c WHERE id = 4")
    ManifestSink.compact(root("c").toString, targetRows = 1000L) // purges the DV
    spark.sql("INSERT INTO cdf.db.c SELECT id FROM range(10, 12)")
    val all = feed("c", 0).select($"id", $"_change_type")
      .as[(Long, String)].collect().toSeq
    assert(all.count(_._2 == "insert") == 12)
    assert(all.filter(_._2 == "delete").map(_._1) == Seq(4L))
  }

  test("a copy-on-write rewrite in the window fails the feed loudly") {
    spark.sql("CREATE TABLE cdf.db.cow (id BIGINT)") // CoW (default)
    spark.sql("INSERT INTO cdf.db.cow SELECT id FROM range(10)")
    spark.sql("DELETE FROM cdf.db.cow WHERE id = 2") // file rewritten
    val e = intercept[Exception] { feed("cow", 0).collect() }
    assert(e.getMessage.contains("copy-on-write") ||
      e.getMessage.contains("not pure-append"), e.getMessage)
  }

  test("the change feed STREAMS: per-version micro-batches of typed row images") {
    spark.sql("CREATE TABLE cdf.db.s (id BIGINT, v BIGINT) " +
      "TBLPROPERTIES ('delete.mode' = 'merge-on-read')")
    spark.sql("INSERT INTO cdf.db.s SELECT id, id * 2 FROM range(5)")
    val start = ManifestSink.currentVersion(root("s"))
    val collected = scala.collection.mutable.ArrayBuffer.empty[(Long, String, Long)]
    val q = spark.readStream.format("graft.sources.ManifestSink")
      .option("path", root("s").toString)
      .option("changesFromVersion", start.toString)
      .option("changeFeedMode", "cdc")
      .load()
      .writeStream
      .option("checkpointLocation", Files.createTempDirectory("cdf-ckpt").toString)
      .foreachBatch { (b: DataFrame, id: Long) =>
        collected.synchronized {
          collected ++= b.selectExpr("id", "_change_type", "v")
            .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
        }
        ()
      }.start()
    try {
      spark.sql("INSERT INTO cdf.db.s SELECT id, id * 2 FROM range(5, 8)")
      q.processAllAvailable()
      spark.sql("DELETE FROM cdf.db.s WHERE id IN (1, 6)")
      q.processAllAvailable()
      val got = collected.synchronized(collected.toSet)
      assert(got == Set(
        (5L, "insert", 10L), (6L, "insert", 12L), (7L, "insert", 14L),
        (1L, "delete", 2L), (6L, "delete", 12L)), s"got $got")
    } finally q.stop()
  }

  test("the deleted row image is physical: it comes from the base file") {
    // delete a row, then physically destroy every OTHER file: only the
    // base file of the deleted position is needed for the delete window
    spark.sql("CREATE TABLE cdf.db.p (id BIGINT, v BIGINT) " +
      "TBLPROPERTIES ('delete.mode' = 'merge-on-read')")
    spark.sql("INSERT INTO cdf.db.p SELECT id, id * 5 FROM range(10)")
    spark.sql("INSERT INTO cdf.db.p SELECT id, id * 5 FROM range(10, 20)")
    val v = ManifestSink.currentVersion(root("p"))
    spark.sql("DELETE FROM cdf.db.p WHERE id = 7")
    val holder = ManifestSink.committedEntries(root("p"), None)
      .find(_.dvRows > 0L).get
    ManifestSink.committedEntries(root("p"), None)
      .filter(_.name != holder.name)
      .foreach(e => Files.delete(root("p").resolve(e.name)))
    val d = feed("p", v).select($"id", $"v", $"_change_type")
      .as[(Long, Long, String)].collect().toSeq
    assert(d == Seq((7L, 35L, "delete")))
  }
}
