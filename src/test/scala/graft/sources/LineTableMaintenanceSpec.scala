package graft.sources

import java.nio.file.{Files, Path}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The maintained LINE table ([[LineTableMaintenance]], q207's standing
  * statistic): refcounted MERGE maintenance through the change feed —
  * appends increment, merge-on-read deletes decrement, last-holder
  * lines vanish, shared lines survive — and crash states roll forward
  * exactly-once (a recovered window must not double-apply refcounts,
  * the failure an owned-row index cannot even express). */
class LineTableMaintenanceSpec extends AnyFunSuite {
  import graft.TestSpark.spark
  import spark.implicits._

  private val wh: Path = {
    val p = Files.createTempDirectory("graft-linem")
    p.toFile.deleteOnExit()
    spark.conf.set("spark.sql.catalog.lmcat", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.lmcat.warehouse", p.toString)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS lmcat.db")
    p
  }
  private def root(t: String): Path = wh.resolve("db").resolve(t)

  private def words(p: String, n: Int) =
    (1 to n).map(i => f"$p$i%02d").mkString(" ")
  private val (lx, ly, lz, lw) =
    (words("x", 10), words("y", 10), words("z", 10), words("w", 10))

  private def recompute(survivors: DataFrame): Set[(String, Long)] =
    LineTableMaintenance.docLines(survivors)
      .groupBy("line").agg(count(lit(1)).as("df"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet

  private def tableSet(t: String): Set[(String, Long)] =
    spark.table(s"lmcat.db.$t")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet

  test("refcounts track arrivals and deletes exactly: shared lines survive a holder's delete, last-holder lines vanish") {
    spark.sql("CREATE TABLE lmcat.db.src1 (doc_id BIGINT, text STRING) " +
      "TBLPROPERTIES ('delete.mode' = 'merge-on-read')")
    val a1 = Seq(1L -> s"$lx $ly", 2L -> s"$lx $lz").toDF("doc_id", "text")
    a1.writeTo("lmcat.db.src1").append()
    LineTableMaintenance.create(spark, "lmcat", "db.src1", "db.lines1")
    assert(tableSet("lines1") === recompute(a1))
    assert(tableSet("lines1").contains((lx, 2L)))

    val a2 = Seq(3L -> s"$lx $lw").toDF("doc_id", "text")
    a2.writeTo("lmcat.db.src1").append()
    LineTableMaintenance.refreshCdc(spark, "lmcat", "db.src1", "db.lines1")
    assert(tableSet("lines1").contains((lx, 3L)), "append must increment the shared line")

    spark.sql("DELETE FROM lmcat.db.src1 WHERE doc_id = 1")
    LineTableMaintenance.refreshCdc(spark, "lmcat", "db.src1", "db.lines1")
    val afterDel = tableSet("lines1")
    assert(afterDel === recompute(a1.filter(col("doc_id") =!= 1L).union(a2)))
    assert(afterDel.contains((lx, 2L)), "shared line survives with decremented df")
    assert(!afterDel.exists(_._1 == ly), "the deleted doc's exclusive line must vanish")

    // idempotence: a refresh with no new source version is a no-op
    val v = LineTableMaintenance.refreshCdc(spark, "lmcat", "db.src1", "db.lines1")
    assert(v === LineTableMaintenance.lastSourceVersion(spark, "lmcat", "db.lines1"))
    assert(tableSet("lines1") === afterDel)
  }

  test("crash states roll forward exactly-once: refcounts are never double-applied") {
    spark.sql("CREATE TABLE lmcat.db.src2 (doc_id BIGINT, text STRING) " +
      "TBLPROPERTIES ('delete.mode' = 'merge-on-read')")
    val a1 = Seq(1L -> s"$lx $ly").toDF("doc_id", "text")
    a1.writeTo("lmcat.db.src2").append()
    LineTableMaintenance.create(spark, "lmcat", "db.src2", "db.lines2")

    // crash AFTER stage, BEFORE apply: marker durable, nothing applied —
    // the next refresh must recover the window, once
    val a2 = Seq(2L -> s"$lx $lz").toDF("doc_id", "text")
    a2.writeTo("lmcat.db.src2").append()
    val from = LineTableMaintenance.lastSourceVersion(spark, "lmcat", "db.lines2")
    val to = ManifestSink.currentVersion(root("src2"))
    PendingWindow.stage(root("lines2"), "linem.pending", from, to)
    LineTableMaintenance.refreshCdc(spark, "lmcat", "db.src2", "db.lines2")
    assert(tableSet("lines2") === recompute(a1.union(a2)))

    // crash AFTER the MERGE landed, BEFORE finalize: recovery must see
    // the landed commit and only finalize — df must NOT increment twice
    val a3 = Seq(3L -> s"$lx $lw").toDF("doc_id", "text")
    a3.writeTo("lmcat.db.src2").append()
    val to3 = ManifestSink.currentVersion(root("src2"))
    PendingWindow.stage(root("lines2"), "linem.pending", to, to3)
    LineTableMaintenance.applyWindow(spark, "lmcat", root("src2"), "db.lines2", to, to3)
    LineTableMaintenance.refreshCdc(spark, "lmcat", "db.src2", "db.lines2")
    assert(tableSet("lines2") === recompute(a1.union(a2).union(a3)),
      "recovery re-merged an applied window (double-counted refcounts)")
    assert(tableSet("lines2").contains((lx, 3L)))
  }
}
