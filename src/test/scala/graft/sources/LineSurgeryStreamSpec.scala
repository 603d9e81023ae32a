package graft.sources

import java.nio.file.{Files, Path}

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.DedupOps
import graft.streaming.LineSurgeryStream

/** Streaming corpus surgery (LineSurgeryStream): a document stream
  * maintains the q207 standing line table through foreachBatch
  * refresh-CDC and cleans each batch in-stream; the standing table
  * CONVERGES to the batch-built one, per-batch surgery reports match
  * the inline engine, and every crash prefix of the apply replays to
  * exactly-once state — including a crash INSIDE the merge, rolled
  * forward by LineTableMaintenance's own pivot. */
class LineSurgeryStreamSpec extends AnyFunSuite {
  import graft.TestSpark.spark
  import spark.implicits._

  private val wh: Path = {
    val p = Files.createTempDirectory("graft-lss")
    p.toFile.deleteOnExit()
    spark.conf.set("spark.sql.catalog.lsscat", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.lsscat.warehouse", p.toString)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS lsscat.db")
    p
  }
  private def root(t: String): Path = wh.resolve("db").resolve(t)

  private def words(p: String, n: Int) =
    (1 to n).map(i => f"$p$i%02d").mkString(" ")

  // 10-word "lines": docs sharing a prefix line are surgery targets
  private val boiler = words("b", 10)
  private def doc(unique: String): String = s"$boiler ${words(unique, 10)}"

  private def bootstrap(tag: String): (String, String, String) = {
    val (src, lines, out) = (s"db.src_$tag", s"db.lines_$tag", s"db.out_$tag")
    spark.sql(s"CREATE TABLE lsscat.$src (doc_id BIGINT, text STRING)")
    spark.sql(s"CREATE TABLE lsscat.$out " +
      "(doc_id BIGINT, n_lines BIGINT, n_dropped BIGINT, clean_md5 STRING)")
    LineTableMaintenance.create(spark, "lsscat", src, lines)
    (src, lines, out)
  }

  private def lineSet(lines: String): Set[(String, Long)] =
    spark.table(s"lsscat.$lines").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet

  test("stream maintains the line table to batch-built convergence; in-stream cleaning matches inline") {
    val (src, lines, out) = bootstrap("t1")
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = MemoryStream[(Long, String)]
    val q = LineSurgeryStream.start(spark,
      ms.toDF().toDF("doc_id", "text"), "lsscat", src, lines, out,
      Files.createTempDirectory("lss-ckpt").toString)
    try {
      // batch 1: two docs sharing the boilerplate line
      ms.addData(1L -> doc("c"), 2L -> doc("d"))
      q.processAllAvailable()
      // boilerplate line reached df 2: batch 1's own docs were cleaned
      // against the post-fold table, so the shared line dropped already
      val out1 = spark.table(s"lsscat.$out").orderBy("doc_id").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
      assert(out1 == Seq((1L, 2L, 1L), (2L, 2L, 1L)),
        s"batch-frequent lines must clean in-stream: $out1")
      // batch 2: one more boilerplate holder + a loner
      ms.addData(3L -> doc("e"), 4L -> words("z", 12))
      q.processAllAvailable()
      val expected = spark.table(s"lsscat.$src")
      // CONVERGENCE: the streamed table == a from-scratch batch build
      spark.sql(s"CREATE TABLE lsscat.db.ref_t1 (doc_id BIGINT, text STRING)")
      expected.writeTo("lsscat.db.ref_t1").append()
      LineTableMaintenance.create(spark, "lsscat", "db.ref_t1", "db.ref_lines_t1")
      assert(lineSet(lines) == lineSet("db.ref_lines_t1"),
        "streamed line table diverged from the batch-built one")
      // batch 2's report equals the inline engine against the same table
      val want = DedupOps.cleanAgainstLines(
          Seq(3L -> doc("e"), 4L -> words("z", 12)).toDF("doc_id", "text"),
          spark.table(s"lsscat.$lines")
            .filter(col("df") >= DedupOps.LineDupMinDocs).select("line"))
        .collect().map(_.toString).sorted.toSeq
      val got = spark.table(s"lsscat.$out").filter(col("doc_id") >= 3L)
        .collect().map(_.toString).sorted.toSeq
      assert(got == want, s"in-stream surgery diverged from inline: $got vs $want")
    } finally q.stop()
  }

  test("every crash prefix of the apply replays to exactly-once state") {
    val (src, lines, out) = bootstrap("t2")
    val full = Seq(10L -> doc("f"), 11L -> doc("g")).toDF("doc_id", "text")
    // crash prefix A: source append landed, nothing else
    full.writeTo(s"lsscat.$src").append()
    // crash prefix B (deeper): refresh landed too, output did not
    LineTableMaintenance.refreshCdc(spark, "lsscat", src, lines)
    // replay the WHOLE apply — must converge, not double-count
    LineSurgeryStream.applyBatch(spark, full, "lsscat", src, lines, out)
    assert(spark.table(s"lsscat.$src").count() == 2,
      "replay re-appended source docs")
    val df = spark.table(s"lsscat.$lines")
      .filter(col("line") === boiler).collect()
    assert(df.map(_.getLong(1)).toSeq == Seq(2L),
      s"replay double-counted line refcounts: ${df.toSeq}")
    assert(spark.table(s"lsscat.$out").count() == 2)
    // and replaying the COMPLETE apply once more is a no-op everywhere
    val (vs, vl, vo) = (ManifestSink.currentVersion(root(s"src_t2")),
      ManifestSink.currentVersion(root(s"lines_t2")),
      ManifestSink.currentVersion(root(s"out_t2")))
    LineSurgeryStream.applyBatch(spark, full, "lsscat", src, lines, out)
    assert((ManifestSink.currentVersion(root(s"src_t2")),
      ManifestSink.currentVersion(root(s"lines_t2")),
      ManifestSink.currentVersion(root(s"out_t2"))) == (vs, vl, vo),
      "a fully-applied batch's replay must commit nothing")
  }

  test("crash INSIDE the merge rolls forward via the maintainer's pivot") {
    val (src, lines, out) = bootstrap("t3")
    val b1 = Seq(20L -> doc("h"), 21L -> doc("k")).toDF("doc_id", "text")
    LineSurgeryStream.applyBatch(spark, b1, "lsscat", src, lines, out)
    // batch 2 lands in the source; the refresh CRASHES after staging
    // the pending window (marker durable, merge not committed)
    val b2 = Seq(22L -> doc("m")).toDF("doc_id", "text")
    b2.writeTo(s"lsscat.$src").append()
    val from = LineTableMaintenance.lastSourceVersion(spark, "lsscat", lines)
    val to = ManifestSink.currentVersion(root(s"src_t3"))
    PendingWindow.stage(root(s"lines_t3"), "linem.pending", from, to)
    // the stream's replay of the batch rolls the pivot forward
    LineSurgeryStream.applyBatch(spark, b2, "lsscat", src, lines, out)
    assert(spark.table(s"lsscat.$lines")
      .filter(col("line") === boiler).head().getLong(1) == 3L,
      "pivot roll-forward must fold batch 2 exactly once")
    assert(spark.table(s"lsscat.$out").count() == 3)
  }
}
