package graft

import java.nio.file.{Files, Path}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.engine.Tables
import graft.streaming.ReportStream

/** End-to-end publish pipeline: file stream -> summary -> foreachBatch HTML
  * artifact, idempotent by batchId (the reference's generate.sh/cronjob.sh
  * loop as Trigger.AvailableNow micro-batches). */
class ReportStreamSpec extends AnyFunSuite {
  import TestSpark.spark

  private def tmp(prefix: String): Path = {
    val p = Files.createTempDirectory(prefix)
    p.toFile.deleteOnExit()
    p
  }

  test("availableNow tick publishes one idempotent report per batch") {
    val src = tmp("rs-src")
    val out = tmp("rs-out")
    val ckpt = tmp("rs-ckpt")

    // stage the fixture events as the raw-nanos parquet the stream reads
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(s"${TestSpark.sfDir}/events.parquet")
      .write.mode("overwrite").parquet(src.toString)

    val n1 = ReportStream.runAvailableNow(spark, src.toString, out.toString, ckpt.toString)
    assert(n1 >= 1, "first tick must publish at least one report")

    val reports = Files.list(out).filter(_.toString.endsWith(".html")).toArray
    val html = Files.readString(reports.head.asInstanceOf[Path])
    assert(html.contains("<html>") && html.contains("Event report"))
    assert(html.contains("<br>"), "newline -> <br> sink rewrite (K2) must apply")

    // the real per-type counts must appear in the artifact
    val counts = ReportStream.summarize(Tables.events(spark, TestSpark.sfDir))
      .collect().map(r => s"- ${r.getString(0)}: ${r.getLong(1)} events")
    counts.foreach(line => assert(html.contains(line), s"missing '$line'"))

    // second tick with the same checkpoint: no new input -> nothing new
    val n2 = ReportStream.runAvailableNow(spark, src.toString, out.toString, ckpt.toString)
    assert(n2 == n1, "re-running with no new data must not publish again")

    // new file arrives -> the next tick sees exactly the increment and
    // publishes an updated report (the cron-loop behavior end-to-end)
    spark.read.parquet(s"${TestSpark.sfDir}/events.parquet")
      .limit(100).write.mode("append").parquet(src.toString)
    val n3 = ReportStream.runAvailableNow(spark, src.toString, out.toString, ckpt.toString)
    assert(n3 > n2, "new input files must produce a new published report")
  }

  test("long-lived ProcessingTime loop publishes per tick and restarts idempotently") {
    val src = tmp("rs-pt-src")
    val out = tmp("rs-pt-out")
    val ckpt = tmp("rs-pt-ckpt")

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(s"${TestSpark.sfDir}/events.parquet")
      .limit(200).write.mode("overwrite").parquet(src.toString)

    // tick 1: the running query drains the first file and publishes
    val q = ReportStream.runProcessingTime(spark, src.toString, out.toString,
      ckpt.toString, intervalMs = 100)
    try {
      q.processAllAvailable()
      val n1 = ReportStream.publishedCount(out.toString)
      assert(n1 >= 1, "first tick must publish a report")

      // tick 2: a new file arrives while the SAME query keeps running
      spark.read.parquet(s"${TestSpark.sfDir}/events.parquet")
        .limit(100).write.mode("append").parquet(src.toString)
      q.processAllAvailable()
      val n2 = ReportStream.publishedCount(out.toString)
      assert(n2 > n1, "a later tick of the running query must publish the increment")
    } finally q.stop()

    // restart with the same checkpoint and no new input: idempotent —
    // no re-published artifacts
    val before = ReportStream.publishedCount(out.toString)
    val q2 = ReportStream.runProcessingTime(spark, src.toString, out.toString,
      ckpt.toString, intervalMs = 100)
    try {
      q2.processAllAvailable()
      assert(ReportStream.publishedCount(out.toString) == before,
        "restart with no new data must not publish again")
    } finally q2.stop()
  }

  test("streaming parquet file sink is exactly-once across restart (partitioned)") {
    val src = tmp("fs-src")
    val out = tmp("fs-out")
    val ckpt = tmp("fs-ckpt")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val events = spark.read.parquet(s"${TestSpark.sfDir}/events.parquet").limit(300)
    events.write.mode("overwrite").parquet(src.toString)

    def runOnce(): Unit = {
      val q = spark.readStream
        .schema(ReportStream.eventsSchema)
        .parquet(src.toString)
        .writeStream
        .partitionBy("event_type") // the layout a 100 TB sink would use
        .option("checkpointLocation", ckpt.toString)
        .option("path", out.toString)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    runOnce()
    val n1 = spark.read.parquet(out.toString).count()
    assert(n1 == 300, s"sink must contain exactly the input rows, got $n1")
    // restart with the same checkpoint and no new input: no duplicates
    // (the file-sink manifest is the exactly-once mechanism)
    runOnce()
    assert(spark.read.parquet(out.toString).count() == 300)
    // partition pruning works on the sink layout
    val purchases = spark.read.parquet(out.toString)
      .filter(col("event_type") === "purchase")
    assert(purchases.count() ==
      events.filter(col("event_type") === "purchase").count())
  }

  test("foreachBatch upsert sink converges to the batch CDC result across micro-batches") {
    val src = tmp("up-src")
    val state = tmp("up-state")
    val ckpt = tmp("up-ckpt")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val all = spark.read.parquet(s"${TestSpark.sfDir}/events.parquet")

    // two arrivals: first 600 rows, then the rest
    all.limit(600).write.mode("overwrite").parquet(src.toString)
    ReportStream.runUpsert(spark, src.toString, state.toString, ckpt.toString)
    all.write.mode("append").parquet(src.toString) // re-delivers 600 + rest
    ReportStream.runUpsert(spark, src.toString, state.toString, ckpt.toString)

    val got = ReportStream.upsertState(spark, state.toString).get
      .select("user_id", "event_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // batch twin: q81's latest-wins result over the union of arrivals
    // (duplicates collapse by rank-1, so re-delivery changes nothing)
    val expected = graft.operators.PipelineOps
      .queries("q81_cdc_upsert")(spark, TestSpark.sfDir)
      .select(col("user_id"), col("last_event_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == expected)
  }

  test("maxFilesPerTrigger drains a backlog as bounded micro-batches") {
    val src = tmp("rs-bp-src")
    val out = tmp("rs-bp-out")
    val ckpt = tmp("rs-bp-ckpt")
    // stage a 4-file backlog
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val events = spark.read.parquet(s"${TestSpark.sfDir}/events.parquet")
    (0 until 4).foreach { i =>
      events.filter(col("event_id") % 4 === i)
        .coalesce(1).write.mode("append").parquet(src.toString)
    }
    // knob = 1 file per batch -> AvailableNow drains everything, but as
    // one bounded micro-batch per file: 4 published artifacts, not 1
    val n = ReportStream.runAvailableNow(spark, src.toString, out.toString,
      ckpt.toString, maxFilesPerTrigger = Some(1))
    assert(n >= 4, s"expected >=4 bounded micro-batches, got $n")
    // and the final report reflects the FULL backlog (complete mode):
    // the last batch's totals equal the batch recompute over all files
    val reports = Files.list(out).filter(_.toString.endsWith(".html"))
      .sorted().toArray.map(_.asInstanceOf[Path])
    val lastHtml = Files.readString(reports.last)
    val total = events.count()
    val perType = events.groupBy("event_type").count().collect()
    perType.foreach { r =>
      assert(lastHtml.contains(s"${r.getAs[String]("event_type")}: ${r.getAs[Long]("count")} events"),
        s"final report must aggregate the whole $total-row backlog")
    }
    // unbounded control: same backlog, no knob -> a single batch
    val out2 = tmp("rs-bp-out2")
    val ckpt2 = tmp("rs-bp-ckpt2")
    val n2 = ReportStream.runAvailableNow(spark, src.toString, out2.toString, ckpt2.toString)
    assert(n2 == 1, s"without the knob the backlog is one batch, got $n2")
  }

  test("publish is idempotent per batch id (redelivery is a no-op)") {
    val out = tmp("rs-idem")
    val summary = ReportStream.summarize(Tables.events(spark, TestSpark.sfDir))
    ReportStream.publish(summary, 7L, out.toString)
    val first = Files.readString(out.resolve("report-7.html"))
    val mtime = Files.getLastModifiedTime(out.resolve("report-7.html"))
    ReportStream.publish(summary.limit(1), 7L, out.toString) // different content, same id
    assert(Files.readString(out.resolve("report-7.html")) == first)
    assert(Files.getLastModifiedTime(out.resolve("report-7.html")) == mtime)
  }
}
