package graft

import java.nio.file.{Files, Path}

import scala.collection.mutable.ArrayBuffer

import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.ReportStream

/** Long-lived ProcessingTime soak: ONE running query, many ticks, files
  * arriving mid-stream. What a cron-replacement loop must prove before it
  * can run for months:
  *
  *   - streaming state does NOT grow with input volume — the complete-mode
  *     summary keys on event_type, so state rows stay at the (tiny, fixed)
  *     key cardinality no matter how many files flow through;
  *   - every data-carrying tick publishes exactly one new artifact, and
  *     idle ticks publish nothing (no duplicate work while idle);
  *   - a restart on the same checkpoint re-publishes nothing.
  *
  * State evidence comes from the query's own progress stream
  * (`stateOperators.numRowsTotal`) — the same metric an operator watches
  * on a production job to catch unbounded state before it OOMs. */
class SoakSpec extends AnyFunSuite {
  import TestSpark.spark

  private def tmp(prefix: String): Path = {
    val p = Files.createTempDirectory(prefix)
    p.toFile.deleteOnExit()
    p
  }

  test("10-tick soak: flat state, one artifact per data tick, idempotent restart") {
    val src = tmp("soak-src")
    val out = tmp("soak-out")
    val ckpt = tmp("soak-ckpt")

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val all = spark.read.parquet(s"${TestSpark.sfDir}/events.parquet")
    val keyCardinality =
      all.select("event_type").distinct().count()

    // tick 0 input exists before the query starts
    all.limit(50).write.mode("overwrite").parquet(src.toString)

    val stateRowsPerTick = ArrayBuffer[Long]()
    val publishedPerTick = ArrayBuffer[Long]()
    val q = ReportStream.runProcessingTime(spark, src.toString, out.toString,
      ckpt.toString, intervalMs = 50)
    try {
      for (tick <- 1 to 10) {
        // a fresh file lands mid-stream on every tick
        all.limit(50 + tick).write.mode("append").parquet(src.toString)
        q.processAllAvailable()
        // progress of the latest DATA batch carries the state-store size
        val dataProgress = q.recentProgress
          .filter(p => p.numInputRows > 0 && p.stateOperators.nonEmpty)
        assert(dataProgress.nonEmpty, s"tick $tick produced no data batch")
        stateRowsPerTick += dataProgress.last.stateOperators.map(_.numRowsTotal).sum
        publishedPerTick += ReportStream.publishedCount(out.toString)
      }
    } finally q.stop()

    // state is FLAT at the aggregate's key cardinality — 10x the input
    // files, zero state growth (the unbounded-state failure mode would
    // show up here as a monotone climb)
    assert(stateRowsPerTick.toSet == Set(keyCardinality),
      s"state rows drifted across ticks: $stateRowsPerTick (keys=$keyCardinality)")

    // every tick saw fresh input, so every tick published at least once
    // more (a tick may split across micro-batches if the source lists the
    // append mid-commit — each batch still publishes exactly once, which
    // the per-batchId markers + the restart check below pin down)
    assert(publishedPerTick.size == 10)
    publishedPerTick.sliding(2).foreach { w =>
      if (w.size == 2) assert(w(1) > w(0),
        s"publish cadence broke: $publishedPerTick")
    }

    // restart on the same checkpoint with nothing new: no re-publish
    val before = ReportStream.publishedCount(out.toString)
    val q2 = ReportStream.runProcessingTime(spark, src.toString, out.toString,
      ckpt.toString, intervalMs = 50)
    try {
      q2.processAllAvailable()
      assert(ReportStream.publishedCount(out.toString) == before,
        "restart with no new data must not publish again")
    } finally q2.stop()
  }
}
