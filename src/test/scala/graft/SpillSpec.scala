package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.scalatest.funsuite.AnyFunSuite

/** Robustness under memory pressure: a query whose per-partition window
  * buffers exceed their in-memory allowance must SPILL and COMPLETE with
  * the same result — not OOM, not silently truncate.
  *
  * The per-operator spill thresholds
  * (`spark.sql.windowExec.buffer.{in.memory,spill}.threshold`) are
  * runtime SQL confs, so the probe constrains exactly the operator under
  * test instead of restarting the shared context with a tiny
  * `spark.memory.fraction` (impossible mid-JVM, and it would destabilize
  * every other suite). Spill evidence comes from task metrics
  * (memory/diskBytesSpilled) via a listener — the same counters a 100 TB
  * job's executors report when a partition outgrows execution memory. */
class SpillSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("window frames under a 64-row buffer spill to disk and stay correct") {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    // 3 flag values over all of lineitem: ~2000 buffered rows per window
    // partition at sf0.001 — far past a 64-row allowance. The sliding
    // frame forces the full partition through the operator's row buffer.
    def q(s: org.apache.spark.sql.SparkSession, dir: String) =
      graft.engine.Tables.lineitem(s, dir)
        .select(col("l_returnflag"), col("l_orderkey"), col("l_linenumber"),
          col("l_extendedprice"), col("l_quantity"))
        .withColumn("win_avg", avg(col("l_extendedprice")).over(
          Window.partitionBy("l_returnflag")
            .orderBy(col("l_quantity"), col("l_orderkey"), col("l_linenumber"))
            .rowsBetween(-50, 50)))
    val baseline = q(spark, TestSpark.sfDir).collect().map(_.toString).sorted

    @volatile var spilledDisk = 0L
    @volatile var spilledMem = 0L
    val listener = new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        val m = t.taskMetrics
        if (m != null) {
          spilledDisk += m.diskBytesSpilled
          spilledMem += m.memoryBytesSpilled
        }
      }
    }
    val confs = Seq(
      "spark.sql.windowExec.buffer.in.memory.threshold",
      "spark.sql.windowExec.buffer.spill.threshold")
    val prev = confs.map(k => k -> spark.conf.getOption(k))
    spark.sparkContext.addSparkListener(listener)
    try {
      confs.foreach(k => spark.conf.set(k, "64"))
      val constrained = q(spark, TestSpark.sfDir).collect().map(_.toString).sorted
      assert(constrained.sameElements(baseline),
        "spilling changed the query result")
      // listener delivery is async: poll until the spill shows up
      val deadline = System.nanoTime() + 15L * 1000 * 1000 * 1000
      while (spilledDisk == 0 && System.nanoTime() < deadline) Thread.sleep(100)
      assert(spilledDisk > 0 || spilledMem > 0,
        "constrained window buffer never spilled - probe did not bite")
    } finally {
      spark.sparkContext.removeSparkListener(listener)
      prev.foreach {
        case (k, Some(v)) => spark.conf.set(k, v)
        case (k, None) => spark.conf.unset(k)
      }
    }
  }
}
