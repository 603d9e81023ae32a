package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class FanoutSourceSpec extends AnyFunSuite {
  import TestSpark.spark

  private def load(ids: String, rows: Int) =
    spark.read.format("graft.sources.FanoutSource")
      .option("ids", ids).option("rowsPerId", rows.toString).load()

  test("one input partition per configured id") {
    val df = load("1,2,3,4,5", 10)
    assert(df.rdd.getNumPartitions == 5)
    assert(df.count() == 50)
  }

  test("rows are deterministic and partition-local to their id") {
    val rows = load("7,9", 3).collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getString(2))).sorted.toSeq
    assert(rows == Seq(
      (7L, 0L, "7-0"), (7L, 1L, "7-1"), (7L, 2L, "7-2"),
      (9L, 0L, "9-0"), (9L, 1L, "9-1"), (9L, 2L, "9-2")))
  }

  test("column pruning reaches the reader") {
    val pruned = load("1,2", 5).select("seq")
    val scanLine = pruned.queryExecution.executedPlan.toString
      .linesIterator.find(_.contains("BatchScan")).getOrElse("")
    assert(scanLine.contains("seq") && !scanLine.contains("payload"),
      s"expected payload pruned from scan: $scanLine")
    assert(pruned.agg(sum("seq")).head().getLong(0) == 20L)
  }
}
