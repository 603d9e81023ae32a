package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.tools.PlanAudit

/** The plan auditor must catch REAL scale smells and not flag healthy
  * plans: the round-2 substring heuristic flagged every predicate-less
  * scan ("PushedFilters: []" itself contains "Filter"), 46/77 false
  * positives. These probes pin both directions. */
class PlanAuditSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = TestSpark.sfDir

  test("pushed filter on a parquet scan is NOT flagged") {
    val df = graft.engine.Tables.orders(spark, dir)
      .filter(col("o_custkey") < 100)
      .select("o_orderkey", "o_custkey")
    assert(!PlanAudit.hasUnpushedFilter(df.queryExecution.executedPlan))
  }

  test("deliberately unpushed filter IS flagged") {
    // wrapping the column in coalesce() defeats source-filter translation
    // (and, being null-intolerant-free, derives no pushable IsNotNull):
    // the scan shows PushedFilters: [] with a FilterExec right on top —
    // the classic silent full-scan smell this auditor exists to catch.
    // (Note `spark.sql.parquet.filterPushdown=false` is NOT a valid probe:
    // PushedFilters metadata reflects translation, not the runtime conf.)
    val df = graft.engine.Tables.orders(spark, dir)
      .filter(coalesce(col("o_custkey"), lit(0)) < 100)
      .select("o_orderkey", "o_custkey")
    assert(PlanAudit.hasUnpushedFilter(df.queryExecution.executedPlan))
  }

  test("unpartitioned global window IS flagged as single-partition") {
    val df = graft.engine.Tables.orders(spark, dir)
      .withColumn("rn", row_number().over(Window.orderBy("o_orderkey")))
    assert(PlanAudit.hasBadSinglePartition(df.queryExecution.executedPlan))
  }

  test("final PER-KEY aggregate under a global window IS flagged") {
    // A partition-less running-sum window over groupBy(key).count():
    // the exchange's child is a FINAL per-key aggregate — |distinct keys|
    // rows funnel through one task — which the round-5 audit exempted
    // because it only checked for BaseAggregateExec, not the aggregate's
    // mode/grouping. (A rank-filter probe would NOT exercise this:
    // InferWindowGroupLimit rewrites row_number+filter(rk<=k) into
    // TakeOrderedAndProject before the window, so the bad exchange never
    // plans. A running total has no limit to push.)
    val df = graft.engine.Tables.orders(spark, dir)
      .groupBy("o_custkey").agg(count(lit(1)).as("cnt"))
      .withColumn("run", sum(col("cnt")).over(
        Window.orderBy(col("cnt").desc, col("o_custkey"))))
    assert(PlanAudit.hasBadSinglePartition(df.queryExecution.executedPlan))
  }

  test("orderBy+limit top-k (TakeOrderedAndProject) is NOT flagged") {
    // the scale-correct top-k shape: per-task top-k heaps, k rows per
    // task through the single-partition merge — bounded by construction.
    val df = graft.engine.Tables.orders(spark, dir)
      .groupBy("o_custkey").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("o_custkey")).limit(5)
      .withColumn("rk", row_number().over(Window.orderBy(col("cnt").desc, col("o_custkey"))))
    assert(!PlanAudit.hasBadSinglePartition(df.queryExecution.executedPlan))
  }

  test("final global aggregate over partials is NOT flagged") {
    val df = graft.engine.Tables.orders(spark, dir)
      .agg(count(lit(1)).as("n"), sum(col("o_custkey")).as("s"))
    assert(!PlanAudit.hasBadSinglePartition(df.queryExecution.executedPlan))
  }

  test("every declared query plans with zero scale smells") {
    val bad = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      val smells = PlanAudit.smells(
        fn(spark, dir).queryExecution.executedPlan)
      if (smells.isEmpty) None else Some(s"$name: ${smells.mkString(",")}")
    }
    assert(bad.isEmpty, bad.mkString("\n"))
  }
}
