package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** AQE skew-join handling: q29 shows MANUAL salting; this spec pins the
  * AUTOMATIC path — at runtime AQE detects an oversized shuffle
  * partition on the join key and splits it across tasks (skew=true in
  * the final plan) without any query rewrite. Thresholds are lowered so
  * a synthetic 99%-one-key table qualifies at fixture scale. */
class SkewJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("AQE splits a skewed shuffle partition at runtime") {
    // a DERIVED session (same context, own SQLConf): mutating the
    // shared session's conf races with concurrently-running suites
    val ss = spark.newSession()
    Seq(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "1",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "16KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "16KB",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1"
    ).foreach { case (k, v) => ss.conf.set(k, v) }
    // 99.5% of rows share key 7 — one shuffle partition dwarfs the rest
    val big = ss.range(200000)
      .select(when(col("id") % 200 =!= 0, lit(7L)).otherwise(col("id")).as("k"),
        col("id").as("v"))
    val dim = ss.range(1000).select(col("id").as("k"), (col("id") * 2).as("w"))
    val joined = big.join(dim, "k")
    // collect() executes THIS dataset's QueryExecution — count() would
    // build a separate one and leave this plan un-finalized
    val n = joined.collect().length
    // key 7 matches dim row 7 (199000 rows); every other key < 1000 matches once
    assert(n > 0)
    val finalPlan = joined.queryExecution.executedPlan.toString
    assert(finalPlan.contains("skew=true"),
      s"AQE did not mark the skewed join:\n$finalPlan")
  }

  test("AQE coalesces undersized shuffle partitions at runtime") {
    val df = spark.range(1000)
      .groupBy((col("id") % 10).as("g"))
      .agg(count(lit(1)).as("n"))
    val n = df.collect().length
    assert(n == 10)
    val finalPlan = df.queryExecution.executedPlan.toString
    assert(finalPlan.contains("AQEShuffleRead") && finalPlan.contains("coalesced"),
      s"AQE did not coalesce the tiny shuffle:\n$finalPlan")
  }
}
