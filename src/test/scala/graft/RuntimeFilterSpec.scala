package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.engine.Tables

/** Runtime bloom-filter join pruning: when a selective dim-side filter
  * feeds a shuffle join, Spark can inject a bloom filter built from the
  * dim side into the fact scan, dropping non-joining rows before the
  * shuffle — at 100 TB this is the difference between shuffling the
  * whole fact table and shuffling the matching slice. The production
  * thresholds (10 GB application side) are lowered here so the fixture
  * tables qualify; the assertion pins that the optimizer DOES inject the
  * filter under the documented conditions. */
class RuntimeFilterSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("selective dim filter injects a bloom filter on the fact side of a shuffle join") {
    // a DERIVED session (same context, own SQLConf): mutating the
    // shared session's conf races with concurrently-running suites
    val ss = spark.newSession()
    Seq(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1"
    ).foreach { case (k, v) => ss.conf.set(k, v) }
    val fact = Tables.lineitem(ss, TestSpark.sfDir)
    val dim = Tables.orders(ss, TestSpark.sfDir)
      .filter(col("o_orderpriority") === "1-URGENT")
    val joined = fact.join(dim, col("l_orderkey") === col("o_orderkey"))
      .agg(count(lit(1)).as("n"))
    val optimized = joined.queryExecution.optimizedPlan.toString
    assert(optimized.contains("bloom_filter") || optimized.contains("might_contain"),
      s"no runtime bloom filter injected:\n$optimized")
    // the filtered plan must still produce the exact join count
    val expected = fact.join(
      Tables.orders(ss, TestSpark.sfDir)
        .filter(col("o_orderpriority") === "1-URGENT"),
      col("l_orderkey") === col("o_orderkey")).count()
    assert(joined.collect().head.getLong(0) == expected)
  }
}
