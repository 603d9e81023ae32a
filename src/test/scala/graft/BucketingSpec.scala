package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.engine.Tables

/** Co-located joins via bucketing (the 100 TB repeated-join pattern): both
  * fact tables written bucketed+sorted on the join key join WITHOUT any
  * shuffle or sort in the physical plan — the scan's output partitioning
  * and ordering already satisfy the join's requirements. */
class BucketingSpec extends AnyFunSuite {
  import TestSpark.{spark, sfDir}

  test("bucketed tables join with no exchange and match the unbucketed result") {
    val wh = Files.createTempDirectory("graft-bucket")
    wh.toFile.deleteOnExit()

    spark.sql("DROP TABLE IF EXISTS li_b")
    spark.sql("DROP TABLE IF EXISTS ord_b")
    Tables.lineitem(spark, sfDir).withColumnRenamed("l_orderkey", "key")
      .write.mode("overwrite").bucketBy(4, "key").sortBy("key")
      .option("path", s"$wh/li_b").saveAsTable("li_b")
    Tables.orders(spark, sfDir).withColumnRenamed("o_orderkey", "key")
      .write.mode("overwrite").bucketBy(4, "key").sortBy("key")
      .option("path", s"$wh/ord_b").saveAsTable("ord_b")

    // disable auto-broadcast so the join is a genuine large-large SMJ —
    // the case bucketing exists for. Confs live in a DERIVED session
    // (shared external catalog, own SQLConf): mutating the shared
    // session's conf races with concurrently-running suites.
    val ss = spark.newSession()
    ss.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = ss.table("li_b").join(ss.table("ord_b"), "key")
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n"))

      val plan = joined.queryExecution.executedPlan.toString
      // bucketed scans already satisfy the join's distribution+ordering:
      // the ONLY shuffle in the plan is the final groupBy's
      val shuffles = "Exchange hashpartitioning".r.findAllIn(plan).size
      assert(shuffles == 1,
        s"expected only the groupBy shuffle, found $shuffles:\n$plan")
      assert(plan.contains("SortMergeJoin"), s"expected SMJ over bucketed scans:\n$plan")

      // and it must produce exactly what the plain join produces
      val expected = Tables.lineitem(spark, sfDir)
        .join(Tables.orders(spark, sfDir), col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderpriority").agg(count(lit(1)).as("n"))
        .collect().map(_.toString).sorted.toSeq
      val got = joined.collect().map(_.toString).sorted.toSeq
      assert(got == expected)
    } finally {
      spark.sql("DROP TABLE IF EXISTS li_b")
      spark.sql("DROP TABLE IF EXISTS ord_b")
    }
  }
}
