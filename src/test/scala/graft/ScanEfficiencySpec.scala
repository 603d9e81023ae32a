package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.engine.Tables

/** Scan-efficiency behaviors that matter at 100 TB but are easy to lose
  * silently: nested-schema pruning (a 2-field projection of a wide
  * struct must not read the whole struct) and observe() metrics (the
  * zero-cost way to count/sum what a job actually scanned without a
  * second pass). */
class ScanEfficiencySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("nested schema pruning: selecting one struct field reads only that field") {
    val dir = Files.createTempDirectory("nested"); dir.toFile.deleteOnExit()
    Tables.events(spark, TestSpark.sfDir)
      .select(col("event_id"),
        struct(col("user_id"), col("event_type"), col("value"), col("ts_us"))
          .as("payload"))
      .write.mode("overwrite").parquet(dir.toString)

    val df = spark.read.parquet(dir.toString)
      .select(col("payload.user_id"))
    val scanLine = df.queryExecution.executedPlan.toString
      .linesIterator.find(_.contains("ReadSchema")).get
    assert(scanLine.contains("payload:struct<user_id:bigint>"),
      s"struct not pruned to the single field: $scanLine")
    assert(!scanLine.contains("event_type"),
      s"unused struct fields still read: $scanLine")
    assert(df.distinct().count() > 0)
  }

  test("observe() attaches scan metrics without a second pass") {
    val df = Tables.events(spark, TestSpark.sfDir)
      .observe("scan_metrics",
        count(lit(1)).as("rows_scanned"),
        sum(col("ts_us")).as("sum_ts"))
      .filter(col("event_type") === "purchase")
    // collect() executes THIS dataset's QueryExecution; count() would
    // build a separate one whose metrics this handle never sees
    val n = df.collect().length.toLong
    val metrics = df.queryExecution.observedMetrics("scan_metrics")
    // the observation point sits BEFORE the filter: it sees all rows
    val total = Tables.events(spark, TestSpark.sfDir).count()
    assert(metrics.getAs[Long]("rows_scanned") == total)
    assert(n < total)
  }
}
