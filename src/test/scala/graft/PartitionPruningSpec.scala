package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.engine.Tables

/** At 100 TB the dominant cost is the scan, and the dominant scan win is
  * skipping whole partitions. This spec pins both forms on a real
  * partitioned parquet layout:
  *
  *   - static partition pruning: a literal filter on the partition column
  *     reaches the scan as a PartitionFilter and prunes the file listing
  *   - dynamic partition pruning (DPP): a selective dim-side filter prunes
  *     fact partitions at runtime through the join key
  */
class PartitionPruningSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  /** events written partitioned by event_type (the partition column a
    * day-partitioned 100 TB table would use). */
  private lazy val partedDir: String = {
    val dir = Files.createTempDirectory("parted-events")
    dir.toFile.deleteOnExit()
    Tables.events(spark, TestSpark.sfDir)
      .select("event_id", "user_id", "ts_us", "value", "event_type")
      .write.mode("overwrite").partitionBy("event_type")
      .parquet(dir.toString)
    dir.toString
  }

  private def scans(p: SparkPlan): Seq[FileSourceScanExec] = p match {
    case a: AdaptiveSparkPlanExec => scans(a.executedPlan)
    case s: FileSourceScanExec    => Seq(s)
    case other => other.children.flatMap(scans) ++
      other.subqueries.flatMap(scans)
  }

  test("literal filter on the partition column prunes partitions at the scan") {
    val df = spark.read.parquet(partedDir)
      .filter(col("event_type") === "purchase")
      .agg(count(lit(1)).as("n"))
    val scan = scans(df.queryExecution.executedPlan).head
    assert(scan.partitionFilters.nonEmpty,
      s"expected partition filters on the scan, got: ${scan.metadata}")
    // pruning must actually reduce the files read vs the full table
    val allScan = scans(spark.read.parquet(partedDir)
      .agg(count(lit(1))).queryExecution.executedPlan).head
    assert(scan.selectedPartitions.partitionCount < allScan.selectedPartitions.partitionCount)
    // and the result matches the unpartitioned path
    val expected = Tables.events(spark, TestSpark.sfDir)
      .filter(col("event_type") === "purchase").count()
    assert(df.collect().head.getLong(0) == expected)
  }

  test("dynamic partition pruning: dim-side filter prunes fact partitions through the join") {
    import spark.implicits._
    // the dim must be a real scan: a filter over an in-memory
    // LocalRelation is constant-folded away before the DPP rule looks
    // for a selective predicate
    val dimDir = Files.createTempDirectory("dpp-dim")
    dimDir.toFile.deleteOnExit()
    Seq(("purchase", 1L), ("click", 2L), ("view", 3L))
      .toDF("event_type", "type_rank")
      .write.mode("overwrite").parquet(dimDir.toString)
    val dim = spark.read.parquet(dimDir.toString)
    val fact = spark.read.parquet(partedDir)
    val joined = fact.join(dim, "event_type")
      .filter(col("type_rank") === 1)
      .agg(count(lit(1)).as("n"))
    // DPP injects a runtime partition filter (dynamicpruning subquery) on
    // the fact scan
    val scan = scans(joined.queryExecution.executedPlan)
      .find(_.relation.location.rootPaths.exists(_.toString.contains("parted-events")))
      .get
    assert(scan.partitionFilters.map(_.toString).exists(_.contains("dynamicpruning")),
      s"expected a dynamicpruning partition filter, got: ${scan.partitionFilters}")
    val expected = Tables.events(spark, TestSpark.sfDir)
      .filter(col("event_type") === "purchase").count()
    assert(joined.collect().head.getLong(0) == expected)
  }
}
