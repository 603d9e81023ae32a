package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.engine.Tables

/** MEASURES that min/max statistics actually skip data, not just that the
  * layout is clustered (LayoutSpec proves disjoint ranges exist; this
  * spec proves the scan reads less because of them).
  *
  * The observable is the parquet scan's `numOutputRows` metric: with
  * predicate pushdown, whole row groups (and pages, via column indexes)
  * whose min/max exclude the predicate never surface rows, so scan output
  * < table size iff skipping happened. (`numFiles` is NOT the right
  * metric — without partition directories every file is listed and
  * opened; min/max skipping operates inside the reader.)
  *
  * At 100 TB these two tests are the difference between a one-day query
  * reading one day and reading the whole table — and between a 2-column
  * box predicate reading ~sqrt of the data (Z-order) vs all of it
  * (single-column sort). */
class SkippingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  /** Total rows the parquet scan(s) of `df` emitted during execution. */
  private def scanOutputRows(df: DataFrame): Long = {
    df.collect() // collect, not count: count() plans a separate execution
    df.queryExecution.executedPlan.collectLeaves()
      .filter(_.nodeName.toLowerCase.contains("scan"))
      .map(_.metrics("numOutputRows").value).sum
  }

  private lazy val events = Tables.events(spark, TestSpark.sfDir)
    .select("event_id", "user_id", "event_type", "value", "ts_us")

  test("time-range predicate skips row groups on the clustered layout only") {
    val root = Files.createTempDirectory("skip_time"); root.toFile.deleteOnExit()
    events.repartitionByRange(8, col("ts_us")).sortWithinPartitions("ts_us")
      .write.mode("overwrite").parquet(s"$root/clustered")
    events.repartition(8) // round-robin: every file spans the full range
      .write.mode("overwrite").parquet(s"$root/shuffled")

    val total = events.count()
    val Array(lo, span) = events.agg(min("ts_us"), max("ts_us") - min("ts_us"))
      .collect().map(r => Array(r.getLong(0), r.getLong(1))).head
    val hi = lo + span / 20 // a 5% time slice

    def slice(path: String) = spark.read.parquet(path)
      .filter(col("ts_us") >= lo && col("ts_us") <= hi)
    val clustered = scanOutputRows(slice(s"$root/clustered"))
    val shuffled = scanOutputRows(slice(s"$root/shuffled"))

    // same answer from both layouts
    assert(slice(s"$root/clustered").count() == slice(s"$root/shuffled").count())
    // clustered: only the row groups overlapping the 5% slice surface rows
    assert(clustered <= total / 4,
      s"clustered scan read $clustered of $total rows - no skipping happened")
    // shuffled: every row group overlaps the slice, nothing can skip
    assert(shuffled >= (total * 9) / 10,
      s"shuffled scan read only $shuffled of $total - unexpected skipping")
  }

  test("Z-order layout skips on the second dimension where linear sort cannot") {
    val root = Files.createTempDirectory("skip_z"); root.toFile.deleteOnExit()
    // two numeric dims with stored column stats: user_id and cents(value)
    val dims = events
      .withColumn("u16", col("user_id") % lit(65536L))
      .withColumn("v16", (col("value") * 100).cast("long") % lit(65536L))
    val z = (0 until 16).map { i =>
      (expr(s"(u16 div ${1L << i}) % 2") * lit(1L << (2 * i))) +
        (expr(s"(v16 div ${1L << i}) % 2") * lit(1L << (2 * i + 1)))
    }.reduce(_ + _)
    val withZ = dims.withColumn("zkey", z)

    withZ.repartitionByRange(16, col("zkey")).sortWithinPartitions("zkey")
      .write.mode("overwrite").parquet(s"$root/zorder")
    withZ.repartitionByRange(16, col("user_id")).sortWithinPartitions("user_id")
      .write.mode("overwrite").parquet(s"$root/byuser")

    val total = withZ.count()
    // box predicate on the SECOND dim only: narrow value band, all users
    def band(path: String) = spark.read.parquet(path)
      .filter(col("v16") >= 1000 && col("v16") < 3000)
    val zRows = scanOutputRows(band(s"$root/zorder"))
    val linRows = scanOutputRows(band(s"$root/byuser"))

    assert(band(s"$root/zorder").count() == band(s"$root/byuser").count())
    // user-sorted files all span the full value range: no skipping possible
    assert(linRows >= (total * 9) / 10,
      s"by-user scan read only $linRows of $total - unexpected skipping")
    // z-ordered files have bounded v16 ranges: the band must skip row groups
    assert(zRows < (linRows * 7) / 10,
      s"z-order scan read $zRows vs linear $linRows - interleave didn't skip")
  }
}
