package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.engine.Tables

/** File-layout clustering: `repartitionByRange + sortWithinPartitions`
  * writes files whose per-file value ranges are DISJOINT, which is what
  * makes parquet min/max row-group statistics actually skip data on a
  * time-filtered scan. An unclustered write gives every file the full
  * value range and min/max skipping is useless — at 100 TB the layout
  * decides whether a one-day query reads one day or the whole table. */
class LayoutSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("range-partitioned sorted write produces disjoint per-file time ranges") {
    val dir = Files.createTempDirectory("layout"); dir.toFile.deleteOnExit()
    Tables.events(spark, TestSpark.sfDir)
      .select("event_id", "user_id", "event_type", "value", "ts_us")
      .repartitionByRange(8, col("ts_us"))
      .sortWithinPartitions("ts_us")
      .write.mode("overwrite").parquet(dir.toString)

    val files = dir.toFile.listFiles().filter(_.getName.endsWith(".parquet"))
    assert(files.length > 1, "need multiple files to demonstrate clustering")
    val ranges = files.map { f =>
      val r = spark.read.parquet(f.toString)
        .agg(min("ts_us"), max("ts_us")).collect().head
      (r.getLong(0), r.getLong(1))
    }.sortBy(_._1)
    // each file's range ends before the next one starts: disjoint
    ranges.sliding(2).foreach {
      case Array((_, hi), (lo2, _)) =>
        assert(hi <= lo2, s"overlapping file ranges: $hi > $lo2")
      case _ =>
    }
    // and the layout did not lose rows
    val n = spark.read.parquet(dir.toString).count()
    assert(n == Tables.events(spark, TestSpark.sfDir).count())
  }
}
