package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.engine.Tables
import graft.tools.Compaction

/** Compaction must shrink the file count without a shuffle and without
  * changing the data. */
class CompactionSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("compacts many small files into few, losslessly, via coalesce") {
    val src = Files.createTempDirectory("compact-src"); src.toFile.deleteOnExit()
    val out = Files.createTempDirectory("compact-out"); out.toFile.deleteOnExit()
    val events = Tables.events(spark, TestSpark.sfDir)
      .select("event_id", "user_id", "event_type", "value", "ts_us")
    events.repartition(40).write.mode("overwrite").parquet(src.toString)

    val (before, after, rows) =
      Compaction.compact(spark, src.toString, out.toString,
        targetFileBytes = 64L * 1024 * 1024)
    assert(before == 40)
    assert(after < before, s"expected fewer files, got $after")
    assert(rows == events.count())

    // content identical as a multiset
    val a = spark.read.parquet(out.toString).orderBy("event_id").collect().map(_.toString)
    val b = events.orderBy("event_id").collect().map(_.toString)
    assert(a.sameElements(b))
  }
}
