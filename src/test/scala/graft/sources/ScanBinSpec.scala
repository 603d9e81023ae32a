package graft.sources

import java.nio.file.{Files, Path}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Small-file read coalescing ([[ManifestBinPartition]]): unpartitioned
  * scans bin tiny files into multi-file read partitions (default ~1M
  * live rows per task) so scan parallelism follows DATA size, not file
  * count — the read-side complement of OPTIMIZE. Binning is
  * ordering-aware: attested-sorted files bin only across strictly
  * disjoint key boundaries, so the scan's ordering report stays true. */
class ScanBinSpec extends AnyFunSuite {
  import graft.TestSpark.spark
  import spark.implicits._

  private val wh: Path = {
    val p = Files.createTempDirectory("graft-bin")
    p.toFile.deleteOnExit()
    spark.conf.set("spark.sql.catalog.bn", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.bn.warehouse", p.toString)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS bn.db")
    p
  }

  private def scanPartitions(table: String): Int = {
    val df = spark.table(table)
    df.queryExecution.executedPlan.collect {
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => b
    }.head.inputRDD.getNumPartitions
  }

  test("tiny files bin into few read partitions; values exact, deletes honored") {
    spark.sql("CREATE TABLE bn.db.t (id BIGINT, v BIGINT)")
    (0 until 12).foreach(i =>
      spark.sql(s"INSERT INTO bn.db.t SELECT id + ${i * 10}, id FROM range(10)"))
    assert(ManifestSink.committedEntries(wh.resolve("db").resolve("t"), None).size >= 12)
    // ADAPTIVE default: 120 live rows over local[4] → ~30-row bins →
    // one task per core, not one per file and not one total
    assert(scanPartitions("bn.db.t") === 4)
    // a deletion vector rides inside the bin (row-based path)
    spark.sql("DELETE FROM bn.db.t WHERE id % 10 = 3")
    val got = spark.table("bn.db.t").select($"id").as[Long].collect().sorted.toSeq
    assert(got === (0L until 120L).filterNot(_ % 10 == 3).sorted)
    // disabling the knob restores one task per file
    spark.conf.set("graft.scan.bin-rows", "0")
    try assert(scanPartitions("bn.db.t") >= 12)
    finally spark.conf.unset("graft.scan.bin-rows")
  }

  test("the row target splits bins; oversized files stay solo") {
    spark.sql("CREATE TABLE bn.db.s (id BIGINT)")
    (0 until 6).foreach(i =>
      spark.sql(s"INSERT INTO bn.db.s SELECT id + ${i * 100} FROM range(100)"))
    spark.conf.set("graft.scan.bin-rows", "250")
    try {
      // 6 × 100 rows at a 250-row target → bins of 2 → 3 partitions
      assert(scanPartitions("bn.db.s") === 3)
      assert(spark.table("bn.db.s").count() === 600L)
    } finally spark.conf.unset("graft.scan.bin-rows")
  }

  test("attested-sorted files bin ONLY across disjoint boundaries and stay sorted per task") {
    spark.sql("CREATE TABLE bn.db.o (t BIGINT, v BIGINT) " +
      "TBLPROPERTIES ('write.sort-by'='t')")
    // disjoint t ranges: binnable while provably sorted (explicit
    // target so the whole table fits one bin)
    spark.sql("INSERT INTO bn.db.o SELECT id, id FROM range(0, 50)")
    spark.sql("INSERT INTO bn.db.o SELECT id, id FROM range(50, 100)")
    spark.sql("INSERT INTO bn.db.o SELECT id, id FROM range(100, 150)")
    spark.conf.set("graft.scan.bin-rows", "100000")
    try {
      assert(scanPartitions("bn.db.o") === 1)
    // PHYSICAL within-task ordering proof: rows of every read partition
    // arrive non-decreasing in t
    val byPart = spark.table("bn.db.o")
      .select(expr("spark_partition_id()").as("pid"), $"t")
      .as[(Int, Long)].collect().groupBy(_._1)
    byPart.values.foreach { rows =>
      val ts = rows.map(_._2).toSeq
      assert(ts === ts.sorted, "bin members concatenated out of order")
    }
    } finally spark.conf.unset("graft.scan.bin-rows")

    spark.sql("CREATE TABLE bn.db.ov (t BIGINT, v BIGINT) " +
      "TBLPROPERTIES ('write.sort-by'='t')")
    // OVERLAPPING t ranges: binning would break the ordering claim, so
    // every file must keep its own partition
    spark.sql("INSERT INTO bn.db.ov SELECT id, id FROM range(0, 50)")
    spark.sql("INSERT INTO bn.db.ov SELECT id, id FROM range(0, 50)")
    spark.conf.set("graft.scan.bin-rows", "100000")
    // each append's files have disjoint ranges (range-distributed
    // write) and chain into one bin; the overlap BETWEEN appends
    // forces the second run into its own bin
    try assert(scanPartitions("bn.db.ov") === 2,
      "overlapping attested files must not share a bin")
    finally spark.conf.unset("graft.scan.bin-rows")
  }
}
