package graft.sources

import java.nio.file.{Files, Path}

import org.scalatest.funsuite.AnyFunSuite

/** GROUP-BY-partition-column aggregates served from manifest metadata
  * alone (the Iceberg partition-stats query): every proof below DELETES
  * the data files first — only a zero-I/O plan can still answer. */
class GroupedAggPushdownSpec extends AnyFunSuite {
  import graft.TestSpark.spark
  import spark.implicits._

  private val wh: Path = {
    val p = Files.createTempDirectory("graft-gagg")
    p.toFile.deleteOnExit()
    spark.conf.set("spark.sql.catalog.gapcat", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.gapcat.warehouse", p.toString)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gapcat.db")
    p
  }
  private def root(t: String): Path = wh.resolve("db").resolve(t)
  private def deleteData(t: String): Unit =
    ManifestSink.committedEntries(root(t), None)
      .foreach(e => Files.delete(root(t).resolve(e.name)))

  test("grouped count/min/max by partition column answer with zero data I/O") {
    spark.sql("CREATE TABLE gapcat.db.g (id BIGINT, p BIGINT) PARTITIONED BY (p)")
    (0 until 3).foreach { i => // several files per partition
      spark.sql(s"INSERT INTO gapcat.db.g SELECT id + ${i * 100}, id % 4 FROM range(40)")
    }
    deleteData("g")
    val got = spark.sql(
      "SELECT p, count(*) AS n, min(id) AS mn, max(id) AS mx " +
        "FROM gapcat.db.g GROUP BY p ORDER BY p")
      .as[(Long, Long, Long, Long)].collect().toSeq
    val ids = for (i <- 0 until 3; id <- 0 until 40) yield (id + i * 100L, id % 4L)
    val want = ids.groupBy(_._2).toSeq.sortBy(_._1).map { case (p, xs) =>
      (p, xs.size.toLong, xs.map(_._1).min, xs.map(_._1).max)
    }
    assert(got == want)
  }

  test("string partition keys group from metadata too (null tuple included)") {
    spark.sql("CREATE TABLE gapcat.db.s (id BIGINT, g STRING) PARTITIONED BY (g)")
    spark.sql("INSERT INTO gapcat.db.s SELECT id, " +
      "CASE WHEN id % 3 = 0 THEN 'a' WHEN id % 3 = 1 THEN 'b' ELSE NULL END FROM range(30)")
    deleteData("s")
    val got = spark.sql("SELECT g, count(*) AS n FROM gapcat.db.s GROUP BY g")
      .as[(Option[String], Long)].collect().toMap
    assert(got == Map(Some("a") -> 10L, Some("b") -> 10L, None -> 10L))
  }

  test("non-partition grouping, filters, and DV'd min/max still scan for real") {
    spark.sql("CREATE TABLE gapcat.db.r (id BIGINT, p BIGINT) PARTITIONED BY (p) " +
      "TBLPROPERTIES ('delete.mode' = 'merge-on-read')")
    spark.sql("INSERT INTO gapcat.db.r SELECT id, id % 2 FROM range(20)")
    // grouping by a NON-partition column must read data (answers change
    // with row content, metadata can't know)
    assert(spark.sql("SELECT id % 5 AS b, count(*) FROM gapcat.db.r GROUP BY b")
      .count() == 5)
    // a filtered grouped count must read data too (skipFilters gate)
    assert(spark.sql(
      "SELECT p, count(*) AS n FROM gapcat.db.r WHERE id < 10 GROUP BY p")
      .as[(Long, Long)].collect().toMap == Map(0L -> 5L, 1L -> 5L))
    // MoR delete: grouped COUNT stays metadata-exact (live counts),
    // grouped MIN/MAX must fall back to a real scan
    spark.sql("DELETE FROM gapcat.db.r WHERE id = 0")
    assert(spark.sql("SELECT p, min(id) AS mn FROM gapcat.db.r GROUP BY p")
      .as[(Long, Long)].collect().toMap == Map(0L -> 2L, 1L -> 1L))
    deleteData("r")
    assert(spark.sql("SELECT p, count(*) AS n FROM gapcat.db.r GROUP BY p")
      .as[(Long, Long)].collect().toMap == Map(0L -> 9L, 1L -> 10L))
  }

  test("a WAP branch's grouped counts cover anchor + staged entries") {
    spark.sql("CREATE TABLE gapcat.db.b (id BIGINT, p BIGINT) PARTITIONED BY (p)")
    spark.sql("INSERT INTO gapcat.db.b SELECT id, id % 2 FROM range(10)")
    ManifestSink.createBranch(root("b"), "lane")
    spark.sql("INSERT INTO gapcat.db.b.branch_lane SELECT id, id % 2 FROM range(100, 106)")
    deleteData("b")
    ManifestSink.branchEntries(root("b"), "lane")
      .foreach(e => Files.delete(root("b").resolve(e.name)))
    assert(spark.sql("SELECT p, count(*) AS n FROM gapcat.db.b.branch_lane GROUP BY p")
      .as[(Long, Long)].collect().toMap == Map(0L -> 8L, 1L -> 8L))
    assert(spark.sql("SELECT p, count(*) AS n FROM gapcat.db.b GROUP BY p")
      .as[(Long, Long)].collect().toMap == Map(0L -> 5L, 1L -> 5L))
  }
}
