package graft.sources

import java.nio.file.{Files, Path}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The `_file` metadata column (SupportsMetadataColumns): every row can
  * name the manifest data file it lives in, emitted by the reader as a
  * per-partition constant — never stored, never decoded from parquet.
  * Two consumers:
  *  - users: `SELECT _file, count(*)` provenance / skew forensics;
  *  - the engine itself: row-level rewrites advertise `_file` as their
  *    ONLY runtime-filter attribute, so Spark's group filter arrives as
  *    a single-column `_file IN (names…)` and a MERGE/UPDATE rewrites
  *    EXACTLY the files with matches — even when per-file key ranges
  *    overlap and min/max stats could never tell the files apart. */
class FileMetadataColumnSpec extends AnyFunSuite {
  import graft.TestSpark.spark
  import spark.implicits._

  private val wh: Path = {
    val p = Files.createTempDirectory("graft-filecol")
    p.toFile.deleteOnExit()
    spark.conf.set("spark.sql.catalog.fcat", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.fcat.warehouse", p.toString)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS fcat.db")
    p
  }
  private def root(t: String): Path = wh.resolve("db").resolve(t)
  private def entries(t: String): Seq[ManifestSink.FileEntry] =
    ManifestSink.committedEntries(root(t), None)

  test("SELECT _file groups rows by their physical data file") {
    spark.sql("CREATE TABLE fcat.db.p (id BIGINT, v BIGINT)")
    spark.sql("INSERT INTO fcat.db.p SELECT id, id FROM range(10)")
    spark.sql("INSERT INTO fcat.db.p SELECT id, id FROM range(10, 30)")
    val got = spark.table("fcat.db.p").groupBy($"_file")
      .agg(count(lit(1)).as("n"))
      .as[(String, Long)].collect().toMap
    val expect = entries("p").map(e => e.name -> e.rows).toMap
    assert(got == expect, s"got $got expect $expect")
    // _file-only projection decodes zero data columns and still counts
    assert(spark.table("fcat.db.p").select($"_file").count() == 30L)
  }

  test("_file respects merge-on-read deletion vectors") {
    spark.sql("CREATE TABLE fcat.db.d (id BIGINT, v BIGINT) " +
      "TBLPROPERTIES ('delete.mode' = 'merge-on-read')")
    spark.range(10).select($"id", $"id".as("v"))
      .coalesce(1).writeTo("fcat.db.d").append()
    spark.sql("DELETE FROM fcat.db.d WHERE id >= 7")
    val got = spark.table("fcat.db.d").select($"_file", $"id")
      .as[(String, Long)].collect()
    assert(got.length == 7 && got.map(_._2).sorted.toSeq == (0L until 7L))
    assert(got.map(_._1).distinct.length == 1)
  }

  test("MERGE rewrites exactly the matched files even with overlapping key ranges") {
    spark.sql("CREATE TABLE fcat.db.m (key BIGINT, v STRING)")
    // two files with fully INTERLEAVED key ranges: evens and odds over
    // [0, 20) — key min/max stats cannot distinguish them, so any
    // stats-based group filter would keep both as candidates
    spark.range(10).select(($"id" * 2).as("key"), concat(lit("e"), $"id").as("v"))
      .coalesce(1).writeTo("fcat.db.m").append()
    spark.range(10).select(($"id" * 2 + 1).as("key"), concat(lit("o"), $"id").as("v"))
      .coalesce(1).writeTo("fcat.db.m").append()
    val before = entries("m").map(_.name).toSet
    assert(before.size == 2)
    // source matches ODD keys only
    Seq((3L, "x3"), (5L, "x5")).toDF("key", "v").createOrReplaceTempView("msrc")
    spark.sql(
      """MERGE INTO fcat.db.m t USING msrc s ON t.key = s.key
        |WHEN MATCHED THEN UPDATE SET v = s.v""".stripMargin)
    val after = entries("m").map(_.name).toSet
    // the even file is untouched BY NAME; the odd file was rewritten
    assert(before.intersect(after).size == 1,
      s"exactly one file must carry by reference: $before -> $after")
    assert(after.size == 2)
    // values converged
    val vals = spark.table("fcat.db.m").as[(Long, String)].collect().toMap
    assert(vals(3L) == "x3" && vals(5L) == "x5" && vals(2L) == "e1" &&
      vals(7L) == "o3" && vals.size == 20)
  }

  test("group-filtered MERGE never loses rows of pruned files (replace set = read set)") {
    spark.sql("CREATE TABLE fcat.db.g (key BIGINT, v BIGINT)")
    (0 until 4).foreach(i =>
      spark.range(i * 5, i * 5 + 5).select($"id".as("key"), $"id".as("v"))
        .coalesce(1).writeTo("fcat.db.g").append())
    assert(entries("g").size == 4)
    Seq((12L, 999L)).toDF("key", "v").createOrReplaceTempView("gsrc")
    spark.sql(
      """MERGE INTO fcat.db.g t USING gsrc s ON t.key = s.key
        |WHEN MATCHED THEN UPDATE SET v = s.v
        |WHEN NOT MATCHED THEN INSERT (key, v) VALUES (s.key, s.v)""".stripMargin)
    // every original row survives; exactly one got the update
    val rows = spark.table("fcat.db.g").as[(Long, Long)].collect().toMap
    assert(rows.size == 20)
    assert(rows(12L) == 999L && rows(11L) == 11L && rows(0L) == 0L)
    // three of the four files carried by reference
    assert(entries("g").count(_.name.startsWith("data-")) == 4)
  }
}
