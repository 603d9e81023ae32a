package graft.sources

import java.nio.file.{Files, Path}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Operator surface over table history: the `db.t.history` / `db.t.files`
  * metadata views (Iceberg-style suffix identifiers, planned as local
  * relations — no executor work for manifest-derived kilobytes) and
  * `CALL graft.system.rollback` (RESTORE as a new commit: history only
  * moves forward). */
class TableOpsSpec extends AnyFunSuite {
  import graft.TestSpark.spark
  import spark.implicits._

  private val wh: Path = {
    val p = Files.createTempDirectory("graft-tops")
    p.toFile.deleteOnExit()
    spark.conf.set("spark.sql.catalog.tcat", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.tcat.warehouse", p.toString)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS tcat.db")
    p
  }
  private def root(t: String): Path = wh.resolve("db").resolve(t)

  test("history view labels create/append/delete/optimize/alter/overwrite steps") {
    spark.sql("CREATE TABLE tcat.db.h (id BIGINT, v BIGINT)") // v1 create
    spark.range(0, 10).select($"id", $"id".as("v"))
      .coalesce(1).writeTo("tcat.db.h").append() // v2 append
    spark.sql("DELETE FROM tcat.db.h WHERE id < 3") // v3 delete (CoW)
    spark.sql("ALTER TABLE tcat.db.h ADD COLUMN w BIGINT") // v4 alter
    ManifestSink.compact(root("h").toString, targetRows = 1000L) // no-op (1 file)
    spark.range(10, 20).select($"id", $"id".as("v"), $"id".as("w"))
      .coalesce(1).writeTo("tcat.db.h").append() // v5 append
    spark.sql("INSERT OVERWRITE tcat.db.h SELECT id, id, id FROM range(5)") // v6 overwrite
    val hist = spark.sql("SELECT version, operation, rows, live_rows FROM tcat.db.h.history")
      .as[(Long, String, Long, Long)].collect().sortBy(_._1).toSeq
    // v3 is a CoW delete: the file is REWRITTEN (removed + added), so
    // the manifest-level label is replace; only removal-only and
    // DV-change steps read as delete
    assert(hist.map(h => (h._1, h._2)) == Seq(
      (1L, "create"), (2L, "append"), (3L, "replace"), (4L, "alter"),
      (5L, "append"), (6L, "replace")), s"got $hist")
    assert(hist(1)._3 == 10L && hist(2)._3 == 7L && hist(5)._4 == 5L)
  }

  test("files view reports physical/live rows and deletion vectors") {
    spark.sql("CREATE TABLE tcat.db.f (id BIGINT, v BIGINT) " +
      "TBLPROPERTIES ('delete.mode' = 'merge-on-read')")
    spark.range(0, 10).select($"id", $"id".as("v"))
      .coalesce(1).writeTo("tcat.db.f").append()
    spark.sql("DELETE FROM tcat.db.f WHERE id < 4")
    val files = spark.sql("SELECT file, rows, live_rows, dv_rows FROM tcat.db.f.files")
      .as[(String, Long, Long, Long)].collect().toSeq
    assert(files.size == 1)
    assert(files.head._2 == 10L && files.head._3 == 6L && files.head._4 == 4L)
    // history marks the MoR delete as a delete even though no file moved
    val ops = spark.sql("SELECT operation FROM tcat.db.f.history ORDER BY version")
      .as[String].collect().toSeq
    assert(ops == Seq("create", "append", "delete"))
  }

  test("files view shows partition tuples") {
    spark.sql("CREATE TABLE tcat.db.p (id BIGINT, grp STRING) PARTITIONED BY (grp)")
    spark.sql("INSERT INTO tcat.db.p SELECT id, CASE WHEN id % 2 = 0 THEN 'a' ELSE 'b' END FROM range(10)")
    val parts = spark.sql("SELECT DISTINCT partition FROM tcat.db.p.files")
      .as[String].collect().toSet
    assert(parts == Set("grp=a", "grp=b"))
  }

  test("partitions view aggregates per-tuple file/row/DV accounting, metadata-only") {
    spark.sql("CREATE TABLE tcat.db.pv (id BIGINT, p STRING) PARTITIONED BY (p) " +
      "TBLPROPERTIES ('delete.mode' = 'merge-on-read')")
    (0 until 2).foreach { _ => // two files per partition
      spark.sql("INSERT INTO tcat.db.pv " +
        "SELECT id, CASE WHEN id % 2 = 0 THEN 'x' ELSE 'y' END FROM range(20)")
    }
    spark.sql("DELETE FROM tcat.db.pv WHERE id = 0") // one DV row in p=x
    // metadata-only: destroy the data files, the view must still answer
    ManifestSink.committedEntries(root("pv"), None)
      .foreach(e => Files.delete(root("pv").resolve(e.name)))
    val got = spark.sql(
      "SELECT partition, files, rows, live_rows, dv_rows FROM tcat.db.pv.partitions")
      .as[(String, Int, Long, Long, Long)].collect().toSet
    assert(got == Set(("p=x", 2, 20L, 18L, 2L), ("p=y", 2, 20L, 20L, 0L)), got)
    // unpartitioned tables report a single all-table row
    spark.sql("CREATE TABLE tcat.db.uv (id BIGINT)")
    spark.sql("INSERT INTO tcat.db.uv SELECT id FROM range(5)")
    assert(spark.sql("SELECT partition, rows FROM tcat.db.uv.partitions")
      .as[(String, Long)].collect().toSeq == Seq(("", 5L)))
  }

  test("TIMESTAMP AS OF resolves to the newest version published at or before the instant") {
    spark.sql("CREATE TABLE tcat.db.tt (id BIGINT)")
    spark.sql("INSERT INTO tcat.db.tt SELECT id FROM range(5)") // v2
    Thread.sleep(1100) // distinct publish instants at mtime granularity
    val mid = java.time.Instant.now()
    Thread.sleep(1100)
    spark.sql("INSERT INTO tcat.db.tt SELECT id FROM range(5, 9)") // v3
    val fmt = java.time.format.DateTimeFormatter
      .ofPattern("yyyy-MM-dd HH:mm:ss.SSS").withZone(java.time.ZoneOffset.UTC)
    assert(spark.sql(
      s"SELECT count(*) FROM tcat.db.tt TIMESTAMP AS OF '${fmt.format(mid)}'")
      .as[Long].head() == 5L)
    assert(spark.table("tcat.db.tt").count() == 9L)
    // an instant before the table existed fails loudly
    val e = intercept[Exception] {
      spark.sql("SELECT * FROM tcat.db.tt TIMESTAMP AS OF '2000-01-01 00:00:00'")
        .collect()
    }
    assert(e.getMessage.contains("predates"), e.getMessage)
  }

  test("TIMESTAMP AS OF fails loudly when the true version was expired but an older one survives") {
    // versions: v1 create, v2 insert, v3 insert. Expire v2 while v1
    // survives (the shape a live branch's pinned anchor produces):
    // an instant between v2 and v3 must NOT silently resolve to v1 —
    // the true state at that instant (v2) is unrecoverable.
    spark.sql("CREATE TABLE tcat.db.gap (id BIGINT)")
    spark.sql("INSERT INTO tcat.db.gap SELECT id FROM range(3)") // v2
    Thread.sleep(1100)
    val betweenV2andV3 = java.time.Instant.now()
    Thread.sleep(1100)
    spark.sql("INSERT INTO tcat.db.gap SELECT id FROM range(3, 7)") // v3
    Files.delete(root("gap").resolve("manifest-v000002.txt"))
    val fmt = java.time.format.DateTimeFormatter
      .ofPattern("yyyy-MM-dd HH:mm:ss.SSS").withZone(java.time.ZoneOffset.UTC)
    val e = intercept[Exception] {
      spark.sql("SELECT count(*) FROM tcat.db.gap TIMESTAMP AS OF " +
        s"'${fmt.format(betweenV2andV3)}'").collect()
    }
    assert(e.getMessage.contains("contiguously retained") ||
      e.getMessage.contains("expired by retention"), e.getMessage)
    // instants at-or-after the surviving head still resolve normally
    assert(spark.sql("SELECT count(*) FROM tcat.db.gap TIMESTAMP AS OF " +
      s"'${fmt.format(java.time.Instant.now())}'").as[Long].head() == 7L)
  }

  test("rollback restores data and schema as a NEW version; bad history stays readable") {
    spark.sql("CREATE TABLE tcat.db.r (id BIGINT, v BIGINT)") // v1
    spark.range(0, 10).select($"id", $"id".as("v"))
      .coalesce(1).writeTo("tcat.db.r").append() // v2
    spark.sql("DELETE FROM tcat.db.r WHERE id < 8") // v3: the mistake
    spark.sql("ALTER TABLE tcat.db.r ADD COLUMN oops STRING") // v4: more mistake
    assert(spark.table("tcat.db.r").count() == 2L)
    val res = spark.sql(
      "CALL tcat.system.rollback(table => 'db.r', version => 2)")
      .as[(Long, Long)].head()
    assert(res == ((5L, 2L)), s"got $res")
    // restored: v2's rows AND v2's schema
    assert(spark.table("tcat.db.r").count() == 10L)
    assert(spark.table("tcat.db.r").schema.fieldNames.toSeq == Seq("id", "v"))
    // the mistake versions remain time-travelable
    assert(spark.sql("SELECT count(*) FROM tcat.db.r VERSION AS OF 3").as[Long].head() == 2L)
    // and the table keeps working after the restore
    spark.range(10, 12).select($"id", $"id".as("v"))
      .coalesce(1).writeTo("tcat.db.r").append()
    assert(spark.table("tcat.db.r").count() == 12L)
  }

  test("rollback refuses a future/current version and GC'd targets") {
    spark.sql("CREATE TABLE tcat.db.rb (id BIGINT, v BIGINT)")
    spark.range(0, 5).select($"id", $"id".as("v"))
      .coalesce(1).writeTo("tcat.db.rb").append()
    intercept[Exception] { ManifestSink.rollback(root("rb").toString, 2L) }
    intercept[Exception] { ManifestSink.rollback(root("rb").toString, 0L) }
    // simulate GC: drop v2's data file, roll forward, then try to restore
    spark.sql("INSERT OVERWRITE tcat.db.rb SELECT id, id FROM range(3)") // v3
    ManifestSink.committedEntries(root("rb"), Some(2L))
      .foreach(e => Files.delete(root("rb").resolve(e.name)))
    val err = intercept[Exception] { ManifestSink.rollback(root("rb").toString, 2L) }
    assert(err.getMessage.contains("retention GC"), err.getMessage)
  }
}
