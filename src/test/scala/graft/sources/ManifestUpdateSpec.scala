package graft.sources

import java.nio.file.{Files, Path}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** SQL `UPDATE` and `MERGE INTO` against manifest tables: Spark's
  * group-based row-level rewrite ([[ManifestRowLevelOperation]]) driven
  * through [[GraftCatalog]]. The rewrite scan pins the version it read
  * and records the file set it planned; the replacing write swaps
  * exactly those files in one CAS publish — so these specs assert not
  * just the resulting relation but the FILE accounting (untouched files
  * carried by reference, touched files rewritten) and that history and
  * the change feed stay consistent across the rewrite version. */
class ManifestUpdateSpec extends AnyFunSuite {
  import graft.TestSpark.spark
  import spark.implicits._

  private val fmt = "graft.sources.ManifestSink"

  private val wh: Path = {
    val p = Files.createTempDirectory("graft-update")
    p.toFile.deleteOnExit()
    spark.conf.set("spark.sql.catalog.ucat", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.ucat.warehouse", p.toString)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS ucat.db")
    p
  }

  private def files(t: String): Set[String] = {
    val root = wh.resolve("db").resolve(t)
    ManifestSink.committedEntries(root, None).map(_.name).toSet
  }

  test("UPDATE rewrites only stats-matching files; others carried by reference") {
    spark.sql("CREATE TABLE ucat.db.u (id BIGINT, grp BIGINT, v BIGINT)")
    // two appends → two files with disjoint id ranges [0,50) and [50,100)
    spark.sql("INSERT INTO ucat.db.u SELECT id, id % 5, id * 10 FROM range(50)")
    spark.sql("INSERT INTO ucat.db.u SELECT id, id % 5, id * 10 FROM range(50, 100)")
    val before = files("u")
    assert(before.size >= 2)

    spark.sql("UPDATE ucat.db.u SET v = v + 1 WHERE id < 10")

    val rows = spark.table("ucat.db.u").as[(Long, Long, Long)].collect().toSet
    val expect = (0L until 100L).map(i =>
      (i, i % 5, if (i < 10) i * 10 + 1 else i * 10)).toSet
    assert(rows == expect)

    // file accounting: the [50,100) file's id-range stats rule it out of
    // the rewrite scan, so it must survive BY NAME; the [0,50) file must
    // be gone (rewritten under a fresh name)
    val after = files("u")
    val untouched = before.intersect(after)
    assert(untouched.nonEmpty, s"no file carried by reference: $before -> $after")
    assert(before != after, "UPDATE rewrote nothing")
  }

  test("UPDATE with arithmetic predicate and expression SET") {
    spark.sql("CREATE TABLE ucat.db.ue (id BIGINT, s STRING, v BIGINT)")
    spark.sql("INSERT INTO ucat.db.ue SELECT id, concat('r', id), id FROM range(30)")
    spark.sql("UPDATE ucat.db.ue SET v = v * 2, s = upper(s) WHERE id % 3 = 0")
    val rows = spark.table("ucat.db.ue").as[(Long, String, Long)].collect().toSet
    val expect = (0L until 30L).map { i =>
      if (i % 3 == 0) (i, s"R$i", i * 2) else (i, s"r$i", i)
    }.toSet
    assert(rows == expect)
  }

  test("UPDATE preserves time travel: pre-update snapshot still readable") {
    spark.sql("CREATE TABLE ucat.db.tt (id BIGINT, v BIGINT)") // v1
    spark.sql("INSERT INTO ucat.db.tt SELECT id, id FROM range(20)") // v2
    spark.sql("UPDATE ucat.db.tt SET v = 0 WHERE id >= 10") // v3
    val old = spark.sql("SELECT * FROM ucat.db.tt VERSION AS OF 2")
      .as[(Long, Long)].collect().toSet
    assert(old == (0L until 20L).map(i => (i, i)).toSet)
    val now = spark.table("ucat.db.tt").as[(Long, Long)].collect().toSet
    assert(now == (0L until 20L).map(i => (i, if (i >= 10) 0L else i)).toSet)
  }

  test("MERGE INTO: matched update, not-matched insert, matched delete") {
    spark.sql("CREATE TABLE ucat.db.m (id BIGINT, v BIGINT)")
    spark.sql("INSERT INTO ucat.db.m SELECT id, id FROM range(10)")
    spark.sql(
      """MERGE INTO ucat.db.m t
        |USING (SELECT id, id * 100 AS v FROM range(5, 15)) s
        |ON t.id = s.id
        |WHEN MATCHED AND t.id = 7 THEN DELETE
        |WHEN MATCHED THEN UPDATE SET v = s.v
        |WHEN NOT MATCHED THEN INSERT (id, v) VALUES (s.id, s.v)
        |""".stripMargin)
    val rows = spark.table("ucat.db.m").as[(Long, Long)].collect().toSet
    val expect =
      (0L until 5L).map(i => (i, i)).toSet ++ // untouched
        (5L until 10L).filter(_ != 7L).map(i => (i, i * 100)).toSet ++ // updated
        (10L until 15L).map(i => (i, i * 100)).toSet // inserted
    assert(rows == expect)
  }

  test("MERGE INTO with NOT MATCHED BY SOURCE clause") {
    spark.sql("CREATE TABLE ucat.db.ms (id BIGINT, v BIGINT)")
    spark.sql("INSERT INTO ucat.db.ms SELECT id, id FROM range(10)")
    spark.sql(
      """MERGE INTO ucat.db.ms t
        |USING (SELECT id FROM range(8, 12)) s
        |ON t.id = s.id
        |WHEN MATCHED THEN UPDATE SET v = -1
        |WHEN NOT MATCHED THEN INSERT (id, v) VALUES (s.id, 999)
        |WHEN NOT MATCHED BY SOURCE AND t.id < 3 THEN DELETE
        |""".stripMargin)
    val rows = spark.table("ucat.db.ms").as[(Long, Long)].collect().toSet
    val expect =
      (3L until 8L).map(i => (i, i)).toSet ++ // survivors (0,1,2 deleted)
        Set((8L, -1L), (9L, -1L)) ++ // matched → sentinel
        Set((10L, 999L), (11L, 999L)) // inserted
    assert(rows == expect)
  }

  test("concurrent append between rewrite scan and commit loses loudly, table intact") {
    spark.sql("CREATE TABLE ucat.db.cc (id BIGINT, v BIGINT)")
    spark.sql("INSERT INTO ucat.db.cc SELECT id, id FROM range(10)")
    val root = wh.resolve("db").resolve("cc")
    val v0 = ManifestSink.currentVersion(root)
    // simulate a concurrent append AFTER the rewrite would have planned:
    // bump the version underneath a replace pinned to v0
    spark.range(10, 12).selectExpr("id", "id AS v")
      .write.format(fmt).option("path", root.toString).mode("append").save()
    intercept[Exception] {
      ManifestSink.publishReplace(root, v0, Set.empty, Seq.empty,
        GcPolicy(None, 3600L * 1000))
    }
    assert(spark.table("ucat.db.cc").count() == 12)
  }
}
