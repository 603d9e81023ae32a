package graft.sources

import java.nio.file.{Files, Path}

import org.scalatest.funsuite.AnyFunSuite

/** Incrementally-maintained materialized views ([[IncrementalMv]]):
  * refresh reads ONLY the delta (proved physically — the consumed files
  * are deleted before the next refresh and it still succeeds), the view
  * equals the full recompute after every round, compaction inside the
  * window contributes nothing, a no-op refresh commits nothing, and a
  * row-level delete in the source fails the refresh loudly. */
class IncrementalMvSpec extends AnyFunSuite {
  import graft.TestSpark.spark
  import spark.implicits._

  private val wh: Path = {
    val p = Files.createTempDirectory("graft-mv")
    p.toFile.deleteOnExit()
    spark.conf.set("spark.sql.catalog.mvc", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.mvc.warehouse", p.toString)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS mvc.db")
    p
  }
  private def root(t: String): Path = wh.resolve("db").resolve(t)

  private def mvRows(t: String): Map[Long, (Long, Long)] =
    spark.table(s"mvc.db.$t").as[(Long, Long, Long)].collect()
      .map { case (k, n, sv) => k -> (n, sv) }.toMap

  test("refresh folds exactly the delta and matches the full recompute") {
    spark.sql("CREATE TABLE mvc.db.src (k BIGINT, v BIGINT)")
    spark.sql("CREATE TABLE mvc.db.mv (k BIGINT, n BIGINT, sum_v BIGINT)")
    spark.sql("INSERT INTO mvc.db.src SELECT id % 3, id FROM range(30)")

    val v1 = IncrementalMv.refresh(spark, "mvc", "db.src", "db.mv",
      Seq("k"), Seq("v"))
    assert(v1 == ManifestSink.currentVersion(root("src")))
    assert(mvRows("mv") == (0L until 3L).map(k =>
      k -> ((10L, (0L until 30L).filter(_ % 3 == k).sum))).toMap)

    // round 2: consumed files DELETED first — an incremental refresh
    // never re-opens them; a full recompute would die here
    val consumed = ManifestSink.committedEntries(root("src"), None).map(_.name)
    spark.sql("INSERT INTO mvc.db.src SELECT id % 3, id FROM range(30, 60)")
    consumed.foreach(n => Files.delete(root("src").resolve(n)))
    val v2 = IncrementalMv.refresh(spark, "mvc", "db.src", "db.mv",
      Seq("k"), Seq("v"))
    assert(v2 > v1)
    assert(mvRows("mv") == (0L until 3L).map(k =>
      k -> ((20L, (0L until 60L).filter(_ % 3 == k).sum))).toMap)

    // no-op: source unchanged → same version back, no MV commit
    val mvVer = ManifestSink.currentVersion(root("mv"))
    assert(IncrementalMv.refresh(spark, "mvc", "db.src", "db.mv",
      Seq("k"), Seq("v")) == v2)
    assert(ManifestSink.currentVersion(root("mv")) == mvVer)
  }

  test("a compaction inside the refresh window contributes nothing") {
    spark.sql("CREATE TABLE mvc.db.csrc (k BIGINT, v BIGINT)")
    spark.sql("CREATE TABLE mvc.db.cmv (k BIGINT, n BIGINT, sum_v BIGINT)")
    spark.sql("INSERT INTO mvc.db.csrc SELECT id % 2, id FROM range(10)")
    spark.sql("INSERT INTO mvc.db.csrc SELECT id % 2, id FROM range(10, 20)")
    // OPTIMIZE between the appends and the refresh: the rewrite version
    // must not re-deliver (or double-deliver) a single row
    ManifestSink.compact(root("csrc").toString, targetRows = 1000L)
    spark.sql("INSERT INTO mvc.db.csrc SELECT id % 2, id FROM range(20, 25)")
    IncrementalMv.refresh(spark, "mvc", "db.csrc", "db.cmv", Seq("k"), Seq("v"))
    assert(mvRows("cmv") == (0L until 2L).map(k =>
      k -> (((0L until 25L).count(_ % 2 == k).toLong,
        (0L until 25L).filter(_ % 2 == k).sum))).toMap)
  }

  test("merge-on-read deletes retract from the view; an emptied key leaves it") {
    spark.sql("CREATE TABLE mvc.db.rsrc (k BIGINT, v BIGINT) " +
      "TBLPROPERTIES ('delete.mode' = 'merge-on-read')")
    spark.sql("CREATE TABLE mvc.db.rmv (k BIGINT, n BIGINT, sum_v BIGINT)")
    spark.sql("INSERT INTO mvc.db.rsrc SELECT id % 3, id FROM range(30)")
    IncrementalMv.refresh(spark, "mvc", "db.rsrc", "db.rmv", Seq("k"), Seq("v"))
    // retract part of key 0 and ALL of key 2
    spark.sql("DELETE FROM mvc.db.rsrc WHERE k = 0 AND v < 10")
    spark.sql("DELETE FROM mvc.db.rsrc WHERE k = 2")
    spark.sql("INSERT INTO mvc.db.rsrc SELECT 1, 100") // and one insert
    IncrementalMv.refresh(spark, "mvc", "db.rsrc", "db.rmv", Seq("k"), Seq("v"))
    val live = (0L until 30L).map(v => (v % 3, v))
      .filterNot { case (k, v) => (k == 0 && v < 10) || k == 2 } :+ ((1L, 100L))
    val want = live.groupBy(_._1).view
      .mapValues(xs => (xs.size.toLong, xs.map(_._2).sum)).toMap
    assert(mvRows("rmv") == want, s"want $want got ${mvRows("rmv")}")
    assert(!mvRows("rmv").contains(2L), "an emptied key must leave the view")
  }

  test("inserts and deletes that cancel within one window insert no tombstone") {
    spark.sql("CREATE TABLE mvc.db.csrc2 (k BIGINT, v BIGINT) " +
      "TBLPROPERTIES ('delete.mode' = 'merge-on-read')")
    spark.sql("CREATE TABLE mvc.db.cmv2 (k BIGINT, n BIGINT, sum_v BIGINT)")
    spark.sql("INSERT INTO mvc.db.csrc2 SELECT 0, id FROM range(5)")
    // key 9 appears and fully disappears BEFORE the first refresh sees it
    spark.sql("INSERT INTO mvc.db.csrc2 SELECT 9, id FROM range(3)")
    spark.sql("DELETE FROM mvc.db.csrc2 WHERE k = 9")
    IncrementalMv.refresh(spark, "mvc", "db.csrc2", "db.cmv2", Seq("k"), Seq("v"))
    // the full recompute has no key-9 row; neither may the fold
    assert(mvRows("cmv2") == Map(0L -> ((5L, 10L))), mvRows("cmv2"))
  }

  test("a row-level delete in the window fails the refresh loudly") {
    spark.sql("CREATE TABLE mvc.db.dsrc (k BIGINT, v BIGINT)")
    spark.sql("CREATE TABLE mvc.db.dmv (k BIGINT, n BIGINT, sum_v BIGINT)")
    spark.sql("INSERT INTO mvc.db.dsrc SELECT id % 2, id FROM range(10)")
    IncrementalMv.refresh(spark, "mvc", "db.dsrc", "db.dmv", Seq("k"), Seq("v"))
    spark.sql("INSERT INTO mvc.db.dsrc SELECT id % 2, id FROM range(10, 20)")
    spark.sql("DELETE FROM mvc.db.dsrc WHERE v = 3")
    val e = intercept[Exception] {
      IncrementalMv.refresh(spark, "mvc", "db.dsrc", "db.dmv", Seq("k"), Seq("v"))
    }
    assert(e.getMessage.contains("pure-append") ||
      e.getMessage.contains("not pure-append"), e.getMessage)
    // the view was not corrupted by the failed attempt: still round-1 state
    assert(mvRows("dmv") == (0L until 2L).map(k =>
      k -> (((0L until 10L).count(_ % 2 == k).toLong,
        (0L until 10L).filter(_ % 2 == k).sum))).toMap)
  }

  test("continuous maintenance: a streaming trigger drives refresh; replays are no-ops") {
    // the production loop: the TABLE-AS-STREAM source wakes the refresher
    // whenever the source commits; the refresh itself reads the change
    // feed against its own durable version pointer, so a replayed or
    // duplicate trigger (foreachBatch's at-least-once) finds to <= from
    // and commits nothing — exactly-once by table metadata, not by
    // checkpoint gymnastics
    spark.sql("CREATE TABLE mvc.db.ssrc (k BIGINT, v BIGINT)")
    spark.sql("CREATE TABLE mvc.db.smv (k BIGINT, n BIGINT, sum_v BIGINT)")
    spark.sql("INSERT INTO mvc.db.ssrc SELECT id % 2, id FROM range(10)")
    def runOnce(): Unit = {
      val q = spark.readStream.format("graft.sources.ManifestSink")
        .option("path", root("ssrc").toString).load()
        .writeStream
        .option("checkpointLocation",
          Files.createTempDirectory("graft-mv-ckpt").toString)
        .foreachBatch { (_: org.apache.spark.sql.DataFrame, _: Long) =>
          IncrementalMv.refresh(spark, "mvc", "db.ssrc", "db.smv",
            Seq("k"), Seq("v")): Unit
        }
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    runOnce()
    assert(mvRows("smv") == (0L until 2L).map(k =>
      k -> (((0L until 10L).count(_ % 2 == k).toLong,
        (0L until 10L).filter(_ % 2 == k).sum))).toMap)
    // a SECOND full pass over the stream (fresh checkpoint = total
    // replay) must change nothing
    val mvVer = ManifestSink.currentVersion(root("smv"))
    runOnce()
    assert(ManifestSink.currentVersion(root("smv")) == mvVer)
    // new appends then flow through the same loop
    spark.sql("INSERT INTO mvc.db.ssrc SELECT id % 2, id FROM range(10, 16)")
    runOnce()
    assert(mvRows("smv") == (0L until 2L).map(k =>
      k -> (((0L until 16L).count(_ % 2 == k).toLong,
        (0L until 16L).filter(_ % 2 == k).sum))).toMap)
  }

  test("NULL group keys fold into ONE view row and retract correctly") {
    // GROUP BY treats NULL as a real group; the MERGE must match it
    // with null-safe equality or every refresh would insert a fresh
    // NULL-key row that no later retraction could ever find
    spark.sql("CREATE TABLE mvc.db.nsrc (k BIGINT, v BIGINT) " +
      "TBLPROPERTIES ('delete.mode' = 'merge-on-read')")
    spark.sql("CREATE TABLE mvc.db.nmv (k BIGINT, n BIGINT, sum_v BIGINT)")
    spark.sql("INSERT INTO mvc.db.nsrc VALUES (NULL, 1), (NULL, 2), (7, 3)")
    IncrementalMv.refresh(spark, "mvc", "db.nsrc", "db.nmv", Seq("k"), Seq("v"))
    // second window touches the NULL group again: must UPDATE, not insert
    spark.sql("INSERT INTO mvc.db.nsrc VALUES (NULL, 10)")
    IncrementalMv.refresh(spark, "mvc", "db.nsrc", "db.nmv", Seq("k"), Seq("v"))
    val rows = spark.table("mvc.db.nmv").collect()
      .map(r => (if (r.isNullAt(0)) None else Some(r.getLong(0)),
        r.getLong(1), r.getLong(2))).toSet
    assert(rows == Set((None, 3L, 13L), (Some(7L), 1L, 3L)), rows.mkString(", "))
    // retraction finds the NULL-key row too; emptying it removes it
    spark.sql("DELETE FROM mvc.db.nsrc WHERE k IS NULL")
    IncrementalMv.refresh(spark, "mvc", "db.nsrc", "db.nmv", Seq("k"), Seq("v"))
    val after = spark.table("mvc.db.nmv").collect()
      .map(r => (if (r.isNullAt(0)) None else Some(r.getLong(0)),
        r.getLong(1), r.getLong(2))).toSet
    assert(after == Set((Some(7L), 1L, 3L)), after.mkString(", "))
  }

  test("crash after staging (before the MERGE) rolls forward exactly once") {
    spark.sql("CREATE TABLE mvc.db.c1src (k BIGINT, v BIGINT)")
    spark.sql("CREATE TABLE mvc.db.c1mv (k BIGINT, n BIGINT, sum_v BIGINT)")
    spark.sql("INSERT INTO mvc.db.c1src SELECT id % 2, id FROM range(10)")
    // simulate: the previous refresher died right after step 1 — the
    // pending marker is durable, the fold never ran
    val to = ManifestSink.currentVersion(root("c1src"))
    IncrementalMv.stagePending(root("c1mv"), 0L, to)
    IncrementalMv.refresh(spark, "mvc", "db.c1src", "db.c1mv", Seq("k"), Seq("v"))
    assert(mvRows("c1mv") == (0L until 2L).map(k =>
      k -> (((0L until 10L).count(_ % 2 == k).toLong,
        (0L until 10L).filter(_ % 2 == k).sum))).toMap)
    // marker cleared, pointer advanced — the protocol fully settled
    val props = ManifestSink.readHeader(root("c1mv")).props
    assert(!props.contains("mv.pending-refresh"), props)
    assert(props.get("mv.source-version").contains(to.toString))
  }

  test("crash after the MERGE (before finalize) must NOT double-count") {
    spark.sql("CREATE TABLE mvc.db.c2src (k BIGINT, v BIGINT)")
    spark.sql("CREATE TABLE mvc.db.c2mv (k BIGINT, n BIGINT, sum_v BIGINT)")
    spark.sql("INSERT INTO mvc.db.c2src SELECT id % 2, id FROM range(10)")
    // simulate: steps 1 and 2 committed, the refresher died before
    // step 3 — the window IS folded but the pointer still says it isn't.
    // The old two-publish protocol re-applied the window here and
    // silently doubled every count.
    val to = ManifestSink.currentVersion(root("c2src"))
    IncrementalMv.stagePending(root("c2mv"), 0L, to)
    IncrementalMv.applyWindow(spark, "mvc", root("c2src"), "db.c2mv",
      Seq("k"), Seq("v"), 0L, to)
    IncrementalMv.refresh(spark, "mvc", "db.c2src", "db.c2mv", Seq("k"), Seq("v"))
    assert(mvRows("c2mv") == (0L until 2L).map(k =>
      k -> (((0L until 10L).count(_ % 2 == k).toLong,
        (0L until 10L).filter(_ % 2 == k).sum))).toMap,
      "recovery re-applied an already-folded window (double-count)")
    assert(!ManifestSink.readHeader(root("c2mv")).props.contains("mv.pending-refresh"))
    // and the loop continues normally afterwards
    spark.sql("INSERT INTO mvc.db.c2src SELECT id % 2, id FROM range(10, 14)")
    IncrementalMv.refresh(spark, "mvc", "db.c2src", "db.c2mv", Seq("k"), Seq("v"))
    assert(mvRows("c2mv") == (0L until 2L).map(k =>
      k -> (((0L until 14L).count(_ % 2 == k).toLong,
        (0L until 14L).filter(_ % 2 == k).sum))).toMap)
  }

  test("refresh state is durable table metadata, not session state") {
    spark.sql("CREATE TABLE mvc.db.psrc (k BIGINT, v BIGINT)")
    spark.sql("CREATE TABLE mvc.db.pmv (k BIGINT, n BIGINT, sum_v BIGINT)")
    spark.sql("INSERT INTO mvc.db.psrc SELECT id % 2, id FROM range(6)")
    val v = IncrementalMv.refresh(spark, "mvc", "db.psrc", "db.pmv",
      Seq("k"), Seq("v"))
    // the pointer is readable straight off the manifest (any session
    // could pick the next refresh up) and via SHOW TBLPROPERTIES
    assert(IncrementalMv.lastSourceVersion(spark, "mvc", "db.pmv") == v)
    val shown = spark.sql("SHOW TBLPROPERTIES mvc.db.pmv").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(shown.get("mv.source-version").contains(v.toString))
  }
}
