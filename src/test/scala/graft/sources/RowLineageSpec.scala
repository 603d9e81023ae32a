package graft.sources

import java.nio.file.{Files, Path}

import org.scalatest.funsuite.AnyFunSuite

/** ROW LINEAGE (the Iceberg v3 row-lineage shape): every row gets a
  * table-unique `_row_id` when it first enters the table and a
  * `_last_updated_version` stamp, both served from manifest lineage
  * segments + physical file position — never stored in data files.
  * Appends assign contiguous id ranges from the CAS-carried
  * next-row-id high-water mark; deletes never disturb survivors' ids;
  * rewrites that cannot prove preservation mint fresh ids (the spec's
  * fallback for non-preserving writers). */
class RowLineageSpec extends AnyFunSuite {
  import graft.TestSpark.spark

  private val wh: Path = {
    val p = Files.createTempDirectory("graft-rowlineage")
    p.toFile.deleteOnExit()
    spark.conf.set("spark.sql.catalog.rl", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.rl.warehouse", p.toString)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS rl.db")
    p
  }
  private def root(t: String): Path = wh.resolve("db").resolve(t)
  private def lineageOf(t: String): Map[Long, (Long, Long)] =
    spark.sql(s"SELECT id, _row_id, _last_updated_version FROM rl.db.$t")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap

  test("appends assign contiguous ids; a second append continues numbering") {
    spark.sql("CREATE TABLE rl.db.a (id BIGINT)")
    spark.sql("INSERT INTO rl.db.a SELECT id FROM range(5)") // v2
    spark.sql("INSERT INTO rl.db.a SELECT id + 100 FROM range(3)") // v3
    val m = lineageOf("a")
    assert(m.size == 8)
    // all ids distinct, exactly [0, 8)
    assert(m.values.map(_._1).toSeq.sorted == (0L until 8L))
    // batch membership: the first batch's 5 ids are 0..4 with version 2,
    // the second's are 5..7 with version 3
    val batch1 = m.filter { case (id, _) => id < 100 }.values
    val batch2 = m.filter { case (id, _) => id >= 100 }.values
    assert(batch1.map(_._1).toSeq.sorted == (0L until 5L))
    assert(batch1.forall(_._2 == 2L))
    assert(batch2.map(_._1).toSeq.sorted == (5L until 8L))
    assert(batch2.forall(_._2 == 3L))
  }

  test("a MoR delete removes ids without renumbering survivors") {
    spark.sql("CREATE TABLE rl.db.d (id BIGINT) TBLPROPERTIES ('delete.mode'='merge-on-read')")
    spark.sql("INSERT INTO rl.db.d SELECT id FROM range(10)")
    val before = lineageOf("d")
    spark.sql("DELETE FROM rl.db.d WHERE id IN (2, 3, 7)")
    val after = lineageOf("d")
    assert(after.keySet == before.keySet -- Set(2L, 3L, 7L))
    after.foreach { case (id, l) => assert(l == before(id), s"id $id") }
  }

  test("lineage survives time travel and is exact per version") {
    spark.sql("CREATE TABLE rl.db.tt (id BIGINT)")
    spark.sql("INSERT INTO rl.db.tt SELECT id FROM range(4)") // v2
    spark.sql("INSERT INTO rl.db.tt SELECT id + 10 FROM range(2)") // v3
    val v2 = spark.sql(
      "SELECT id, _row_id FROM rl.db.tt VERSION AS OF 2")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(v2.values.toSeq.sorted == (0L until 4L))
    val cur = spark.sql("SELECT id, _row_id FROM rl.db.tt")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    v2.foreach { case (id, rid) => assert(cur(id) == rid) }
  }

  test("a lineage-only projection answers from the manifest (zero data columns)") {
    spark.sql("CREATE TABLE rl.db.z (id BIGINT)")
    spark.sql("INSERT INTO rl.db.z SELECT id FROM range(6)")
    val rids = spark.sql("SELECT _row_id FROM rl.db.z")
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(rids == (0L until 6L))
    // with a MoR delete the dead positions' ids disappear from the
    // zero-data-column path too
    spark.sql("CREATE TABLE rl.db.z2 (id BIGINT) TBLPROPERTIES ('delete.mode'='merge-on-read')")
    spark.sql("INSERT INTO rl.db.z2 SELECT id FROM range(6)")
    val mapped = spark.sql("SELECT id, _row_id FROM rl.db.z2")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    spark.sql("DELETE FROM rl.db.z2 WHERE id IN (1, 4)")
    val rids2 = spark.sql("SELECT _row_id FROM rl.db.z2")
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(rids2 == (mapped -- Set(1L, 4L)).values.toSeq.sorted)
  }

  test("a copy-on-write delete PRESERVES survivor ids through the rewrite") {
    spark.sql("CREATE TABLE rl.db.c (id BIGINT)")
    spark.sql("INSERT INTO rl.db.c SELECT id FROM range(6)") // v2
    val before = lineageOf("c")
    spark.sql("DELETE FROM rl.db.c WHERE id IN (0, 3)") // CoW: rewrites the file, v3
    val after = lineageOf("c")
    assert(after.keySet == Set(1L, 2L, 4L, 5L))
    // the Iceberg v3 guarantee: survivors keep their ids AND their
    // last-updated version across the physical rewrite (the rows
    // themselves were not modified)
    after.foreach { case (id, l) => assert(l == before(id), s"id $id") }
  }

  test("OPTIMIZE (bin-merge) preserves every row's id via concatenation lineage") {
    spark.sql("CREATE TABLE rl.db.m (id BIGINT)")
    spark.sql("INSERT INTO rl.db.m SELECT id FROM range(4)") // v2
    spark.sql("INSERT INTO rl.db.m SELECT id + 10 FROM range(4)") // v3
    spark.sql("INSERT INTO rl.db.m SELECT id + 20 FROM range(4)") // v4
    val before = lineageOf("m")
    val res = ManifestSink.compact(root("m").toString, targetRows = 1000L)
    assert(res.filesAfter < res.filesBefore, "files actually merged")
    val after = lineageOf("m")
    assert(after == before)
    // and the merged file reads them through ONE entry's segments
    val files = spark.sql("SELECT DISTINCT _file FROM rl.db.m").collect()
    assert(files.length == 1)
  }

  test("DV purge (OPTIMIZE after MoR deletes) preserves survivor ids by run-splitting") {
    spark.sql("CREATE TABLE rl.db.pv (id BIGINT) TBLPROPERTIES ('delete.mode'='merge-on-read')")
    spark.sql("INSERT INTO rl.db.pv SELECT id FROM range(10)")
    spark.sql("DELETE FROM rl.db.pv WHERE id IN (0, 4, 5, 9)") // DV, v3
    val before = lineageOf("pv")
    ManifestSink.compact(root("pv").toString, targetRows = 1000L) // purges the DV
    val after = lineageOf("pv")
    assert(after == before)
    // the purged file carries no DV anymore
    val st = ManifestSink.readState(root("pv"))
    assert(st.entries.forall(_.dvName.isEmpty))
  }

  test("equality-delete materialization preserves survivor ids") {
    spark.sql("CREATE TABLE rl.db.eq (id BIGINT, k STRING)")
    spark.sql("INSERT INTO rl.db.eq SELECT id, concat('k', id) FROM range(8)")
    val before = lineageOf2("eq")
    ManifestSink.deleteWhereEq(root("eq").toString, "k", Seq("k2", "k5"))
    val mid = lineageOf2("eq")
    assert(mid == before -- Set(2L, 5L))
    ManifestSink.materializeEqDeletes(root("eq").toString)
    val after = lineageOf2("eq")
    assert(after == mid)
    assert(ManifestSink.readState(root("eq")).eqDels.isEmpty)
  }

  private def lineageOf2(t: String): Map[Long, (Long, Long)] =
    spark.sql(s"SELECT id, _row_id, _last_updated_version FROM rl.db.$t")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap

  test("the CDC feed carries each change row's lineage: a stable upsert key") {
    spark.sql("CREATE TABLE rl.db.cf (id BIGINT, v STRING) " +
      "TBLPROPERTIES ('delete.mode' = 'merge-on-read')")
    spark.sql("INSERT INTO rl.db.cf SELECT id, concat('a', id) FROM range(6)") // v2
    val snap = lineageOf2b("cf") // id -> row id, from the snapshot read
    spark.sql("DELETE FROM rl.db.cf WHERE id IN (1, 4)") // v3: DV delete slices
    val feed = spark.read.format("graft.sources.ManifestSink")
      .option("path", root("cf").toString)
      .option("changesFromVersion", "0")
      .option("changeFeedMode", "cdc").load()
      .select("id", "_row_id", "_change_type")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    // insert rows carry the ids the snapshot serves; delete rows carry
    // the DELETED rows' original ids — consumers key on _row_id directly
    assert(feed.count(_._3 == "insert") == 6)
    feed.filter(_._3 == "insert").foreach { case (id, rid, _) =>
      assert(rid == snap(id), s"insert id $id") }
    assert(feed.filter(_._3 == "delete").map(r => (r._1, r._2)).toSet ==
      Set((1L, snap(1L)), (4L, snap(4L))))
  }

  private def lineageOf2b(t: String): Map[Long, Long] =
    spark.sql(s"SELECT id, _row_id FROM rl.db.$t")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("UPDATE: all rows keep their ids; updated rows alone bump last-updated") {
    spark.sql("CREATE TABLE rl.db.up (id BIGINT, v BIGINT)")
    spark.sql("INSERT INTO rl.db.up SELECT id, id * 10 FROM range(8)") // v2: ids 0..7
    val before = lineageOf("up")
    spark.sql("UPDATE rl.db.up SET v = v + 1 WHERE id IN (2, 5)") // v3: CoW group rewrite
    val after = lineageOf("up")
    assert(after.keySet == before.keySet)
    // carried-over rows keep BOTH their id and their last-updated stamp
    // through the physical rewrite (metadata projection carry-over)
    (before.keySet -- Set(2L, 5L)).foreach(id =>
      assert(after(id) == before(id), s"carried id $id"))
    // the full Iceberg v3 update semantic: updated rows KEEP their ids
    // (row identity survives the update) while last-updated bumps to
    // the rewrite version (PRESERVE_ON_UPDATE=false nullifies it
    // through the plan; the publisher stamps the committing version)
    Seq(2L, 5L).foreach { id =>
      assert(after(id)._1 == before(id)._1, s"updated row $id keeps its id")
      assert(after(id)._2 == 3L, s"updated row $id version")
    }
    assert(after.values.map(_._1).toSeq.distinct.size == after.size)
  }

  test("MERGE: carried and updated rows keep ids, updates bump version, inserts number fresh") {
    spark.sql("CREATE TABLE rl.db.mg (id BIGINT, v BIGINT)")
    spark.sql("INSERT INTO rl.db.mg SELECT id, id * 10 FROM range(6)") // v2: ids 0..5
    val before = lineageOf("mg")
    spark.sql(
      """MERGE INTO rl.db.mg t
        |USING (SELECT id FROM range(4, 9)) s ON t.id = s.id
        |WHEN MATCHED THEN UPDATE SET v = t.v + 1
        |WHEN NOT MATCHED THEN INSERT (id, v) VALUES (s.id, s.id * 100)
        |""".stripMargin) // updates 4,5; inserts 6,7,8
    val after = lineageOf("mg")
    assert(after.keySet == (0L until 9L).toSet)
    (0L until 4L).foreach(id => assert(after(id) == before(id), s"carried id $id"))
    // matched updates keep identity, bump version
    (4L until 6L).foreach { id =>
      assert(after(id)._1 == before(id)._1, s"updated row $id keeps its id")
      assert(after(id)._2 == 3L, s"updated row $id version")
    }
    // not-matched inserts are NEW rows: fresh ids past the high-water mark
    (6L until 9L).foreach { id =>
      assert(after(id)._1 >= 6L, s"inserted row $id id ${after(id)._1}")
      assert(after(id)._2 == 3L, s"inserted row $id version")
    }
    assert(after.values.map(_._1).toSeq.distinct.size == after.size)
  }

  test("a scattered UPDATE past the inline cap spills segments to a sidecar, ids exact") {
    import org.apache.spark.sql.functions._
    spark.sql("CREATE TABLE rl.db.sp (k BIGINT, p STRING)")
    // one file, 5000 rows in key order
    spark.range(0, 5000)
      .select(col("id").as("k"), lit("X").as("p"))
      .coalesce(1).sortWithinPartitions("k")
      .writeTo("rl.db.sp").append() // v2: ids 0..4999
    val before = spark.sql("SELECT k, _row_id FROM rl.db.sp")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // every other row updates: carried/updated alternate per row →
    // ~5000 version-alternating segments, far past the 1024 inline cap
    spark.sql("UPDATE rl.db.sp SET p = 'Y' WHERE k % 2 = 0") // v3
    val after = spark.sql("SELECT k, _row_id, _last_updated_version FROM rl.db.sp")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(after.size == 5000)
    // EVERY id preserved exactly — the spill keeps full fidelity where
    // the old inline cap silently re-minted the whole file
    after.foreach { case (k, (rid, lu)) =>
      assert(rid == before(k), s"id at k=$k")
      assert(lu == (if (k % 2 == 0) 3L else 2L), s"version at k=$k")
    }
    // the segments physically live in a content-addressed sidecar
    val st = ManifestSink.readState(root("sp"))
    val spilled = st.entries.filter(_.lineageRef.isDefined)
    assert(spilled.nonEmpty, "expected a lineage spill sidecar")
    spilled.foreach { e =>
      assert(e.lineage.isEmpty)
      assert(java.nio.file.Files.exists(root("sp").resolve(e.lineageRef.get)))
      assert(e.lineageSegs(root("sp")).size > 1024)
    }
    // vacuum keeps referenced sidecars, drops them once unreferenced
    ManifestSink.vacuum(root("sp"), retain = 1, orphanGraceMs = 0L, dryRun = false)
    spilled.foreach(e =>
      assert(java.nio.file.Files.exists(root("sp").resolve(e.lineageRef.get)),
        "referenced sidecar survived vacuum"))
    spark.sql("UPDATE rl.db.sp SET p = 'Z' WHERE k % 2 = 1") // v4: re-spills
    ManifestSink.vacuum(root("sp"), retain = 1, orphanGraceMs = 0L, dryRun = false)
    val names = java.nio.file.Files.list(root("sp")).iterator()
    val live = ManifestSink.readState(root("sp")).entries
      .flatMap(_.lineageRef).toSet
    import scala.jdk.CollectionConverters._
    names.asScala.map(_.getFileName.toString)
      .filter(_.startsWith("lineage-")).foreach(n =>
        assert(live(n), s"unreferenced sidecar $n swept"))
  }

  test("'changed since V' prunes files by lineage version, metadata-only") {
    spark.sql("CREATE TABLE rl.db.inc (id BIGINT)")
    spark.sql("INSERT INTO rl.db.inc SELECT id FROM range(5)") // v2
    spark.sql("INSERT INTO rl.db.inc SELECT id + 10 FROM range(5)") // v3
    spark.sql("INSERT INTO rl.db.inc SELECT id + 20 FROM range(5)") // v4
    // physically delete every file whose rows predate v3: if the
    // incremental filter actually prunes by lineage version, the scan
    // never opens them — the repo's standard no-read proof
    val st = ManifestSink.readState(root("inc"))
    val old = st.entries.filter(_.lineageSegs(root("inc")).forall(_._3 < 3L))
    assert(old.nonEmpty)
    old.foreach(e => Files.delete(root("inc").resolve(e.name)))
    val changed = spark.sql(
      "SELECT id, _last_updated_version FROM rl.db.inc WHERE _last_updated_version >= 3")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(changed == ((10L until 15L).map(i => (i, 3L)) ++
      (20L until 25L).map(i => (i, 4L))).toSet)
    // row-id range scans prune the same way (positions [0,5) live in
    // the deleted first file; ids >= 5 never touch it)
    val byId = spark.sql(
      "SELECT id FROM rl.db.inc WHERE _row_id >= 5")
      .collect().map(_.getLong(0)).toSet
    assert(byId == ((10L until 15L) ++ (20L until 25L)).toSet)
    // the documented upsert-key probe shape: an IN-set on _row_id prunes
    // by each file's id runs too (ids 7 and 12 live in files 2 and 3)
    val byIn = spark.sql(
      "SELECT id FROM rl.db.inc WHERE _row_id IN (7, 12)")
      .collect().map(_.getLong(0)).toSet
    assert(byIn == Set(12L, 22L))
  }

  test("db.t.files reports per-file lineage accounting, sidecars included") {
    spark.sql("CREATE TABLE rl.db.fv (id BIGINT)")
    spark.sql("INSERT INTO rl.db.fv SELECT /*+ COALESCE(1) */ id FROM range(7)") // v2: ids 0..6
    spark.sql("INSERT INTO rl.db.fv SELECT /*+ COALESCE(1) */ id + 10 FROM range(3)") // v3: ids 7..9
    val rows = spark.sql(
      """SELECT file, first_row_id, last_row_id, min_last_updated,
        |  max_last_updated, lineage_segments, lineage_spilled
        |FROM rl.db.fv.files ORDER BY first_row_id""".stripMargin).collect()
    assert(rows.length == 2)
    assert((rows(0).getLong(1), rows(0).getLong(2),
      rows(0).getLong(3), rows(0).getLong(4)) == (0L, 6L, 2L, 2L))
    assert((rows(1).getLong(1), rows(1).getLong(2),
      rows(1).getLong(3), rows(1).getLong(4)) == (7L, 9L, 3L, 3L))
    assert(rows.forall(r => r.getLong(5) == 1L && !r.getBoolean(6)))
  }

  test("lineage flows through coalesced small-file bins (chained per-file readers)") {
    spark.sql("CREATE TABLE rl.db.bn (id BIGINT)")
    for (i <- 0 until 4)
      spark.sql(s"INSERT INTO rl.db.bn SELECT id + ${i * 10} FROM range(3)")
    val prev = spark.conf.getOption("graft.scan.bin-rows")
    try {
      spark.conf.set("graft.scan.bin-rows", "1000000") // bin EVERYTHING into one task
      val m = spark.sql("SELECT id, _row_id, _last_updated_version FROM rl.db.bn")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      assert(m.length == 12)
      assert(m.map(_._2).sorted.toSeq == (0L until 12L))
      // version stamps follow each member file's own segments even
      // inside one chained task
      m.foreach { case (id, rid, lu) => assert(lu == 2L + rid / 3, s"id $id") }
    } finally {
      prev.fold(spark.conf.unset("graft.scan.bin-rows"))(
        spark.conf.set("graft.scan.bin-rows", _))
    }
  }

  // NOTE deliberately NOT covered: lineage columns on `readStream` —
  // Spark's DSv2 STREAMING planner resolves metadata columns on the
  // relation but never routes them through pruneColumns when the scan
  // is built at stream start, so no connector can serve them there
  // (the analyzer accepts the query and the task then reads ordinals
  // past the reader's row — a Spark surface gap, not a graft one).
  // Streaming incremental consumers use the CDC feed (whose BATCH read
  // carries lineage, test above) or the changed-since-V pruned batch
  // read (test above) per micro-batch via foreachBatch.

  test("pre-lineage files read NULL, later appends still number from the high-water mark") {
    spark.sql("CREATE TABLE rl.db.l (id BIGINT)")
    spark.sql("INSERT INTO rl.db.l SELECT id FROM range(3)")
    // publish a lineage-stripped snapshot (next-row-id reset): simulates
    // a table whose files were committed before lineage tracking
    val st = ManifestSink.readState(root("l"))
    val schemaJson = st.schema.get.json
    val stripped = st.entries.map(e => ManifestSink.entryLine(
      e.copy(lineage = Seq.empty)))
    ManifestSink.publish(root("l"), st.version,
      ((schemaJson +: st.copy(nextRowId = 0L).metaLines) ++ stripped)
        .mkString("\n"))
    val rows = spark.sql("SELECT id, _row_id, _last_updated_version FROM rl.db.l")
      .collect()
    assert(rows.length == 3 && rows.forall(r => r.isNullAt(1) && r.isNullAt(2)))
    spark.sql("INSERT INTO rl.db.l SELECT id + 10 FROM range(2)")
    val after = spark.sql(
      "SELECT id, _row_id FROM rl.db.l WHERE _row_id IS NOT NULL")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(after == Map(10L -> 0L, 11L -> 1L))
  }
}
