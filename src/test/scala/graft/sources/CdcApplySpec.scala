package graft.sources

import java.nio.file.{Files, Path}

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The standard streaming-CDC-apply loop (the Delta `foreachBatch` +
  * MERGE pattern) composed from this engine's pieces: a stream of keyed
  * changes (upserts and deletes) applied into a manifest table with one
  * MERGE INTO per micro-batch. Proves last-writer-wins convergence,
  * per-batch atomicity (each micro-batch is one CAS commit in the
  * history), and that a replayed batch cannot corrupt state when the
  * apply is written idempotently (MERGE with identical input is a
  * no-op on the row values). */
case class Change(key: Long, value: String, op: String, seq: Long)

class CdcApplySpec extends AnyFunSuite {
  import graft.TestSpark.spark
  import spark.implicits._

  private val wh: Path = {
    val p = Files.createTempDirectory("graft-cdc")
    p.toFile.deleteOnExit()
    spark.conf.set("spark.sql.catalog.ccat", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.ccat.warehouse", p.toString)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS ccat.db")
    p
  }

  test("foreachBatch MERGE applies a change stream with last-writer-wins semantics") {
    spark.sql("CREATE TABLE ccat.db.state (key BIGINT, value STRING, seq BIGINT)")
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = MemoryStream[Change]
    val q = ms.toDS().writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[Change], batchId: Long) =>
        // within one batch, keep only the latest change per key (MERGE
        // rejects multiple source matches per target row — as it must)
        batch.createOrReplaceTempView("changes_raw")
        batch.sparkSession.sql(
          """MERGE INTO ccat.db.state t
            |USING (SELECT key, value, op, seq FROM (
            |  SELECT *, row_number() OVER (PARTITION BY key ORDER BY seq DESC) rn
            |  FROM changes_raw) WHERE rn = 1) s
            |ON t.key = s.key
            |WHEN MATCHED AND s.op = 'D' THEN DELETE
            |WHEN MATCHED AND s.seq > t.seq THEN UPDATE SET value = s.value, seq = s.seq
            |WHEN NOT MATCHED AND s.op != 'D' THEN INSERT (key, value, seq)
            |  VALUES (s.key, s.value, s.seq)""".stripMargin).collect()
        ()
      }
      .option("checkpointLocation",
        Files.createTempDirectory("graft-cdc-ckpt").toString)
      .start()

    // batch 1: inserts
    ms.addData(Change(1, "a", "U", 1), Change(2, "b", "U", 2), Change(3, "c", "U", 3))
    q.processAllAvailable()
    assert(spark.table("ccat.db.state").as[(Long, String, Long)].collect().toSet ==
      Set((1L, "a", 1L), (2L, "b", 2L), (3L, "c", 3L)))

    // batch 2: update key 1 (two changes — latest wins), delete key 2,
    // insert key 4, and a STALE change for key 3 that must be ignored
    ms.addData(Change(1, "a2", "U", 4), Change(1, "a3", "U", 5),
      Change(2, "", "D", 6), Change(4, "d", "U", 7), Change(3, "stale", "U", 0))
    q.processAllAvailable()
    assert(spark.table("ccat.db.state").as[(Long, String, Long)].collect().toSet ==
      Set((1L, "a3", 5L), (3L, "c", 3L), (4L, "d", 7L)))

    // re-applying batch 2's content is a value-level no-op (idempotent
    // apply): same rows after
    ms.addData(Change(1, "a3", "U", 5), Change(4, "d", "U", 7))
    q.processAllAvailable()
    assert(spark.table("ccat.db.state").as[(Long, String, Long)].collect().toSet ==
      Set((1L, "a3", 5L), (3L, "c", 3L), (4L, "d", 7L)))
    q.stop()

    // each applied batch is one atomic commit in the table history
    val ops = spark.sql("SELECT operation FROM ccat.db.state.history ORDER BY version")
      .as[String].collect().toSeq
    assert(ops.head == "create" && ops.count(_ != "create") >= 3, s"got $ops")
  }

  test("CDC apply onto a partitioned merge-on-read table with mid-stream OPTIMIZE") {
    // The production shape of the apply loop: the state table is
    // PARTITIONED (part = key div 4) and deletes are MERGE-ON-READ
    // (deletion-vector sidecars, no rewrite on the delete path). The
    // spec pins three compositions the unpartitioned test cannot:
    //  - a batch touching one partition leaves every other partition's
    //    data files untouched (carried by reference — the MERGE scan
    //    pruned them);
    //  - the delete step writes DVs instead of rewriting files;
    //  - OPTIMIZE between two micro-batches purges the DVs without
    //    disturbing convergence (dataChange=false, stream keeps going).
    spark.sql("CREATE TABLE ccat.db.pstate " +
      "(key BIGINT, part BIGINT, value STRING, seq BIGINT) " +
      "PARTITIONED BY (part) TBLPROPERTIES ('delete.mode' = 'merge-on-read')")
    val root = wh.resolve("db").resolve("pstate")
    def entries: Seq[ManifestSink.FileEntry] =
      ManifestSink.committedEntries(root, None).filter(_.rows > 0)
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = MemoryStream[Change]
    val q = ms.toDS().writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[Change], batchId: Long) =>
        val ss = batch.sparkSession
        batch.createOrReplaceTempView("pchanges")
        // upserts via MERGE on a MULTI-column key: the rewrite scan
        // advertises only `_file`, so the runtime group filter stays a
        // single-column `_file IN (…)` regardless of the ON shape (a
        // multi-attribute filter would become an untranslatable
        // struct-IN and every group would rewrite — see
        // ManifestScan.filterAttributes)
        ss.sql(
          """MERGE INTO ccat.db.pstate t
            |USING (SELECT key, key div 4 AS part, value, seq FROM (
            |  SELECT *, row_number() OVER (PARTITION BY key ORDER BY seq DESC) rn
            |  FROM pchanges WHERE op = 'U') WHERE rn = 1) s
            |ON t.key = s.key AND t.part = s.part
            |WHEN MATCHED AND s.seq > t.seq THEN UPDATE SET value = s.value, seq = s.seq
            |WHEN NOT MATCHED THEN INSERT (key, part, value, seq)
            |  VALUES (s.key, s.part, s.value, s.seq)""".stripMargin).collect()
        // deletes via row-level DELETE -> deletion vectors under MoR
        val dels = batch.filter(_.op == "D").select("key").as[Long].collect()
        if (dels.nonEmpty)
          ss.sql("DELETE FROM ccat.db.pstate WHERE key IN (" +
            dels.mkString(",") + ")").collect()
        ()
      }
      .option("checkpointLocation",
        Files.createTempDirectory("graft-cdc-pckpt").toString)
      .start()

    // batch 1: seed keys 0..15 across the 4 partitions (part = key div 4)
    ms.addData((0L until 16L).map(k => Change(k, s"v$k", "U", k + 1)): _*)
    q.processAllAvailable()
    assert(spark.table("ccat.db.pstate").count() == 16L)
    val before = entries.groupBy(_.parts("part")).view.mapValues(_.map(_.name).toSet).toMap

    // batch 2: update keys 5 and 6 (both part 1), delete key 9 (part 2)
    ms.addData(Change(5, "v5b", "U", 20), Change(6, "v6b", "U", 21),
      Change(9, "", "D", 22))
    q.processAllAvailable()
    val mid = entries
    // untouched partitions carried by reference: parts 0 and 3 keep
    // their exact file names through both the MERGE and the DELETE
    Seq("0", "3").foreach { p =>
      assert(mid.filter(_.parts("part") == p).map(_.name).toSet == before(p),
        s"partition $p files must carry by reference")
    }
    // the delete produced a deletion vector, not a rewrite: the part-2
    // file survives under its original name with dvRows set
    val p2 = mid.filter(_.parts("part") == "2")
    assert(p2.map(_.name).toSet == before("2"), "MoR delete must not rewrite")
    assert(p2.exists(_.dvRows > 0L), s"expected a DV on part 2: $p2")
    assert(spark.table("ccat.db.pstate").filter($"key" === 9L).count() == 0L)
    assert(spark.table("ccat.db.pstate").filter($"key" === 5L)
      .select($"value").as[String].head() == "v5b")

    // mid-stream OPTIMIZE purges the DV (dataChange=false rewrite)
    ManifestSink.compact(root.toString, targetRows = 100L)
    assert(entries.forall(_.dvRows == 0L), "OPTIMIZE must purge DVs")
    assert(spark.table("ccat.db.pstate").count() == 15L)

    // batch 3: the stream continues over the compacted layout —
    // re-insert the deleted key 9, MoR-delete key 12
    ms.addData(Change(9, "v9c", "U", 30), Change(12, "", "D", 31))
    q.processAllAvailable()
    q.stop()
    val fin = spark.table("ccat.db.pstate")
      .select($"key", $"value").as[(Long, String)].collect().toMap
    val want = (0L until 16L).filter(_ != 12L).map {
      case 5L => 5L -> "v5b"
      case 6L => 6L -> "v6b"
      case 9L => 9L -> "v9c"
      case k => k -> s"v$k"
    }.toMap
    assert(fin == want, s"got $fin")
  }

  test("key-only changelog: the DELETE half applies with ZERO base-file reads") {
    // a CDC producer that only knows KEYS (the common shape: upstream
    // emits tombstones) previously had no no-read delete path — both
    // CoW and MoR deletes must READ candidates to locate positions.
    // Equality deletes are exactly that path: the apply loop routes
    // tombstones to deleteWhereEq (keys-only commit) and upserts to the
    // ordinary append; base files are MOVED AWAY during the delete half
    // to prove it reads nothing.
    spark.sql("CREATE TABLE ccat.db.eqstate (key BIGINT, value STRING)")
    spark.sql("INSERT INTO ccat.db.eqstate SELECT id, concat('v', id) FROM range(10)")
    val root = wh.resolve("db").resolve("eqstate")
    def entries = ManifestSink.committedEntries(root, None)

    // one applied micro-batch: tombstones for 2 and 8, upsert of 100
    val tombstones = Seq(2L, 8L)
    val stash = Files.createTempDirectory("cdc-eq-stash")
    val names = entries.map(_.name)
    names.foreach(n => Files.move(root.resolve(n), stash.resolve(n)))
    ManifestSink.deleteWhereEq(root.toString, "key", tombstones.map(_.toString))
    names.foreach(n => Files.move(stash.resolve(n), root.resolve(n)))
    spark.sql("INSERT INTO ccat.db.eqstate VALUES (100, 'new')")

    val got = spark.table("ccat.db.eqstate").as[(Long, String)].collect().toMap
    val want = ((0L until 10L).filterNot(tombstones.contains)
      .map(k => k -> s"v$k") :+ (100L -> "new")).toMap
    assert(got == want, s"got $got")
    // a later tombstone for the re-inserted key only kills the OLD data
    // sequence if committed after it — kill 100 and verify
    ManifestSink.deleteWhereEq(root.toString, "key", Seq("100"))
    assert(!spark.table("ccat.db.eqstate").as[(Long, String)].collect().toMap.contains(100L))
  }
}
