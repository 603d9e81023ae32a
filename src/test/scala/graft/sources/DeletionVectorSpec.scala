package graft.sources

import java.nio.file.{Files, Path}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Merge-on-read deletes via positional deletion vectors. Invariants:
  *  - a MoR DELETE rewrites NO data file (all entry names stay; a
  *    sidecar dv-*.txt appears instead) yet reads exclude the rows;
  *  - count(*) stays metadata-exact (live counts), while MIN/MAX
  *    pushdown is disabled the moment a DV exists (the extremum might
  *    be deleted) — both verified by VALUE, not just plan shape;
  *  - a second DELETE merges vectors; deleting every live row of a
  *    file drops its entry with no rewrite;
  *  - time travel shows pre-delete rows; a change feed across the DV
  *    version fails loudly (not silently empty);
  *  - OPTIMIZE purges vectors (fresh files, fresh stats, change feed
  *    and streams treat it as dataChange=false);
  *  - row-level DML (UPDATE / direct CoW delete) after a MoR delete
  *    sees live rows only and purges the vector of any file it
  *    rewrites;
  *  - vacuum never sweeps a referenced DV, and sweeps orphaned ones;
  *  - a stream started from scratch reads the SNAPSHOT first (DVs
  *    applied), not the history walk.
  *
  * Layout-sensitive tests write via `coalesce(1)` so each INSERT is
  * exactly one data file — SQL INSERT fans out one file per task. */
class DeletionVectorSpec extends AnyFunSuite {
  import graft.TestSpark.spark
  import spark.implicits._

  private val wh: Path = {
    val p = Files.createTempDirectory("graft-dv")
    p.toFile.deleteOnExit()
    spark.conf.set("spark.sql.catalog.dvcat", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.dvcat.warehouse", p.toString)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS dvcat.db")
    p
  }
  private def root(t: String): Path = wh.resolve("db").resolve(t)
  private def entries(t: String): Seq[ManifestSink.FileEntry] =
    ManifestSink.committedEntries(root(t), None)
  private def create(t: String): Unit =
    spark.sql(s"CREATE TABLE dvcat.db.$t (id BIGINT, v BIGINT) " +
      "TBLPROPERTIES ('delete.mode' = 'merge-on-read')")
  /** One data file per call, ids [lo, hi), v = id. */
  private def insertOneFile(t: String, lo: Long, hi: Long): Unit =
    spark.range(lo, hi).select($"id", $"id".as("v"))
      .coalesce(1).writeTo(s"dvcat.db.$t").append()

  test("MoR delete: no file rewritten, a DV appears, reads exclude the rows") {
    create("m")
    spark.sql("INSERT INTO dvcat.db.m SELECT id, id * 2 FROM range(100)")
    val names = entries("m").map(_.name).toSet
    spark.sql("DELETE FROM dvcat.db.m WHERE id % 10 = 3")
    val after = entries("m")
    assert(after.map(_.name).toSet == names, "MoR delete must not rewrite data files")
    assert(after.exists(e => e.dvName.isDefined && e.dvRows > 0L),
      s"expected deletion vectors, got $after")
    assert(after.map(_.rows).sum == 100L, "physical rows unchanged")
    assert(after.map(_.liveRows).sum == 90L)
    val got = spark.table("dvcat.db.m").select($"id").as[Long].collect().sorted
    assert(got.toSeq == (0L until 100L).filter(_ % 10 != 3))
    // full-row read too (columnar handoff must have fallen back cleanly)
    assert(spark.table("dvcat.db.m").agg(sum($"v")).as[Long].head() ==
      (0L until 100L).filter(_ % 10 != 3).map(_ * 2).sum)
  }

  test("count(*) stays metadata-exact; MIN/MAX pushdown turns off under a DV") {
    create("agg")
    insertOneFile("agg", 0, 50)
    spark.sql("DELETE FROM dvcat.db.agg WHERE id = 0 OR id = 49")
    val df = spark.table("dvcat.db.agg").agg(
      count(lit(1)).as("n"), min($"id").as("lo"), max($"id").as("hi"))
    // the file stats still say min=0/max=49 — the DELETED rows. Correct
    // answers prove the scan refused stats-only MIN/MAX while count(*)
    // stayed metadata-exact via the entry's live count.
    assert(df.as[(Long, Long, Long)].head() == ((48L, 1L, 48L)))
  }

  test("second delete merges vectors; emptying a file drops its entry") {
    create("mrg")
    insertOneFile("mrg", 0, 10)  // file A
    insertOneFile("mrg", 10, 20) // file B
    spark.sql("DELETE FROM dvcat.db.mrg WHERE id IN (1, 11)")
    val dv1 = entries("mrg").flatMap(_.dvName).toSet
    assert(dv1.size == 2)
    spark.sql("DELETE FROM dvcat.db.mrg WHERE id IN (2, 3)")
    val es = entries("mrg")
    // file A's vector was REPLACED by a merged one, file B's kept
    assert(es.flatMap(_.dvName).toSet.intersect(dv1).size == 1)
    assert(es.map(_.dvRows).sorted == Seq(1L, 3L))
    assert(spark.table("dvcat.db.mrg").count() == 16)
    // delete the whole remainder of file A (ids 0..9 minus 1,2,3)
    spark.sql("DELETE FROM dvcat.db.mrg WHERE id <= 9")
    val es2 = entries("mrg")
    assert(es2.size == 1 && es2.head.mins("id") == 10L,
      s"file A must drop entirely once every live row is deleted: $es2")
    assert(spark.table("dvcat.db.mrg").count() == 9)
  }

  test("time travel sees pre-delete rows; change feed across a MoR delete fails loudly") {
    create("tt")
    insertOneFile("tt", 0, 20) // v2
    spark.sql("DELETE FROM dvcat.db.tt WHERE id < 5") // v3: DV, file stays
    assert(spark.sql("SELECT count(*) FROM dvcat.db.tt VERSION AS OF 2")
      .as[Long].head() == 20L)
    assert(spark.table("dvcat.db.tt").count() == 15L)
    val feed = intercept[Exception] {
      spark.read.format("graft.sources.ManifestSink")
        .option("path", root("tt").toString)
        .option("changesFromVersion", "2").load().collect()
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Seq.empty else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(feed).exists(_.contains("merge-on-read")),
      s"expected a loud MoR-delete change-feed failure, got: ${messages(feed)}")
  }

  test("OPTIMIZE purges vectors: fresh files, fresh stats, live rows preserved") {
    create("opt")
    insertOneFile("opt", 0, 100)
    spark.sql("DELETE FROM dvcat.db.opt WHERE id < 10")
    assert(entries("opt").exists(_.dvRows == 10L))
    val res = ManifestSink.compact(root("opt").toString, targetRows = 1L)
    assert(res.rewrittenFiles == 1 && res.rewrittenRows == 90L)
    val es = entries("opt")
    assert(es.forall(_.dvName.isEmpty), "OPTIMIZE must drop deletion vectors")
    assert(es.map(_.rows).sum == 90L, "purged files hold live rows only")
    assert(es.forall(_.mins("id") >= 10L), "stats must be recomputed post-purge")
    assert(spark.table("dvcat.db.opt").count() == 90L)
    // the purge is dataChange=false: a change feed spanning ONLY the
    // optimize version is legal and empty
    val v = ManifestSink.currentVersion(root("opt"))
    val feed = spark.read.format("graft.sources.ManifestSink")
      .option("path", root("opt").toString)
      .option("changesFromVersion", (v - 1).toString).load()
    assert(feed.count() == 0L)
  }

  test("UPDATE (CoW rewrite) after a MoR delete sees live rows only and purges the DV") {
    create("up")
    insertOneFile("up", 0, 20)
    spark.sql("DELETE FROM dvcat.db.up WHERE id % 2 = 0")
    spark.sql("UPDATE dvcat.db.up SET v = v + 100 WHERE id < 10")
    val rows = spark.table("dvcat.db.up")
      .select($"id", $"v").as[(Long, Long)].collect().toSet
    val expect = (0L until 20L).filter(_ % 2 == 1)
      .map(i => (i, if (i < 10) i + 100 else i)).toSet
    assert(rows == expect, s"got $rows")
    // the single file was rewritten wholesale: deleted rows must not
    // resurrect, and the replacement carries no vector
    assert(entries("up").forall(_.dvName.isEmpty))
  }

  test("direct CoW delete on a DV'd file skips already-deleted positions") {
    create("cw")
    insertOneFile("cw", 0, 10)
    spark.sql("DELETE FROM dvcat.db.cw WHERE id = 4") // MoR, dv = {4}
    import org.apache.spark.sql.sources.GreaterThanOrEqual
    val res = ManifestSink.deleteWhere(root("cw").toString,
      Seq(GreaterThanOrEqual("id", 8L)))
    assert(res.deletedRows == 2L, s"already-DV'd row must not recount: $res")
    assert(spark.table("dvcat.db.cw").select($"id").as[Long].collect().sorted.toSeq ==
      Seq(0L, 1L, 2L, 3L, 5L, 6L, 7L))
    assert(entries("cw").forall(_.dvName.isEmpty), "CoW rewrite purges the DV")
  }

  test("vacuum keeps referenced DVs, sweeps orphaned ones") {
    create("gc")
    insertOneFile("gc", 0, 10)
    spark.sql("DELETE FROM dvcat.db.gc WHERE id = 1") // v3: dv A
    spark.sql("DELETE FROM dvcat.db.gc WHERE id = 2") // v4: merged dv B; A now orphaned
    val live = entries("gc").flatMap(_.dvName).toSet
    assert(live.size == 1)
    // retain only the latest version; grace 0 so age never protects
    val report = ManifestSink.vacuum(root("gc"), retain = 1, orphanGraceMs = 0L,
      dryRun = false)
    val sweptDvs = report.candidates.filter(_.kind == "dv").map(_.name).toSet
    assert(sweptDvs.nonEmpty && !sweptDvs.exists(live), s"swept: $sweptDvs, live: $live")
    assert(Files.exists(root("gc").resolve(live.head)))
    assert(spark.table("dvcat.db.gc").count() == 8L)
  }

  test("streaming from scratch reads the snapshot first — DVs applied, delete history tolerated") {
    create("st")
    insertOneFile("st", 0, 10)
    spark.sql("DELETE FROM dvcat.db.st WHERE id >= 8")
    val out = Files.createTempDirectory("graft-dv-stream")
    out.toFile.deleteOnExit()
    val q = spark.readStream.format("graft.sources.ManifestSink")
      .option("path", root("st").toString).load()
      .writeStream.format("parquet")
      .option("path", s"$out/data").option("checkpointLocation", s"$out/ckpt")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination(60000)
    assert(spark.read.parquet(s"$out/data").count() == 8L,
      "the first micro-batch reads the current snapshot — DVs included")
  }
}
