package graft.sources

import java.nio.file.{Files, Path}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{IvfPqOps, PqOps}

/** The ANN-ingest loop: embedding appends incrementally maintain the
  * IVFPQ codes table through the change feed with FROZEN codebooks
  * ([[AnnIndexMaintenance]]). Proofs: the maintained index equals a
  * from-scratch re-encode against the same codebooks (bit for bit — the
  * encode is a pure function, so incremental IS exact), refresh I/O is
  * proportional to the delta (consumed source files are DELETED before
  * the refresh), replays are no-ops, crash states roll forward
  * exactly-once, and a rewrite in the window fails loudly. */
class AnnMaintenanceSpec extends AnyFunSuite {
  import graft.TestSpark.spark
  import spark.implicits._

  private val wh: Path = {
    val p = Files.createTempDirectory("graft-annm")
    p.toFile.deleteOnExit()
    spark.conf.set("spark.sql.catalog.amcat", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.amcat.warehouse", p.toString)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS amcat.db")
    p
  }
  private def root(t: String): Path = wh.resolve("db").resolve(t)

  private val rnd = new scala.util.Random(23)
  private def mkVecs(ids: Range): DataFrame =
    ids.map(i => (i.toLong, List.fill(64)((rnd.nextFloat() - 0.5f) * 1.6f)))
      .toDF("vec_id", "embedding")

  private def codes(t: String): Set[(Long, Long, Seq[Long])] =
    spark.table(s"amcat.db.$t").as[(Long, Long, Seq[Long])].collect().toSet

  /** From-scratch re-encode of a vector frame against the index's own
    * frozen codebooks — the rebuild oracle. */
  private def reencode(vecs: DataFrame, idx: String): Set[(Long, Long, Seq[Long])] =
    IvfPqOps.freshEncode(vecs,
        spark.table(s"amcat.db.${idx}_coarse"), spark.table(s"amcat.db.${idx}_pqc"),
        PqOps.M, PqOps.SubDim)
      .as[(Long, Long, Seq[Long])].collect().toSet

  test("appends maintain the index; refresh reads ONLY the delta; equals a re-encode") {
    spark.sql("CREATE TABLE amcat.db.src (vec_id BIGINT, embedding ARRAY<FLOAT>)")
    val b1 = mkVecs(0 until 30)
    val b2 = mkVecs(30 until 50)
    b1.writeTo("amcat.db.src").append()
    AnnIndexMaintenance.createIndex(spark, "amcat", "db.src", "db.idx")
    assert(codes("idx") == reencode(b1, "idx"))

    b2.writeTo("amcat.db.src").append()
    // the full-corpus expectation, computed while batch-1 files still
    // exist; after the delete, only an INCREMENTAL refresh can reach it
    val expected = reencode(b1.unionAll(b2), "idx")
    // delete the files createIndex consumed (everything committed at
    // version 1 — batch 1): an incremental refresh never re-opens them,
    // while any full re-read of the source would die here
    ManifestSink.committedEntries(root("src"), Some(1L)).map(_.name)
      .foreach(n => Files.delete(root("src").resolve(n)))
    AnnIndexMaintenance.refresh(spark, "amcat", "db.src", "db.idx")
    assert(codes("idx") == expected,
      "maintained index must equal the from-scratch re-encode")
    // every vector once, M codes each, codes in range
    val all = codes("idx")
    assert(all.size == 50 && all.map(_._1).size == 50)
    assert(all.forall(c => c._3.length == PqOps.M &&
      c._3.forall(x => x >= 0 && x < PqOps.Ksub)))

    // replay: nothing new, nothing committed
    val v = ManifestSink.currentVersion(root("idx"))
    AnnIndexMaintenance.refresh(spark, "amcat", "db.src", "db.idx")
    assert(ManifestSink.currentVersion(root("idx")) == v)
  }

  test("crash states roll forward exactly-once (no duplicate codes)") {
    spark.sql("CREATE TABLE amcat.db.src2 (vec_id BIGINT, embedding ARRAY<FLOAT>)")
    val b1 = mkVecs(0 until 20)
    b1.writeTo("amcat.db.src2").append()
    AnnIndexMaintenance.createIndex(spark, "amcat", "db.src2", "db.idx2")
    val b2 = mkVecs(20 until 28)
    b2.writeTo("amcat.db.src2").append()
    val from = AnnIndexMaintenance.lastSourceVersion(spark, "amcat", "db.idx2")
    val to = ManifestSink.currentVersion(root("src2"))
    val expected = reencode(b1.unionAll(b2), "idx2")
    // crash after stage: marker durable, nothing applied — refresh recovers
    PendingWindow.stage(root("idx2"), "ann.pending", from, to)
    AnnIndexMaintenance.refresh(spark, "amcat", "db.src2", "db.idx2")
    assert(codes("idx2") == expected)
    // crash after the APPEND (before finalize): must not re-append
    val b3 = mkVecs(28 until 33)
    b3.writeTo("amcat.db.src2").append()
    val to3 = ManifestSink.currentVersion(root("src2"))
    PendingWindow.stage(root("idx2"), "ann.pending", to, to3)
    AnnIndexMaintenance.applyWindow(spark, "amcat", root("src2"), "db.idx2", to, to3)
    AnnIndexMaintenance.refresh(spark, "amcat", "db.src2", "db.idx2")
    assert(codes("idx2") == reencode(b1.unionAll(b2).unionAll(b3), "idx2"),
      "recovery re-appended an already-applied window (duplicate codes)")
  }

  test("CDC refresh: MoR deletes retire index rows with ZERO index reads") {
    spark.sql("CREATE TABLE amcat.db.src4 (vec_id BIGINT, embedding ARRAY<FLOAT>) " +
      "TBLPROPERTIES ('delete.mode' = 'merge-on-read')")
    val b1 = mkVecs(0 until 30)
    b1.writeTo("amcat.db.src4").append()
    AnnIndexMaintenance.createIndex(spark, "amcat", "db.src4", "db.idx4")
    // window: MoR-delete five vectors (no inserts)
    spark.sql("DELETE FROM amcat.db.src4 WHERE vec_id % 6 = 0")
    // move EVERY index data file away during the refresh: the delete
    // half must be pure metadata — any read of the codes would crash
    val idxRoot = root("idx4")
    val dataFiles = ManifestSink.committedEntries(idxRoot, None).map(_.name)
    val hidden = Files.createTempDirectory("annm-hide")
    dataFiles.foreach(n => Files.move(idxRoot.resolve(n), hidden.resolve(n)))
    try AnnIndexMaintenance.refreshCdc(spark, "amcat", "db.src4", "db.idx4")
    finally dataFiles.foreach(n => Files.move(hidden.resolve(n), idxRoot.resolve(n)))
    // the index now answers WITHOUT the deleted vectors, matching a
    // re-encode of the live rows only
    val live = b1.filter(col("vec_id") % 6 =!= 0)
    assert(codes("idx4") == reencode(live, "idx4"))
    assert(ManifestSink.readHeader(idxRoot).eqDels.nonEmpty,
      "the delete must land as an equality-delete record, not a rewrite")
    // a mixed window (inserts + other deletes) applies both halves;
    // vec 30 arrives AFTER the %6 delete, so it stays live
    val b2 = mkVecs(30 until 36)
    b2.writeTo("amcat.db.src4").append()
    spark.sql("DELETE FROM amcat.db.src4 WHERE vec_id = 1")
    AnnIndexMaintenance.refreshCdc(spark, "amcat", "db.src4", "db.idx4")
    val live2 = b1.filter(col("vec_id") % 6 =!= 0 && col("vec_id") =!= 1)
      .unionAll(b2)
    assert(codes("idx4") == reencode(live2, "idx4"))
  }

  test("a key inserted AND deleted in one CDC window is refused loudly") {
    spark.sql("CREATE TABLE amcat.db.src5 (vec_id BIGINT, embedding ARRAY<FLOAT>) " +
      "TBLPROPERTIES ('delete.mode' = 'merge-on-read')")
    mkVecs(0 until 8).writeTo("amcat.db.src5").append()
    AnnIndexMaintenance.createIndex(spark, "amcat", "db.src5", "db.idx5")
    mkVecs(8 until 12).writeTo("amcat.db.src5").append()
    spark.sql("DELETE FROM amcat.db.src5 WHERE vec_id = 9")
    val e = intercept[Exception] {
      AnnIndexMaintenance.refreshCdc(spark, "amcat", "db.src5", "db.idx5")
    }
    assert(Option(e.getMessage).exists(_.contains("intra-window ordering")),
      e.getMessage)
  }

  test("a row-level delete in the window fails the refresh loudly") {
    spark.sql("CREATE TABLE amcat.db.src3 (vec_id BIGINT, embedding ARRAY<FLOAT>)")
    mkVecs(0 until 10).writeTo("amcat.db.src3").append()
    AnnIndexMaintenance.createIndex(spark, "amcat", "db.src3", "db.idx3")
    ManifestSink.deleteWhereEq(root("src3").toString, "vec_id", Seq("3"))
    val e = intercept[Exception] {
      AnnIndexMaintenance.refresh(spark, "amcat", "db.src3", "db.idx3")
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Seq.empty else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(m => m.contains("EQUALITY DELETE") || m.contains("append-only")),
      msgs(e).mkString("|"))
  }
}
