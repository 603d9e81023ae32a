package graft.sources

import java.nio.file.{Files, Path}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.DedupOps

/** The MinHash/LSH index ingest loop ([[MinHashIndexMaintenance]]):
  * appends maintain the digest + band tables through the change feed
  * with delta-only I/O, merge-on-read deletes retire rows from BOTH
  * tables with zero base-file reads, crash states roll forward
  * exactly-once via the scrub-then-reapply recovery, and the probe's
  * band keys reach the manifest scan as a runtime filter that prunes
  * whole index files (proved physically, the SetSimAtRestSpec bar). */
class MinHashMaintenanceSpec extends AnyFunSuite {
  import graft.TestSpark.spark
  import spark.implicits._

  private val wh: Path = {
    val p = Files.createTempDirectory("graft-mhm")
    p.toFile.deleteOnExit()
    spark.conf.set("spark.sql.catalog.mhcat", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.mhcat.warehouse", p.toString)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS mhcat.db")
    p
  }
  private def root(t: String): Path = wh.resolve("db").resolve(t)

  private def words(p: String, n: Int) =
    (1 to n).map(i => f"$p$i%02d").mkString(" ")

  private def probeRows(batch: DataFrame, docs: DataFrame, dig: String,
      band: String): Set[(Long, String, Long)] =
    DedupOps.mhProbe(spark, batch, docs, s"mhcat.db.$dig", s"mhcat.db.$band")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet

  /** From-scratch ground truth: a fresh index built on ONE snapshot of
    * `corpus`, probed identically — the maintained index must be
    * verdict-equal to it after any append/delete history. */
  private def fromScratch(tag: String, batch: DataFrame,
      corpus: DataFrame): Set[(Long, String, Long)] = {
    spark.sql(s"CREATE TABLE mhcat.db.ref_src_$tag (doc_id BIGINT, text STRING)")
    corpus.writeTo(s"mhcat.db.ref_src_$tag").append()
    MinHashIndexMaintenance.createIndex(spark, "mhcat", s"db.ref_src_$tag",
      s"db.ref_dig_$tag", s"db.ref_band_$tag")
    probeRows(batch, corpus, s"ref_dig_$tag", s"ref_band_$tag")
  }

  test("appends maintain the index; refresh reads ONLY the delta; probe equals from-scratch") {
    spark.sql("CREATE TABLE mhcat.db.src (doc_id BIGINT, text STRING)")
    val b1 = Seq(1L -> words("c", 20), 2L -> words("d", 20), 3L -> words("e", 12))
      .toDF("doc_id", "text")
    // arrival 2 near-dups arrival 1's doc 1 AND brings a fresh universe
    val b2 = Seq(4L -> (words("c", 19) + " cz99"), 5L -> words("f", 15))
      .toDF("doc_id", "text")
    b1.writeTo("mhcat.db.src").append()
    MinHashIndexMaintenance.createIndex(spark, "mhcat", "db.src", "db.dig", "db.band")
    b2.writeTo("mhcat.db.src").append()
    // delete the files createIndex consumed (batch 1, committed at v1):
    // an incremental refresh never re-opens them, a full re-read dies here
    ManifestSink.committedEntries(root("src"), Some(1L)).map(_.name)
      .foreach(n => Files.delete(root("src").resolve(n)))
    MinHashIndexMaintenance.refreshCdc(spark, "mhcat", "db.src", "db.dig", "db.band")
    // probe: exact clone of doc 5 (refresh-time row) + near-dup of doc 1
    // (create-time row, also hits its arrival-2 twin doc 4) —
    // verification docs come from the intact frames, not the gutted src
    val pb = Seq(10L -> (words("c", 19) + " cq88"), 11L -> words("f", 15))
      .toDF("doc_id", "text")
    val corpus = b1.unionAll(b2)
    val got = probeRows(pb, corpus, "dig", "band")
    assert(got == fromScratch("t1", pb, corpus),
      s"maintained probe diverged from the from-scratch index: $got")
    assert(got == Set((10L, "near", 1L), (11L, "exact", 5L)),
      "the probe must hit the create-time near-dup and the refresh-time exact clone")
    // replay: nothing new, nothing committed
    val v = ManifestSink.currentVersion(root("band"))
    MinHashIndexMaintenance.refreshCdc(spark, "mhcat", "db.src", "db.dig", "db.band")
    assert(ManifestSink.currentVersion(root("band")) == v)
  }

  test("crash states roll forward exactly-once (scrub recovery, no duplicate rows)") {
    spark.sql("CREATE TABLE mhcat.db.src2 (doc_id BIGINT, text STRING)")
    val b1 = Seq(1L -> words("g", 20), 2L -> words("h", 12)).toDF("doc_id", "text")
    b1.writeTo("mhcat.db.src2").append()
    MinHashIndexMaintenance.createIndex(spark, "mhcat", "db.src2", "db.dig2", "db.band2")
    val b2 = Seq(3L -> words("k", 15)).toDF("doc_id", "text")
    b2.writeTo("mhcat.db.src2").append()
    val from = MinHashIndexMaintenance.lastSourceVersion(spark, "mhcat", "db.band2")
    val to = ManifestSink.currentVersion(root("src2"))
    // crash after stage: marker durable, nothing applied — refresh recovers
    PendingWindow.stage(root("band2"), "mh.pending-cdc", from, to)
    MinHashIndexMaintenance.refreshCdc(spark, "mhcat", "db.src2", "db.dig2", "db.band2")
    // crash after the full APPLY (before finalize): recovery must scrub
    // the landed rows before re-applying — no duplicates may survive
    val b3 = Seq(4L -> words("m", 15)).toDF("doc_id", "text")
    b3.writeTo("mhcat.db.src2").append()
    val to3 = ManifestSink.currentVersion(root("src2"))
    PendingWindow.stage(root("band2"), "mh.pending-cdc", to, to3)
    MinHashIndexMaintenance.applyWindowCdc(spark, "mhcat", root("src2"),
      "db.dig2", "db.band2", to, to3)
    MinHashIndexMaintenance.refreshCdc(spark, "mhcat", "db.src2", "db.dig2", "db.band2")
    val dupBands = spark.table("mhcat.db.band2")
      .groupBy("band", "doc_id").agg(count(lit(1)).as("n"))
      .filter(col("n") > 1).count()
    val dupDigs = spark.table("mhcat.db.dig2")
      .groupBy("h", "doc_id").agg(count(lit(1)).as("n"))
      .filter(col("n") > 1).count()
    assert(dupBands == 0 && dupDigs == 0,
      s"recovery re-appended an applied window: $dupBands band / $dupDigs digest dup rows")
    assert(spark.table("mhcat.db.band2").filter(col("doc_id") === 4L).count() > 0)
    assert(spark.table("mhcat.db.dig2").filter(col("doc_id") === 4L).count() === 1)
    // and the recovered index equals from-scratch content on every doc
    val corpus = b1.unionAll(b2).unionAll(b3)
    val pb = Seq(10L -> words("k", 15)).toDF("doc_id", "text")
    assert(probeRows(pb, corpus, "dig2", "band2") ==
      fromScratch("t2", pb, corpus))
  }

  test("CDC refresh: MoR deletes retire BOTH arms with ZERO index reads") {
    spark.sql("CREATE TABLE mhcat.db.src3 (doc_id BIGINT, text STRING) " +
      "TBLPROPERTIES ('delete.mode' = 'merge-on-read')")
    val b1 = Seq(
      1L -> words("p", 20),
      2L -> words("p", 20), // exact clone of doc 1
      3L -> (words("p", 19) + " pz99"), // near-dup of docs 1/2
      4L -> words("q", 12)
    ).toDF("doc_id", "text")
    b1.writeTo("mhcat.db.src3").append()
    MinHashIndexMaintenance.createIndex(spark, "mhcat", "db.src3", "db.dig3", "db.band3")
    val pb = Seq(10L -> words("p", 20)).toDF("doc_id", "text")
    assert(probeRows(pb, b1, "dig3", "band3") == Set((10L, "exact", 1L)))
    // window: MoR-delete doc 1 (no inserts) — the EXACT arm's minimum
    spark.sql("DELETE FROM mhcat.db.src3 WHERE doc_id = 1")
    // hide EVERY index data file (both tables) during the refresh: the
    // delete half must be pure metadata — any read would crash
    val hidden = Files.createTempDirectory("mhm-hide")
    val moved = Seq("dig3", "band3").flatMap { t =>
      ManifestSink.committedEntries(root(t), None).map(_.name).map { n =>
        Files.move(root(t).resolve(n), hidden.resolve(s"$t-$n")); (t, n)
      }
    }
    try MinHashIndexMaintenance.refreshCdc(spark, "mhcat", "db.src3", "db.dig3", "db.band3")
    finally moved.foreach { case (t, n) =>
      Files.move(hidden.resolve(s"$t-$n"), root(t).resolve(n)) }
    // exact match moved to the surviving clone — WITHOUT any rebuild
    val surviving = b1.filter(col("doc_id") =!= 1L)
    assert(probeRows(pb, surviving, "dig3", "band3") == Set((10L, "exact", 2L)))
    // delete the remaining clone too: the verdict degrades exact → near
    // (band arm survives through doc 3), proving BOTH arms retire rows
    spark.sql("DELETE FROM mhcat.db.src3 WHERE doc_id = 2")
    MinHashIndexMaintenance.refreshCdc(spark, "mhcat", "db.src3", "db.dig3", "db.band3")
    val surv2 = b1.filter(col("doc_id") > 2L)
    val got = probeRows(pb, surv2, "dig3", "band3")
    assert(got == Set((10L, "near", 3L)),
      s"digest AND band rows of deleted docs must stop matching: $got")
    assert(got == fromScratch("t3", pb, surv2))
  }

  test("probe runtime filter prunes band files — physical no-read proof") {
    spark.sql("CREATE TABLE mhcat.db.src4 (doc_id BIGINT, text STRING)")
    // two doc universes in two COMMITS → disjoint band-key files: the
    // 'aa' corpus at create, a 'zz' universe appended by refresh
    val aCorpus = Seq(
      1L -> words("aa", 20),
      2L -> (words("aa", 19) + " aaxx"), // near-dup of doc 1
      3L -> words("ab", 12)
    ).toDF("doc_id", "text")
    aCorpus.writeTo("mhcat.db.src4").append()
    MinHashIndexMaintenance.createIndex(spark, "mhcat", "db.src4", "db.dig4", "db.band4")
    val vCreate = ManifestSink.currentVersion(root("band4"))
    val zBatch = Seq(100L -> words("zz", 20), 101L -> words("zy", 16))
      .toDF("doc_id", "text")
    zBatch.writeTo("mhcat.db.src4").append()
    MinHashIndexMaintenance.refreshCdc(spark, "mhcat", "db.src4", "db.dig4", "db.band4")
    // delete every band/digest file the REFRESH landed (they hold only
    // z-universe keys): a probe whose runtime pruning failed would open
    // them and throw FileNotFound. Band keys are hash strings, so the
    // per-file BLOOM (not a lexical range) is what must prune here.
    Seq("band4", "dig4").foreach { t =>
      ManifestSink.committedEntries(root(t), None)
        .filter(_.seq > vCreate).map(_.name)
        .foreach(n => Files.delete(root(t).resolve(n)))
    }
    val pb = Seq(10L -> (words("aa", 19) + " aazz")).toDF("doc_id", "text")
    val got = probeRows(pb, aCorpus.unionAll(zBatch), "dig4", "band4")
    assert(got == Set((10L, "near", 1L)),
      s"the pruned probe must still find the aa-universe near-dup: $got")
  }
}
