package graft.sources

import java.nio.file.{Files, Path}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.DedupOps

/** The set-sim-index ingest loop ([[SsimIndexMaintenance]]): appends
  * maintain the prefix index through the change feed under the FROZEN
  * df order, merge-on-read deletes retire prefix rows with zero prefix
  * reads, crash states roll forward exactly-once, and
  * `CALL graft.system.ssim_reindex` repairs df drift — probe results
  * invariant, pruning power restored (proved physically). */
class SsimMaintenanceSpec extends AnyFunSuite {
  import graft.TestSpark.spark
  import spark.implicits._

  private val wh: Path = {
    val p = Files.createTempDirectory("graft-ssimm")
    p.toFile.deleteOnExit()
    spark.conf.set("spark.sql.catalog.smcat", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.smcat.warehouse", p.toString)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS smcat.db")
    p
  }
  private def root(t: String): Path = wh.resolve("db").resolve(t)

  private def words(p: String, n: Int) =
    (1 to n).map(i => f"$p$i%02d").mkString(" ")

  /** Row-keyed brute-force ground truth: every (batch, corpus) pair
    * sharing >= 1 five-shingle at exact Jaccard >= t — NO
    * canonicalization, the maintained index's contract. */
  private def crossPairs(batch: DataFrame, corpus: DataFrame,
      t: Long = DedupOps.SetSimTBp): Set[(Long, Long)] = {
    val btk = SsimIndexMaintenance.docTokens(batch)
    val ctk = SsimIndexMaintenance.docTokens(corpus)
    val bsz = btk.groupBy("doc_id").agg(count(lit(1)).as("m"))
    val csz = ctk.groupBy("doc_id").agg(count(lit(1)).as("m"))
    btk.as("a").join(ctk.as("b"), col("a.token") === col("b.token"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("inter"))
      .join(bsz.select(col("doc_id").as("doc_a"), col("m").as("ma")), "doc_a")
      .join(csz.select(col("doc_id").as("doc_b"), col("m").as("mb")), "doc_b")
      .filter(col("inter") * 10000 >= (col("ma") + col("mb") - col("inter")) * t)
      .select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
  }

  private def probe(batch: DataFrame, docs: DataFrame, df: String,
      pre: String): Set[(Long, Long)] =
    DedupOps.ssimProbeTk(spark,
        SsimIndexMaintenance.docTokens(batch).localCheckpoint(), docs,
        s"smcat.db.$df", s"smcat.db.$pre")
      .select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  test("appends maintain the index; refresh reads ONLY the delta; probe equals brute force") {
    spark.sql("CREATE TABLE smcat.db.src (doc_id BIGINT, text STRING)")
    val b1 = Seq(1L -> words("c", 20), 2L -> words("d", 20), 3L -> words("e", 12))
      .toDF("doc_id", "text")
    // arrival 2 near-dups arrival 1's doc 1 AND brings a fresh universe
    val b2 = Seq(4L -> (words("c", 19) + " cz99"), 5L -> words("f", 15))
      .toDF("doc_id", "text")
    b1.writeTo("smcat.db.src").append()
    SsimIndexMaintenance.createIndex(spark, "smcat", "db.src", "db.sdf", "db.spre")
    b2.writeTo("smcat.db.src").append()
    // delete the files createIndex consumed (batch 1, committed at v1):
    // an incremental refresh never re-opens them, a full re-read dies here
    ManifestSink.committedEntries(root("src"), Some(1L)).map(_.name)
      .foreach(n => Files.delete(root("src").resolve(n)))
    SsimIndexMaintenance.refresh(spark, "smcat", "db.src", "db.sdf", "db.spre")
    // probe: near-dup of doc 1 (also hits its arrival-2 twin doc 4) —
    // verification docs come from the intact frames, not the gutted src
    val pb = Seq(10L -> (words("c", 19) + " cq88")).toDF("doc_id", "text")
    val corpus = b1.unionAll(b2)
    val got = probe(pb, corpus, "sdf", "spre")
    assert(got == crossPairs(pb, corpus),
      s"maintained probe diverged from row-keyed brute force: $got")
    assert(got == Set((10L, 1L), (10L, 4L)),
      "the probe must hit BOTH the frozen-order build doc and the refreshed append doc")
    // replay: nothing new, nothing committed
    val v = ManifestSink.currentVersion(root("spre"))
    SsimIndexMaintenance.refresh(spark, "smcat", "db.src", "db.sdf", "db.spre")
    assert(ManifestSink.currentVersion(root("spre")) == v)
  }

  test("crash states roll forward exactly-once (no duplicate prefix rows)") {
    spark.sql("CREATE TABLE smcat.db.src2 (doc_id BIGINT, text STRING)")
    val b1 = Seq(1L -> words("g", 20), 2L -> words("h", 12)).toDF("doc_id", "text")
    b1.writeTo("smcat.db.src2").append()
    SsimIndexMaintenance.createIndex(spark, "smcat", "db.src2", "db.sdf2", "db.spre2")
    val b2 = Seq(3L -> words("k", 15)).toDF("doc_id", "text")
    b2.writeTo("smcat.db.src2").append()
    val from = SsimIndexMaintenance.lastSourceVersion(spark, "smcat", "db.spre2")
    val to = ManifestSink.currentVersion(root("src2"))
    // crash after stage: marker durable, nothing applied — refresh recovers
    PendingWindow.stage(root("spre2"), "ssim.pending", from, to)
    SsimIndexMaintenance.refresh(spark, "smcat", "db.src2", "db.sdf2", "db.spre2")
    val rows = spark.table("smcat.db.spre2").count()
    // crash after the APPEND (before finalize): must not re-append
    val b3 = Seq(4L -> words("m", 15)).toDF("doc_id", "text")
    b3.writeTo("smcat.db.src2").append()
    val to3 = ManifestSink.currentVersion(root("src2"))
    PendingWindow.stage(root("spre2"), "ssim.pending", to, to3)
    SsimIndexMaintenance.applyWindow(spark, "smcat", root("src2"),
      "db.sdf2", "db.spre2", to, to3)
    SsimIndexMaintenance.refresh(spark, "smcat", "db.src2", "db.sdf2", "db.spre2")
    val perDoc = spark.table("smcat.db.spre2")
      .groupBy("doc_id", "token").agg(count(lit(1)).as("n"))
      .filter(col("n") > 1).count()
    assert(perDoc == 0, "recovery re-appended an applied window (duplicate prefix rows)")
    assert(spark.table("smcat.db.spre2").filter(col("doc_id") === 4L).count() > 0)
    assert(spark.table("smcat.db.spre2").count() > rows)
  }

  test("CDC refresh: MoR deletes retire prefix rows with ZERO prefix reads") {
    spark.sql("CREATE TABLE smcat.db.src3 (doc_id BIGINT, text STRING) " +
      "TBLPROPERTIES ('delete.mode' = 'merge-on-read')")
    val b1 = Seq(
      1L -> words("p", 20),
      2L -> (words("p", 19) + " pz99"), // near-dup of doc 1
      3L -> words("q", 12)
    ).toDF("doc_id", "text")
    b1.writeTo("smcat.db.src3").append()
    SsimIndexMaintenance.createIndex(spark, "smcat", "db.src3", "db.sdf3", "db.spre3")
    val pb = Seq(10L -> (words("p", 19) + " pq88")).toDF("doc_id", "text")
    assert(probe(pb, b1, "sdf3", "spre3") == Set((10L, 1L), (10L, 2L)))
    // window: MoR-delete doc 2 (no inserts)
    spark.sql("DELETE FROM smcat.db.src3 WHERE doc_id = 2")
    // hide EVERY prefix data file during the refresh: the delete half
    // must be pure metadata — any read of the prefixes would crash
    val preRoot = root("spre3")
    val dataFiles = ManifestSink.committedEntries(preRoot, None).map(_.name)
    val hidden = Files.createTempDirectory("ssimm-hide")
    dataFiles.foreach(n => Files.move(preRoot.resolve(n), hidden.resolve(n)))
    try SsimIndexMaintenance.refreshCdc(spark, "smcat", "db.src3", "db.sdf3", "db.spre3")
    finally dataFiles.foreach(n => Files.move(hidden.resolve(n), preRoot.resolve(n)))
    // the deleted doc no longer surfaces — WITHOUT any rebuild
    val surviving = b1.filter(col("doc_id") =!= 2L)
    val got = probe(pb, surviving, "sdf3", "spre3")
    assert(got == Set((10L, 1L)),
      s"the CDC-deleted doc must stop appearing in probe results: $got")
    assert(got == crossPairs(pb, surviving))
  }

  test("CALL graft.system.ssim_reindex: probe invariant, drift repaired, pruning restored") {
    spark.sql("CREATE TABLE smcat.db.src5 (doc_id BIGINT, text STRING)")
    // arrival 1 freezes an 'aa'-universe order; arrival 2 DRIFTS — a
    // whole new 'zz' universe the frozen df has never seen (every
    // appended prefix ranks its tokens df=0)
    val b1 = (1L to 20L).map(i => i -> (words("aa", 18) + s" ax$i ay$i"))
      .toDF("doc_id", "text")
    val b2 = (31L to 50L).map(i => i -> (words("zz", 18) + s" zx$i zy$i"))
      .toDF("doc_id", "text")
    b1.writeTo("smcat.db.src5").append()
    SsimIndexMaintenance.createIndex(spark, "smcat", "db.src5", "db.sdf5", "db.spre5")
    b2.writeTo("smcat.db.src5").append()
    SsimIndexMaintenance.refresh(spark, "smcat", "db.src5", "db.sdf5", "db.spre5")
    val corpus = b1.unionAll(b2)
    // probes in BOTH universes: every corpus doc near-dups its
    // neighbors (18 of 20 words shared)
    // one appended word, not two: 14 shared shingles over sizes (15, 16)
    // is J = 14/17 ≈ 0.82 ≥ 0.8; a second extra word would dilute every
    // pair to 14/18 ≈ 0.78 and empty the expectation
    val pb = Seq(100L -> (words("aa", 18) + " aq1"),
      101L -> (words("zz", 18) + " zq1")).toDF("doc_id", "text")
    val before = probe(pb, corpus, "sdf5", "spre5")
    assert(before == crossPairs(pb, corpus), "pre-reindex probe must be exact")
    assert(before.exists(_._2 >= 31L), "z-universe pairs must exist pre-reindex")
    // drift is real: the frozen df knows nothing of the z universe
    assert(spark.table("smcat.db.sdf5")
      .filter(col("token").startsWith("zz")).count() == 0)
    // drifted maintenance left >= 2 live prefix files (create + append
    // commits) — the probe's file-READ upper bound
    val liveBefore = ManifestSink.committedEntries(root("spre5"), None).size
    assert(liveBefore >= 2, s"fixture must have per-commit prefix files: $liveBefore")
    val preRows = spark.table("smcat.db.spre5").count()
    val res = spark.sql("CALL smcat.system.ssim_reindex(" +
      "source => 'db.src5', df_table => 'db.sdf5', prefix_table => 'db.spre5')")
      .collect().head
    // pruning power restored: the rebuild CONSOLIDATES the per-append
    // files (every probe's file-read bound drops with them) and
    // re-clusters rows under one token sort — asserted strictly, and
    // cross-checked against the live manifest
    assert(res.getInt(2) < res.getInt(1),
      s"reindex must consolidate prefix files: $res")
    assert(ManifestSink.committedEntries(root("spre5"), None).size < liveBefore)
    // df now reflects the CURRENT corpus — drift repaired
    assert(spark.table("smcat.db.sdf5")
      .filter(col("token").startsWith("zz")).count() > 0)
    // the contract: probe RESULTS are invariant under reindex
    assert(probe(pb, corpus, "sdf5", "spre5") == before,
      "reindex changed probe results — the order must steer pruning only")
    // and the prior index stays readable: time travel to the version
    // just before the reindex marker sees the OLD row set (the cutover
    // is versioned, not destructive) — marker/overwrite/finalize are
    // the last three prefix-table commits
    val vMarker = ManifestSink.currentVersion(root("spre5")) - 2
    assert(spark.read.format("graft.sources.ManifestSink")
      .option("path", root("spre5").toString)
      .option("versionAsOf", (vMarker - 1).toString)
      .load().count() == preRows,
      "time travel must keep the pre-reindex index readable")
  }
}
