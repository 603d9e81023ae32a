package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.operators.DedupOps
import graft.sources.LineTableMaintenance

/** STREAMING corpus surgery: q207's maintained line table driven from a
  * document stream. Each micro-batch runs one `foreachBatch` apply:
  *
  *   1. land the batch's docs in the manifest SOURCE table (the
  *      standing corpus);
  *   2. `LineTableMaintenance.refreshCdc` folds the arrival into the
  *      standing line table — refcounted MERGE through the change
  *      feed, exactly-once via the PendingWindow pivot;
  *   3. clean the batch's docs IN-STREAM against the line table as of
  *      after its own fold (batch-frequent lines clean immediately,
  *      q202's membership semantics) and land the per-doc surgery
  *      report in the output table.
  *
  * EXACTLY-ONCE across crash replays WITHOUT an atomic marker: every
  * write is content-idempotent. Steps 1 and 3 anti-join the batch's
  * doc_ids against their target before appending (doc ids are unique
  * for the stream's life — the maintainers' shared contract — and an
  * append is one atomic commit, so a replay sees either all of the
  * batch or none of it); step 2 is the maintainer's own pivot (a
  * replayed refresh of a consumed window is a version-check no-op, a
  * crash mid-merge rolls forward at the pinned window). Any crash
  * point therefore replays to the identical state —
  * LineSurgeryStreamSpec drives every prefix of the apply and re-runs.
  *
  * Scale shape: per batch, the source-id anti-join is a doc_id-pruned
  * scan (at warehouse scale: a batch-id high-water mark makes it a
  * metadata check, falling back to the anti-join on crash recovery);
  * the refresh reads only the window's files; cleaning joins the batch
  * against the standing line table by line key (the q206/q207 plan). */
object LineSurgeryStream {

  /** The foreachBatch body, factored so the spec can drive partial
    * (crashed) applies deterministically. Idempotent: re-running with
    * the same batch from ANY prefix state converges to one application. */
  def applyBatch(s: SparkSession, batch: DataFrame, catalog: String,
      srcIdent: String, linesIdent: String, outIdent: String): Unit = {
    val src = s"$catalog.$srcIdent"
    val out = s"$catalog.$outIdent"
    val docs = batch.select(col("doc_id"), col("text")).localCheckpoint()
    // 1. content-idempotent source append
    val fresh = docs.join(s.table(src).select("doc_id"), Seq("doc_id"), "left_anti")
    if (!fresh.isEmpty) fresh.writeTo(src).append()
    // 2. fold into the standing line table (pivot-protected)
    LineTableMaintenance.refreshCdc(s, catalog, srcIdent, linesIdent)
    // 3. clean in-stream against the post-fold table; idempotent land.
    // The batch is already FOLDED IN, so its own lines all sit in the
    // table at df >= 1 — the drop rule is q202's refcount rule
    // (df >= LineDupMinDocs), not q206/q207's presence rule (those
    // clean a batch DISJOINT from the table).
    val cleaned = DedupOps.cleanAgainstLines(docs,
      s.table(s"$catalog.$linesIdent")
        .filter(col("df") >= DedupOps.LineDupMinDocs).select("line"))
    val freshOut = cleaned.join(s.table(out).select("doc_id"), Seq("doc_id"), "left_anti")
    if (!freshOut.isEmpty) freshOut.writeTo(out).append()
  }

  /** Wire a streaming (doc_id, text) frame into the surgery loop. The
    * line table must exist (LineTableMaintenance.create on whatever the
    * source table held at bootstrap — an empty source is fine). */
  def start(s: SparkSession, docs: DataFrame, catalog: String,
      srcIdent: String, linesIdent: String, outIdent: String,
      checkpointDir: String): StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        applyBatch(batch.sparkSession, batch, catalog, srcIdent,
          linesIdent, outIdent)
      }
      .start()
}
