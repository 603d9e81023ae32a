package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.sources.ClusterIndexMaintenance

/** STREAMING incremental dedup clusters: q213's maintained cluster index
  * driven from a document stream — the streaming form of q210's fold,
  * but against DURABLE standing state (manifest labels/edges/bands
  * tables) instead of a session memo. Each micro-batch runs one
  * `foreachBatch` apply:
  *
  *   1. land the batch's docs in the manifest SOURCE table (the
  *      standing corpus) with a content-idempotent anti-join append;
  *   2. `ClusterIndexMaintenance.refreshCdc` folds the arrival into the
  *      standing index — batch×batch + batch×standing candidates, edge
  *      verification, touched-components-only label recompute,
  *      exactly-once via the PendingWindow pivot on the labels table.
  *
  * EXACTLY-ONCE across crash replays WITHOUT an atomic marker of its
  * own (the LineSurgeryStream contract): step 1 is content-idempotent
  * (doc ids are unique for the stream's life — the maintainers' shared
  * contract — and an append is one atomic commit, so a replay sees all
  * of the batch or none of it); step 2 is the maintainer's pivot (a
  * replayed refresh of a consumed window is a version-check no-op, a
  * crash mid-apply rolls forward with the scrub-then-reapply rule).
  * ClusterStreamSpec drives every crash prefix and asserts the standing
  * labels CONVERGE to a from-scratch clustering after each batch.
  *
  * Scale shape: per batch, the source anti-join is a doc_id-pruned scan
  * (at warehouse scale a batch-id high-water mark makes it a metadata
  * check); the refresh reads the window's files plus touched-component
  * rows only — the q213 posture, unchanged by the streaming driver. */
object ClusterStream {

  /** The foreachBatch body, factored so the spec can drive partial
    * (crashed) applies deterministically. Idempotent: re-running with
    * the same batch from ANY prefix state converges to one application. */
  def applyBatch(s: SparkSession, batch: DataFrame, catalog: String,
      srcIdent: String, labIdent: String, edgeIdent: String,
      bandIdent: String): Unit = {
    val src = s"$catalog.$srcIdent"
    val docs = batch.select(col("doc_id"), col("text")).localCheckpoint()
    val fresh = docs.join(s.table(src).select("doc_id"), Seq("doc_id"), "left_anti")
    if (!fresh.isEmpty) fresh.writeTo(src).append()
    ClusterIndexMaintenance.refreshCdc(s, catalog, srcIdent,
      labIdent, edgeIdent, bandIdent)
  }

  /** Wire a streaming (doc_id, text) frame into the cluster fold. The
    * index must exist (ClusterIndexMaintenance.createIndex on whatever
    * the source table held at bootstrap — an empty source is fine). */
  def start(s: SparkSession, docs: DataFrame, catalog: String,
      srcIdent: String, labIdent: String, edgeIdent: String,
      bandIdent: String, checkpointDir: String): StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        applyBatch(batch.sparkSession, batch, catalog, srcIdent,
          labIdent, edgeIdent, bandIdent)
      }
      .start()
}
