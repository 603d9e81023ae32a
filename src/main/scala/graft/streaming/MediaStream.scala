package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.sources.PhashIndexMaintenance

/** STREAMING media index: q215's maintained perceptual-hash index
  * driven from a media stream — new media lands as it arrives and the
  * hash/band tables fold forward per micro-batch, the production
  * media-ingest loop. Each `foreachBatch` apply:
  *
  *   1. land the batch's (doc_id, px) rows in the manifest media SOURCE
  *      table with a content-idempotent anti-join append;
  *   2. `PhashIndexMaintenance.refreshCdc` folds the change window into
  *      the standing index — pure insertion (no corpus statistic: a
  *      doc's hash depends on its own pixels alone), plus any source
  *      DELETEs in the window as zero-read equality deletes on both
  *      arms, exactly-once via the PendingWindow pivot on the bands
  *      table with the q208 scrub rule.
  *
  * EXACTLY-ONCE across crash replays WITHOUT an atomic marker of its
  * own (the ClusterStream / LineSurgeryStream contract): step 1 is
  * content-idempotent (doc ids are unique for the stream's life and an
  * append is one atomic commit); step 2 is the maintainer's pivot (a
  * replayed refresh of a consumed window is a version-check no-op; a
  * crash mid-apply rolls forward with scrub-then-reapply).
  * MediaStreamSpec drives every crash prefix and asserts the standing
  * index stays BIT-IDENTICAL to a from-scratch build over everything
  * that has arrived — the media family's stronger-than-converges
  * invariant (no frozen corpus statistic to drift).
  *
  * Scale shape: per batch, the source anti-join is a doc_id-pruned
  * scan (at warehouse scale a batch-id high-water mark makes it a
  * metadata check); the refresh reads the window's files only — index
  * I/O is delta-sized, never corpus-sized. */
object MediaStream {

  /** The foreachBatch body, factored so the spec can drive partial
    * (crashed) applies deterministically. Idempotent: re-running with
    * the same batch from ANY prefix state converges to one application. */
  def applyBatch(s: SparkSession, batch: DataFrame, catalog: String,
      srcIdent: String, hashIdent: String, bandIdent: String): Unit = {
    val src = s"$catalog.$srcIdent"
    val media = batch.select(col("doc_id"), col("px")).localCheckpoint()
    val fresh = media.join(s.table(src).select("doc_id"), Seq("doc_id"), "left_anti")
    if (!fresh.isEmpty) fresh.writeTo(src).append()
    PhashIndexMaintenance.refreshCdc(s, catalog, srcIdent, hashIdent, bandIdent)
  }

  /** Wire a streaming (doc_id, px) frame into the index fold. The index
    * must exist (PhashIndexMaintenance.createIndex on whatever the
    * source table held at bootstrap — an empty source is fine). */
  def start(s: SparkSession, media: DataFrame, catalog: String,
      srcIdent: String, hashIdent: String, bandIdent: String,
      checkpointDir: String): StreamingQuery =
    media.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        applyBatch(batch.sparkSession, batch, catalog, srcIdent,
          hashIdent, bandIdent)
      }
      .start()
}
