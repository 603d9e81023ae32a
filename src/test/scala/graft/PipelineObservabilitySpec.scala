package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.PipelineOps

/** q117's observe() stage counters must reconcile exactly with the
  * pipeline's output and with independently recomputed stage counts —
  * the monitoring contract a production run reads from a listener. */
class PipelineObservabilitySpec extends AnyFunSuite {
  import TestSpark.{spark, sfDir}

  test("flagship pipeline emits reconciling per-stage metrics in one pass") {
    val df = PipelineOps.queries("q117_corpus_pipeline")(spark, sfDir)
    val out = df.collect() // one action populates all observed metrics
    val dedup = df.queryExecution.observedMetrics("pipeline_dedup")
    val quality = df.queryExecution.observedMetrics("pipeline_quality")

    // quality-stage totals equal the pipeline's own output totals
    val outDocs = out.map(_.getAs[Long]("n_docs")).sum
    val outTokens = out.map(_.getAs[Long]("n_tokens")).sum
    assert(quality.getAs[Long]("docs_after_quality") == outDocs)
    assert(quality.getAs[Long]("tokens_after_quality") == outTokens)

    // dedup-stage count equals the independent recompute: exact keepers
    // minus near-dup losers
    val docs = graft.engine.Tables.documents(spark, sfDir)
    val keepers = docs.groupBy("text").agg(min(col("doc_id")).as("doc_id"))
    val losers = graft.operators.DedupOps.verifiedNearDupPairs(spark, sfDir)
      .select(col("doc_b").as("doc_id")).distinct()
    // anti-join, not subtraction: an exact-duplicate doc is BOTH a
    // non-keeper and a near-dup loser (Jaccard 1), so the sets overlap
    val expected = keepers.join(losers, Seq("doc_id"), "left_anti").count()
    assert(dedup.getAs[Long]("docs_after_dedup") == expected)
    // and the funnel only narrows
    assert(dedup.getAs[Long]("docs_after_dedup") >= outDocs)
  }

  test("RunPipeline CLI executes, publishes via the manifest sink, and reports") {
    val out = java.nio.file.Files.createTempDirectory("pipeline-cli")
    out.toFile.deleteOnExit()
    val json = graft.tools.RunPipeline.run(spark, sfDir, out.toString)
    assert(json.contains(""""pipeline":"corpus""""))
    assert(json.contains(""""docs_after_dedup""""))
    // published table reads back with the pipeline's shard rows
    val published = spark.read.format("graft.sources.ManifestSink")
      .option("path", out.toString).load()
    val direct = PipelineOps.queries("q117_corpus_pipeline")(spark, sfDir)
    assert(published.collect().map(_.toString).sorted.toSeq
      == direct.collect().map(_.toString).sorted.toSeq)
  }
}
