package graft.streaming

import org.apache.spark.sql.{DataFrame, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

import graft.engine.Tables
import graft.operators.SimilarityOps
import graft.plans.{FloatVectorDot, LshBucketExpr}

/** Streaming similarity search: ANN for ARRIVING query vectors against
  * the static corpus index — the vector twin of [[DedupStream]] and the
  * streaming completion of the q45 batch path.
  *
  *   1. Per-row LSH bucket via the codegen'd [[LshBucketExpr]] —
  *      stateless, so it runs in an append-mode stream.
  *   2. STREAM-STATIC equi-join on the bucket: each probe compares only
  *      against its bucket's inverted list; the static side is re-planned
  *      per micro-batch, so a growing index is picked up automatically;
  *      the stream side buffers no state.
  *   3. `transformWithState` keyed by probe: ranks the bucket matches
  *      (score desc, cand id — q45's exact tie-break), emits the top k
  *      once, and suppresses the key on at-least-once re-delivery.
  *
  * State is ONE boolean per served probe; candidate ranking needs no
  * persistent list because all of a probe's bucket matches land in its
  * arrival micro-batch.
  */
object AnnStream {

  /** Static corpus side: (cand_id, ce, bucket) from the batch operators. */
  def corpusIndex(s: SparkSession, dir: String): DataFrame =
    Tables.embeddings(s, dir).select(
      col("vec_id").as("cand_id"), col("embedding").as("ce"),
      LshBucketExpr.bucketNative(col("embedding"),
        SimilarityOps.Planes, SimilarityOps.Dim).as("bucket"))

  /** arrivals (probe_id, embedding) → (probe_id, cand_id, rn, score):
    * the streamed statement of q45, row-identical to it for any probe
    * whose vector is in the corpus (AnnStreamSpec proves convergence). */
  def annAgainstCorpus(arrivals: DataFrame, index: DataFrame,
      k: Int = SimilarityOps.TopK): DataFrame = {
    val spark = arrivals.sparkSession
    import spark.implicits._
    arrivals
      .select(col("probe_id"), col("embedding").as("pe"),
        LshBucketExpr.bucketNative(col("embedding"),
          SimilarityOps.Planes, SimilarityOps.Dim).as("bucket"))
      .join(index, Seq("bucket"))
      .filter(col("probe_id") =!= col("cand_id"))
      .withColumn("score", FloatVectorDot.cosineNative(col("pe"), col("ce")))
      .select(col("probe_id"), col("cand_id"), col("score"))
      .as[(Long, Long, Double)]
      .groupByKey(_._1)
      .transformWithState(new ProbeTopKProcessor(k), TimeMode.None(), OutputMode.Append())
      .toDF("probe_id", "cand_id", "rn", "score")
  }
}

/** Keyed by probe id: rank the probe's bucket matches, emit top k once,
  * suppress the key on re-delivery (ValueState "served" flag). */
class ProbeTopKProcessor(k: Int)
    extends StatefulProcessor[Long, (Long, Long, Double), (Long, Long, Int, Double)] {

  @transient private var served: ValueState[Boolean] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    served = getHandle.getValueState[Boolean](
      "served", Encoders.scalaBoolean, TTLConfig.NONE)

  override def handleInputRows(key: Long, rows: Iterator[(Long, Long, Double)],
      timerValues: TimerValues): Iterator[(Long, Long, Int, Double)] = {
    if (served.exists()) {
      Iterator.empty
    } else {
      served.update(true)
      rows.toSeq.distinct
        .sortBy { case (_, cand, score) => (-score, cand) }
        .take(k).zipWithIndex
        .map { case ((probe, cand, score), i) => (probe, cand, i + 1, score) }
        .iterator
    }
  }
}
