package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

import graft.functions.GraftFunctions.shingleSet
import graft.functions.HashFunctions.{affineHash, md5Code60}
import graft.operators.DedupOps

/** Incremental deduplication: dedup ARRIVING documents against the
  * existing corpus index and against earlier arrivals — the streaming
  * completion of the q41 batch MinHash/LSH pipeline.
  *
  * Architecture (the only shape that survives an unbounded corpus):
  *
  *   1. Per-row MinHash signature ([[withRowSignature]]) — stateless, no
  *      groupBy, so it runs in an append-mode stream. Bit-identical to the
  *      batch signature (same md5 + affine-hash + min fold over the same
  *      shingle set), proven by the DedupStreamSpec convergence test.
  *   2. Band explode → STREAM-STATIC equi-join against the corpus band
  *      index on (band, key). Stateless: candidates form only where a
  *      band collides, the static side is re-planned per micro-batch (a
  *      growing corpus index is picked up automatically), and the stream
  *      side never buffers state. Exact Jaccard verification joins the
  *      static shingle table on the candidate's corpus doc only.
  *   3. `transformWithState` keyed by the arriving doc: per-key
  *      ValueState marks a doc as processed, making the output idempotent
  *      under at-least-once re-delivery; within one arrival the processor
  *      dedups multi-band collisions without any persistent list state.
  *
  * Per-arrival state is ONE boolean per seen doc id (plus one long per
  * distinct signature for [[seenSignatureDedup]]) — bounded by corpus
  * cardinality, never by stream length × bands.
  *
  * Reference analog: none — the reference recomputes from scratch per
  * cron tick (rws_data_ingester cronjob.sh:1-3); this is the incremental
  * design a 100 TB corpus forces.
  */
object DedupStream {

  /** MinHash signature computed per row as one nested HOF chain:
    * `transform(transform(shingles, md5), code -> [h_1..h_16])` digests
    * every shingle exactly once (the inner transform materializes the
    * code array before the outer lambda maps it — no CollapseProject
    * re-evaluation trap), then an elementwise-min fold reduces the
    * per-shingle hash rows to the signature. Bit-identical to
    * [[DedupOps.withSignature]]'s explode+groupBy formulation, which
    * stays the BATCH path: there the min combines map-side so the
    * shuffle carries 16 longs/doc; here there is no shuffle at all. */
  def withRowSignature(docs: DataFrame): DataFrame = {
    val n = DedupOps.NumHashes
    docs
      .withColumn("shingles", shingleSet(col("text"), 3))
      .filter(size(col("shingles")) > 0)
      .withColumn("sig",
        aggregate(
          transform(transform(col("shingles"), sh => md5Code60(sh)),
            c => array((1 to n).map(i => affineHash(lit(i), c)): _*)),
          array(Seq.fill(n)(lit(Long.MaxValue)): _*),
          (acc, h) => zip_with(acc, h, (a, b) => least(a, b))))
  }

  /** Static corpus side: (doc_id, j, bkey) band index + shingle sets,
    * computed once from the corpus directory by the batch operators. */
  def corpusBandIndex(s: SparkSession, dir: String): DataFrame =
    DedupOps.bands(DedupOps.withSignature(DedupOps.shingleSets(s, dir)))

  def corpusShingles(s: SparkSession, dir: String): DataFrame =
    DedupOps.shingleSets(s, dir)
      .select(col("doc_id").as("doc_old"), col("shingles").as("sh_old"))

  /** The streaming near-dup verdict pipeline: arrivals (doc_id, text) →
    * verified (doc_new, doc_old, inter, uni, jac_bp), one row per
    * (arriving doc × corpus near-dup), idempotent under re-delivery. */
  def nearDupAgainstCorpus(arrivals: DataFrame, corpusBands: DataFrame,
      corpusSh: DataFrame): DataFrame = {
    val spark = arrivals.sparkSession
    import spark.implicits._
    val arrBands = withRowSignature(arrivals)
      .select(col("doc_id").as("doc_new"), col("shingles").as("sh_new"), col("sig"))
      .withColumn("j", explode(sequence(lit(0), lit(DedupOps.Bands - 1))))
      .withColumn("bkey", array_join(
        transform(slice(col("sig"), col("j") * lit(DedupOps.RowsPerBand) + lit(1),
          lit(DedupOps.RowsPerBand)), v => v.cast("string")), "_"))
    val inter = size(array_intersect(col("sh_new"), col("sh_old")))
    val verified = arrBands
      .join(corpusBands.select(col("doc_id").as("doc_old"), col("j"), col("bkey")),
        Seq("j", "bkey"))
      .filter(col("doc_new") =!= col("doc_old"))
      .join(corpusSh, "doc_old")
      .withColumn("inter", inter)
      .withColumn("uni", size(col("sh_new")) + size(col("sh_old")) - col("inter"))
      .filter(col("inter") * 2 >= col("uni"))
      .select(col("doc_new"), col("doc_old"), col("inter").cast("int"),
        col("uni").cast("int"))
    verified.as[(Long, Long, Int, Int)]
      .groupByKey(_._1)
      .transformWithState(new ArrivalDedupProcessor, TimeMode.None(), OutputMode.Append())
      .toDF("doc_new", "doc_old", "inter", "uni")
      .withColumn("jac_bp", expr("inter * 10000L div uni"))
  }

  /** Incremental EXACT dedup by full MinHash signature: the first arrival
    * of a signature becomes the keeper; later arrivals are flagged with
    * the keeper's id. ValueState holds one long per distinct signature —
    * the streaming twin of q40's groupBy(text). */
  def seenSignatureDedup(arrivals: DataFrame): DataFrame = {
    val spark = arrivals.sparkSession
    import spark.implicits._
    withRowSignature(arrivals)
      .select(col("doc_id"), array_join(
        transform(col("sig"), v => v.cast("string")), "_").as("sig_key"))
      .as[(Long, String)]
      .groupByKey(_._2)
      .transformWithState(new SignatureDedupProcessor, TimeMode.None(), OutputMode.Append())
      .toDF("doc_id", "keeper_id", "is_first")
  }
}

/** Keyed by arriving doc id: emits each distinct corpus near-dup once and
  * suppresses the whole key on re-delivery (ValueState "done" flag). All
  * band rows of one arrival land in one micro-batch, so within-arrival
  * dedup needs no persistent list — just a local distinct. */
class ArrivalDedupProcessor
    extends StatefulProcessor[Long, (Long, Long, Int, Int), (Long, Long, Int, Int)] {

  @transient private var done: ValueState[Boolean] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    done = getHandle.getValueState[Boolean](
      "done", Encoders.scalaBoolean, TTLConfig.NONE)

  override def handleInputRows(key: Long, rows: Iterator[(Long, Long, Int, Int)],
      timerValues: TimerValues): Iterator[(Long, Long, Int, Int)] = {
    if (done.exists()) {
      Iterator.empty // re-delivered arrival: verdicts already emitted
    } else {
      done.update(true)
      rows.toSeq.distinct.sortBy(_._2).iterator
    }
  }
}

/** Keyed by signature string: ValueState holds the keeper (first) doc id. */
class SignatureDedupProcessor
    extends StatefulProcessor[String, (Long, String), (Long, Long, Boolean)] {

  @transient private var keeper: ValueState[Long] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    keeper = getHandle.getValueState[Long](
      "keeper", Encoders.scalaLong, TTLConfig.NONE)

  override def handleInputRows(key: String, rows: Iterator[(Long, String)],
      timerValues: TimerValues): Iterator[(Long, Long, Boolean)] = {
    val arriving = rows.map(_._1).toSeq.sorted
    val first = if (keeper.exists()) keeper.get() else {
      keeper.update(arriving.head)
      arriving.head
    }
    arriving.iterator.map(id => (id, first, id == first))
  }
}
