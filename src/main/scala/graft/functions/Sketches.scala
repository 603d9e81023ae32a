package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Misra–Gries heavy-hitter candidate sketch as a mergeable Spark
  * `Aggregator` — the bounded-state half of the classic two-pass exact
  * heavy-hitter algorithm.
  *
  * Why not just `groupBy(token).count()`? At 100 TB the full token
  * vocabulary (URLs, hashes, typos) can be billions of distinct keys —
  * a full-width shuffle whose hash-aggregate state is itself the
  * bottleneck, when all the pipeline wants is "which tokens exceed 1/K
  * of the corpus". Misra–Gries keeps AT MOST `k` counters per partial
  * aggregate regardless of input size, merges associatively (Spark may
  * combine partials in any order), and guarantees every item with true
  * frequency > N/(k+1) survives into the candidate set. The second pass
  * (an exact count restricted to the ≤k candidates, e.g. via a broadcast
  * semi-join) removes false positives, so the FINAL result is exact and
  * deterministic even though the candidate set itself depends on merge
  * order.
  *
  * Guarantee (standard MG bound, preserved under arbitrary merge trees):
  * for every item x, trueCount(x) - estimate(x) <= N/(k+1), and the
  * buffer holds at most k keys; hence trueCount(x) > N/(k+1) implies x
  * is in the buffer.
  *
  * Reference behavioral anchor: the engine-capability matrix's sketch
  * tier (SURVEY.md §2.2) — same family as `approx_count_distinct` (HLL),
  * but for top-frequency items rather than cardinality.
  */
class MisraGries(k: Int) extends Aggregator[String, Map[String, Long], Seq[String]] {
  require(k >= 1, s"MisraGries capacity must be >= 1, got $k")

  override def zero: Map[String, Long] = Map.empty

  override def reduce(b: Map[String, Long], item: String): Map[String, Long] = {
    val bumped = b.updatedWith(item)(c => Some(c.getOrElse(0L) + 1L))
    if (bumped.size <= k) bumped else shrink(bumped)
  }

  override def merge(a: Map[String, Long], b: Map[String, Long]): Map[String, Long] = {
    val combined = b.foldLeft(a) { case (acc, (item, c)) =>
      acc.updatedWith(item)(old => Some(old.getOrElse(0L) + c))
    }
    if (combined.size <= k) combined else shrink(combined)
  }

  /** MG overflow step: subtract the (k+1)-th largest count from every
    * counter and drop the non-positive ones — at most k keys remain,
    * and each subtraction is charged against >= k+1 distinct items, so
    * the total undercount stays <= N/(k+1). */
  private def shrink(m: Map[String, Long]): Map[String, Long] = {
    val cut = m.valuesIterator.toArray.sorted(Ordering[Long].reverse).apply(k)
    m.collect { case (item, c) if c > cut => (item, c - cut) }
  }

  override def finish(b: Map[String, Long]): Seq[String] = b.keys.toSeq.sorted

  override def bufferEncoder: Encoder[Map[String, Long]] =
    ExpressionEncoder[Map[String, Long]]()
  override def outputEncoder: Encoder[Seq[String]] =
    ExpressionEncoder[Seq[String]]()
}

object Sketches {
  /** Untyped-column form of [[MisraGries]] for DataFrame pipelines:
    * `df.agg(Sketches.mgCandidates(64)(col("token")))` → `array<string>`
    * of at most 64 heavy-hitter candidates. */
  def mgCandidates(k: Int): org.apache.spark.sql.expressions.UserDefinedFunction =
    org.apache.spark.sql.functions.udaf(new MisraGries(k), Encoders.STRING)
}
