package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, rng}
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{MisraGries, Sketches}

/** Misra–Gries heavy-hitter sketch: the local-algebra guarantee
  * (candidates ⊇ every item with frequency > N/(k+1), under arbitrary
  * merge trees), bounded state, and the distributed two-pass pipeline's
  * exactness against a naive full groupBy. */
class SketchSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  private def sample[A](gen: Gen[A], n: Int): Seq[A] = {
    val params = Gen.Parameters.default
    Iterator.from(0)
      .map(i => gen.apply(params, rng.Seed(0x5EEDL + i)))
      .flatten.take(n).toSeq
  }

  // zipf-ish skew: a few hot items over a long uniform tail — the regime
  // heavy-hitter detection exists for
  private val item: Gen[String] = Gen.frequency(
    8 -> Gen.oneOf("hot1", "hot2", "hot3"),
    2 -> Gen.stringOfN(4, Gen.alphaLowerChar))

  test("MG guarantee holds on skewed streams under adversarial merge splits") {
    val k = 7
    val mg = new MisraGries(k)
    for (trial <- 0 until 20) {
      val stream = sample(item, 500 + trial * 37)
      val exact = stream.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val heavy = exact.collect {
        case (x, c) if c * (k + 1) > stream.size => x
      }.toSet
      // fold through an uneven merge tree: chunks of varying size reduced
      // left-to-right, then merged pairwise in reversed order
      val chunks = stream.grouped(7 + trial % 13).toSeq
      val partials = chunks.map(_.foldLeft(mg.zero)(mg.reduce))
      val merged = partials.reverse.foldLeft(mg.zero)(mg.merge)
      assert(merged.size <= k, s"state exceeded capacity: ${merged.size} > $k")
      val cands = mg.finish(merged).toSet
      assert(heavy.subsetOf(cands),
        s"trial $trial lost heavy hitters ${heavy -- cands} (cands=$cands)")
    }
  }

  test("two-pass pipeline is exact: sketch candidates + recount == full groupBy") {
    val k = 7
    val data = sample(item, 4000)
    val df = data.toDF("token").repartition(8) // force multi-partition merges
    val cands = df
      .agg(Sketches.mgCandidates(k)(col("token")).as("cands"),
        count(lit(1)).as("n_total"))
      .select(explode(col("cands")).as("token"), col("n_total"))
    val result = df.join(broadcast(cands), Seq("token"))
      .groupBy("token", "n_total").agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") * (k + 1) > col("n_total"))
      .select("token", "cnt")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    val exact = data.groupBy(identity).view.mapValues(_.size.toLong)
      .filter { case (_, c) => c * (k + 1) > data.size }
      .toSet
    assert(result == exact)
  }
}
