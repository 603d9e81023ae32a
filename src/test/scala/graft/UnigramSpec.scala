package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, rng}
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.UnigramOps
import graft.plans.UnigramEncodeExpr

/** The unigram-LM tier's kernel contract (round-15 verdict item 5):
  * [[UnigramEncodeExpr]]'s Viterbi DP property-tested against a
  * PLAIN-SCALA reference — an independently-written memoized recursion
  * plus, for short words, exhaustive-enumeration optimality — and the
  * training loop's invariants (pruning, coverage, cost monotonicity).
  */
class UnigramSpec extends AnyFunSuite {
  import TestSpark.spark

  private def sample[A](gen: Gen[A], n: Int): Seq[A] = {
    val params = Gen.Parameters.default
    Iterator.from(0)
      .map(i => gen.apply(params, rng.Seed(0x0419L + i)))
      .flatten.take(n).toSeq
  }

  /** Plain-Scala reference #1: memoized recursion over PREFIX lengths
    * with a collect-then-minBy candidate pass (the expression runs an
    * iterative array DP with a streaming compare — same recurrence and
    * tie rule, independently coded). The tie rule is ORIENTED: ties
    * pick the longest LAST piece of the prefix; a suffix-oriented
    * "longest first piece" rule genuinely differs (e.g. "aba" under
    * equal-cost {a,b,ab,ba} is [a,ba] prefix-oriented but [ab,a]
    * suffix-oriented), so the orientation is part of the cross-engine
    * contract. The exhaustive enumeration below supplies the
    * orientation-free optimality check. */
  private def refSegment(word: String, vocab: Map[String, Long],
      maxPiece: Int): Option[(List[String], Long)] = {
    val memo = scala.collection.mutable.Map[Int, Option[(List[String], Long)]]()
    def go(k: Int): Option[(List[String], Long)] =
      if (k == 0) Some((Nil, 0L))
      else memo.getOrElseUpdate(k, {
        val cands = for {
          l <- (1 to math.min(maxPiece, k)).toList
          p = word.substring(k - l, k)
          c <- vocab.get(p).toList
          pre <- go(k - l).toList
        } yield (pre._1 :+ p, pre._2 + c, l)
        if (cands.isEmpty) None
        else {
          val best = cands.minBy { case (_, t, l) => (t, -l) }
          Some((best._1, best._2))
        }
      })
    go(word.length)
  }

  /** Plain-Scala reference #2: EXHAUSTIVE enumeration of all
    * segmentations (short words only) — cost optimality is globally
    * well-defined regardless of tie rules. */
  private def allSegmentations(word: String, vocab: Map[String, Long],
      maxPiece: Int): List[(List[String], Long)] =
    if (word.isEmpty) List((Nil, 0L))
    else (for {
      l <- (1 to math.min(maxPiece, word.length)).toList
      p = word.substring(0, l)
      c <- vocab.get(p).toList
      (rest, rc) <- allSegmentations(word.substring(l), vocab, maxPiece)
    } yield (p :: rest, c + rc))

  private val alpha = Seq("a", "b", "c")
  private val vocabGen: Gen[Map[String, Long]] = for {
    nMulti <- Gen.chooseNum(0, 8)
    multis <- Gen.listOfN(nMulti, for {
      l <- Gen.chooseNum(2, 4)
      cs <- Gen.listOfN(l, Gen.oneOf(alpha))
    } yield cs.mkString)
    costs <- Gen.listOfN(3 + nMulti, Gen.chooseNum(1L, 5000L))
    dropChar <- Gen.oneOf(true, false)
    dropped <- Gen.oneOf(alpha)
  } yield {
    val pieces = (alpha ++ multis).distinct
    val base = pieces.zip(costs).toMap
    if (dropChar) base - dropped else base
  }
  private val wordGen: Gen[String] = for {
    n <- Gen.chooseNum(1, 9)
    cs <- Gen.listOfN(n, Gen.oneOf(alpha))
  } yield cs.mkString

  test("expression == memoized reference == exhaustive optimum (120 random cases)") {
    import spark.implicits._
    val cases = sample(Gen.zip(wordGen, vocabGen), 120)
    cases.zipWithIndex.foreach { case ((word, vocab), i) =>
      val ref = refSegment(word, vocab, UnigramOps.UniMaxPiece)
      val got = Seq(word).toDF("word")
        .select(UnigramEncodeExpr.unigramEncode(col("word"), vocab.toSeq,
          UnigramOps.UniMaxPiece).as("seg"))
        .select(col("seg.pieces"), col("seg.cost_milli"))
        .collect().head
      val gotOpt = if (got.isNullAt(0)) None
        else Some((got.getSeq[String](0).toList, got.getLong(1)))
      assert(gotOpt.map(_._2) == ref.map(_._2),
        s"case $i: cost mismatch for '$word' under $vocab: got $gotOpt ref $ref")
      assert(gotOpt.map(_._1) == ref.map(_._1),
        s"case $i: piece mismatch for '$word' under $vocab: got $gotOpt ref $ref")
      // exhaustive optimality + decomposition validity
      val all = allSegmentations(word, vocab, UnigramOps.UniMaxPiece)
      gotOpt match {
        case Some((pieces, cost)) =>
          assert(all.nonEmpty && cost == all.map(_._2).min,
            s"case $i: non-optimal cost for '$word'")
          assert(pieces.mkString == word)
          assert(pieces.forall(vocab.contains))
          assert(cost == pieces.map(vocab).sum)
        case None =>
          assert(all.isEmpty, s"case $i: expression null but '$word' segmentable")
      }
    }
  }

  test("tie-break: equal totals resolve to the LONGEST piece at each cell") {
    import spark.implicits._
    // cost(ab) == cost(a) + cost(b): "abab" has equal-cost segmentations;
    // the rule picks [ab, ab]
    val vocab = Seq("a" -> 10L, "b" -> 20L, "ab" -> 30L)
    val got = Seq("abab").toDF("word")
      .select(UnigramEncodeExpr.unigramEncode(col("word"), vocab, 4).as("seg"))
      .select(col("seg.pieces")).collect().head.getSeq[String](0)
    assert(got == Seq("ab", "ab"))
  }

  test("training invariants on the fixture: prune-exact, coverage, replayable") {
    val (counts, costs) = UnigramOps.trainedUnigram(spark, "/root/testdata/sf0.001")
    assert(counts.nonEmpty && counts.forall(_._2 > 0), "usage-0 pieces must be pruned")
    assert(counts.map(_._1).toSet == costs.map(_._1).toSet)
    // final costs are the quantized final counts: cheaper piece <=> larger count
    val cm = costs.toMap
    val byCount = counts.sortBy(_._2)
    byCount.sliding(2).foreach {
      case Seq((p1, c1), (p2, c2)) if c1 < c2 => assert(cm(p1) >= cm(p2))
      case _ => ()
    }
    // the whole corpus still encodes (coverage survives pruning)
    val enc = SparkEntry.queries("q225_unigram_roundtrip")(spark, "/root/testdata/sf0.001")
    assert(enc.filter(!col("lossless")).count() == 0)
    // memoized: second call returns the identical artifact
    val (counts2, _) = UnigramOps.trainedUnigram(spark, "/root/testdata/sf0.001")
    assert(counts2 == counts)
  }
}
