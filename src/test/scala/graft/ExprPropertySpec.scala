package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, rng}
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.GraftFunctions.shingleSet
import graft.operators.DedupOps
import graft.plans.{CharNgramsExpr, MinHashFromTextExpr, ShinglesExpr}

/** Property-style hardening for the byte-slice expressions: on ARBITRARY
  * texts — multibyte UTF-8 words, repeated/leading/trailing spaces, empty
  * tokens, single tokens — the native kernels must equal the HOF/
  * relational formulations exactly. One generated corpus, one Spark job,
  * column-vs-column comparison (a per-sample forAll would pay a Spark
  * round-trip per case). */
class ExprPropertySpec extends AnyFunSuite {
  import TestSpark.spark

  // deterministic scalacheck sampling: fixed seed, no retry flakiness
  private def sample[A](gen: Gen[A], n: Int): Seq[A] = {
    val params = Gen.Parameters.default
    Iterator.from(0)
      .map(i => gen.apply(params, rng.Seed(0xC0FFEEL + i)))
      .flatten.take(n).toSeq
  }

  private val word: Gen[String] = Gen.oneOf(
    Gen.stringOfN(3, Gen.alphaLowerChar),
    Gen.oneOf("täst", "日本", "a", "xyzzy", "é", "𝒜𝓑", "naïve"),
    Gen.stringOfN(1, Gen.alphaNumChar))

  private val text: Gen[String] = for {
    n <- Gen.chooseNum(0, 12)
    ws <- Gen.listOfN(n, word)
    // joiners include repeated spaces -> empty tokens under split semantics
    js <- Gen.listOfN(math.max(n - 1, 0), Gen.oneOf(" ", "  ", " ", "   "))
    lead <- Gen.oneOf("", " ", "  ")
    trail <- Gen.oneOf("", " ")
  } yield lead + (if (ws.isEmpty) "" else
    ws.tail.zip(js).foldLeft(ws.head) { case (acc, (w, j)) => acc + j + w }) + trail

  private lazy val corpus = {
    import spark.implicits._
    sample(text, 300).zipWithIndex.map(_.swap).toDF("doc_id", "text")
  }

  test("ShinglesExpr equals the HOF shingleSet on arbitrary texts (incl. multibyte + empty tokens)") {
    val both = corpus.select(
      ShinglesExpr.shinglesNative(col("text"), 3).as("native"),
      shingleSet(col("text"), 3).as("hof"))
    assert(both.filter(col("native") =!= col("hof")).count() == 0)
  }

  test("MinHashFromTextExpr equals the relational signature on arbitrary texts") {
    val sets = corpus
      .select(col("doc_id"), shingleSet(col("text"), 3).as("shingles"))
      .filter(size(col("shingles")) > 0)
    val relational = DedupOps.withSignatureRelational(sets)
      .withColumnRenamed("sig", "sig_rel")
    val fused = corpus.select(col("doc_id"),
      MinHashFromTextExpr.sigFromText(col("text"), 3, DedupOps.NumHashes).as("sig"))
      .filter(col("sig").isNotNull)
    assert(fused.count() == sets.count())
    assert(fused.join(relational, "doc_id")
      .filter(col("sig") =!= col("sig_rel")).count() == 0)
  }

  test("shingle width n is honored across 2..5 on arbitrary texts") {
    (2 to 5).foreach { n =>
      val both = corpus.select(
        ShinglesExpr.shinglesNative(col("text"), n).as("native"),
        shingleSet(col("text"), n).as("hof"))
      assert(both.filter(col("native") =!= col("hof")).count() == 0, s"n=$n")
    }
  }

  test("BPE round-trip: concat(bpe_apply(word)) == word under adversarial merges") {
    import spark.implicits._
    // arbitrary words (multibyte, surrogate pairs, empty) plus the
    // classic overlap/chain torture cases
    val words = (sample(word, 200) ++ Seq("", "aaa", "aaaa", "abab",
      "aabb", "baaab", "𝒜𝒜𝒜", "ééé")).distinct
    val mergeTables: Seq[Seq[(String, String)]] = Seq(
      Seq("a" -> "a"),                              // self-overlap ("aaa" -> [aa, a])
      Seq("a" -> "a", "aa" -> "aa"),                // chained onto its own output
      Seq("a" -> "b", "ab" -> "ab", "abab" -> "a"), // multi-char partners
      Seq("é" -> "é", "𝒜" -> "𝒜"), // multibyte + non-BMP
      Seq("b" -> "a", "a" -> "b", "ba" -> "ab"),    // interleaved directions
      Seq.fill(50)("a" -> "a"))                     // repeated identical merges
    mergeTables.zipWithIndex.foreach { case (merges, mi) =>
      val bad = words.zipWithIndex.map(_.swap).toDF("id", "w")
        .select(col("w"),
          array_join(graft.plans.BpeApplyExpr.bpeApply(col("w"), merges), "")
            .as("rt"))
        .filter(col("rt") =!= col("w")).collect()
      assert(bad.isEmpty,
        s"merge table #$mi broke the round-trip: ${bad.take(3).toSeq}")
    }
  }

  test("CharNgramsExpr equals the HOF substring twin on arbitrary multibyte texts, n in 1..4") {
    import spark.implicits._
    // the HOF twin mirrors the DuckDB oracle algebra exactly:
    // transform(sequence(1, length - n + 1), i -> substring(text, i, n));
    // both engines' substring/length count CODEPOINTS
    for (n <- 1 to 4) {
      val both = corpus.filter(length(col("text")) >= n).select(
        CharNgramsExpr.charNgrams(col("text"), n).as("native"),
        expr(s"transform(sequence(1, length(text) - $n + 1), " +
          s"i -> substring(text, i, $n))").as("hof"))
      assert(both.filter(col("native") =!= col("hof")).count() == 0,
        s"codepoint $n-grams diverged from the substring algebra")
    }
    // shorter than n -> empty, never null, never a partial gram
    val short = Seq((1L, "日"), (2L, "ab"), (3L, "")).toDF("doc_id", "text")
    val got = short.select(CharNgramsExpr.charNgrams(col("text"), 3).as("g"))
      .collect().map(_.getSeq[String](0).toSeq).toSeq
    assert(got == Seq(Seq(), Seq(), Seq()))
    // distinct variant: first-occurrence order, set semantics
    val d = Seq((1L, "ababa")).toDF("doc_id", "text")
      .select(CharNgramsExpr.charNgramsDistinct(col("text"), 2).as("g"))
      .collect().head.getSeq[String](0).toSeq
    assert(d == Seq("ab", "ba"))
  }
}
