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

  test("RepStatsExpr equals the relational gram-count twin on arbitrary + repetitive texts") {
    import org.apache.spark.sql.expressions.Window
    import spark.implicits._
    // arbitrary short texts + engineered repetition: block repeats (dup10
    // coverage), tie-broken top grams, single-gram docs, empty tokens
    val spam = Seq(
      ("x y " * 40).trim,                          // one bigram dominates
      (("the quick brown fox jumps over the lazy dog now " * 5).trim),
      ("a b c d e f g h i j " * 3).trim,           // exact 10-gram repeats
      "b a b a b a",                               // tie between "b a" and "a b"
      "solo", "", "  ", "日本 日本 日本 語 語",
      ("p q r s t u v w x y z " * 8).trim)
    val docs = (sample(text, 150) ++ spam).zipWithIndex.map(_.swap)
      .toDF("doc_id", "text")
    def gramCounts(n: Int) = docs
      .select(col("doc_id"),
        explode(ShinglesExpr.shinglesAllNative(col("text"), n)).as("gram"))
      .groupBy("doc_id", "gram").agg(count(lit(1)).as("cnt"))
    def topCover(n: Int) = gramCounts(n)
      .withColumn("rn", row_number().over(
        Window.partitionBy("doc_id").orderBy(col("cnt").desc, col("gram"))))
      .filter(col("rn") === 1)
      .select(col("doc_id"),
        (col("cnt") * length(col("gram"))).cast("long").as(s"t$n"))
    val dup10 = gramCounts(10).filter(col("cnt") >= 2)
      .groupBy("doc_id")
      .agg(sum(col("cnt") * length(col("gram"))).cast("long").as("d10"))
    val twin = docs.select(col("doc_id"))
      .join(topCover(2), Seq("doc_id"), "left")
      .join(topCover(3), Seq("doc_id"), "left")
      .join(topCover(4), Seq("doc_id"), "left")
      .join(dup10, Seq("doc_id"), "left")
      .select(col("doc_id"), coalesce(col("t2"), lit(0L)).as("t2"),
        coalesce(col("t3"), lit(0L)).as("t3"),
        coalesce(col("t4"), lit(0L)).as("t4"),
        coalesce(col("d10"), lit(0L)).as("d10"))
    val fused = docs.select(col("doc_id"),
      graft.plans.RepStatsExpr.repStats(col("text")).as("st"))
      .select(col("doc_id"), col("st.top2_chars").as("f2"),
        col("st.top3_chars").as("f3"), col("st.top4_chars").as("f4"),
        col("st.dup10_chars").as("fd"))
    val bad = fused.join(twin, "doc_id")
      .filter(col("f2") =!= col("t2") || col("f3") =!= col("t3") ||
        col("f4") =!= col("t4") || col("fd") =!= col("d10"))
    assert(bad.count() == 0, bad.limit(3).collect().mkString("; "))
    // null text -> null struct
    val n = Seq((1L, None: Option[String])).toDF("doc_id", "text")
      .select(graft.plans.RepStatsExpr.repStats(col("text")).as("st"))
      .collect().head
    assert(n.isNullAt(0))
  }

  test("LineChunksExpr / CodepointChunksExpr equal their HOF twins (incl. empty text)") {
    import spark.implicits._
    val w = DedupOps.LineWords
    val longDocs = Seq(("lorem ipsum " * 30).trim, ("日本 語 テ キ スト " * 9).trim)
    val docs = (sample(text, 200) ++ longDocs ++ Seq("")).zipWithIndex
      .map(_.swap).toDF("doc_id", "text")
    // word chunks: the exact former DedupOps.lineChunks formulation
    val ws = expr("split(text, ' ')")
    val hofLine = transform(
      sequence(lit(0), floor((size(ws) - 1) / lit(w)).cast("int")),
      j => array_join(slice(ws, j * w + 1, lit(w)), " "))
    val badL = docs.select(
      graft.plans.LineChunksExpr.lineChunksNative(col("text"), w).as("native"),
      hofLine.as("hof")).filter(col("native") =!= col("hof"))
    assert(badL.count() == 0, badL.limit(3).collect().mkString("; "))
    // codepoint chunks: the exact former cjkLineChunks formulation,
    // INCLUDING the degenerate ""-input sequence(0,-1) shape
    val n = 20
    val hofCp = transform(
      sequence(lit(0), floor((length(col("text")) - 1) / lit(n)).cast("int")),
      j => col("text").substr(j * lit(n) + lit(1), lit(n)))
    val badC = docs.select(
      graft.plans.CodepointChunksExpr.codepointChunks(col("text"), n).as("native"),
      hofCp.as("hof")).filter(col("native") =!= col("hof"))
    assert(badC.count() == 0, badC.limit(3).collect().mkString("; "))
    // null contract
    val nulls = Seq((1L, None: Option[String])).toDF("doc_id", "text").select(
      graft.plans.LineChunksExpr.lineChunksNative(col("text"), w).as("a"),
      graft.plans.CodepointChunksExpr.codepointChunks(col("text"), n).as("b"))
      .collect().head
    assert(nulls.isNullAt(0) && nulls.isNullAt(1))
  }

  test("GopherStatsExpr equals the HOF nine-column twin (bullets, ellipses, multibyte, empty)") {
    import spark.implicits._
    val stops = Seq("the", "of", "täst", "xyzzy")
    val engineered = Seq(
      "- bullet one\n* bullet two\n-nobullet\n- \nplain",
      "ends with dots...\nno dots\n...", "..", "....", ".....",
      "## #hash# tags ##", "the of the of", "",
      "日本 the 語...\n- 日本 x", " leading space", "trail ",
      "a\n\n\nb", "...\n- x y z...")
    val docs = (sample(text, 150) ++ engineered).zipWithIndex.map(_.swap)
      .toDF("doc_id", "text")
    val hof = docs
      .select(col("doc_id"),
        expr("filter(split(text, ' '), t -> t != '')").as("toks"), col("text"))
      .select(col("doc_id"),
        size(col("toks")).cast("long").as("n_words"),
        expr("aggregate(toks, 0L, (a, w) -> a + length(w))").as("sum_len"),
        (length(col("text")) - length(regexp_replace(col("text"), "#", "")))
          .cast("long").as("n_hash"),
        ((length(col("text")) -
          length(regexp_replace(col("text"), "\\.\\.\\.", ""))) / 3)
          .cast("long").as("n_ellipsis"),
        expr("size(filter(split(text, '\n'), l -> l LIKE '- %' OR l LIKE '* %'))")
          .cast("long").as("bullet_lines"),
        expr("size(split(text, '\n'))").cast("long").as("n_lines"),
        expr("size(filter(split(text, '\n'), l -> l LIKE '%...'))")
          .cast("long").as("ellipsis_lines"),
        expr("size(filter(toks, w -> w rlike '[A-Za-z]'))")
          .cast("long").as("alpha_words"),
        size(array_intersect(array_distinct(col("toks")),
          array(stops.map(lit): _*))).cast("long").as("stop_hits"))
    val fused = docs.select(col("doc_id"),
      graft.plans.GopherStatsExpr.gopherStats(col("text"), stops).as("g"))
      .select(col("doc_id"), col("g.*"))
    val cols = Seq("n_words", "sum_len", "n_hash", "n_ellipsis",
      "bullet_lines", "n_lines", "ellipsis_lines", "alpha_words", "stop_hits")
    val bad = fused.as("f").join(hof.as("h"), "doc_id")
      .filter(cols.map(c => col(s"f.$c") =!= col(s"h.$c")).reduce(_ || _))
    assert(bad.count() == 0, bad.limit(3).collect().mkString("; "))
    // null text -> null struct
    val n = Seq((1L, None: Option[String])).toDF("doc_id", "text")
      .select(graft.plans.GopherStatsExpr.gopherStats(col("text"), stops).as("g"))
      .collect().head
    assert(n.isNullAt(0))
  }

  test("CharNgramHashesExpr equals xxhash64 over the distinct-gram twin as a SET") {
    import spark.implicits._
    // in-place span hashing must be bit-equal to materialize-then-
    // xxhash64 (seed 42); compare as sorted sets — the fused form
    // dedupes BY HASH, the twin by gram text (identical unless xxhash64
    // collides, which array_sort equality would then catch here)
    for (n <- Seq(1, 2, 3, 12, 40)) {
      val both = corpus.select(
        array_sort(graft.plans.CharNgramHashesExpr
          .charNgramHashes(col("text"), n)).as("native"),
        array_sort(array_distinct(transform(
          CharNgramsExpr.charNgramsDistinct(col("text"), n),
          w => xxhash64(w)))).as("twin"))
      assert(both.filter(col("native") =!= col("twin")).count() == 0,
        s"in-place $n-gram hashes diverged from xxhash64 over gram strings")
    }
    // shorter than n -> empty; null -> null
    val edge = Seq((1L, Some("日本")), (2L, Some("")), (3L, None: Option[String]))
      .toDF("doc_id", "text")
      .select(graft.plans.CharNgramHashesExpr.charNgramHashes(col("text"), 3).as("g"))
      .collect().map(r => if (r.isNullAt(0)) null else r.getSeq[Long](0).toSeq).toSeq
    assert(edge == Seq(Seq(), Seq(), null))
  }

  test("keep kernels equal their relational gate twins (gopher, repetition, cjk)") {
    import spark.implicits._
    val stops = Seq("the", "and", "of")
    // docs that actually CROSS the gates' floors (>= 50 words / 50
    // bigrams), pass AND fail each rule, plus the arbitrary short corpus
    // (false == false is still a pinned case)
    val longDocs = Seq(
      "the and of " + (1 to 60).map(i => s"word$i").mkString(" "), // passes all
      ("the and " + "spam " * 80).trim,                            // repetitive
      "the and " + (1 to 60).map(_ => "####x").mkString(" "),      // symbol-heavy
      ("the quick brown fox and the lazy dog jumps over walls " * 8).trim,
      (0 until 120).map(i => (0x4E00 + i).toChar).mkString,        // cjk, unique bigrams
      "日本語のテキスト" * 20,                                      // cjk, repetitive
      "abcdefghij" * 12
    ).zipWithIndex.map { case (t, i) => (10000L + i, t) }
    val docs = corpus.select(col("doc_id").cast("long").as("doc_id"), col("text"))
      .unionByName(longDocs.toDF("doc_id", "text"))
    // gopher: boolean kernel == the nine-column relational keep
    val gRel = graft.operators.TextOps.gopherRulesWith(docs, stops)
      .select(col("doc_id"), col("keep").as("rel"))
    val gNat = docs.select(col("doc_id"),
      graft.plans.GopherKeepExpr.gopherKeep(col("text"), stops).as("nat"))
    assert(gRel.join(gNat, "doc_id").filter(col("rel") =!= col("nat")).count() == 0,
      "gopher keep kernel diverged from gopherRulesWith")
    assert(gNat.filter(col("nat")).count() >= 1, "no doc passes the gopher gate")
    // repetition: boolean kernel == repetitionRules' keep
    val rRel = graft.operators.TextOps.repetitionRules(docs)
      .select(col("doc_id"), col("keep").as("rel"))
    val rNat = docs.select(col("doc_id"),
      graft.plans.RepKeepExpr.repKeep(col("text")).as("nat"))
    val rBoth = rRel.join(rNat, "doc_id")
    assert(rBoth.filter(col("rel") =!= col("nat")).count() == 0,
      "repetition keep kernel diverged from repetitionRules")
    assert(rBoth.filter(col("rel") && !col("nat")).count() == 0 &&
      rNat.filter(col("nat")).count() >= 1 && rNat.filter(!col("nat")).count() >= 1)
    // cjk gate: boolean kernel == cjkGateIds MEMBERSHIP
    val cstops = Seq("一丁", "丁丂", "日本")
    val cRelIds = graft.operators.ScriptDedupOps.cjkGateIds(docs, cstops)
      .withColumn("rel", lit(true))
    val cBoth = docs.select(col("doc_id"),
        graft.plans.CjkGateKeepExpr.cjkGateKeep(col("text"), cstops).as("nat"))
      .join(cRelIds, Seq("doc_id"), "left")
      .select(col("doc_id"), coalesce(col("nat"), lit(false)).as("nat"),
        coalesce(col("rel"), lit(false)).as("rel"))
    assert(cBoth.filter(col("rel") =!= col("nat")).count() == 0,
      "cjk gate keep kernel diverged from cjkGateIds membership")
    assert(cBoth.filter(col("nat")).count() >= 1, "no doc passes the cjk gate")
    // null text -> null (filter-drop), all three kernels
    val n = Seq((1L, None: Option[String])).toDF("doc_id", "text")
      .select(graft.plans.GopherKeepExpr.gopherKeep(col("text"), stops).as("g"),
        graft.plans.RepKeepExpr.repKeep(col("text")).as("r"),
        graft.plans.CjkGateKeepExpr.cjkGateKeep(col("text"), cstops).as("c"))
      .collect().head
    assert(n.isNullAt(0) && n.isNullAt(1) && n.isNullAt(2))
  }
}
