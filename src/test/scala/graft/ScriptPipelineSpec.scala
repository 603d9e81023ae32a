package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.engine.Tables
import graft.operators.{DedupOps, ScriptDedupOps, TextOps}

/** The script-aware flagship contract (round-15 verdict item 3): q117's
  * pipeline over the mixed-script corpus must MEASURABLY CLEAN the CJK
  * stratum — not annihilate it (the old word gate's behavior: every
  * space-free doc is ONE word, so the ≥50-word floor kills the whole
  * stratum) and not pass it through untouched (the old dedup/leak
  * paths' behavior: no shingles, no windows → nothing ever removed).
  */
class ScriptPipelineSpec extends AnyFunSuite {
  import TestSpark.spark

  private val dir = "/root/testdata/sf0.001"

  private lazy val mixed = TextOps.scriptMixed(Tables.documents(spark, dir))
    .withColumn("script", TextOps.scriptOf(col("text")))
    .localCheckpoint()

  private lazy val cleaned =
    ScriptDedupOps.scriptCleanedDocs(mixed).localCheckpoint()

  test("old gate ANNIHILATES the CJK stratum; the script gate keeps most of it") {
    val cjkCleaned = cleaned.filter(col("script") === "cjk")
    val nCjk = cjkCleaned.count()
    assert(nCjk > 0)
    // the old q117 gate on the same cleaned text: one giant word fails
    // the ≥50-word floor for every space-free doc
    val oldKeep = TextOps.gopherRulesWith(cjkCleaned, Seq("the", "be", "to"))
      .filter(col("keep")).count()
    assert(oldKeep == 0, "word-form Gopher floor must reject every space-free doc")
    // the script gate keeps a majority but NOT everything (short and
    // stopword-poor docs fail the bigram floor / evidence rules)
    val cstops = mixed.filter(col("script") === "cjk")
      .select(explode(graft.plans.CharNgramsExpr.charNgrams(col("text"), 2)).as("t"))
      .groupBy("t").agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("t")).limit(8)
      .collect().map(_.getString(0)).toSeq
    val kept = ScriptDedupOps.cjkGateIds(cjkCleaned, cstops).count()
    assert(kept > 0 && kept <= nCjk)
  }

  test("line cleaning actually rewrites CJK text (boilerplate removed in-place)") {
    val joined = mixed.filter(col("script") === "cjk")
      .select(col("doc_id"), col("text").as("raw"))
      .join(cleaned.select(col("doc_id"), col("text")), "doc_id")
    assert(joined.filter(length(col("text")) < length(col("raw"))).count() > 0,
      "at least one CJK doc must lose a corpus-frequent 20-codepoint line")
    assert(joined.filter(col("text") === col("raw")).count() > 0,
      "cleaning is selective — boilerplate-free CJK docs keep their text")
  }

  test("q221 output carries a live cjk stratum AND the stratum was cleaned") {
    val out = SparkEntry.queries("q221_script_pipeline")(spark, dir)
      .localCheckpoint()
    val cjkRows = out.filter(col("stratum") === "cjk")
    assert(cjkRows.count() > 0, "the cjk stratum must survive into packing")
    val cjkTokens = cjkRows.agg(sum(col("n_tokens"))).head().getLong(0)
    assert(cjkTokens > 0)
    // cleaned = fewer packed tokens than the raw stratum's codepoint
    // count: the gate, near-dup, eval split and leak removal all bite
    val rawCp = mixed.filter(col("script") === "cjk")
      .agg(sum(length(col("text")))).head().getLong(0)
    assert(cjkTokens < rawCp,
      s"packed cjk tokens ($cjkTokens) must be < raw stratum codepoints ($rawCp)")
    // latin strata still pack alongside (per-lang, as in q117)
    assert(out.filter(col("stratum") =!= "cjk").count() > 0)
  }

  test("near-dup stage removes CJK docs the old path could not see") {
    // gated survivors (pre-dedup) still contain both endpoints of the
    // planted CJK near-dup pairs; the pipeline's S3 removes doc_b
    val pairs = ScriptDedupOps.scriptNearDupPairs(
        cleaned.select("doc_id", "text"))
      .filter(col("script") === "cjk").collect()
    assert(pairs.nonEmpty, "planted CJK near-dups exist on cleaned text")
    // old-path comparison: the word-shingled pair set over the same
    // frame has NO cjk pairs (no signatures at all)
    val oldSigs = cleaned.filter(col("script") === "cjk")
      .select(graft.plans.MinHashFromTextExpr.sigFromText(col("text"),
        DedupOps.ShingleN, DedupOps.NumHashes).as("sig"))
      .filter(col("sig").isNotNull)
    assert(oldSigs.count() == 0)
  }

  test("cjk verbatim-leak detection quarantines planted eval overlap") {
    // plant: a train doc sharing a 40-codepoint span with an eval doc
    import spark.implicits._
    val span = TextOps.CjkAlphabet.take(30) * 3 // 90 cp, shared
    val train = Seq((1L, span + TextOps.CjkAlphabet.take(20)),
      (2L, TextOps.CjkAlphabet.reverse.take(30) * 3)).toDF("doc_id", "text")
    val evalC = Seq((100L, TextOps.CjkAlphabet.take(15) + span))
      .toDF("doc_id", "text")
    val leaks = ScriptDedupOps.cjkVerbatimLeakIds(train, evalC)
      .as[Long].collect().toSet
    assert(leaks == Set(1L), s"expected only doc 1 quarantined, got $leaks")
  }
}
