package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.engine.Tables
import graft.operators.{DedupOps, ScriptDedupOps, TextOps}
import graft.plans.{CharNgramsExpr, MinHashFromTextExpr, MinHashSigExpr, ScriptMinHashExpr, ShinglesExpr}

/** The script-aware dedup contract (round-15 verdict item 1), both
  * directions:
  *
  *   1. BLINDNESS — the word-tokenized paths provably miss the
  *      space-free stratum: a CJK doc is one token, so it gets no
  *      MinHash signature, an empty set-sim shingle set, and one
  *      giant "line".
  *   2. RECALL — the script-aware operators find the planted CJK
  *      near-dup structure the old paths missed.
  *
  * Plus the kernel identity: the fused ScriptMinHashExpr equals the
  * composed script-dispatch twin (detect → CharNgrams/Shingles →
  * MinHashSig) on every mixed-corpus doc.
  */
class ScriptDedupSpec extends AnyFunSuite {
  import TestSpark.spark

  private val dir = "/root/testdata/sf0.001"

  private lazy val mixed =
    TextOps.scriptMixed(Tables.documents(spark, dir)).localCheckpoint()

  test("blindness: word-tokenized MinHash gives the CJK stratum NO signature") {
    val oldSig = mixed
      .select(col("doc_id"),
        MinHashFromTextExpr.sigFromText(col("text"),
          DedupOps.ShingleN, DedupOps.NumHashes).as("sig"))
      .filter(col("doc_id") % 3 === 0)
    assert(oldSig.count() > 0)
    assert(oldSig.filter(col("sig").isNotNull).count() == 0,
      "a space-free doc must have fewer than ShingleN word tokens -> null sig")
  }

  test("blindness: word 5-shingle set-sim sets and 10-word lines degenerate on CJK docs") {
    val cjk = mixed.filter(col("doc_id") % 3 === 0)
    assert(cjk
      .select(ShinglesExpr.shinglesNative(col("text"), DedupOps.SetSimShingleN).as("sh"))
      .filter(size(col("sh")) > 0).count() == 0,
      "old set-sim path: every CJK shingle set is empty")
    assert(cjk
      .select(size(DedupOps.lineChunksOf(col("text"))).as("n"))
      .agg(max(col("n"))).head().getInt(0) == 1,
      "old line path: every CJK doc is ONE giant line")
  }

  test("fused ScriptMinHashExpr equals the composed script-dispatch twin") {
    val fused = ScriptMinHashExpr.sigScriptAware(col("text"),
      TextOps.CjkAlphabet, DedupOps.ShingleN, ScriptDedupOps.CjkShingleN,
      DedupOps.NumHashes)
    val composed = when(TextOps.scriptOf(col("text")) === "cjk",
        MinHashSigExpr.sigNative(
          CharNgramsExpr.charNgramsDistinct(col("text"), ScriptDedupOps.CjkShingleN),
          DedupOps.NumHashes))
      .otherwise(MinHashFromTextExpr.sigFromText(col("text"),
        DedupOps.ShingleN, DedupOps.NumHashes))
    val diff = mixed.select(fused.as("f"), composed.as("c"))
      .filter(!(col("f") <=> col("c")))
    assert(diff.count() == 0)
  }

  test("recall: q218 finds CJK near-dup pairs, endpoints inside the CJK stratum") {
    val pairs = ScriptDedupOps.queries("q218_script_neardup")(spark, dir)
      .filter(col("script") === "cjk").collect()
    assert(pairs.nonEmpty, "the planted CJK near-dup pairs must surface")
    pairs.foreach { r =>
      assert(r.getAs[Long]("doc_a") % 3 == 0 && r.getAs[Long]("doc_b") % 3 == 0)
      assert(r.getAs[Long]("jac_bp") >= 5000L)
    }
  }

  test("recall: q219 sees cross-doc boilerplate inside the CJK stratum") {
    val dup = ScriptDedupOps.queries("q219_script_line_dedup")(spark, dir)
      .filter(col("doc_id") % 3 === 0 && col("n_dup_lines") > 0)
    assert(dup.count() > 0,
      "20-codepoint segmentation must expose shared CJK line content")
  }

  test("recall: q220 surfaces a CJK batch-vs-corpus near-dup (sf0.01)") {
    // sf0.001's batch stratum holds no CJK near-dup partner; the
    // sf0.01 fixture plants one (doc 267 % 10 = 7 vs doc 45)
    val pairs = ScriptDedupOps.queries("q220_script_setsim")(spark, "/root/testdata/sf0.01")
      .filter(col("doc_a") % 3 === 0 && col("doc_b") % 3 === 0)
    assert(pairs.count() > 0)
  }

  test("cross-script pairs are impossible: shingle character sets are disjoint") {
    val pairs = ScriptDedupOps.queries("q218_script_neardup")(spark, dir).collect()
    pairs.foreach { r =>
      val a3 = r.getAs[Long]("doc_a") % 3 == 0
      val b3 = r.getAs[Long]("doc_b") % 3 == 0
      assert(a3 == b3, "a verified pair never spans scripts")
      assert((r.getAs[String]("script") == "cjk") == a3)
    }
  }
}
