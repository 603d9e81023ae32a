package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.DedupOps

/** The exact set-similarity join (q190, SSJoin/PPJoin prefix filtering)
  * against brute-force ground truth: adversarial micro-corpora AND the
  * full fixture — prefix filtering must lose nothing, which is exactly
  * the guarantee the probabilistic LSH path (q41) cannot give. */
class SetSimSpec extends AnyFunSuite {
  import TestSpark.{spark, sfDir}

  private def bruteForce(docs: org.apache.spark.sql.DataFrame,
      tBp: Long): Set[(Long, Long)] = {
    // mirror the operator's exact-dup canonicalization
    val canon = docs.groupBy(col("text")).agg(min(col("doc_id")).as("doc_id"))
    val tk = canon.select(col("doc_id"),
      explode(graft.plans.ShinglesExpr.shinglesNative(col("text"), DedupOps.SetSimShingleN))
        .as("token"))
    val sz = tk.groupBy("doc_id").agg(count(lit(1)).as("m"))
    tk.as("a").join(tk.as("b"),
        col("a.token") === col("b.token") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("inter"))
      .join(sz.select(col("doc_id").as("doc_a"), col("m").as("ma")), "doc_a")
      .join(sz.select(col("doc_id").as("doc_b"), col("m").as("mb")), "doc_b")
      .filter(col("inter") * 10000 >= (col("ma") + col("mb") - col("inter")) * tBp)
      .select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
  }

  test("prefix filtering equals brute force on an adversarial micro-corpus") {
    import spark.implicits._
    // crafted shapes: near-identical pair (one token appended), an
    // identical pair, a prefix-sharing pair BELOW threshold (shares its
    // rarest shingles but diverges after), disjoint docs, and a doc too
    // short to shingle — candidates that must verify-fail, pairs that
    // must be found, and noise that must not pair
    val docs = Seq(
      1L -> "alpha beta gamma delta epsilon zeta eta theta",
      2L -> "alpha beta gamma delta epsilon zeta eta theta iota",
      3L -> "alpha beta gamma delta epsilon zeta eta theta",
      4L -> "alpha beta gamma nine ten eleven twelve thirteen fourteen fifteen",
      5L -> "one two three four five six seven eight",
      6L -> "tiny doc"
    ).toDF("doc_id", "text")
    val got = DedupOps.setSimJoin(docs)
      .select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val want = bruteForce(docs, DedupOps.SetSimTBp)
    assert(got == want, s"exact join diverged: got $got want $want")
    assert(want.contains((1L, 2L)),
      "the planted near-dup must be present for the test to mean anything")
    assert(!got.exists(p => p._1 == 3L || p._2 == 3L),
      "byte-identical clones collapse to their canonical before the join")
    assert(!want.exists(p => p._1 == 4L || p._2 == 4L),
      "the prefix-sharing below-threshold doc must verify-fail")
  }

  test("the exact join equals brute force on the fixture (completeness, not sampling)") {
    // the full-corpus ground truth: every canonical pair sharing >= 1
    // five-shingle, exact Jaccard, threshold — the exact join must
    // reproduce it completely (this is the guarantee LSH cannot give;
    // the DuckDB oracle re-proves it at every gate scale)
    val exact = DedupOps.queries("q190_setsim_join")(spark, sfDir)
      .select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val want = bruteForce(graft.engine.Tables.documents(spark, sfDir),
      DedupOps.SetSimTBp)
    assert(exact == want, s"diverged: missing ${want.diff(exact)}, " +
      s"extra ${exact.diff(want)}")
  }

  test("jaccard output is threshold-consistent and symmetric-free") {
    val r = DedupOps.queries("q190_setsim_join")(spark, sfDir).collect()
    r.foreach { row =>
      val (a, b) = (row.getAs[Long]("doc_a"), row.getAs[Long]("doc_b"))
      assert(a < b, "pairs must be canonical (doc_a < doc_b)")
      assert(row.getAs[Long]("jacc_bp") >= DedupOps.SetSimTBp)
      val inter = row.getAs[Long]("inter")
      assert(inter <= math.min(row.getAs[Long]("size_a"), row.getAs[Long]("size_b")))
    }
  }
}
