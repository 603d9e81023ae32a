package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.DedupOps

/** The exact set-similarity join (q190, SSJoin/PPJoin prefix filtering)
  * against its two ground truths: brute force on adversarial
  * micro-corpora, and the LSH pipeline it dominates (q41 answers the
  * SAME Jaccard-≥-0.5-on-shingles question through probabilistic band
  * collisions — every pair LSH finds, the exact join MUST find). */
class SetSimSpec extends AnyFunSuite {
  import TestSpark.{spark, sfDir}

  private def bruteForce(docs: org.apache.spark.sql.DataFrame,
      tBp: Long): Set[(Long, Long)] = {
    val tk = docs.select(col("doc_id"),
      explode(graft.plans.ShinglesExpr.shinglesNative(col("text"), DedupOps.ShingleN))
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
    assert(want.contains((1L, 3L)) && want.contains((1L, 2L)),
      "the planted near-dups must be present for the test to mean anything")
    assert(!want.exists(p => p._1 == 4L || p._2 == 4L),
      "the prefix-sharing below-threshold doc must verify-fail")
  }

  test("the exact join dominates LSH on the shared band (no >= t pair LSH found is missing)") {
    val exact = DedupOps.queries("q190_setsim_join")(spark, sfDir)
      .select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // q41 verifies at J >= 0.5 and publishes the exact Jaccard; on the
    // exact join's stricter >= 0.8 band every LSH find must be present
    val lsh = DedupOps.verifiedNearDupPairs(spark, sfDir)
      .filter(col("jac_bp") >= DedupOps.SetSimTBp)
      .select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(lsh.subsetOf(exact),
      s"LSH found pairs the exact join missed: ${lsh.diff(exact)}")
    assert(lsh.nonEmpty, "fixture must contain >= 0.8 near-dups for this to bite")
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
