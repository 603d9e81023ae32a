package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.DedupOps

/** q131 exact substring dedup: recall against planted verbatim runs,
  * no false pairs on disjoint text, the boilerplate df cap, and the
  * window-count arithmetic (a run of L >= W shared tokens yields exactly
  * L - W + 1 shared W-windows). */
class SubstringDedupSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  private def doc(id: Long, words: Seq[String]) = (id, words.mkString(" "))

  private def pairs(docs: Seq[(Long, String)], w: Int, dfCap: Int = DedupOps.SubstrDfCap) =
    DedupOps.substringDupPairs(docs.toDF("doc_id", "text"), w, dfCap)
      .select($"doc_a", $"doc_b", $"n_hits", $"n_windows", $"first_a", $"first_b")
      .as[(Long, Long, Long, Long, Int, Int)]
      .collect().sortBy(p => (p._1, p._2)).toSeq

  private def words(prefix: String, n: Int): Seq[String] =
    (0 until n).map(i => s"$prefix$i")

  test("a planted L-token copy is found with exactly L-W+1 shared windows") {
    val run = words("shared", 25)
    val a = doc(1, words("a", 10) ++ run ++ words("x", 10))
    val b = doc(2, words("b", 5) ++ run ++ words("y", 15))
    val c = doc(3, words("c", 40)) // disjoint
    val got = pairs(Seq(a, b, c), w = 20)
    // 25-token run, W=20: windows at run offsets 0..5 on both sides
    assert(got == Seq((1L, 2L, 6L, 6L, 11, 6)),
      s"expected the planted pair with 25-20+1=6 windows, got $got")
  }

  test("overlap strictly shorter than W is invisible") {
    val run = words("shared", 19)
    val a = doc(1, words("a", 10) ++ run ++ words("x", 10))
    val b = doc(2, words("b", 10) ++ run ++ words("y", 10))
    assert(pairs(Seq(a, b), w = 20).isEmpty)
  }

  test("repeated window inside one doc multiplies hits, not windows") {
    val run = words("shared", 20)
    val a = doc(1, run) // exactly one window
    val b = doc(2, run ++ words("mid", 5) ++ run) // the same window twice
    val got = pairs(Seq(a, b), w = 20)
    // doc_b holds the window at pos 1 and pos 26 -> two position hits,
    // one distinct window; first_b is the earlier occurrence
    assert(got == Seq((1L, 2L, 2L, 1L, 1, 1)), s"got $got")
  }

  test("df cap drops corpus-common boilerplate, keeps pairwise copies") {
    val boiler = words("license", 20)
    val priv = words("secret", 20)
    // 5 docs share the boilerplate run; docs 1 and 2 ALSO share a
    // private run. With dfCap=4 the boilerplate window (df=5) is
    // dropped, so only the private pair survives.
    val docs = (1L to 5L).map { i =>
      val own = if (i <= 2) priv else words(s"own$i", 20)
      doc(i, boiler ++ words(s"f$i", 3) ++ own)
    }
    val got = pairs(docs, w = 20, dfCap = 4)
    assert(got == Seq((1L, 2L, 1L, 1L, 24, 24)), s"got $got")
    // with the cap lifted, all 10 boilerplate pairs (plus the private
    // window on the 1-2 pair) appear
    val uncapped = pairs(docs, w = 20, dfCap = 64)
    assert(uncapped.size == 10)
    assert(uncapped.find(p => p._1 == 1L && p._2 == 2L).exists(_._4 == 2L))
  }

  test("sf0.001 corpus: every reported pair truly shares a verbatim W-token run") {
    val docs = graft.engine.Tables.documents(spark, TestSpark.sfDir)
      .select($"doc_id", $"text").as[(Long, String)].collect().toMap
    val got = pairs(docs.toSeq.map { case (id, t) => (id, t) }, w = DedupOps.SubstrWindow)
    assert(got.nonEmpty, "expected some substring dups in the synthetic corpus")
    got.foreach { case (da, db, _, _, fa, fb) =>
      val wa = docs(da).split(" ").slice(fa - 1, fa - 1 + DedupOps.SubstrWindow)
      val wb = docs(db).split(" ").slice(fb - 1, fb - 1 + DedupOps.SubstrWindow)
      assert(wa.sameElements(wb), s"pair ($da,$db) first windows differ")
    }
  }
}
