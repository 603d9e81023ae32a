package graft

import scala.math.BigDecimal.RoundingMode

import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.PcaOps

/** q176/q177's one-pass covariance + integer power iteration checked
  * against a plain-Scala reference on the REAL fixture dimensionality
  * (the rescale/tdiv ladder is where engines could diverge — the spec
  * replays it bit-for-bit), independent of the DuckDB oracle. */
class PcaSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  private val N = 40
  private val D = PcaOps.Dim

  private val rnd = new scala.util.Random(23)
  // planted dominant direction so convergence is visible: component 3
  // carries most variance
  private val vecs: Map[Long, List[Float]] =
    (0 until N).map { i =>
      val t = (rnd.nextFloat() - 0.5f) * 1.6f
      i.toLong -> List.tabulate(D)(d =>
        if (d == 3) t else (rnd.nextFloat() - 0.5f) * 0.2f)
    }.toMap

  private def emb: DataFrame =
    vecs.toSeq.sortBy(_._1).toDF("vec_id", "embedding")

  // --- reference implementation (plain Scala, no Spark) -------------------

  private def quant(v: List[Float]): Array[Long] =
    v.map(x => BigDecimal(x.toDouble * 1000)
      .setScale(0, RoundingMode.HALF_UP).toLong + 1000L).toArray

  private def tdiv(a: Long, b: Long): Long =
    if (a < 0) -((-a) / b) else a / b

  /** Final (v, w) after the rescaled power rounds. */
  private def reference(): (Array[Long], Array[Long]) = {
    val q = vecs.toSeq.sortBy(_._1).map { case (_, v) => quant(v) }
    val n = q.size.toLong
    val sx = Array.tabulate(D)(j => q.map(_(j)).sum)
    val cov = Array.tabulate(D, D) { (i, j) =>
      n * q.map(r => r(i) * r(j)).sum - sx(i) * sx(j)
    }
    val d = cov.flatten.map(math.abs).max / PcaOps.CellCap + 1
    val cs = cov.map(_.map(tdiv(_, d)))
    var v = Array.fill(D)(1000L)
    var w = Array.fill(D)(0L)
    for (_ <- 1 to PcaOps.PcaIters) {
      w = Array.tabulate(D)(i => (0 until D).map(j => cs(i)(j) * v(j)).sum)
      val m = math.max(w.map(math.abs).max, 1L)
      v = w.map(x => if (x < 0) -((math.abs(x) * 1000) / m) else (x * 1000) / m)
    }
    (v, w)
  }

  test("distributed covariance + power iteration matches the integer reference exactly") {
    val (refV, refW) = reference()
    val m = PcaOps.train(emb)
    assert(m.n == N.toLong)
    for (j <- 0 until D) {
      assert(m.v(j) == refV(j), s"v at dim ${j + 1}")
      assert(m.w(j) == refW(j), s"w at dim ${j + 1}")
    }
  }

  test("the trained component finds the planted dominant direction") {
    val (refV, _) = reference()
    val dominant = refV.zipWithIndex.maxBy { case (v, _) => math.abs(v) }._2
    assert(dominant == 3, s"expected planted dim 3, got $dominant")
    // L∞ normalization pins the peak at exactly ±1000 milli-units
    assert(math.abs(refV(dominant)) == 1000L)
    // off-direction mass is small relative to the peak
    val off = refV.zipWithIndex.collect { case (v, i) if i != dominant => math.abs(v) }.max
    assert(off < 500L, s"off-direction component $off")
  }

  test("training is independent of input row order") {
    val shuffled = vecs.toSeq.sortBy { case (id, _) => id.toString.hashCode }
      .toDF("vec_id", "embedding")
    def run(df: DataFrame): List[Long] = PcaOps.train(df).v.toList
    assert(run(emb) == run(shuffled))
  }
}
