package graft

import scala.math.BigDecimal.RoundingMode

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.IvfPqOps

/** q181/q182's IVFADC composition checked against a plain-Scala
  * reference on a planted-cluster geometry: same coarse argmin with
  * lower-cluster tie-break, same +2000 residual re-offset, same
  * hash-ranked residual-PQ seeding and truncated-mean rounds, same
  * probed-cell containment and M-lookup ADC sums. Any divergence in the
  * composed distributed plan (residual against the wrong cell, a
  * candidate scored from an unprobed list, an offset dropped on one
  * side) shows up as an integer mismatch, independent of DuckDB. */
class IvfPqSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  private val N = 24
  private val DimT = 8
  private val MT = 2
  private val SubT = DimT / MT
  private val KsubT = 3
  private val Iters = 2
  private val CK = 3 // coarse cells
  private val NProbe = 2

  // Planted geometry: three well-separated centers; vector i sits near
  // center i % 3 (noise an order of magnitude below the separation).
  private val centers: Map[Int, List[Float]] = Map(
    0 -> List.fill(DimT)(0.5f),
    1 -> List.fill(DimT)(-0.5f),
    2 -> (0 until DimT).map(d => if (d % 2 == 0) 0.5f else -0.5f).toList)
  private val rnd = new scala.util.Random(42)
  private val vecs: Map[Long, List[Float]] =
    (0 until N).map { i =>
      i.toLong -> centers(i % 3).map(c => c + (rnd.nextFloat() - 0.5f) * 0.1f)
    }.toMap

  private def emb: DataFrame =
    vecs.toSeq.sortBy(_._1).toDF("vec_id", "embedding")

  // --- reference implementation (plain Scala, no Spark) -------------------

  private def md5code60(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    java.lang.Long.parseLong(d.map("%02x".format(_)).mkString.take(15), 16)
  }

  private def quant(v: List[Float]): Array[Long] =
    v.map(x => BigDecimal(x.toDouble * 1000)
      .setScale(0, RoundingMode.HALF_UP).toLong + 1000L).toArray

  private def d2(a: Array[Long], b: Array[Long]): Long =
    a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum

  private val q: Map[Long, Array[Long]] =
    vecs.map { case (id, v) => id -> quant(v) }
  private val ccents: Map[Long, Array[Long]] =
    centers.map { case (c, v) => c.toLong -> quant(v) }

  private def cellsDf: DataFrame =
    ccents.toSeq.sortBy(_._1).map { case (c, v) => (c, v.toSeq) }
      .toDF("cluster", "cvec")

  private def coarse(id: Long): Long =
    ccents.keys.toSeq.map(c => (c, d2(q(id), ccents(c)))).minBy { case (c, d) => (d, c) }._1

  private def resid(x: Array[Long], cell: Long): Array[Long] =
    x.zip(ccents(cell)).map { case (a, c) => a - c + IvfPqOps.ROff }

  private def subv(r: Array[Long], s: Int): Array[Long] =
    r.slice(s * SubT, (s + 1) * SubT)

  /** Residual-PQ reference: (cents (sub, code) -> cells,
    * codes (vec, sub) -> (code, d2), cell map vec -> cluster). */
  private def reference(): (Map[(Long, Long), Array[Long]],
      Map[(Long, Long), (Long, Long)], Map[Long, Long]) = {
    val cellOf = vecs.keys.map(id => id -> coarse(id)).toMap
    val rq = vecs.keys.map(id => id -> resid(q(id), cellOf(id))).toMap
    val seedIds = vecs.keys.toSeq
      .sortBy(id => (md5code60(s"ivfpq:$id"), id)).take(KsubT)
    var cents: Map[(Long, Long), Array[Long]] =
      (for (s <- 0 until MT; (id, c) <- seedIds.zipWithIndex)
        yield (s.toLong, c.toLong) -> subv(rq(id), s)).toMap
    var codes: Map[(Long, Long), (Long, Long)] = Map.empty
    for (_ <- 1 to Iters) {
      codes = (for (id <- vecs.keys.toSeq; s <- 0 until MT) yield {
        val x = subv(rq(id), s)
        val best = (0 until KsubT).map { c =>
          (c.toLong, d2(x, cents((s.toLong, c.toLong))))
        }.minBy { case (c, d) => (d, c) }
        (id, s.toLong) -> best
      }).toMap
      cents = cents.map { case ((s, c), old) =>
        val members = codes.collect {
          case ((id, `s`), (`c`, _)) => subv(rq(id), s.toInt)
        }.toSeq
        if (members.isEmpty) (s, c) -> old
        else (s, c) -> (0 until SubT).map { d =>
          members.map(_(d)).sum / members.size // truncated mean (sum div n)
        }.toArray
      }
    }
    (cents, codes, cellOf)
  }

  /** Reference ADC over probed cells: (qid, vec) -> (cell, adist) for
    * every candidate whose cell is among qid's NProbe nearest. */
  private def referenceSearch(probeIds: Seq[Long]): Map[(Long, Long), (Long, Long)] = {
    val (cents, codes, cellOf) = reference()
    (for (qid <- probeIds) yield {
      val probedCells = ccents.keys.toSeq
        .map(c => (c, d2(q(qid), ccents(c)))).sortBy { case (c, d) => (d, c) }
        .take(NProbe).map(_._1)
      for {
        id <- vecs.keys.toSeq if id != qid
        cell = cellOf(id) if probedCells.contains(cell)
      } yield {
        val rquery = resid(q(qid), cell)
        val adist = (0 until MT).map { s =>
          val code = codes((id, s.toLong))._1
          d2(subv(rquery, s), cents((s.toLong, code)))
        }.sum
        (qid, id) -> (cell, adist)
      }
    }).flatten.toMap
  }

  test("residual-PQ training matches the in-memory reference exactly") {
    val (refCents, refCodes, refCells) = reference()
    val (pqc, codes, assigned) =
      IvfPqOps.ivfpqFit(emb, cellsDf, MT, SubT, KsubT, Iters)
    val gotCents = pqc.collect().map { r =>
      (r.getLong(0), r.getLong(1)) -> r.getSeq[Long](2).toArray
    }.toMap
    assert(gotCents.keySet == refCents.keySet)
    for ((k, v) <- refCents)
      assert(gotCents(k).toList == v.toList, s"residual centroid $k")
    val gotCodes = assigned.select("vec_id", "sub", "code", "d2").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3))).toMap
    assert(gotCodes == refCodes)
    val gotCells = codes.select("vec_id", "cluster").distinct().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(gotCells == refCells)
  }

  test("ADC search scores exactly the probed-cell candidates, bit-for-bit") {
    val probeIds = Seq(0L, 1L, 2L)
    val expected = referenceSearch(probeIds)
    val got = IvfPqOps.ivfpqSearch(emb, cellsDf,
        emb.filter(col("vec_id") < 3), NProbe, topK = N,
        MT, SubT, KsubT, Iters)
      .collect().map(r => (r.getLong(0), r.getLong(2)) -> (r.getLong(3), r.getLong(4)))
      .toMap
    // keyset equality IS the containment proof: nothing outside the
    // probed cells is scored, nothing inside is missed
    assert(got.keySet == expected.keySet)
    for ((k, v) <- expected) assert(got(k) == v, s"candidate $k")
  }

  test("planted twin surfaces at rank 1 within the probe's own cell") {
    val res = IvfPqOps.ivfpqSearch(emb, cellsDf,
        emb.filter(col("vec_id") < 3), NProbe, topK = 1,
        MT, SubT, KsubT, Iters)
      .collect().map(r => r.getLong(0) -> (r.getLong(2), r.getLong(3))).toMap
    for (qid <- 0L until 3L) {
      val (top1, cell) = res(qid)
      assert(top1 % 3 == qid % 3, s"probe $qid top-1 from its planted cluster")
      assert(cell == coarse(qid), s"probe $qid top-1 served from its own cell")
    }
  }
}
