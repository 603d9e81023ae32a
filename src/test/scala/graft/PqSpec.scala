package graft

import scala.math.BigDecimal.RoundingMode

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.PqOps

/** q174/q175's per-subspace integer Lloyd + ADC search checked against a
  * plain-Scala reference: same hash-ranked seeding, same milli-unit
  * quantization, same truncated-mean updates, same M-lookup distance
  * sums — any divergence in the distributed plan (wrong per-sub
  * tie-break, lost empty code, probe not excluded) shows up as an
  * integer mismatch here, independent of the DuckDB oracle. */
class PqSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  private val N = 24
  private val DimT = 8
  private val MT = 2
  private val SubT = DimT / MT
  private val KT = 3
  private val Iters = 2

  private val rnd = new scala.util.Random(11)
  private val vecs: Map[Long, List[Float]] =
    (0 until N).map(i => i.toLong -> List.fill(DimT)((rnd.nextFloat() - 0.5f) * 1.8f)).toMap

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

  /** Per-sub codebooks and final assignment:
    * (cents (sub, code) -> cells, codes (vec, sub) -> (code, d2)). */
  private def reference(): (Map[(Long, Long), Array[Long]], Map[(Long, Long), (Long, Long)]) = {
    val q = vecs.map { case (id, v) => id -> quant(v) }
    def subv(id: Long, s: Int): Array[Long] =
      q(id).slice(s * SubT, (s + 1) * SubT)
    val seedIds = vecs.keys.toSeq
      .sortBy(id => (md5code60(s"pq:$id"), id)).take(KT)
    var cents: Map[(Long, Long), Array[Long]] =
      (for (s <- 0 until MT; (id, c) <- seedIds.zipWithIndex)
        yield (s.toLong, c.toLong) -> subv(id, s)).toMap
    var codes: Map[(Long, Long), (Long, Long)] = Map.empty
    for (_ <- 1 to Iters) {
      codes = (for (id <- vecs.keys.toSeq; s <- 0 until MT) yield {
        val x = subv(id, s)
        val best = (0 until KT).map { c =>
          val cv = cents((s.toLong, c.toLong))
          (c.toLong, x.zip(cv).map { case (a, b) => (a - b) * (a - b) }.sum)
        }.minBy { case (c, d2) => (d2, c) }
        (id, s.toLong) -> best
      }).toMap
      cents = cents.map { case ((s, c), old) =>
        val members = codes.collect {
          case ((id, `s`), (`c`, _)) => subv(id, s.toInt)
        }.toSeq
        if (members.isEmpty) (s, c) -> old
        else (s, c) -> (0 until SubT).map { d =>
          members.map(_(d)).sum / members.size // truncated mean (sum div n)
        }.toArray
      }
    }
    (cents, codes)
  }

  test("distributed per-subspace Lloyd matches the in-memory reference exactly") {
    val (refCents, refCodes) = reference()
    val (cents, assigned) = PqOps.pqFit(emb, MT, SubT, KT, Iters)
    val gotCents = cents.collect().map { r =>
      (r.getLong(0), r.getLong(1)) -> r.getSeq[Long](2).toArray
    }.toMap
    assert(gotCents.keySet == refCents.keySet)
    for ((k, v) <- refCents)
      assert(gotCents(k).toList == v.toList, s"centroid $k")
    val gotCodes = assigned.select("vec_id", "sub", "code", "d2").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3))).toMap
    assert(gotCodes == refCodes)
  }

  test("ADC distance is exactly the sum of per-subspace table distances") {
    val (refCents, refCodes) = reference()
    val q = vecs.map { case (id, v) => id -> quant(v) }
    def subv(id: Long, s: Int): Array[Long] =
      q(id).slice(s * SubT, (s + 1) * SubT)
    val probeIds = Seq(0L, 1L)
    val expected = (for (qid <- probeIds; id <- vecs.keys.toSeq if id != qid) yield {
      val adist = (0 until MT).map { s =>
        val code = refCodes((id, s.toLong))._1
        val cv = refCents((s.toLong, code))
        subv(qid, s).zip(cv).map { case (a, b) => (a - b) * (a - b) }.sum
      }.sum
      (qid, id) -> adist
    }).toMap
    val (cents, assigned) = PqOps.pqFit(emb, MT, SubT, KT, Iters)
    val probes = PqOps.subvecs(emb.filter(col("vec_id") < 2), MT, SubT)
    val got = PqOps.adcSearch(cents, assigned, probes, topK = N).collect()
      .map(r => (r.getLong(0), r.getLong(2)) -> r.getLong(3)).toMap
    assert(got.size == probeIds.size * (N - 1), "probe excluded, all others ranked")
    for ((k, v) <- got) assert(expected(k) == v, s"adist $k")
  }

  test("training is deterministic and independent of input row order") {
    val shuffled = vecs.toSeq.sortBy { case (id, _) => md5code60(s"shuf:$id") }
      .toDF("vec_id", "embedding")
    val a = PqOps.pqFit(emb, MT, SubT, KT, Iters)._1.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getSeq[Long](2).toList)).sortBy(t => (t._1, t._2))
    val b = PqOps.pqFit(shuffled, MT, SubT, KT, Iters)._1.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getSeq[Long](2).toList)).sortBy(t => (t._1, t._2))
    assert(a.toList == b.toList)
  }
}
