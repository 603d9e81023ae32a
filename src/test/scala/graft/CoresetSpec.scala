package graft

import scala.math.BigDecimal.RoundingMode

import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.CoresetOps

/** q179's k-Center-Greedy selection checked against a plain-Scala
  * reference on the real fixture dimensionality — the argmax/tie-break
  * ladder is where engines could diverge; the spec replays it
  * bit-for-bit, independent of the DuckDB oracle. */
class CoresetSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  private val N = 50
  private val D = CoresetOps.Dim

  private val rnd = new scala.util.Random(41)
  // three planted clusters far apart (dims 0/1 carry the separation) so
  // greedy selection visibly hops between clusters before refining
  private val vecs: Map[Long, List[Float]] =
    (0 until N).map { i =>
      val cluster = i % 3
      val cx = Array(-0.8f, 0.0f, 0.8f)(cluster)
      i.toLong -> List.tabulate(D)(d =>
        if (d == 0) cx + (rnd.nextFloat() - 0.5f) * 0.05f
        else if (d == 1) cx * 0.5f + (rnd.nextFloat() - 0.5f) * 0.05f
        else (rnd.nextFloat() - 0.5f) * 0.05f)
    }.toMap

  private def emb: DataFrame =
    vecs.toSeq.sortBy(_._1).toDF("vec_id", "embedding")

  private def quant(v: List[Float]): Array[Long] =
    v.map(x => BigDecimal(x.toDouble * 1000)
      .setScale(0, RoundingMode.HALF_UP).toLong + 1000L).toArray

  /** Plain-Scala k-center greedy, identical tie-breaks. */
  private def reference(rounds: Int): Seq[(Long, Long, Long)] = {
    val q = vecs.toSeq.sortBy(_._1).map { case (id, v) => id -> quant(v) }
    def d2(a: Array[Long], b: Array[Long]): Long =
      (0 until D).map(j => (a(j) - b(j)) * (a(j) - b(j))).sum
    var centers = Vector(q.head._2)
    var picked = Vector((1L, q.head._1, 0L))
    for (r <- 2 to rounds + 1) {
      val (id, dist) = q.map { case (id, v) =>
        id -> centers.map(c => d2(v, c)).min
      }.maxBy { case (id, d) => (d, -id) } // max dist, smallest id on ties
      picked :+= ((r.toLong, id, dist))
      centers :+= q.find(_._1 == id).get._2
    }
    picked
  }

  test("distributed greedy selection matches the integer reference exactly") {
    val ref = reference(CoresetOps.CoresetRounds)
    val got = CoresetOps.kCenterGreedy(emb, CoresetOps.CoresetRounds)
    assert(got == ref)
  }

  test("the selection covers the planted clusters before refining") {
    val ref = reference(CoresetOps.CoresetRounds)
    // the first three picks must land in three DIFFERENT planted
    // clusters — the farthest-first property on well-separated data
    val firstThree = ref.take(3).map { case (_, id, _) => id % 3 }.toSet
    assert(firstThree.size == 3, s"picks ${ref.take(3)}")
    // the objective trace is nonincreasing after the seed (each pick's
    // min-distance can only shrink as the selected set grows)
    val ds = ref.drop(1).map(_._3)
    assert(ds == ds.sorted.reverse, s"distances $ds")
  }

  test("selection is independent of input row order") {
    val shuffled = vecs.toSeq.sortBy { case (id, _) => id.toString.hashCode }
      .toDF("vec_id", "embedding")
    assert(CoresetOps.kCenterGreedy(shuffled, CoresetOps.CoresetRounds) ==
      CoresetOps.kCenterGreedy(emb, CoresetOps.CoresetRounds))
  }

  test("q184 prototype pruning: exact keep quota, hardness dominance, total coverage") {
    val dir = TestSpark.sfDir
    val rows = CoresetOps.queries("q184_prototype_pruning")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getString(5)))
    // every corpus vector verdicted exactly once
    val n = graft.engine.Tables.embeddings(spark, dir).count()
    assert(rows.length.toLong == n && rows.map(_._1).distinct.length.toLong == n)
    rows.groupBy(_._2).foreach { case (cl, members) =>
      val csz = members.head._5
      assert(csz == members.length.toLong, s"csz must be the cluster size: $cl")
      // keep quota is exactly floor(csz * KeepPct / 100)
      val kept = members.filter(_._6 == "keep")
      assert(kept.length.toLong == csz * CoresetOps.KeepPct / 100,
        s"cluster $cl keep quota")
      // dominance: every kept example is at least as hard (far from the
      // prototype) as every dropped one
      val dropped = members.filter(_._6 == "drop")
      if (kept.nonEmpty && dropped.nonEmpty)
        assert(kept.map(_._3).min >= dropped.map(_._3).max,
          s"cluster $cl hardness dominance")
    }
  }
}
