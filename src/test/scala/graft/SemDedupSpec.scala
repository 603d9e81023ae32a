package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.SimilarityOps

/** SemDeDup's scale guarantee is parameterization, not luck: the centroid
  * count is session-tunable (k ∝ N per the paper) and a hard cluster-size
  * cap bounds the within-cluster all-pairs stage even when a codebook is
  * badly skewed — the worst case being every vector assigned to ONE
  * cluster, which un-capped is the full corpus quadratic. */
class SemDedupSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  private val N = 40

  /** 5 near-orthogonal direction groups of 8 identical vectors each:
    * in-group cosine = 1 (dup pairs), cross-group cosine = 0 (< tau). */
  private def emb: DataFrame = (0 until N).map { i =>
    val v = Array.fill(10)(0f); v(i % 5) = 1f
    (i.toLong, v.toList)
  }.toDF("vec_id", "embedding")

  /** One-centroid codebook — maximal skew: everything lands in cluster 0. */
  private def hotCodebook: DataFrame =
    Seq((0L, List.fill(10)(1f))).toDF("cluster", "centroid")

  private def verdicts(cap: Int): Map[Long, (String, Long)] =
    SimilarityOps.semanticDedup(emb, hotCodebook, tau = 0.3, clusterCap = cap)
      .collect().map(r => r.getLong(0) -> ((r.getString(2), r.getLong(3)))).toMap

  test("a skewed codebook's hot cluster is sub-split into bounded shards") {
    val assigned = emb.withColumn("cluster", lit(0L))
    val shards = SimilarityOps.shardClusters(assigned, clusterCap = 10)
      .groupBy("cluster", "sub").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getLong(1) -> r.getLong(2)).toMap
    // 40 rows / cap 10 → exactly ⌈40/10⌉ = 4 shards, all populated
    assert(shards.keySet == Set(0L, 1L, 2L, 3L), s"got $shards")
    assert(shards.values.sum == N.toLong)
    // hash split is even enough that no shard exceeds 2×cap — so the
    // pair stage generates at most Σ nᵢ² ≪ N² candidate rows
    assert(shards.values.max <= 20L, s"got $shards")
    val pairBound = shards.values.map(n => n * n).sum
    assert(pairBound < N.toLong * N, s"pair work $pairBound not sub-quadratic")
    // under-cap clusters keep the identity shard
    val one = SimilarityOps.shardClusters(assigned, clusterCap = N)
      .select("sub").distinct().as[Long].collect().toSeq
    assert(one == Seq(0L))
  }

  test("capped dedup only loses recall, never invents pairs; uncapped is exact") {
    val exact = verdicts(cap = N)
    // uncapped on the hot cluster IS full SemDeDup: each group of 8
    // identical vectors keeps its lowest id and drops the other 7
    assert(exact.count(_._2._1 == "drop") == N - 5)
    (0 until 5).foreach { g =>
      val ids = (0 until N).filter(_ % 5 == g).map(_.toLong)
      assert(exact(ids.head)._1 == "keep")
      ids.tail.foreach(i => assert(exact(i) == ("drop", ids.head)))
    }
    val capped = verdicts(cap = 10)
    // every capped drop exists uncapped (subset — shards can only HIDE
    // pairs), and any surviving drop points at a true duplicate
    capped.foreach { case (id, (v, dupOf)) =>
      if (v == "drop") {
        assert(exact(id)._1 == "drop", s"vec $id: capped invented a drop")
        assert(dupOf % 5 == id % 5 && dupOf < id, s"vec $id → $dupOf not a dup")
      }
    }
    assert(capped.count(_._2._1 == "drop") <= exact.count(_._2._1 == "drop"))
  }
}
