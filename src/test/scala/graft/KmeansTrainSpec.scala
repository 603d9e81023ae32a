package graft

import scala.math.BigDecimal.RoundingMode

import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.SimilarityOps

/** q139's distributed integer-Lloyd loop checked against a 30-line
  * in-memory reference: same hash-ranked seeding, same quantization,
  * same truncated-mean updates — any divergence in the Spark plan
  * (wrong tie-break, unordered collect_list, lost empty cluster) shows
  * up as an integer mismatch here, independent of the DuckDB oracle. */
class KmeansTrainSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  private val N = 30
  private val DimT = 6
  private val K = 3
  private val Iters = 3

  private val rnd = new scala.util.Random(7)
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

  /** (cluster -> (n, minVec, maxVec, inertia, csum, cnorm2)) */
  private def reference(): Map[Long, (Long, Long, Long, Long, Long, Long)] = {
    val q = vecs.map { case (id, v) => id -> quant(v) }
    val seedIds = vecs.keys.toSeq
      .sortBy(id => (md5code60(s"km:$id"), id)).take(K)
    var cents: Map[Long, Array[Long]] =
      seedIds.zipWithIndex.map { case (id, c) => c.toLong -> q(id) }.toMap
    var assigned: Map[Long, (Long, Long)] = Map.empty // vec -> (cluster, d2)
    for (_ <- 1 to Iters) {
      assigned = q.map { case (id, x) =>
        val best = cents.toSeq.map { case (c, cv) =>
          (c, x.zip(cv).map { case (a, b) => (a - b) * (a - b) }.sum)
        }.minBy { case (c, d2) => (d2, c) }
        id -> (best._1, best._2)
      }
      cents = cents.map { case (c, old) =>
        val members = assigned.collect { case (id, (`c`, _)) => q(id) }.toSeq
        if (members.isEmpty) c -> old
        else c -> (0 until DimT).map(d =>
          members.map(_(d)).sum / members.size).toArray
      }
    }
    assigned.groupBy(_._2._1).map { case (c, m) =>
      val ids = m.keys
      c -> (m.size.toLong, ids.min, ids.max, m.values.map(_._2).sum,
        cents(c).sum, cents(c).map(v => v * v).sum)
    }
  }

  test("distributed Lloyd matches the in-memory integer reference exactly") {
    val got = SimilarityOps.kmeansTrain(emb, K, Iters).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6))).toMap
    val want = reference()
    assert(got == want, s"\ngot  $got\nwant $want")
    assert(got.values.map(_._1).sum == N.toLong)
    assert(got.keySet.subsetOf((0L until K).toSet))
  }

  test("training is deterministic across runs and independent of input order") {
    val a = SimilarityOps.kmeansTrain(emb, K, Iters).collect().toSeq
    val b = SimilarityOps.kmeansTrain(
      emb.orderBy($"vec_id".desc), K, Iters).collect().toSeq
    assert(a == b)
  }

  test("the trained codebook beats the first-k stand-in (inertia strictly lower)") {
    import org.apache.spark.sql.functions._
    // trained: sum of per-vector squared distances under the Lloyd
    // assignment (q139's inertia_q column)
    val trained = SimilarityOps.kmeansTrain(
      graft.engine.Tables.embeddings(spark, TestSpark.sfDir),
      SimilarityOps.NumCentroids, SimilarityOps.KmIters)
      .agg(sum(col("inertia_q"))).collect().head.getLong(0)
    // stand-in: the historical "first k vectors" codebook, scored on
    // the same quantized cells with the same argmin rule
    val q = SimilarityOps.quantized(
      graft.engine.Tables.embeddings(spark, TestSpark.sfDir))
    val standCents = q.filter(col("vec_id") < SimilarityOps.NumCentroids)
      .select(col("vec_id").as("cluster"), col("qvec").as("cvec"))
    val standIn = q.join(broadcast(standCents))
      .withColumn("d2", aggregate(
        zip_with(col("qvec"), col("cvec"), (x, c) => (x - c) * (x - c)),
        lit(0L), (acc, v) => acc + v))
      .groupBy("vec_id").agg(min(col("d2")).as("d2"))
      .agg(sum(col("d2"))).collect().head.getLong(0)
    assert(trained < standIn,
      s"trained inertia $trained must beat the first-k stand-in $standIn — " +
        "otherwise the codebook consumers gained nothing from training")
  }
}
