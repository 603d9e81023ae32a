package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.VectorFunctions._
import graft.plans.FloatVectorDot

class VectorSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  /** Deterministic pseudo-random vectors (seeded) — property-style checks
    * without an extra test dependency. */
  private val rnd = new scala.util.Random(42)
  private def vec(): List[Float] = List.fill(8)((rnd.nextFloat() - 0.5f) * 20f)
  private val samples: Seq[(List[Float], List[Float])] = Seq.fill(25)((vec(), vec()))

  test("native FloatVectorDot is bit-identical to the HOF dot product") {
    val df = samples.toDF("a", "b")
    df.select(
      dot(col("a"), col("b")).as("hof"),
      FloatVectorDot.dotNative(col("a"), col("b")).as("native"))
      .collect()
      .foreach(r => assert(java.lang.Double.compare(r.getDouble(0), r.getDouble(1)) == 0))
  }

  test("mismatched-length vectors yield null in BOTH the HOF and the native expression") {
    // HOF: zip_with null-pads the shorter side, the null poisons the
    // aggregate; the native expression must agree, never silently
    // truncate to min(n) — in interpreted AND codegen paths
    val df = Seq((List(1f, 2f, 3f), List(1f, 2f))).toDF("a", "b")
    val r = df.select(
      dot(col("a"), col("b")).as("hof"),
      FloatVectorDot.dotNative(col("a"), col("b")).as("native"))
      .collect().head
    assert(r.isNullAt(0) && r.isNullAt(1))
  }

  test("cosine(v, v) ~ 1; cosine symmetric and within [-1, 1]") {
    val df = samples.toDF("a", "b")
    df.select(
      cosine(col("a"), col("a")).as("aa"),
      cosine(col("a"), col("b")).as("ab"),
      cosine(col("b"), col("a")).as("ba"))
      .collect()
      .foreach { r =>
        assert(math.abs(r.getDouble(0) - 1.0) < 1e-9)
        assert(math.abs(r.getDouble(1) - r.getDouble(2)) < 1e-12)
        assert(r.getDouble(1) >= -1.0 - 1e-9 && r.getDouble(1) <= 1.0 + 1e-9)
      }
  }

  test("l2Sq(v, v) == 0 and l2Sq >= 0") {
    val df = samples.toDF("a", "b")
    df.select(l2Sq(col("a"), col("a")).as("same"), l2Sq(col("a"), col("b")).as("diff"))
      .collect()
      .foreach { r =>
        assert(r.getDouble(0) == 0.0)
        assert(r.getDouble(1) >= 0.0)
      }
  }

  test("native expression survives codegen on a real table scan") {
    val emb = graft.engine.Tables.embeddings(spark, TestSpark.sfDir).limit(20)
    val both = emb.select(
      dot(col("embedding"), col("embedding")).as("hof"),
      FloatVectorDot.dotNative(col("embedding"), col("embedding")).as("native"))
      .collect()
    assert(both.nonEmpty)
    both.foreach(r => assert(r.getDouble(0) == r.getDouble(1)))
  }

  test("q194: recall@k covers every probe, bounded, and matches a direct intersection") {
    import graft.operators.SimilarityOps
    val r = SimilarityOps.queries("q194_ann_recall")(spark, TestSpark.sfDir).collect()
    assert(r.length == SimilarityOps.NumProbes, "one row per probe")
    r.foreach { row =>
      val hits = row.getAs[Long]("hits")
      assert(hits >= 0 && hits <= SimilarityOps.TopK)
      assert(row.getAs[Long]("recall_bp") == hits * 10000 / SimilarityOps.TopK)
    }
    // cross-check one probe against a hand intersection of the two queries
    def pairs(q: String) = SimilarityOps.queries(q)(spark, TestSpark.sfDir)
      .select("probe_id", "cand_id").collect()
      .map(x => (x.getLong(0), x.getLong(1))).toSet
    val direct = pairs("q44_cosine_topk").intersect(pairs("q48_ivf_ann"))
      .groupBy(_._1).view.mapValues(_.size.toLong).toMap
    r.foreach(row => assert(
      row.getAs[Long]("hits") == direct.getOrElse(row.getAs[Long]("probe_id"), 0L)))
  }
}
