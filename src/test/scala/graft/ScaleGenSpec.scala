package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.GraftFunctions.shingleSet
import graft.functions.VectorFunctions.normSq
import graft.tools.ScaleGen

/** The sf1/sf10 scale evidence is only as good as the tiling's claimed
  * isomorphisms — this spec pins them on a 3-copy tile of sf0.001:
  * vocabulary rotation preserves within-copy shingle structure exactly
  * while killing cross-copy duplication, and the orthogonal embedding
  * transform preserves norms bit-for-bit. */
class ScaleGenSpec extends AnyFunSuite {
  import TestSpark.{spark, sfDir}

  private lazy val dst = {
    val d = Files.createTempDirectory("scalegen")
    d.toFile.deleteOnExit()
    ScaleGen.run(spark, sfDir, d.toString, 3)
    d.toString
  }

  test("tiled tables have exactly copies× rows and intact referential integrity") {
    val docs0 = spark.read.parquet(s"$sfDir/documents.parquet")
    val docs = spark.read.parquet(s"$dst/documents.parquet")
    assert(docs.count() == 3 * docs0.count())
    assert(docs.select("doc_id").distinct().count() == docs.count())
    val li = spark.read.parquet(s"$dst/lineitem.parquet")
    val orphans = li.join(spark.read.parquet(s"$dst/orders.parquet"),
      col("l_orderkey") === col("o_orderkey"), "left_anti").count()
    assert(orphans == 0, "every tiled lineitem row must keep its order")
  }

  test("vocabulary rotation preserves within-copy shingle-set sizes exactly") {
    val src = spark.read.parquet(s"$sfDir/documents.parquet")
    val n = src.count()
    val tiled = spark.read.parquet(s"$dst/documents.parquet")
    // copy 1 of doc d is doc_id = d + n; a word-level bijection maps
    // shingle sets bijectively, so per-doc distinct-shingle counts match
    val a = src.select(col("doc_id"),
      size(shingleSet(col("text"), 3)).as("s0"))
    val b = tiled.filter(col("doc_id") >= n && col("doc_id") < 2 * n)
      .select((col("doc_id") - n).as("doc_id"),
        size(shingleSet(col("text"), 3)).as("s1"))
    assert(a.join(b, "doc_id").filter(col("s0") =!= col("s1")).count() == 0)
    // and copy 0 is the identity
    val c0 = tiled.filter(col("doc_id") < n)
      .select(col("doc_id"), col("text").as("t1"))
    assert(src.join(c0, "doc_id").filter(col("text") =!= col("t1")).count() == 0)
  }

  test("cross-copy texts differ (no planted exact-duplicate cliques)") {
    val src = spark.read.parquet(s"$sfDir/documents.parquet")
    val n = src.count()
    val tiled = spark.read.parquet(s"$dst/documents.parquet")
    val c1 = tiled.filter(col("doc_id") >= n && col("doc_id") < 2 * n)
      .select((col("doc_id") - n).as("doc_id"), col("text").as("t1"))
    // multi-word docs must change under the rotation (single-word docs
    // could map to themselves only if the rotation fixes that word —
    // the shift is 3 per copy, never 0 mod vocab for copy 1)
    val same = src.join(c1, "doc_id").filter(col("text") === col("t1")).count()
    assert(same == 0, s"$same docs identical across copies")
  }

  test("embedding transform preserves norms bit-for-bit and decorrelates copies") {
    val src = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val n = src.count()
    val tiled = spark.read.parquet(s"$dst/embeddings.parquet")
    val a = src.select(col("vec_id"), normSq(col("embedding")).as("n0"))
    val b = tiled.filter(col("vec_id") >= n && col("vec_id") < 2 * n)
      .select((col("vec_id") - n).as("vec_id"), normSq(col("embedding")).as("n1"))
    // permutation + sign flips: same multiset of |coordinates| -> the
    // sequential-fold norm can differ only in addition ORDER; compare as
    // exact doubles after sorting the squared terms is overkill — the
    // fold over permuted ±values must land within strict fp tolerance,
    // and the (sorted) coordinate magnitudes must match exactly
    val normDrift = a.join(b, "vec_id")
      .filter(abs(col("n0") - col("n1")) > col("n0") * 1e-6).count()
    assert(normDrift == 0)
    val mags = tiled.filter(col("vec_id") >= n && col("vec_id") < 2 * n)
      .select((col("vec_id") - n).as("vec_id"),
        sort_array(transform(col("embedding"), v => abs(v))).as("m1"))
    val mags0 = src.select(col("vec_id"),
      sort_array(transform(col("embedding"), v => abs(v))).as("m0"))
    assert(mags0.join(mags, "vec_id").filter(col("m0") =!= col("m1")).count() == 0)
  }

  test("LSH bucket occupancy halves per added plane (the planes ~ log2(N) scaling law)") {
    // SimilarityOps' scaladoc claims expected occupancy N/2^planes, which
    // is what makes `planes` the knob that holds q45/q47's within-bucket
    // work constant under corpus growth. Pin it empirically on the tiled
    // (3x) corpus: each 2 extra planes should multiply the number of
    // OCCUPIED buckets ~4x (equivalently, divide mean occupancy ~4x).
    // Sign-projection buckets on structured data aren't perfectly
    // uniform, so the bound is loose — but a broken hash (all vectors in
    // few buckets, occupancy flat in planes) fails it decisively.
    val emb = spark.read.parquet(s"$dst/embeddings.parquet")
    val distinctBuckets = Seq(4, 6, 8).map { p =>
      p -> emb.select(graft.plans.LshBucketExpr.bucketNative(
          col("embedding"), p, graft.operators.SimilarityOps.Dim).as("b"))
        .agg(countDistinct(col("b"))).head.getLong(0)
    }.toMap
    assert(distinctBuckets(4) <= 16 && distinctBuckets(6) <= 64 &&
      distinctBuckets(8) <= 256, s"bucket ids exceed 2^planes: $distinctBuckets")
    val r46 = distinctBuckets(6).toDouble / distinctBuckets(4)
    val r68 = distinctBuckets(8).toDouble / distinctBuckets(6)
    assert(r46 >= 2.0 && r68 >= 1.8,
      s"occupied buckets must grow ~4x per 2 planes, got $distinctBuckets")
  }

  test("the planes/shards session confs reach the query path") {
    val s = spark
    try {
      s.conf.set("graft.lsh.planes", "4")
      s.conf.set("graft.curation.numShards", "8")
      assert(graft.operators.SimilarityOps.planesFor(s) == 4)
      assert(graft.operators.CurationOps.numShardsFor(s) == 8)
      // q105 must actually shard by the override: max shard id < 8
      val maxShard = graft.operators.CurationOps.queries("q105_shuffle_order")(s, sfDir)
        .agg(max(col("shard"))).head.getInt(0)
      assert(maxShard < 8, s"numShards override ignored: max shard $maxShard")
    } finally {
      s.conf.unset("graft.lsh.planes")
      s.conf.unset("graft.curation.numShards")
    }
    assert(graft.operators.SimilarityOps.planesFor(s) == graft.operators.SimilarityOps.Planes)
    assert(graft.operators.CurationOps.numShardsFor(s) == graft.operators.CurationOps.NumShards)
  }
}
