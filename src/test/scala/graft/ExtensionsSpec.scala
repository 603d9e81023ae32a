package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** The extensions must be installed at session build, so this spec owns a
  * dedicated session (same JVM/SparkContext, separate session state). */
class ExtensionsSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = {
    TestSpark.spark // ensure the shared context exists first
    SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .withExtensions(new graft.plans.GraftExtensions)
      .create()
  }

  test("graft_dot and graft_cosine are callable from SQL") {
    import spark.implicits._
    val df = Seq((List(1.0f, 2.0f, 3.0f), List(4.0f, 5.0f, 6.0f))).toDF("a", "b")
    df.createOrReplaceTempView("vecs")
    val dot = spark.sql("SELECT graft_dot(a, b) FROM vecs").as[Double].head()
    assert(dot == 32.0)
    val cos = spark.sql("SELECT graft_cosine(a, a) FROM vecs").as[Double].head()
    assert(math.abs(cos - 1.0) < 1e-12)
  }

  test("optimizer rule rewrites the HOF dot pattern to the native expression") {
    // a real scan input — a LocalRelation would be constant-folded away
    // before the plan can be observed
    import spark.implicits._
    val emb = graft.engine.Tables.embeddings(spark, TestSpark.sfDir).limit(10)
    val df = emb.select(
      graft.functions.VectorFunctions.dot($"embedding", $"embedding").as("d"))
    assert(df.queryExecution.optimizedPlan.toString.contains("float_vector_dot"),
      s"rule did not fire:\n${df.queryExecution.optimizedPlan}")
    // and the rewritten plan computes the same values as a session
    // WITHOUT the extensions (HOF path)
    val viaRule = df.as[Double].collect().toSeq
    val expected = {
      val plain = TestSpark.spark
      import plain.implicits._
      graft.engine.Tables.embeddings(plain, TestSpark.sfDir).limit(10)
        .select(graft.functions.VectorFunctions.dot($"embedding", $"embedding").as("d"))
        .as[Double].collect().toSeq
    }
    assert(viaRule == expected)
  }

  test("optimizer rule leaves deviating aggregates untouched") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val emb = graft.engine.Tables.embeddings(spark, TestSpark.sfDir).limit(5)
    // non-zero seed: NOT the dot pattern
    val df = emb.select(aggregate(
      zip_with($"embedding", $"embedding", (x, y) => x.cast("double") * y.cast("double")),
      lit(1.0d), (acc, v) => acc + v).as("d"))
    assert(!df.queryExecution.optimizedPlan.toString.contains("float_vector_dot"))
    assert(df.queryExecution.optimizedPlan.toString.contains("aggregate"))
  }

  test("native lsh_bucket is bit-identical to the HOF formulation on every fixture vector") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    val emb = graft.engine.Tables.embeddings(spark, TestSpark.sfDir)
    val both = emb.select(
      graft.plans.LshBucketExpr.bucketNative(
        col("embedding"), graft.operators.SimilarityOps.Planes,
        graft.operators.SimilarityOps.Dim).as("native"),
      graft.operators.SimilarityOps.bucketHof(col("embedding")).as("hof"))
    val mismatches = both.filter(col("native") =!= col("hof")).count()
    assert(mismatches == 0)
    // and bucket values span multiple buckets (the hash actually spreads)
    assert(both.select("native").distinct().count() > 10)
  }

  test("lsh_bucket null contract: wrong length and null input yield null") {
    import spark.implicits._
    val df = Seq(
      (1, Some(List(1.0f, 2.0f))),               // wrong length (dim=64)
      (2, None: Option[List[Float]])).toDF("id", "v")
    val out = df.select(
      graft.plans.LshBucketExpr.bucketNative($"v", 8, 64).as("b"))
      .collect().map(r => r.isNullAt(0))
    assert(out.forall(identity))
  }

  test("graft_lsh_bucket is callable from SQL and matches the Column API") {
    import spark.implicits._
    val emb = graft.engine.Tables.embeddings(spark, TestSpark.sfDir).limit(20)
    emb.createOrReplaceTempView("embx")
    val viaSql = spark.sql("SELECT graft_lsh_bucket(embedding, 8, 64) FROM embx")
      .as[Long].collect().toSeq
    val viaCol = emb.select(
      graft.plans.LshBucketExpr.bucketNative($"embedding", 8, 64)).as[Long].collect().toSeq
    assert(viaSql == viaCol)
  }

  test("native minhash_sig is bit-identical to the relational explode→groupBy on every fixture doc") {
    import org.apache.spark.sql.functions._
    val sets = graft.engine.Tables.documents(spark, TestSpark.sfDir)
      .select(col("doc_id"),
        graft.functions.GraftFunctions.shingleSet(col("text"), 3).as("shingles"))
      .filter(size(col("shingles")) > 0)
    val native = sets.select(col("doc_id"),
      graft.plans.MinHashSigExpr.sigNative(col("shingles"),
        graft.operators.DedupOps.NumHashes).as("sig"))
    val relational = graft.operators.DedupOps.withSignatureRelational(sets)
      .withColumnRenamed("sig", "sig_rel")
    val joined = native.join(relational, "doc_id")
    assert(joined.count() == sets.count())
    val mismatches = joined.filter(col("sig") =!= col("sig_rel")).count()
    assert(mismatches == 0)
  }

  test("fused minhash_text matches the relational signature on every fixture doc") {
    import org.apache.spark.sql.functions._
    val sets = graft.engine.Tables.documents(spark, TestSpark.sfDir)
      .select(col("doc_id"),
        graft.functions.GraftFunctions.shingleSet(col("text"), 3).as("shingles"))
      .filter(size(col("shingles")) > 0)
    val relational = graft.operators.DedupOps.withSignatureRelational(sets)
      .withColumnRenamed("sig", "sig_rel")
    val fused = graft.engine.Tables.documents(spark, TestSpark.sfDir)
      .select(col("doc_id"),
        graft.plans.MinHashFromTextExpr.sigFromText(col("text"), 3,
          graft.operators.DedupOps.NumHashes).as("sig"))
      .filter(col("sig").isNotNull)
    val joined = fused.join(relational, "doc_id")
    assert(joined.count() == sets.count() && fused.count() == sets.count())
    assert(joined.filter(col("sig") =!= col("sig_rel")).count() == 0)
  }

  test("minhash_text tokenization edge cases match split semantics") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // repeated/leading/trailing spaces produce empty tokens under
    // split-with-trailing semantics; the byte-slice shingles must equal
    // the concat-built ones for these too, and short docs go null
    val df = Seq("a b c d", "a  b c", " a b", "a b ", "ab", "", "a b")
      .zipWithIndex.map(_.swap).toDF("doc_id", "text")
    val viaArrays = graft.operators.DedupOps.withSignatureRelational(
      df.select(col("doc_id"),
        graft.functions.GraftFunctions.shingleSet(col("text"), 3).as("shingles"))
        .filter(size(col("shingles")) > 0))
      .withColumnRenamed("sig", "sig_rel")
    val fused = df.select(col("doc_id"),
      graft.plans.MinHashFromTextExpr.sigFromText(col("text"), 3, 16).as("sig"))
      .filter(col("sig").isNotNull)
    assert(fused.count() == viaArrays.count())
    assert(fused.join(viaArrays, "doc_id")
      .filter(col("sig") =!= col("sig_rel")).count() == 0)
  }

  test("native shingles equals the HOF shingleSet as ARRAYS on every fixture doc and edge case") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val fixture = graft.engine.Tables.documents(spark, TestSpark.sfDir)
      .select(col("doc_id"), col("text"))
    val edges = Seq("a b c d", "a  b c", " a b c", "a b c ", "ab", "", "a b c a b c")
      .zipWithIndex.map { case (t, i) => (1000000L + i, t) }.toDF("doc_id", "text")
    val df = fixture.union(edges)
    val both = df.select(
      graft.plans.ShinglesExpr.shinglesNative(col("text"), 3).as("native"),
      graft.functions.GraftFunctions.shingleSet(col("text"), 3).as("hof"))
    assert(both.filter(col("native") =!= col("hof")).count() == 0)
  }

  test("multiplicity-preserving native shingles equals the HOF shingles on every fixture doc and edge case") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val fixture = graft.engine.Tables.documents(spark, TestSpark.sfDir)
      .select(col("doc_id"), col("text"))
    val edges = Seq("a b c d", "a  b c", " a b c", "a b c ", "ab", "", "a b c a b c")
      .zipWithIndex.map { case (t, i) => (1000000L + i, t) }.toDF("doc_id", "text")
    val df = fixture.union(edges)
    // n=2 is q58's production shape; n=3 exercises the general slice math
    Seq(2, 3).foreach { n =>
      val both = df.select(
        graft.plans.ShinglesExpr.shinglesAllNative(col("text"), n).as("native"),
        graft.functions.GraftFunctions.shingles(col("text"), n).as("hof"))
      assert(both.filter(col("native") =!= col("hof")).count() == 0,
        s"multiplicity shingles diverge from HOF twin at n=$n")
    }
  }

  test("minhash_sig null contract: empty and null arrays yield null") {
    import spark.implicits._
    val df = Seq(
      (1, Some(List.empty[String])),
      (2, None: Option[List[String]])).toDF("id", "sh")
    val out = df.select(
      graft.plans.MinHashSigExpr.sigNative($"sh", 16).as("sig"))
      .collect().map(_.isNullAt(0))
    assert(out.forall(identity))
  }

  test("graft_minhash_sig is callable from SQL and matches the Column API") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val docs = graft.engine.Tables.documents(spark, TestSpark.sfDir).limit(20)
      .select(col("doc_id"),
        graft.functions.GraftFunctions.shingleSet(col("text"), 3).as("shingles"))
    docs.createOrReplaceTempView("docsx")
    val viaSql = spark.sql("SELECT graft_minhash_sig(shingles, 16) FROM docsx")
      .as[Seq[Long]].collect().toSeq
    val viaCol = docs.select(
      graft.plans.MinHashSigExpr.sigNative($"shingles", 16)).as[Seq[Long]].collect().toSeq
    assert(viaSql == viaCol)
  }

  test("SQL function matches the Column-API native expression") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val rows = Seq.fill(10)((List.fill(16)(rnd.nextFloat()), List.fill(16)(rnd.nextFloat())))
    val df = rows.toDF("a", "b")
    df.createOrReplaceTempView("vecs2")
    val viaSql = spark.sql("SELECT graft_dot(a, b) FROM vecs2").as[Double].collect()
    val viaCol = df.select(graft.plans.FloatVectorDot.dotNative($"a", $"b")).as[Double].collect()
    assert(viaSql.toSeq == viaCol.toSeq)
  }
}
