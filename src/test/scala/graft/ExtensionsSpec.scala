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
