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
