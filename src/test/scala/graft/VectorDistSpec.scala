package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.plans.L2SqExpr

/** Pins the native squared-L2 kernel (plans/VectorDist.scala) to the
  * HOF aggregate(zip_with(...)) formulation it replaced across the
  * quantized-vector tier (k-means, PQ/IVF encode+search, coresets):
  * fixture-realistic vectors plus the lambda's edge semantics (null
  * element, length mismatch → NULL). */
class VectorDistSpec extends AnyFunSuite {
  import TestSpark.spark

  test("L2SqExpr equals aggregate(zip_with((x-c)^2)) on fixture-shaped vectors") {
    val vecs = spark.sql(
      """SELECT id, transform(sequence(0, 63),
        |  j -> CAST((id * 37 + j * j * 11) % 2000 AS BIGINT)) AS a,
        |       transform(sequence(0, 63),
        |  j -> CAST((id * 53 + j * 7) % 2000 AS BIGINT)) AS b
        |FROM range(2000) t(id)""".stripMargin)
    val both = vecs
      .withColumn("hof", expr(
        "aggregate(zip_with(a, b, (x, c) -> (x - c) * (x - c)), 0L, (acc, v) -> acc + v)"))
      .withColumn("native", L2SqExpr.l2sqNative(col("a"), col("b")))
    assert(both.filter(not(col("native") <=> col("hof"))).count() == 0)
  }

  test("L2SqExpr mirrors zip_with null/length-mismatch semantics") {
    val edge = spark.sql(
      """SELECT * FROM VALUES
        |  (array(1L, 2L), array(1L, 2L, 3L)),
        |  (array(1L, CAST(NULL AS BIGINT)), array(1L, 2L)),
        |  (array(5L), array(2L)),
        |  (CAST(array() AS ARRAY<BIGINT>), CAST(array() AS ARRAY<BIGINT>))
        |AS t(a, b)""".stripMargin)
    val both = edge
      .withColumn("hof", expr(
        "aggregate(zip_with(a, b, (x, c) -> (x - c) * (x - c)), 0L, (acc, v) -> acc + v)"))
      .withColumn("native", L2SqExpr.l2sqNative(col("a"), col("b")))
    assert(both.filter(not(col("native") <=> col("hof"))).count() == 0)
  }
}
