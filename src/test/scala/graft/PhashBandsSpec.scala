package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.plans.PhashBandsExpr

/** Pins the native phash kernels (plans/PhashBands.scala) to the HOF
  * formulations they replaced — the q211/q214/q215 family must be
  * bit-identical under the swap. Pixel frames include the real fixture
  * distribution (derived grids over a doc_id range) plus edge rows the
  * fixtures never produce (null pixels, non-64 lengths, empty arrays)
  * so the mirrored lambda semantics (null total zeroes every bit; a
  * short array shortens the trailing bands) are pinned, not assumed. */
class PhashBandsSpec extends AnyFunSuite {
  import TestSpark.spark

  private lazy val grids = {
    // the real fixture algebra: 200 docs through phashPixelsOf
    import spark.implicits._
    val docs = (0L until 200L).toDF("doc_id")
    graft.operators.MultimodalOps.phashPixelsOf(docs).localCheckpoint()
  }

  private def hofBands(px: org.apache.spark.sql.DataFrame) =
    px.withColumn("tot", expr("aggregate(px, 0L, (a, x) -> a + x)"))
      .withColumn("bits", expr("transform(px, x -> IF(x * 64 > tot, 1L, 0L))"))
      .withColumn("hof", expr("transform(sequence(0, 3), " +
        "j -> aggregate(slice(bits, j*16 + 1, 16), 0L, (a, b) -> a * 2 + b))"))

  test("PhashGridExpr equals the SQL scene render (the DuckDB oracle's mirror)") {
    import spark.implicits._
    // sc/vr ranges cover planted triples, controls, and big scene ids
    val docs = ((0L until 300L) ++ (999900L until 1000000L)).toDF("doc_id")
    val both = docs
      .select(col("doc_id"),
        expr("CASE WHEN doc_id % 10 <= 2 THEN (doc_id div 10) * 2 " +
          "ELSE doc_id * 2 + 1 END").as("sc"),
        expr("doc_id % 10").as("vr"))
      .withColumn("sql_px", expr(graft.operators.MultimodalOps.phashGridSpark))
      .withColumn("native_px",
        graft.plans.PhashGridExpr.gridNative(col("sc"), col("vr")))
    assert(both.filter(col("sql_px") =!= col("native_px")).count() == 0)
    assert(both.count() == 400)
  }

  test("PhashBandsExpr equals the HOF band computation on fixture grids") {
    val both = hofBands(grids)
      .withColumn("native", PhashBandsExpr.bandsNative(col("px")))
    assert(both.filter(col("native") =!= col("hof")).count() == 0)
    assert(both.count() == 200)
  }

  test("PhashBandsExpr mirrors lambda semantics on edge arrays (null px, short, empty)") {
    val edge = spark.sql(
      """SELECT * FROM VALUES
        |  (1L, array(CAST(NULL AS BIGINT), 1L, 2L)),
        |  (2L, array(5L, 5L, 5L, 5L, 5L)),
        |  (3L, array(CAST(10L AS BIGINT))),
        |  (4L, array(CAST(NULL AS BIGINT))),
        |  (5L, CAST(array() AS ARRAY<BIGINT>))
        |AS t(doc_id, px)""".stripMargin)
    val both = hofBands(edge)
      .withColumn("native", PhashBandsExpr.bandsNative(col("px")))
    assert(both.filter(not(col("native") <=> col("hof"))).count() == 0)
  }

  test("HammingDistExpr equals the HOF zip_with/bit_count aggregate") {
    val b = graft.operators.MultimodalOps.phashBandsOf(
      { import spark.implicits._; (0L until 200L).toDF("doc_id") })
      .localCheckpoint()
    val pairs = b.as("a").crossJoin(b.as("b")).limit(5000)
      .select(col("a.bands").as("ba"), col("b.bands").as("bb"))
    val both = pairs
      .withColumn("hof", expr(
        "aggregate(zip_with(ba, bb, (x, y) -> bit_count(x ^ y)), 0, (a, v) -> a + v)"))
      .withColumn("native", PhashBandsExpr.hammingNative(col("ba"), col("bb")))
    assert(both.filter(not(col("native") <=> col("hof"))).count() == 0)
  }

  test("HammingDistExpr nulls on length mismatch and null elements, like the HOF") {
    val edge = spark.sql(
      """SELECT * FROM VALUES
        |  (array(1L, 2L), array(1L, 2L, 3L)),
        |  (array(1L, CAST(NULL AS BIGINT)), array(1L, 2L)),
        |  (array(7L), array(7L))
        |AS t(ba, bb)""".stripMargin)
    val both = edge
      .withColumn("hof", expr(
        "aggregate(zip_with(ba, bb, (x, y) -> bit_count(x ^ y)), 0, (a, v) -> a + v)"))
      .withColumn("native", PhashBandsExpr.hammingNative(col("ba"), col("bb")))
    assert(both.filter(not(col("native") <=> col("hof"))).count() == 0)
  }
}
