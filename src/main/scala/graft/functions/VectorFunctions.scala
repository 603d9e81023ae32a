package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Dense-vector math over `ArrayType(FloatType)` embedding columns,
  * expressed with the `zip_with`/`aggregate` higher-order functions so the
  * arithmetic stays inside whole-stage codegen (no UDF/serialization cost
  * in the 100 TB hot path) and remains expressible in the DuckDB oracle.
  *
  * All accumulation is in Double (each float is widened before the first
  * multiply) and folds sequentially left-to-right — the same order DuckDB's
  * list functions use. The oracle hash relies on that fold order being
  * BIT-identical across engines: q44/q45/q48/q73 compare raw double scores
  * exactly (only q47 rounds, to basis points), so any edit that reorders
  * the accumulation breaks the gate — there is no rounding safety net.
  */
object VectorFunctions {

  /** Dot product of two equal-length float vectors, accumulated in Double. */
  def dot(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0d),
      (acc, v) => acc + v)

  /** Squared L2 norm. */
  def normSq(a: Column): Column = dot(a, a)

  /** L2 norm. */
  def norm(a: Column): Column = sqrt(normSq(a))

  /** Cosine similarity; null-safe on zero vectors (returns null, never a
    * divide-by-zero NaN, matching SQL division semantics in both engines). */
  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (norm(a) * norm(b))

  /** Squared Euclidean distance (cheaper than sqrt for nearest-neighbor
    * ranking — monotone in the true distance). */
  def l2Sq(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => {
        val d = x.cast("double") - y.cast("double")
        d * d
      }),
      lit(0.0d),
      (acc, v) => acc + v)
}
