package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.GraftBridge
import org.apache.spark.sql.types.{DataType, LongType}

/** Native Catalyst expression: sign-random-projection LSH bucket id of a
  * float vector — bit j of the result is `sign(v · plane_j)` with
  * `plane_j[c] = ((j*64 + c) * 2654435761 mod 1000003) / 1000003 - 0.5`
  * (c 0-based here; the HOF formulation in SimilarityOps indexes c from 1).
  *
  * This is the codegen'd hot-path twin of the `transform`+`aggregate` HOF
  * formulation (SimilarityOps.bucketHof): the HOF walks planes × dim lambda
  * dispatches per vector (8 × 64 = 512 interpreted steps), which was the
  * cost center of q45/q47/q48; this expression is one tight fused loop.
  * The projection weights are precomputed ONCE into a double[] shared by
  * interpreted and codegen'd eval, and the accumulation is the same
  * sequential ascending-c left fold, so bucket ids are bit-identical to
  * the HOF and to the DuckDB oracle's list_reduce formulation.
  *
  * Null contract: null array -> null; an array whose length differs from
  * `dim` -> null (the HOF would null-poison the fold through a failed
  * element_at, landing every bit in the `otherwise(0)` branch — a
  * mismatched vector is malformed input either way, and null is the
  * honest answer; fixtures guarantee exactly `dim` elements).
  */
case class LshBucketExpr(child: Expression, planes: Int, dim: Int)
    extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "lsh_bucket"
  override def nullable: Boolean = true

  // weight(j, c0) for the fold term `(double)v[c0] * weights[j*dim + c0]`;
  // shared by interpreted + codegen paths so both are bit-identical.
  @transient private lazy val weights: Array[Double] = {
    val w = new Array[Double](planes * dim)
    var j = 0
    while (j < planes) {
      var c0 = 0
      while (c0 < dim) {
        w(j * dim + c0) =
          (((j.toLong * 64 + c0) * 2654435761L) % 1000003L).toDouble / 1000003.0 - 0.5
        c0 += 1
      }
      j += 1
    }
    w
  }

  /** Shared scalar kernel (also called from generated code). */
  def compute(arr: ArrayData): Any = {
    if (arr.numElements() != dim) {
      null
    } else {
      var bucket = 0L
      var j = 0
      while (j < planes) {
        var acc = 0.0d
        val base = j * dim
        var c0 = 0
        while (c0 < dim) {
          acc += arr.getFloat(c0).toDouble * weights(base + c0)
          c0 += 1
        }
        if (acc > 0) bucket |= (1L << j)
        j += 1
      }
      bucket
    }
  }

  override protected def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val w = ctx.addReferenceObj("lshWeights", weights, "double[]")
      val j = ctx.freshName("j")
      val c = ctx.freshName("c")
      val acc = ctx.freshName("acc")
      val bucket = ctx.freshName("bucket")
      s"""
         |if ($a.numElements() != $dim) {
         |  ${ev.isNull} = true;
         |} else {
         |  long $bucket = 0L;
         |  for (int $j = 0; $j < $planes; $j++) {
         |    double $acc = 0.0;
         |    for (int $c = 0; $c < $dim; $c++) {
         |      $acc += (double) $a.getFloat($c) * $w[$j * $dim + $c];
         |    }
         |    if ($acc > 0) $bucket |= (1L << $j);
         |  }
         |  ${ev.value} = $bucket;
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): LshBucketExpr =
    copy(child = newChild)
}

object LshBucketExpr {
  /** Column-API entry point: `bucketNative(vec, planes, dim)`. */
  def bucketNative(vec: Column, planes: Int, dim: Int): Column =
    GraftBridge.column(LshBucketExpr(GraftBridge.expression(vec), planes, dim))
}
