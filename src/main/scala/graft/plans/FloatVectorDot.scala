package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.GraftBridge
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Native Catalyst expression: dot product of two float vectors,
  * accumulated in double, with whole-stage codegen (`doGenCode` emits a
  * tight primitive loop — no per-element boxing, no lambda dispatch).
  *
  * This is the custom-Expression tier of the engine's extension ladder
  * (SURVEY.md §7.3): the `zip_with`+`aggregate` HOF formulation in
  * VectorFunctions is oracle-portable and fine at correctness scale, but
  * each element passes through the lambda interpreter; this expression is
  * the hot-path variant for 100 TB similarity scans. Accumulation order is
  * the same sequential left fold, so results are bit-identical to the HOF
  * and to DuckDB's list_reduce — it stays inside the oracle gate.
  *
  * Null contract: null input array -> null, and MISMATCHED lengths ->
  * null — the same result the HOF formulation produces (zip_with
  * null-pads the shorter side and the null poisons the aggregate), so
  * the two stay bit-identical on malformed vectors too, never silently
  * truncating. Elements are assumed non-null (embedding fixtures and any
  * sane vector column guarantee this).
  */
case class FloatVectorDot(left: Expression, right: Expression)
    extends BinaryExpression {

  // Inputs must be array<float>; used only via the typed helpers below, so
  // a full ExpectsInputTypes contract (private[sql]) isn't needed.
  override def dataType: DataType = DoubleType
  override def prettyName: String = "float_vector_dot"

  // non-null inputs of differing length still yield null
  override def nullable: Boolean = true

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (y.numElements() != n) {
      null
    } else {
      var acc = 0.0d
      var i = 0
      while (i < n) {
        acc += x.getFloat(i).toDouble * y.getFloat(i).toDouble
        i += 1
      }
      acc
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = $a.numElements();
         |if ($b.numElements() != $n) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $acc += (double) $a.getFloat($i) * (double) $b.getFloat($i);
         |  }
         |  ${ev.value} = $acc;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): FloatVectorDot =
    copy(left = newLeft, right = newRight)
}

object FloatVectorDot {
  /** Column-API entry point: `dotNative(a, b)`. */
  def dotNative(a: Column, b: Column): Column =
    GraftBridge.column(
      FloatVectorDot(GraftBridge.expression(a), GraftBridge.expression(b)))

  def cosineNative(a: Column, b: Column): Column = {
    import org.apache.spark.sql.functions.sqrt
    dotNative(a, b) / (sqrt(dotNative(a, a)) * sqrt(dotNative(b, b)))
  }
}
