package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.GraftBridge
import org.apache.spark.sql.types.{DataType, LongType}

/** Native squared-L2 distance over two ARRAY<BIGINT> vectors — the
  * distance kernel of the whole quantized-vector tier (k-means fits,
  * PQ/IVF encode + search, coreset picks). The HOF form
  * `aggregate(zip_with(a, b, (x, c) -> (x - c) * (x - c)), 0L, +)`
  * allocates the zipped array and evaluates two interpreted lambdas per
  * element per comparison; inside a k × n assignment join that is the
  * entire inner loop of Lloyd iterations. One fused scalar loop removes
  * the allocation and the interpretation.
  *
  * Null semantics mirror the HOF exactly: zip_with pads a length
  * mismatch with nulls and the null poisons the lambda, then the
  * aggregate — so ANY length mismatch or null element yields NULL.
  * VectorDistSpec pins native == HOF on fixture vectors + edge rows. */
case class L2SqExpr(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "l2sq"
  override def nullable: Boolean = true

  def compute(aAny: Any, bAny: Any): Any = {
    val a = aAny.asInstanceOf[ArrayData]
    val b = bAny.asInstanceOf[ArrayData]
    val na = a.numElements()
    val nb = b.numElements()
    if (na != nb) return null
    var acc = 0L
    var i = 0
    while (i < na) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val d = a.getLong(i) - b.getLong(i)
      acc += d * d
      i += 1
    }
    acc
  }

  override protected def nullSafeEval(a: Any, b: Any): Any = compute(a, b)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val self = ctx.addReferenceObj("l2SqExpr", this, classOf[L2SqExpr].getName)
      s"""Object r = $self.compute($a, $b);
         |if (r == null) { ${ev.isNull} = true; } else { ${ev.value} = ((Long) r).longValue(); }
         |""".stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): L2SqExpr = copy(left = newLeft, right = newRight)
}

object L2SqExpr {
  /** Σ (aᵢ − bᵢ)² over ARRAY<BIGINT>; NULL on length mismatch or null
    * element (the zip_with/aggregate semantics). */
  def l2sqNative(a: Column, b: Column): Column =
    GraftBridge.column(L2SqExpr(GraftBridge.expression(a), GraftBridge.expression(b)))
}
