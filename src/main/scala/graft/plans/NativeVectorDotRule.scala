package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DoubleType, FloatType}

/** Optimizer rule (the `Rule[LogicalPlan]` tier of the extension ladder,
  * SURVEY.md §7.3): rewrites the portable HOF dot-product pattern
  *
  *   aggregate(zip_with(a, b, (x, y) -> double(x) * double(y)),
  *             0.0d, (acc, v) -> acc + v)
  *
  * over `array<float>` columns into the codegen'd [[FloatVectorDot]].
  * Queries keep the engine-portable formulation (VectorFunctions.dot —
  * the one the DuckDB oracle can reproduce) and sessions that install
  * [[GraftExtensions]] execute the native tight loop instead. Safe
  * because the two are bit-identical by construction: same sequential
  * left fold, same null-on-length-mismatch contract. (Caveat: the native
  * expression assumes non-null ELEMENTS, as embeddings guarantee; a
  * vector column with null elements should not install this rule.)
  *
  * The match is deliberately exact — any deviation (different cast, a
  * non-zero seed, reordered operands) leaves the expression untouched.
  */
object NativeVectorDotRule extends Rule[LogicalPlan] {

  private def isFloatArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  private def isWidenedProduct(e: Expression, x: NamedLambdaVariable,
      y: NamedLambdaVariable): Boolean = e match {
    case Multiply(Cast(l: NamedLambdaVariable, DoubleType, _, _),
        Cast(r: NamedLambdaVariable, DoubleType, _, _), _) =>
      l.exprId == x.exprId && r.exprId == y.exprId
    case _ => false
  }

  private def isAccumulate(e: Expression, acc: NamedLambdaVariable,
      v: NamedLambdaVariable): Boolean = e match {
    case Add(l: NamedLambdaVariable, r: NamedLambdaVariable, _) =>
      l.exprId == acc.exprId && r.exprId == v.exprId
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    case ArrayAggregate(
        ZipWith(a, b,
          LambdaFunction(mul, Seq(x: NamedLambdaVariable, y: NamedLambdaVariable), _)),
        Literal(0.0, DoubleType),
        LambdaFunction(add, Seq(acc: NamedLambdaVariable, v: NamedLambdaVariable), _),
        LambdaFunction(fin: NamedLambdaVariable, Seq(fin2: NamedLambdaVariable), _))
      if isFloatArray(a) && isFloatArray(b) && fin.exprId == fin2.exprId &&
        isWidenedProduct(mul, x, y) && isAccumulate(add, acc, v) =>
      FloatVectorDot(a, b)
  }
}
