package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.GraftBridge
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}

/** Native kernels for the perceptual-hash (aHash) index family.
  *
  * The HOF formulation (`aggregate` for the pixel total, `transform`
  * for the bit vector, a nested `transform`+`aggregate` for the four
  * 16-bit bands) is interpreted per element AND CollapseProject inlines
  * each derived column into the next lambda, so the pixel total is
  * re-evaluated per bit and the bit vector per band — measured 4.1 s
  * (hash rows) / 8.6 s (band rows) of pure compute for 15k docs at
  * sf0.1, and the band table's `write.sort-by` range-sample pass pays
  * it all TWICE (17.7 s for the write). One scalar kernel in a tight
  * loop removes both the interpretation overhead and the re-evaluation;
  * semantics are pinned to the HOF twin by PhashBandsSpec (equality on
  * the staged media grid, plus null/odd-length edge rows).
  *
  * Semantics mirrored EXACTLY from the HOF form:
  *   tot  = aggregate(px, 0L, (a, x) -> a + x)        — null element ⇒ null tot
  *   bit  = IF(x * 64 > tot, 1, 0)                    — null predicate ⇒ 0
  *   band j = aggregate(slice(bits, j*16+1, 16), 0L, (a, b) -> a*2 + b)
  * so a null pixel anywhere zeroes every bit (null tot makes every
  * comparison null), never errors — identical to the lambda algebra. */
case class PhashBandsExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "phash_bands"
  override def nullable: Boolean = true

  def compute(pxAny: Any): Any = {
    val px = pxAny.asInstanceOf[ArrayData]
    val n = px.numElements()
    var tot = 0L
    var anyNull = false
    var i = 0
    while (i < n) {
      if (px.isNullAt(i)) anyNull = true else tot += px.getLong(i)
      i += 1
    }
    val out = new Array[Any](4)
    var j = 0
    while (j < 4) {
      var band = 0L
      var k = j * 16
      val end = math.min(k + 16, n)
      while (k < end) {
        val bit =
          if (anyNull || px.isNullAt(k)) 0L
          else if (px.getLong(k) * 64 > tot) 1L
          else 0L
        band = band * 2 + bit
        k += 1
      }
      out(j) = band
      j += 1
    }
    new GenericArrayData(out)
  }

  override protected def nullSafeEval(input: Any): Any = compute(input)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val self = ctx.addReferenceObj("phashBandsExpr", this, classOf[PhashBandsExpr].getName)
      s"${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) $self.compute($a);"
    })

  override protected def withNewChildInternal(newChild: Expression): PhashBandsExpr =
    copy(child = newChild)
}

/** Exact Hamming distance over two equal-length ARRAY<BIGINT> hash
  * vectors — the verification arm of q211/q214/q215, replacing the
  * interpreted `aggregate(zip_with(ba, bb, (x, y) -> bit_count(x ^ y)),
  * 0, (a, v) -> a + v)` (output type INT, matching the HOF's 0-seeded
  * aggregate). zip_with pads the shorter side with nulls and
  * bit_count(null) poisons the sum — mirrored: any null element or a
  * length mismatch yields null. */
case class HammingDistExpr(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = IntegerType
  override def prettyName: String = "hamming_dist"
  override def nullable: Boolean = true

  def compute(aAny: Any, bAny: Any): Any = {
    val a = aAny.asInstanceOf[ArrayData]
    val b = bAny.asInstanceOf[ArrayData]
    val na = a.numElements()
    val nb = b.numElements()
    if (na != nb) return null
    var acc = 0
    var i = 0
    while (i < na) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      acc += java.lang.Long.bitCount(a.getLong(i) ^ b.getLong(i))
      i += 1
    }
    acc
  }

  override protected def nullSafeEval(a: Any, b: Any): Any = compute(a, b)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val self = ctx.addReferenceObj("hammingDistExpr", this, classOf[HammingDistExpr].getName)
      s"""Object r = $self.compute($a, $b);
         |if (r == null) { ${ev.isNull} = true; } else { ${ev.value} = ((Integer) r).intValue(); }
         |""".stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): HammingDistExpr = copy(left = newLeft, right = newRight)
}

object PhashBandsExpr {
  /** px ARRAY<BIGINT> → the 4 × 16-bit aHash bands. */
  def bandsNative(px: Column): Column =
    GraftBridge.column(PhashBandsExpr(GraftBridge.expression(px)))

  /** Hamming distance between two band arrays (INT, null on mismatch). */
  def hammingNative(a: Column, b: Column): Column =
    GraftBridge.column(HammingDistExpr(GraftBridge.expression(a), GraftBridge.expression(b)))
}
