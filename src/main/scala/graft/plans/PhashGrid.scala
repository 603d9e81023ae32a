package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.GraftBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native render of the q211 synthetic media scene — the scalar twin of
  * MultimodalOps.phashGridSpark (whose SQL form stays in the file as
  * the documented algebra and the DuckDB oracle's mirror). The HOF
  * form (`transform(sequence(0, 63), i -> CASE …)`) evaluates an
  * interpreted lambda whose body holds up to four md5+conv subtrees —
  * measured 11-12 s to stage the sf0.1 media grid, the single largest
  * line of the bench staging phase. This kernel renders the 64 samples
  * in one tight loop and hashes each 4×4 texture cell ONCE per grid
  * row (the four vr=2 subsamples of a cell share its md5 by
  * construction: u ∈ {4r+1, 4r+3} ⇒ u div 4 = r), cutting the resized
  * variant's hash count 4×. Values are pinned bit-identical to the SQL
  * form by PhashBandsSpec (grid equality over a fixture id range).
  *
  * Exact per-pixel algebra (all operands non-negative, so Spark's
  * truncating div/% and Scala's agree):
  *   cell = conv(substring(md5('px:'||sc||':'||((u div 4)*8 + v div 4)), 1, 15), 16, 10) % 4 * 96
  *   grad = ((sc%5 + 1)·u + ((sc·7)%5 + 1)·v) div 4
  *   mask = (((u div 16) + (v div 16)·((sc div 2)%2) + sc%2) % 2) · 32
  *   saw  = (3u + 5v) % 16
  * and the 8×8 sample grid (i = 8r + c):
  *   vr=2: mean of the 4 odd-coordinate subsamples (4r+{1,3}, 4c+{1,3})
  *   vr=1: pixel(4r+2, 4c+2) + (31r + 17c + 13·sc) % 3 − 1
  *   else: pixel(4r+2, 4c+2) */
case class PhashGridExpr(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "phash_grid"
  override def nullable: Boolean = true

  @transient private lazy val md = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** conv(substring(md5(s), 1, 15), 16, 10) as a Long — first 60 bits
    * of the digest, positive. */
  private def md5Code60(s: String): Long = {
    val d = md.get()
    d.reset()
    val h = d.digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    // first 15 hex chars = 7.5 bytes: bytes 0-6 fully, high nibble of byte 7
    var acc = 0L
    var i = 0
    while (i < 7) { acc = (acc << 8) | (h(i) & 0xFFL); i += 1 }
    (acc << 4) | ((h(7) & 0xF0L) >> 4)
  }

  def compute(scAny: Any, vrAny: Any): Any = {
    val sc = scAny.asInstanceOf[Long]
    val vr = vrAny.asInstanceOf[Long]
    val gradU = sc % 5 + 1
    val gradV = (sc * 7) % 5 + 1
    val maskRowFactor = (sc / 2) % 2
    val maskBias = sc % 2
    val scPrefix = "px:" + sc + ":"
    def pixel(cellCode: Long, u: Long, v: Long): Long =
      cellCode % 4 * 96 +
        (gradU * u + gradV * v) / 4 +
        ((u / 16 + (v / 16) * maskRowFactor + maskBias) % 2) * 32 +
        (u * 3 + v * 5) % 16
    val out = new Array[Any](64)
    var i = 0
    while (i < 64) {
      val r = i / 8
      val c = i % 8
      // every sample of grid row (r, c) lies in texture cell (r, c):
      // u ∈ {4r+1, 4r+2, 4r+3} ⇒ u div 4 = r (same for v) — one hash
      val cellCode = md5Code60(scPrefix + (r * 8 + c))
      val px =
        if (vr == 2)
          (pixel(cellCode, r * 4 + 1, c * 4 + 1) + pixel(cellCode, r * 4 + 1, c * 4 + 3) +
            pixel(cellCode, r * 4 + 3, c * 4 + 1) + pixel(cellCode, r * 4 + 3, c * 4 + 3)) / 4
        else if (vr == 1)
          pixel(cellCode, r * 4 + 2, c * 4 + 2) + (r * 31 + c * 17 + sc * 13) % 3 - 1
        else
          pixel(cellCode, r * 4 + 2, c * 4 + 2)
      out(i) = px
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def nullSafeEval(sc: Any, vr: Any): Any = compute(sc, vr)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val self = ctx.addReferenceObj("phashGridExpr", this, classOf[PhashGridExpr].getName)
      s"${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) $self.compute($a, $b);"
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): PhashGridExpr = copy(left = newLeft, right = newRight)
}

object PhashGridExpr {
  /** (sc BIGINT, vr BIGINT) → the 64-sample pixel grid. */
  def gridNative(sc: Column, vr: Column): Column =
    GraftBridge.column(PhashGridExpr(GraftBridge.expression(sc), GraftBridge.expression(vr)))
}
