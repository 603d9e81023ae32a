package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.GraftBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.Platform
import org.apache.spark.unsafe.types.UTF8String

/** All `w`-token window hashes of a document in one fused pass — the
  * codegen'd hot path of q131 exact substring dedup.
  *
  * The HOF formulation builds every window's TEXT
  * (`xxhash64(array_join(slice(split(text,' '), i, w), ' '))`): one
  * split allocation plus, per window, a w-element slice, a joined
  * string copy, and only then the hash — O(tokens × w) bytes copied per
  * document. This expression exploits the byte identity that a
  * single-space split/join reconstructs the original bytes exactly:
  * window i's text IS the input's byte span from token i's start to
  * token (i+w-1)'s end, so each hash is one `XXH64.hashUnsafeBytes`
  * over the input buffer — zero copies, zero intermediate strings. The
  * seed (42) matches Spark's `xxhash64` function, so the result is
  * bit-equal to the HOF twin (WindowHashesSpec asserts it, including
  * consecutive/trailing-space token edge cases).
  *
  * Null contract: null text -> null; fewer than w tokens -> empty
  * array. */
case class WindowHashesExpr(child: Expression, w: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "window_hashes"
  override def nullable: Boolean = true

  /** Shared scalar kernel (also called from generated code). */
  def compute(text: UTF8String): Any = {
    val bytes = text.getBytes
    val len = bytes.length
    var nTok = 1
    var i = 0
    while (i < len) { if (bytes(i) == ' ') nTok += 1; i += 1 }
    if (nTok < w) return new GenericArrayData(Array.empty[Long])
    val starts = new Array[Int](nTok)
    var k = 1
    i = 0
    while (i < len) {
      if (bytes(i) == ' ') { starts(k) = i + 1; k += 1 }
      i += 1
    }
    val last = nTok - w
    val out = new Array[Long](last + 1)
    var s = 0
    while (s <= last) {
      val from = starts(s)
      val until = if (s + w < nTok) starts(s + w) - 1 else len
      out(s) = XXH64.hashUnsafeBytes(bytes,
        Platform.BYTE_ARRAY_OFFSET + from, until - from, 42L)
      s += 1
    }
    new GenericArrayData(out)
  }

  override protected def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val self = ctx.addReferenceObj("windowHashes", this, classOf[WindowHashesExpr].getName)
      s"${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) $self.compute($a);"
    })

  override protected def withNewChildInternal(newChild: Expression): WindowHashesExpr =
    copy(child = newChild)
}

object WindowHashesExpr {
  /** Column-API entry point: `windowHashes(text, w)`. */
  def windowHashes(text: Column, w: Int): Column =
    GraftBridge.column(WindowHashesExpr(GraftBridge.expression(text), w))
}
