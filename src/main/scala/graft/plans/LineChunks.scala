package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.GraftBridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Fixed-width WORD chunks of a document in one byte-span pass — the
  * codegen'd twin of DedupOps.lineChunks
  * (`transform(sequence(0, (n_words-1) div W), j -> array_join(slice(
  * split(text,' '), j*W+1, W), ' '))`), whose HOF form allocates the
  * full token array plus, per chunk, a slice and a joined string copy,
  * all interpreted per element. Chunk j IS the input's byte span from
  * token j*W's start to token min(j*W+W, n)-1's end (the single-space
  * split/join identity shared with ShinglesExpr/WindowHashesExpr), so
  * each chunk is one slice copy. The line-dedup family calls this on
  * every corpus pass; LineChunksSpec pins native == HOF including
  * empty-token and trailing-space cases.
  *
  * Null contract: null text -> null; any non-null text has >= 1 token
  * (split semantics), so the array is never empty. */
case class LineChunksExpr(child: Expression, w: Int) extends UnaryExpression {
  require(w >= 1, s"line chunks need w >= 1, got $w")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "line_chunks"
  override def nullable: Boolean = true

  /** Shared scalar kernel (also called from generated code). */
  def compute(text: UTF8String): Any = {
    val bytes = text.getBytes
    val len = bytes.length
    var nTok = 1
    var i = 0
    while (i < len) { if (bytes(i) == ' ') nTok += 1; i += 1 }
    val starts = new Array[Int](nTok)
    var k = 1
    i = 0
    while (i < len) {
      if (bytes(i) == ' ') { starts(k) = i + 1; k += 1 }
      i += 1
    }
    val nChunks = (nTok - 1) / w + 1
    val out = new Array[Any](nChunks)
    var j = 0
    while (j < nChunks) {
      val from = starts(j * w)
      val until = if ((j + 1) * w < nTok) starts((j + 1) * w) - 1 else len
      val slice = new Array[Byte](until - from)
      System.arraycopy(bytes, from, slice, 0, until - from)
      out(j) = UTF8String.fromBytes(slice)
      j += 1
    }
    new GenericArrayData(out)
  }

  override protected def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val self = ctx.addReferenceObj("lineChunks", this, classOf[LineChunksExpr].getName)
      s"${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) $self.compute($a);"
    })

  override protected def withNewChildInternal(newChild: Expression): LineChunksExpr =
    copy(child = newChild)
}

object LineChunksExpr {
  /** Column-API entry point: `lineChunksNative(text, w)`. */
  def lineChunksNative(text: Column, w: Int): Column =
    GraftBridge.column(LineChunksExpr(GraftBridge.expression(text), w))
}

/** Fixed-width CODEPOINT chunks — the codegen'd twin of ScriptDedupOps'
  * cjkLineChunks (`transform(sequence(0, floor((length-1)/n)), j ->
  * substr(text, j*n+1, n))`), slicing between codepoint starts the way
  * CharNgramsExpr does. The HOF form pays an interpreted substr (its own
  * codepoint walk from position 1) PER CHUNK — quadratic in document
  * length; this kernel indexes codepoint starts once.
  *
  * Exactness includes the degenerate empty-text case: length 0 makes the
  * HOF's `floor((0-1)/n)` = -1, `sequence(0,-1)` = [0,-1] (Spark flips
  * the step), and both substrs of "" = "" — so "" -> ["", ""], which the
  * kernel reproduces verbatim (callers dispatch cjk-detected docs only,
  * which are never empty, but the twin contract is unconditional).
  *
  * Null contract: null text -> null. */
case class CodepointChunksExpr(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, s"codepoint chunks need n >= 1, got $n")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "codepoint_chunks"
  override def nullable: Boolean = true

  /** Shared scalar kernel (also called from generated code). */
  def compute(text: UTF8String): Any = {
    val bytes = text.getBytes
    val len = bytes.length
    if (len == 0)
      return new GenericArrayData(Array[Any](
        UTF8String.EMPTY_UTF8, UTF8String.EMPTY_UTF8))
    var nCp = 0
    var i = 0
    while (i < len) { if ((bytes(i) & 0xC0) != 0x80) nCp += 1; i += 1 }
    val starts = new Array[Int](nCp + 1)
    var k = 0
    i = 0
    while (i < len) {
      if ((bytes(i) & 0xC0) != 0x80) { starts(k) = i; k += 1 }
      i += 1
    }
    starts(nCp) = len
    val nChunks = (nCp - 1) / n + 1
    val out = new Array[Any](nChunks)
    var j = 0
    while (j < nChunks) {
      val from = starts(j * n)
      val until = starts(math.min((j + 1) * n, nCp))
      val slice = new Array[Byte](until - from)
      System.arraycopy(bytes, from, slice, 0, until - from)
      out(j) = UTF8String.fromBytes(slice)
      j += 1
    }
    new GenericArrayData(out)
  }

  override protected def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val self = ctx.addReferenceObj("cpChunks", this, classOf[CodepointChunksExpr].getName)
      s"${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) $self.compute($a);"
    })

  override protected def withNewChildInternal(newChild: Expression): CodepointChunksExpr =
    copy(child = newChild)
}

object CodepointChunksExpr {
  /** Column-API entry point: `codepointChunks(text, n)`. */
  def codepointChunks(text: Column, n: Int): Column =
    GraftBridge.column(CodepointChunksExpr(GraftBridge.expression(text), n))
}
