package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.graft.GraftBridge
import org.apache.spark.sql.types.{DataType, LongType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** The q186 Gopher rule-pack statistics of ONE document in a single
  * fused byte pass — the codegen'd twin of gopherRulesWith's
  * nine-column projection, whose HOF form pays an interpreted lambda
  * per token (`aggregate` for sum_len, `rlike '[A-Za-z]'` per word),
  * two regexp_replace passes, and three interpreted `filter`s over
  * `split(text, '\n')`, each allocating its token/line arrays.
  *
  * Field semantics (bit-equal to the HOF twin, GopherStatsSpec pins):
  *   - n_words / sum_len: non-empty single-space tokens; codepoint
  *     lengths.
  *   - n_hash: '#' occurrences ('#' is ASCII, so a byte count is exact
  *     under UTF-8 — continuation/lead bytes are >= 0x80).
  *   - n_ellipsis: non-overlapping left-to-right "..." occurrences
  *     (regexp_replace's scan order).
  *   - n_lines / bullet_lines / ellipsis_lines: '\n'-split lines;
  *     LIKE '- %' / '* %' prefixes and LIKE '%...' suffix.
  *   - alpha_words: tokens containing an ASCII letter.
  *   - stop_hits: |distinct tokens ∩ stops| (array_intersect dedupes,
  *     so duplicate stops count once).
  *
  * Null contract: null text -> null struct (consumers' boolean gates
  * null out exactly as the HOF columns did). */
case class GopherStatsExpr(child: Expression, stops: Seq[String])
    extends UnaryExpression {

  override def dataType: DataType = StructType(Seq(
    StructField("n_words", LongType, nullable = false),
    StructField("sum_len", LongType, nullable = false),
    StructField("n_hash", LongType, nullable = false),
    StructField("n_ellipsis", LongType, nullable = false),
    StructField("bullet_lines", LongType, nullable = false),
    StructField("n_lines", LongType, nullable = false),
    StructField("ellipsis_lines", LongType, nullable = false),
    StructField("alpha_words", LongType, nullable = false),
    StructField("stop_hits", LongType, nullable = false)))
  override def prettyName: String = "gopher_stats"
  override def nullable: Boolean = true

  @transient private lazy val stopSet: Array[UTF8String] =
    stops.distinct.map(UTF8String.fromString).toArray

  /** Shared scalar kernel (also called from generated code). */
  def compute(text: UTF8String): Any = {
    val bytes = text.getBytes
    val len = bytes.length
    // ---- token walk: non-empty single-space tokens -----------------------
    var nWords = 0L
    var sumLen = 0L
    var alphaWords = 0L
    val toks = new java.util.HashSet[UTF8String]()
    var tokStart = 0
    var i = 0
    while (i <= len) {
      if (i == len || bytes(i) == ' ') {
        if (i > tokStart) {
          nWords += 1
          var cp = 0
          var hasAlpha = false
          var j = tokStart
          while (j < i) {
            val b = bytes(j)
            if ((b & 0xC0) != 0x80) cp += 1
            if ((b >= 'A' && b <= 'Z') || (b >= 'a' && b <= 'z')) hasAlpha = true
            j += 1
          }
          sumLen += cp
          if (hasAlpha) alphaWords += 1
          if (stopSet.nonEmpty) {
            val slice = new Array[Byte](i - tokStart)
            System.arraycopy(bytes, tokStart, slice, 0, i - tokStart)
            toks.add(UTF8String.fromBytes(slice))
          }
        }
        tokStart = i + 1
      }
      i += 1
    }
    var stopHits = 0L
    var s = 0
    while (s < stopSet.length) {
      if (toks.contains(stopSet(s))) stopHits += 1
      s += 1
    }
    // ---- char scans: '#', non-overlapping "..." --------------------------
    var nHash = 0L
    i = 0
    while (i < len) { if (bytes(i) == '#') nHash += 1; i += 1 }
    var nEllipsis = 0L
    i = 0
    while (i < len) {
      if (bytes(i) == '.' && i + 2 < len && bytes(i + 1) == '.' &&
        bytes(i + 2) == '.') { nEllipsis += 1; i += 3 }
      else i += 1
    }
    // ---- line walk: '\n'-split, prefix/suffix tests ----------------------
    var nLines = 1L
    var bulletLines = 0L
    var ellipsisLines = 0L
    var lineStart = 0
    i = 0
    while (i <= len) {
      if (i == len || bytes(i) == '\n') {
        val ll = i - lineStart
        // LIKE '- %' / '* %': '%' matches empty, so the 2-char prefix alone decides
        if (ll >= 2) {
          val b0 = bytes(lineStart)
          if ((b0 == '-' || b0 == '*') && bytes(lineStart + 1) == ' ')
            bulletLines += 1
        }
        if (ll >= 3 &&
          bytes(i - 1) == '.' && bytes(i - 2) == '.' && bytes(i - 3) == '.')
          ellipsisLines += 1
        if (i < len) nLines += 1
        lineStart = i + 1
      }
      i += 1
    }
    InternalRow(nWords, sumLen, nHash, nEllipsis, bulletLines, nLines,
      ellipsisLines, alphaWords, stopHits)
  }

  override protected def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val self = ctx.addReferenceObj("gopherStats", this, classOf[GopherStatsExpr].getName)
      s"${ev.value} = (org.apache.spark.sql.catalyst.InternalRow) $self.compute($a);"
    })

  override protected def withNewChildInternal(newChild: Expression): GopherStatsExpr =
    copy(child = newChild)
}

object GopherStatsExpr {
  /** Column-API entry point: `gopherStats(text, stops)`. */
  def gopherStats(text: Column, stops: Seq[String]): Column =
    GraftBridge.column(GopherStatsExpr(GraftBridge.expression(text), stops))
}

/** The q186 Gopher KEEP verdict of one document as a single boolean
  * kernel — gopherRulesWith's six threshold rules applied to
  * [[GopherStatsExpr]]'s statistics inside the row. Exists because a
  * FILTER on fields of the struct kernel gets its alias substituted by
  * predicate pushdown, leaving one kernel copy per field reference
  * (~13 byte passes per row); a boolean expression pushes as one node
  * and runs the stats pass exactly once. The thresholds restate
  * gopherRulesWith's columns verbatim; ExprPropertySpec pins
  * keep == gopherRulesWith(...).keep row-for-row.
  *
  * Null contract: null text -> null (the filter drops it, exactly as
  * the struct form's null-propagating booleans did). */
case class GopherKeepExpr(child: Expression, stops: Seq[String])
    extends UnaryExpression {

  override def dataType: DataType = org.apache.spark.sql.types.BooleanType
  override def prettyName: String = "gopher_keep"
  override def nullable: Boolean = true

  @transient private lazy val stats = GopherStatsExpr(child, stops)

  /** Shared scalar kernel (also called from generated code). */
  def computeKeep(text: UTF8String): Boolean = {
    val r = stats.compute(text).asInstanceOf[InternalRow]
    val nWords = r.getLong(0); val sumLen = r.getLong(1)
    val nHash = r.getLong(2); val nEllipsis = r.getLong(3)
    val bulletLines = r.getLong(4); val nLines = r.getLong(5)
    val ellipsisLines = r.getLong(6); val alphaWords = r.getLong(7)
    val stopHits = r.getLong(8)
    nWords >= 50 && nWords <= 100000 &&
      sumLen >= nWords * 3 && sumLen <= nWords * 10 &&
      (nHash + nEllipsis) * 10 <= nWords &&
      bulletLines * 10 <= nLines * 9 && ellipsisLines * 10 <= nLines * 3 &&
      alphaWords * 5 >= nWords * 4 &&
      stopHits >= 2
  }

  override protected def nullSafeEval(input: Any): Any =
    computeKeep(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val self = ctx.addReferenceObj("gopherKeep", this, classOf[GopherKeepExpr].getName)
      s"${ev.value} = $self.computeKeep($a);"
    })

  override protected def withNewChildInternal(newChild: Expression): GopherKeepExpr =
    copy(child = newChild)
}

object GopherKeepExpr {
  /** Column-API entry point: `gopherKeep(text, stops)`. */
  def gopherKeep(text: Column, stops: Seq[String]): Column =
    GraftBridge.column(GopherKeepExpr(GraftBridge.expression(text), stops))
}
