package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.graft.GraftBridge
import org.apache.spark.sql.types.{DataType, LongType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** The q200 repetition statistics of ONE document in a single fused
  * pass: `top{2,3,4}_chars` (count × codepoint-length of the most
  * frequent word n-gram, ties broken by binary-smallest gram — exactly
  * `row_number() OVER (ORDER BY count DESC, gram)` = 1) and
  * `dup10_chars` (Σ count × length over 10-grams with count ≥ 2).
  *
  * These are PER-DOCUMENT aggregates, yet the relational formulation
  * computed them with four corpus-wide exchanges: explode every gram
  * with multiplicity (corpus × tokens rows of gram STRINGS, ~n words
  * each), `groupBy(doc_id, gram)`, a per-doc window sort for the top-1,
  * and four left joins back — guide §2.4's textbook accidental shuffle
  * (nothing about the statistic crosses document boundaries). This
  * expression counts the grams inside the row with one tokenize pass
  * (byte-span grams, the ShinglesExpr identity: a single-space
  * split/join reconstructs the original bytes, so gram i at width n IS
  * the input's span from token i's start to token (i+n-1)'s end) and
  * four per-row hash maps, making the whole q200 gate a map-only
  * projection with NO exchange.
  *
  * Bit-compatibility: gram strings equal ShinglesExpr.shinglesAllNative's
  * slices; tie-break uses UTF8String.compareTo (Spark's string ordering,
  * unsigned bytes — what the window's `orderBy(gram)` compared);
  * codepoint length = UTF8String.numChars (what `length(gram)`
  * returned). RepStatsSpec pins the fused form against the relational
  * twin row-for-row.
  *
  * Null contract: null text -> null struct (the relational twin's
  * left-join nulls; consumers coalesce to 0). Fewer than n tokens ->
  * that width's field is 0 (the twin's "no gram rows" null, same
  * coalesce). */
case class RepStatsExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StructType(Seq(
    StructField("top2_chars", LongType, nullable = false),
    StructField("top3_chars", LongType, nullable = false),
    StructField("top4_chars", LongType, nullable = false),
    StructField("dup10_chars", LongType, nullable = false)))
  override def prettyName: String = "rep_stats"
  override def nullable: Boolean = true

  /** count × numChars of the top-1 gram (count desc, gram binary asc). */
  private def topCover(counts: java.util.HashMap[UTF8String, Long]): Long = {
    if (counts.isEmpty) return 0L
    var bestG: UTF8String = null
    var bestC = 0L
    val it = counts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val c = e.getValue
      if (c > bestC || (c == bestC && e.getKey.compareTo(bestG) < 0)) {
        bestG = e.getKey; bestC = c
      }
    }
    bestC * bestG.numChars()
  }

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
    def gram(s: Int, n: Int): UTF8String = {
      val from = starts(s)
      val until = if (s + n < nTok) starts(s + n) - 1 else len
      val slice = new Array[Byte](until - from)
      System.arraycopy(bytes, from, slice, 0, until - from)
      UTF8String.fromBytes(slice)
    }
    def countAt(n: Int): java.util.HashMap[UTF8String, Long] = {
      val m = new java.util.HashMap[UTF8String, Long]()
      if (nTok >= n) {
        var s = 0
        val last = nTok - n
        while (s <= last) { m.merge(gram(s, n), 1L, _ + _); s += 1 }
      }
      m
    }
    var dup10 = 0L
    val it = countAt(10).entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      if (e.getValue >= 2) dup10 += e.getValue * e.getKey.numChars()
    }
    InternalRow(topCover(countAt(2)), topCover(countAt(3)),
      topCover(countAt(4)), dup10)
  }

  override protected def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val self = ctx.addReferenceObj("repStats", this, classOf[RepStatsExpr].getName)
      s"${ev.value} = (org.apache.spark.sql.catalyst.InternalRow) $self.compute($a);"
    })

  override protected def withNewChildInternal(newChild: Expression): RepStatsExpr =
    copy(child = newChild)
}

object RepStatsExpr {
  /** Column-API entry point: `repStats(text)`. */
  def repStats(text: Column): Column =
    GraftBridge.column(RepStatsExpr(GraftBridge.expression(text)))
}

/** The q200 repetition KEEP verdict of one document as a single boolean
  * kernel — repetitionRules' four basis-point thresholds applied to
  * [[RepStatsExpr]]'s statistics inside the row (n_chars = codepoint
  * length, the `length(text)` the relational form divided by). Same
  * rationale as GopherKeepExpr: a filter on struct fields duplicates
  * the stats kernel per field reference under predicate pushdown; a
  * boolean kernel pushes as one node and runs the gram pass once.
  * ExprPropertySpec pins keep == repetitionRules(...).keep row-for-row.
  *
  * Null contract: null text -> null. */
case class RepKeepExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = org.apache.spark.sql.types.BooleanType
  override def prettyName: String = "rep_keep"
  override def nullable: Boolean = true

  @transient private lazy val stats = RepStatsExpr(child)

  /** Shared scalar kernel (also called from generated code). */
  def computeKeep(text: UTF8String): Boolean = {
    val r = stats.compute(text).asInstanceOf[InternalRow]
    val nChars = text.numChars().toLong
    // the relational twin: CASE WHEN n_chars > 0 THEN x*10000 div n_chars
    // ELSE 0 END — all operands non-negative, so Java / == div
    def bp(x: Long): Long = if (nChars > 0) x * 10000L / nChars else 0L
    bp(r.getLong(0)) <= 2000L && bp(r.getLong(1)) <= 1800L &&
      bp(r.getLong(2)) <= 1600L && bp(r.getLong(3)) <= 1000L
  }

  override protected def nullSafeEval(input: Any): Any =
    computeKeep(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val self = ctx.addReferenceObj("repKeep", this, classOf[RepKeepExpr].getName)
      s"${ev.value} = $self.computeKeep($a);"
    })

  override protected def withNewChildInternal(newChild: Expression): RepKeepExpr =
    copy(child = newChild)
}

object RepKeepExpr {
  /** Column-API entry point: `repKeep(text)`. */
  def repKeep(text: Column): Column =
    GraftBridge.column(RepKeepExpr(GraftBridge.expression(text)))
}
