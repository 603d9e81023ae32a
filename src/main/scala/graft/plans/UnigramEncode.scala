package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.GraftBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: Viterbi-segment one word under a unigram
  * piece vocabulary (Kudo 2018, "Subword Regularization" — the
  * SentencePiece unigram LM model), returning the 1-best piece sequence
  * and its total cost.
  *
  * The vocabulary is a per-expression constant (piece → integer
  * MILLI-NAT cost, quantized once per training round — see
  * UnigramOps for why integer costs are the cross-engine determinism
  * contract), so encoding is a narrow projection: no shuffle, no
  * per-row state, and the generated code calls the scalar kernel
  * directly, keeping the projection inside whole-stage codegen — the
  * unigram twin of [[BpeApplyExpr]]'s broadcast-merge-list design.
  *
  * DP contract (bit-compatible with the DuckDB oracle's recursive-CTE
  * replay): positions are CODEPOINTS; `best(k)` is the cheapest
  * segmentation of the k-codepoint prefix; candidates at k are the
  * vocabulary pieces ending at k with length ≤ maxPiece; ties break by
  * LONGEST piece (two candidates at one cell with equal length are the
  * same piece, so no further tie-break exists). Unreachable final
  * state → null (never silently partial).
  *
  * Output: struct(pieces ARRAY<STRING>, cost_milli BIGINT) — both
  * facets of the DP computed once, so consumers never project the
  * kernel twice (the q212 lesson).
  */
case class UnigramEncodeExpr(child: Expression, vocab: Seq[(String, Long)],
    maxPiece: Int) extends UnaryExpression {
  require(maxPiece >= 1, s"unigram maxPiece must be >= 1, got $maxPiece")

  override def dataType: DataType = StructType(Seq(
    StructField("pieces", ArrayType(StringType, containsNull = false)),
    StructField("cost_milli", LongType)))
  override def prettyName: String = "unigram_encode"
  override def nullable: Boolean = true

  /** Unreachable-state sentinel — far above any real path total
    * (costs are ≤ ~1000·ln(T) milli-nats per piece). */
  private val Big = 1L << 40

  @transient private lazy val vmap: java.util.HashMap[String, java.lang.Long] = {
    val m = new java.util.HashMap[String, java.lang.Long](vocab.size * 2)
    vocab.foreach { case (p, c) => m.put(p, c) }
    m
  }

  /** Shared scalar kernel (also called from generated code). */
  def compute(word: UTF8String): Any = {
    val s = word.toString
    val sl = s.length
    // codepoint start offsets (idx(i) = char index of codepoint i)
    var n = 0
    var ci = 0
    while (ci < sl) { ci += Character.charCount(s.codePointAt(ci)); n += 1 }
    val idx = new Array[Int](n + 1)
    ci = 0
    var k = 0
    while (ci < sl) { idx(k) = ci; ci += Character.charCount(s.codePointAt(ci)); k += 1 }
    idx(n) = sl
    val best = Array.fill(n + 1)(Big)
    val bl = new Array[Int](n + 1)
    best(0) = 0L
    var p = 1
    while (p <= n) {
      val maxL = math.min(p, maxPiece)
      var bT = Long.MaxValue
      var bL = 0
      var l = 1
      while (l <= maxL) {
        if (best(p - l) < Big) {
          val c = vmap.get(s.substring(idx(p - l), idx(p)))
          if (c != null) {
            val t = best(p - l) + c.longValue()
            // ties break by LONGEST piece: l iterates ascending, so a
            // strictly-greater l with an equal total overwrites
            if (t < bT || (t == bT && l > bL)) { bT = t; bL = l }
          }
        }
        l += 1
      }
      if (bL > 0) { best(p) = bT; bl(p) = bL }
      p += 1
    }
    if (best(n) >= Big) return null
    var cnt = 0
    var q = n
    while (q > 0) { cnt += 1; q -= bl(q) }
    val pieces = new Array[Any](cnt)
    q = n
    var w = cnt - 1
    while (q > 0) {
      val l = bl(q)
      pieces(w) = UTF8String.fromString(s.substring(idx(q - l), idx(q)))
      w -= 1
      q -= l
    }
    new GenericInternalRow(Array[Any](new GenericArrayData(pieces), best(n)))
  }

  override protected def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val self = ctx.addReferenceObj("unigramEncodeExpr", this,
        classOf[UnigramEncodeExpr].getName)
      val result = ctx.freshName("segResult")
      s"""
         |Object $result = $self.compute($a);
         |if ($result == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = (org.apache.spark.sql.catalyst.InternalRow) $result;
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): UnigramEncodeExpr =
    copy(child = newChild)
}

object UnigramEncodeExpr {
  /** Column-API entry point: Viterbi-segment `word` under the milli-nat
    * cost vocabulary; returns struct(pieces, cost_milli). */
  def unigramEncode(word: Column, vocab: Seq[(String, Long)],
      maxPiece: Int): Column =
    GraftBridge.column(UnigramEncodeExpr(
      GraftBridge.expression(word), vocab, maxPiece))
}
