package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.GraftBridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: BPE-tokenize one word under an ordered
  * merge list (Sennrich et al. 2016, "Neural Machine Translation of
  * Rare Words with Subword Units").
  *
  * The word starts as its code-point sequence; each merge `(l, r)` is
  * applied in training order with LEFT-TO-RIGHT NON-OVERLAPPING
  * semantics (after merging at position j the scan resumes at j+2).
  * That scan order is the bit-compatibility contract with the DuckDB
  * oracle, where a round-k merge is `replace(word, l || r, <1-char
  * placeholder>)` over the placeholder-encoded word — SQL `replace`
  * is exactly leftmost non-overlapping, and in the placeholder
  * encoding every token is one character, so the two formulations
  * merge identical positions ("aaa" under (a,a) → [aa, a] in both).
  *
  * The merge list is a per-expression constant (≤ a few hundred pairs
  * broadcast inside the serialized expression — the BPE twin of a
  * codebook), so tokenization is a narrow projection: no shuffle, no
  * per-row state, and the generated code calls the scalar kernel
  * directly, keeping the projection inside whole-stage codegen.
  *
  * Null contract: null word → null; empty word → empty array.
  */
case class BpeApplyExpr(child: Expression, merges: Seq[(String, String)])
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "bpe_apply"
  override def nullable: Boolean = true

  // materialized once per (de)serialized expression instance, not per row
  @transient private lazy val mergeArr: Array[(String, String)] = merges.toArray

  /** Shared scalar kernel (also called from generated code). */
  def compute(word: UTF8String): Any = {
    val s = word.toString
    var toks = new java.util.ArrayList[String](s.length)
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      val cc = Character.charCount(cp)
      toks.add(s.substring(i, i + cc))
      i += cc
    }
    var m = 0
    while (m < mergeArr.length && toks.size > 1) {
      val l = mergeArr(m)._1
      val r = mergeArr(m)._2
      val out = new java.util.ArrayList[String](toks.size)
      var j = 0
      while (j < toks.size) {
        if (j + 1 < toks.size && toks.get(j) == l && toks.get(j + 1) == r) {
          out.add(l + r)
          j += 2
        } else {
          out.add(toks.get(j))
          j += 1
        }
      }
      toks = out
      m += 1
    }
    val arr = new Array[Any](toks.size)
    var k = 0
    while (k < toks.size) { arr(k) = UTF8String.fromString(toks.get(k)); k += 1 }
    new GenericArrayData(arr)
  }

  override protected def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val self = ctx.addReferenceObj("bpeApplyExpr", this, classOf[BpeApplyExpr].getName)
      s"${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) $self.compute($a);"
    })

  override protected def withNewChildInternal(newChild: Expression): BpeApplyExpr =
    copy(child = newChild)
}

object BpeApplyExpr {
  /** Column-API entry point: tokenize `word` under `merges`. */
  def bpeApply(word: Column, merges: Seq[(String, String)]): Column =
    GraftBridge.column(BpeApplyExpr(GraftBridge.expression(word), merges))
}
