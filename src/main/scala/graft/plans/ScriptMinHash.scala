package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.GraftBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** SCRIPT-AWARE fused MinHash signature: the tokenize→shingle→MinHash
  * scan kernel ([[MinHashFromTextExpr]]) extended to space-free scripts.
  *
  * Word-split tokenization is structurally blind on CJK/Thai text — a
  * whole space-free document becomes ONE token, so it has fewer than n
  * word shingles and gets NO signature at all (q217 proved the failure
  * mode on the quality gates; near-dup LSH degrades identically: every
  * CJK near-dup pair is silently missed). The script-aware contract
  * (CCNet's per-language pipelines; SentencePiece's character fallback):
  * detect the script per document, shingle space-free docs as CODEPOINT
  * n-grams and spaced docs as word n-grams, then MinHash either shingle
  * set with the same hash family.
  *
  * Detection is the same rule both the q216 tokenizer and the DuckDB
  * oracle state: a doc is space-free when MORE THAN HALF its codepoints
  * belong to `alphabet` (the corpus's space-free block) — counted here
  * by one UTF-8 decode pass, in SQL by length-difference after
  * translate-removal. The two counts agree by construction (both count
  * codepoints ∈ alphabet).
  *
  * The branches reuse the existing kernels verbatim — word docs run
  * [[MinHashFromTextExpr]]'s byte-slice loop, space-free docs run
  * [[CharNgramsExpr]] → [[MinHashSigExpr]] — so bit-compatibility with
  * the relational twins and the oracle's md5Code60/affineHash algebra
  * is inherited, not re-proven. Null contract: fewer than `wordN`
  * tokens (spaced) or `charN` codepoints (space-free) → null, the
  * `filter(size > 0)` of the relational pipeline.
  *
  * Scale shape: one narrow projection over the text scan, NO exchange —
  * signature building for a mixed-script 100 TB corpus is the same
  * map-only pass as the monoscript path.
  */
case class ScriptMinHashExpr(child: Expression, alphabet: String,
    wordN: Int, charN: Int, numHashes: Int) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "script_minhash"
  override def nullable: Boolean = true

  @transient private lazy val wordKernel = MinHashFromTextExpr(child, wordN, numHashes)
  @transient private lazy val charKernel = CharNgramsExpr(child, charN)
  @transient private lazy val sigKernel = MinHashSigExpr(child, numHashes)
  @transient private lazy val alphaCps: java.util.HashSet[Integer] = {
    val s = new java.util.HashSet[Integer]()
    alphabet.codePoints().forEach(cp => { s.add(cp); () })
    s
  }

  /** One UTF-8 decode pass: true iff codepoints-in-alphabet * 2 >
    * total codepoints — the scriptOf / oracle translate rule. */
  private def isSpaceFree(bytes: Array[Byte]): Boolean = {
    val len = bytes.length
    var total = 0
    var inAlpha = 0
    var i = 0
    while (i < len) {
      val b0 = bytes(i) & 0xff
      var cp = 0
      var w = 1
      if (b0 < 0x80) { cp = b0 }
      else if ((b0 & 0xE0) == 0xC0) {
        cp = ((b0 & 0x1F) << 6) | (bytes(i + 1) & 0x3F); w = 2
      } else if ((b0 & 0xF0) == 0xE0) {
        cp = ((b0 & 0x0F) << 12) | ((bytes(i + 1) & 0x3F) << 6) |
          (bytes(i + 2) & 0x3F); w = 3
      } else {
        cp = ((b0 & 0x07) << 18) | ((bytes(i + 1) & 0x3F) << 12) |
          ((bytes(i + 2) & 0x3F) << 6) | (bytes(i + 3) & 0x3F); w = 4
      }
      total += 1
      if (alphaCps.contains(cp)) inAlpha += 1
      i += w
    }
    inAlpha * 2 > total
  }

  /** Shared scalar kernel (also called from generated code). */
  def compute(text: UTF8String): Any =
    if (isSpaceFree(text.getBytes)) {
      // MinHashSigExpr maps an empty shingle array (doc shorter than
      // charN codepoints) to null — the word branch's "< n tokens" twin
      sigKernel.compute(charKernel.compute(text).asInstanceOf[ArrayData])
    } else wordKernel.compute(text)

  override protected def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val self = ctx.addReferenceObj("scriptMinhash", this, classOf[ScriptMinHashExpr].getName)
      val result = ctx.freshName("sigResult")
      s"""
         |Object $result = $self.compute($a);
         |if ($result == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) $result;
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): ScriptMinHashExpr =
    copy(child = newChild)
}

object ScriptMinHashExpr {
  /** Column-API entry point. */
  def sigScriptAware(text: Column, alphabet: String, wordN: Int, charN: Int,
      numHashes: Int): Column =
    GraftBridge.column(ScriptMinHashExpr(
      GraftBridge.expression(text), alphabet, wordN, charN, numHashes))
}
