package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.GraftBridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** CODEPOINT n-grams — the tokenizer for SPACE-FREE scripts (CJK, Thai,
  * ...): real pretraining corpora carry text with no word delimiters,
  * where `split(text, ' ')` (GraftFunctions.tokens) returns the whole
  * document as one "token" and every word-based gate silently degrades.
  * The standard fallback (CCNet, Gopher appendices; kenlm's SentencePiece
  * normalization) is character n-grams over codepoints.
  *
  * Works directly on UTF-8 bytes (the ShinglesExpr pattern): a byte
  * starts a codepoint iff (b & 0xC0) != 0x80, so the n-gram spans are
  * byte slices between codepoint starts — one pass, zero string copies
  * beyond the output slices, whole-stage-codegen friendly via the
  * shared scalar kernel. Oracle twin: DuckDB
  * `list_transform(generate_series(1, length(s)-n+1), i -> substring(s, i, n))`
  * (both engines' substring counts CODEPOINTS). */
case class CharNgramsExpr(child: Expression, n: Int, distinct: Boolean = false)
    extends UnaryExpression {
  require(n >= 1, s"char n-grams need n >= 1, got $n")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "char_ngrams"
  override def nullable: Boolean = true

  /** Shared scalar kernel (also called from generated code). */
  def compute(text: UTF8String): Any = {
    val bytes = text.getBytes
    val len = bytes.length
    // codepoint start offsets
    var nCp = 0
    var i = 0
    while (i < len) { if ((bytes(i) & 0xC0) != 0x80) nCp += 1; i += 1 }
    if (nCp < n) return new GenericArrayData(Array.empty[Any])
    val starts = new Array[Int](nCp + 1)
    var k = 0
    i = 0
    while (i < len) {
      if ((bytes(i) & 0xC0) != 0x80) { starts(k) = i; k += 1 }
      i += 1
    }
    starts(nCp) = len
    val last = nCp - n
    def slice(s: Int): UTF8String = {
      val from = starts(s)
      val until = starts(s + n)
      val out = new Array[Byte](until - from)
      System.arraycopy(bytes, from, out, 0, until - from)
      UTF8String.fromBytes(out)
    }
    if (!distinct) {
      val out = new Array[Any](last + 1)
      var s = 0
      while (s <= last) { out(s) = slice(s); s += 1 }
      return new GenericArrayData(out)
    }
    val seen = new java.util.LinkedHashSet[UTF8String]()
    var s = 0
    while (s <= last) { seen.add(slice(s)); s += 1 }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var j = 0
    while (it.hasNext) { out(j) = it.next(); j += 1 }
    new GenericArrayData(out)
  }

  override protected def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val self = ctx.addReferenceObj("charNgramsExpr", this, classOf[CharNgramsExpr].getName)
      s"${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) $self.compute($a);"
    })

  override protected def withNewChildInternal(newChild: Expression): CharNgramsExpr =
    copy(child = newChild)
}

object CharNgramsExpr {
  /** Multiplicity-preserving codepoint n-grams. */
  def charNgrams(text: Column, n: Int): Column =
    GraftBridge.column(CharNgramsExpr(GraftBridge.expression(text), n))

  /** First-occurrence-ordered DISTINCT codepoint n-grams. */
  def charNgramsDistinct(text: Column, n: Int): Column =
    GraftBridge.column(CharNgramsExpr(GraftBridge.expression(text), n, distinct = true))
}

/** The q221 space-free-stratum KEEP verdict of one document as a single
  * boolean kernel — ScriptDedupOps.cjkGateIds' three rules (codepoint-
  * bigram token floor/ceiling, q217 duplicate-token ceiling, localized
  * stopword evidence) computed in one codepoint walk. Same rationale as
  * GopherKeepExpr: a filter on the bigram array's derived statistics
  * re-materializes the array per reference under predicate pushdown; a
  * boolean kernel pushes as one node and walks the text once.
  * ExprPropertySpec pins keep == cjkGateIds membership row-for-row.
  *
  * Rule restatement (the relational twin, with bg = charNgrams(text,2)):
  * n_tok = |bg|, n_uniq = |distinct bg|, stop_hits = |distinct bg ∩
  * stops|; keep = 50 <= n_tok <= 100000 AND (n_tok - n_uniq) * 10000
  * div n_tok <= 6000 AND stop_hits >= 2 (the twin's n_tok = 0 case
  * nulls its division and the filter drops the row; the short-circuit
  * here agrees).
  *
  * Null contract: null text -> null. */
case class CjkGateKeepExpr(child: Expression, stops: Seq[String])
    extends UnaryExpression {

  override def dataType: DataType = org.apache.spark.sql.types.BooleanType
  override def prettyName: String = "cjk_gate_keep"
  override def nullable: Boolean = true

  @transient private lazy val stopSet: java.util.HashSet[UTF8String] = {
    val s = new java.util.HashSet[UTF8String]()
    stops.foreach(x => s.add(UTF8String.fromString(x)))
    s
  }

  /** Shared scalar kernel (also called from generated code). */
  def computeKeep(text: UTF8String): Boolean = {
    val bytes = text.getBytes
    val len = bytes.length
    var nCp = 0
    var i = 0
    while (i < len) { if ((bytes(i) & 0xC0) != 0x80) nCp += 1; i += 1 }
    if (nCp < 2) return false // no bigrams: n_tok = 0 fails the floor
    val starts = new Array[Int](nCp + 1)
    var k = 0
    i = 0
    while (i < len) {
      if ((bytes(i) & 0xC0) != 0x80) { starts(k) = i; k += 1 }
      i += 1
    }
    starts(nCp) = len
    val nTok = (nCp - 1).toLong
    if (nTok < 50L || nTok > 100000L) return false
    val seen = new java.util.HashSet[UTF8String]()
    var stopHits = 0L
    var s = 0
    while (s < nCp - 1) {
      val from = starts(s)
      val until = starts(s + 2)
      val slice = new Array[Byte](until - from)
      System.arraycopy(bytes, from, slice, 0, until - from)
      val g = UTF8String.fromBytes(slice)
      if (seen.add(g) && stopSet.contains(g)) stopHits += 1
      s += 1
    }
    val nUniq = seen.size.toLong
    (nTok - nUniq) * 10000L / nTok <= 6000L && stopHits >= 2L
  }

  override protected def nullSafeEval(input: Any): Any =
    computeKeep(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val self = ctx.addReferenceObj("cjkGateKeep", this, classOf[CjkGateKeepExpr].getName)
      s"${ev.value} = $self.computeKeep($a);"
    })

  override protected def withNewChildInternal(newChild: Expression): CjkGateKeepExpr =
    copy(child = newChild)
}

object CjkGateKeepExpr {
  /** Column-API entry point: `cjkGateKeep(text, stops)`. */
  def cjkGateKeep(text: Column, stops: Seq[String]): Column =
    GraftBridge.column(CjkGateKeepExpr(GraftBridge.expression(text), stops))
}

/** DISTINCT xxhash64 values of a document's codepoint n-grams — the
  * candidate-generation half of CJK verbatim-leak detection fused into
  * one pass. The unfused form (`explode(charNgramsDistinct(text, n))`
  * then `xxhash64(w)`) materializes every gram as its own string —
  * n codepoints x up to 3 UTF-8 bytes ≈ 120 bytes copied per input
  * byte at n = 40 — only to hash-and-discard it. Each gram is a
  * CONTIGUOUS byte span of the input (the WindowHashesExpr identity,
  * codepoint starts instead of space positions), so this expression
  * hashes the span in place with `XXH64.hashUnsafeBytes`: zero copies,
  * zero intermediate strings. Seed 42 matches Spark's `xxhash64`, so
  * results are bit-equal to the HOF twin (CharNgramsSpec pins it).
  *
  * Distinctness is BY HASH VALUE: two distinct grams that collide in
  * xxhash64 dedupe to one row here but to two equal-valued rows in the
  * twin — identical as a SET, which is the only form consumers use
  * (hash-join + distinct doc_id candidate generation; text re-verifies).
  *
  * Null contract: null text -> null; fewer than n codepoints -> empty
  * array. */
case class CharNgramHashesExpr(child: Expression, n: Int)
    extends UnaryExpression {
  require(n >= 1, s"char n-gram hashes need n >= 1, got $n")

  override def dataType: DataType = ArrayType(org.apache.spark.sql.types.LongType,
    containsNull = false)
  override def prettyName: String = "char_ngram_hashes"
  override def nullable: Boolean = true

  /** Shared scalar kernel (also called from generated code). */
  def compute(text: UTF8String): Any = {
    val bytes = text.getBytes
    val len = bytes.length
    var nCp = 0
    var i = 0
    while (i < len) { if ((bytes(i) & 0xC0) != 0x80) nCp += 1; i += 1 }
    if (nCp < n) return new GenericArrayData(Array.empty[Long])
    val starts = new Array[Int](nCp + 1)
    var k = 0
    i = 0
    while (i < len) {
      if ((bytes(i) & 0xC0) != 0x80) { starts(k) = i; k += 1 }
      i += 1
    }
    starts(nCp) = len
    val last = nCp - n
    val seen = new java.util.LinkedHashSet[java.lang.Long]()
    var s = 0
    while (s <= last) {
      val from = starts(s)
      seen.add(org.apache.spark.sql.catalyst.expressions.XXH64.hashUnsafeBytes(
        bytes, org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET + from,
        starts(s + n) - from, 42L))
      s += 1
    }
    val out = new Array[Long](seen.size)
    val it = seen.iterator()
    var j = 0
    while (it.hasNext) { out(j) = it.next(); j += 1 }
    new GenericArrayData(out)
  }

  override protected def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val self = ctx.addReferenceObj("charNgramHashes", this, classOf[CharNgramHashesExpr].getName)
      s"${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) $self.compute($a);"
    })

  override protected def withNewChildInternal(newChild: Expression): CharNgramHashesExpr =
    copy(child = newChild)
}

object CharNgramHashesExpr {
  /** Column-API entry point: distinct xxhash64 of codepoint n-grams. */
  def charNgramHashes(text: Column, n: Int): Column =
    GraftBridge.column(CharNgramHashesExpr(GraftBridge.expression(text), n))
}
