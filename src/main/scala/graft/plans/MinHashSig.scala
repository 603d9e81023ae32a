package graft.plans

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.GraftBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: the full MinHash signature of a shingle
  * set in ONE fused loop per row — `sig[i] = min over shingles of
  * affineHash(i+1, md5Code60(shingle))` for `numHashes` hash functions.
  *
  * This is the map-only twin of DedupOps.withSignature's relational
  * formulation (explode → 16 partial-min aggregates). The relational
  * path shuffles one row per (doc, shingle) — ~29M rows at sf1 — purely
  * to compute per-doc minima; this expression computes the same minima
  * inside the row, so signature building becomes a narrow projection
  * with NO exchange at all, and the md5 digest runs exactly once per
  * shingle (the reason the relational rebuild existed in the first
  * place — HOF lambdas re-evaluated it 16×).
  *
  * Bit-compatibility contract (the DuckDB oracle and the relational twin
  * must agree exactly):
  *   - md5Code60: first 15 hex digits of md5 == the first 15 nibbles of
  *     the digest folded base-16 (identical to conv(substring(md5,1,15),
  *     16,10) for values < 2^60).
  *   - affineHash(i, x) = ((i·2654435761 mod p)·(x mod p) + i·40503 mod
  *     p) mod p with p = 2^31-1, i in 1..numHashes — the same family in
  *     HashFunctions.affineHash / affineHashSql.
  *
  * Null contract: null array -> null; empty array -> null (a doc with no
  * shingles has no signature — the relational groupBy drops it the same
  * way); null elements are not expected (shingle arrays are built
  * null-free) and would NPE rather than silently skew a signature.
  */
case class MinHashSigExpr(child: Expression, numHashes: Int)
    extends UnaryExpression {

  private val P31 = 2147483647L

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_sig"
  override def nullable: Boolean = true

  // a(i), b(i) for hash index i in 1..numHashes (position i-1)
  @transient private lazy val hashA: Array[Long] =
    Array.tabulate(numHashes)(k => ((k + 1).toLong * 2654435761L) % P31)
  @transient private lazy val hashB: Array[Long] =
    Array.tabulate(numHashes)(k => ((k + 1).toLong * 40503L) % P31)

  @transient private lazy val digests = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }

  /** Shared scalar kernel (also called from generated code). */
  def compute(arr: ArrayData): Any = {
    val n = arr.numElements()
    if (n == 0) return null
    val mins = Array.fill(numHashes)(Long.MaxValue)
    val md = digests.get()
    var s = 0
    while (s < n) {
      val shingle: UTF8String = arr.getUTF8String(s)
      md.reset()
      val digest = md.digest(shingle.getBytes)
      // fold the first 15 nibbles base-16 (== conv(substring(md5,1,15),16,10))
      var code = 0L
      var b = 0
      while (b < 7) {
        code = code * 256 + (digest(b) & 0xff)
        b += 1
      }
      code = code * 16 + ((digest(7) & 0xf0) >> 4)
      val x = code % P31
      var i = 0
      while (i < numHashes) {
        val h = (hashA(i) * x + hashB(i)) % P31
        if (h < mins(i)) mins(i) = h
        i += 1
      }
      s += 1
    }
    new GenericArrayData(mins)
  }

  override protected def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[ArrayData])

  // The kernel (md5 + modular folds) is a single opaque call from
  // generated code: no interpreted lambda dispatch per shingle, and the
  // projection stays inside the surrounding WholeStageCodegen span.
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val self = ctx.addReferenceObj("minhashSig", this, classOf[MinHashSigExpr].getName)
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

  override protected def withNewChildInternal(newChild: Expression): MinHashSigExpr =
    copy(child = newChild)
}

object MinHashSigExpr {
  /** Column-API entry point: `sigNative(shingles, numHashes)`. */
  def sigNative(shingles: Column, numHashes: Int): Column =
    GraftBridge.column(MinHashSigExpr(GraftBridge.expression(shingles), numHashes))
}

/** The scan-level fusion of tokenize → n-gram shingle → MinHash: the
  * signature straight from the TEXT column, one pass over the raw bytes,
  * zero intermediate arrays.
  *
  * Key identity: with single-space tokenization, the n-gram shingle
  * `tok(i) ++ " " ++ … ++ tok(i+n-1)` IS the byte slice of the text from
  * the start of token i to the end of token i+n-1 (this also holds for
  * the empty tokens a repeated/leading/trailing space produces under
  * split-with-trailing semantics). So each shingle's md5 runs directly
  * on a slice of the input buffer — no tokens array, no shingle strings,
  * no array_distinct (duplicate shingles cannot change a minimum).
  * Profiling at sf1: building the shingle-array column for 50k docs cost
  * 7.8 s; this expression signs the same corpus in ~1 s.
  *
  * Bit-compatibility: md5Code60 + affineHash as in [[MinHashSigExpr]];
  * ExtensionsSpec asserts equality with the relational explode→groupBy
  * path over every fixture doc. Docs with fewer than n tokens -> null
  * (the relational pipeline's `filter(size(shingles) > 0)`).
  */
case class MinHashFromTextExpr(child: Expression, n: Int, numHashes: Int)
    extends UnaryExpression {

  private val P31 = 2147483647L

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_text"
  override def nullable: Boolean = true

  @transient private lazy val hashA: Array[Long] =
    Array.tabulate(numHashes)(k => ((k + 1).toLong * 2654435761L) % P31)
  @transient private lazy val hashB: Array[Long] =
    Array.tabulate(numHashes)(k => ((k + 1).toLong * 40503L) % P31)

  @transient private lazy val digests = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }

  /** Shared scalar kernel (also called from generated code). */
  def compute(text: UTF8String): Any = {
    val bytes = text.getBytes
    val len = bytes.length
    // token start offsets (a token starts at 0 and after every space);
    // token k spans [starts(k), ends(k)) with ends(k) = next space or len
    var nTok = 1
    var i = 0
    while (i < len) { if (bytes(i) == ' ') nTok += 1; i += 1 }
    if (nTok < n) return null
    val starts = new Array[Int](nTok)
    var k = 1
    i = 0
    while (i < len) {
      if (bytes(i) == ' ') { starts(k) = i + 1; k += 1 }
      i += 1
    }
    val mins = Array.fill(numHashes)(Long.MaxValue)
    val md = digests.get()
    var s = 0
    val last = nTok - n
    while (s <= last) {
      val from = starts(s)
      val until = if (s + n < nTok) starts(s + n) - 1 else len
      md.reset()
      md.update(bytes, from, until - from)
      val digest = md.digest()
      var code = 0L
      var b = 0
      while (b < 7) {
        code = code * 256 + (digest(b) & 0xff)
        b += 1
      }
      code = code * 16 + ((digest(7) & 0xf0) >> 4)
      val x = code % P31
      var h = 0
      while (h < numHashes) {
        val v = (hashA(h) * x + hashB(h)) % P31
        if (v < mins(h)) mins(h) = v
        h += 1
      }
      s += 1
    }
    new GenericArrayData(mins)
  }

  override protected def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val self = ctx.addReferenceObj("minhashText", this, classOf[MinHashFromTextExpr].getName)
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

  override protected def withNewChildInternal(newChild: Expression): MinHashFromTextExpr =
    copy(child = newChild)
}

object MinHashFromTextExpr {
  /** Column-API entry point: `sigFromText(text, n, numHashes)`. */
  def sigFromText(text: Column, n: Int, numHashes: Int): Column =
    GraftBridge.column(MinHashFromTextExpr(GraftBridge.expression(text), n, numHashes))
}

/** Native distinct n-gram shingle set, by byte slices: the codegen'd twin
  * of `GraftFunctions.shingleSet` (split + chained zip_with concat +
  * array_distinct), which allocates two intermediate arrays and performs
  * per-element UTF8String concats per pass — the dominant cost of the
  * dedup verification path once signatures fused (6+ s of sf1's q41).
  * Each shingle is a single copied slice of the input buffer (the same
  * byte-identity as [[MinHashFromTextExpr]]); distinctness via a hash
  * set, first-occurrence order — exactly array_distinct's order, so the
  * HOF twin and this expression are equal as ARRAYS, not just as sets
  * (ExtensionsSpec asserts it).
  *
  * Null contract: null text -> null; fewer than n tokens -> empty array
  * (mirroring shingleSet, whose consumers filter on size > 0).
  *
  * `distinct = false` keeps duplicate shingles WITH MULTIPLICITY in
  * position order — the codegen'd twin of `GraftFunctions.shingles`
  * (the frequency-counting form, e.g. q58's bigram ranking), same
  * single-pass byte-slice kernel minus the dedup set.
  */
case class ShinglesExpr(child: Expression, n: Int, distinct: Boolean = true)
    extends UnaryExpression {

  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.StringType, containsNull = false)
  override def prettyName: String = "shingles"
  override def nullable: Boolean = true

  /** Shared scalar kernel (also called from generated code). */
  def compute(text: UTF8String): Any = {
    val bytes = text.getBytes
    val len = bytes.length
    var nTok = 1
    var i = 0
    while (i < len) { if (bytes(i) == ' ') nTok += 1; i += 1 }
    if (nTok < n) return new GenericArrayData(Array.empty[Any])
    val starts = new Array[Int](nTok)
    var k = 1
    i = 0
    while (i < len) {
      if (bytes(i) == ' ') { starts(k) = i + 1; k += 1 }
      i += 1
    }
    val last = nTok - n
    if (!distinct) {
      val out = new Array[Any](last + 1)
      var s = 0
      while (s <= last) {
        val from = starts(s)
        val until = if (s + n < nTok) starts(s + n) - 1 else len
        val slice = new Array[Byte](until - from)
        System.arraycopy(bytes, from, slice, 0, until - from)
        out(s) = UTF8String.fromBytes(slice)
        s += 1
      }
      return new GenericArrayData(out)
    }
    val seen = new java.util.LinkedHashSet[UTF8String]()
    var s = 0
    while (s <= last) {
      val from = starts(s)
      val until = if (s + n < nTok) starts(s + n) - 1 else len
      val slice = new Array[Byte](until - from)
      System.arraycopy(bytes, from, slice, 0, until - from)
      seen.add(UTF8String.fromBytes(slice))
      s += 1
    }
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
      val self = ctx.addReferenceObj("shinglesExpr", this, classOf[ShinglesExpr].getName)
      s"${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) $self.compute($a);"
    })

  override protected def withNewChildInternal(newChild: Expression): ShinglesExpr =
    copy(child = newChild)
}

object ShinglesExpr {
  /** Column-API entry point: `shinglesNative(text, n)`. */
  def shinglesNative(text: Column, n: Int): Column =
    GraftBridge.column(ShinglesExpr(GraftBridge.expression(text), n))

  /** Multiplicity-preserving form (twin of `GraftFunctions.shingles`). */
  def shinglesAllNative(text: Column, n: Int): Column =
    GraftBridge.column(ShinglesExpr(GraftBridge.expression(text), n, distinct = false))
}
