package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Scalar/column building blocks shared by the graft operators.
  *
  * Everything here is composed from `org.apache.spark.sql.functions`
  * built-ins (whole-stage-codegen'd) — no Scala UDFs — so plans stay
  * inside Tungsten and survive a 100 TB scale-up unchanged.
  *
  * Determinism note (drives the DuckDB-oracle gate, SURVEY.md §4.3/§7.4):
  * floating-point SUMs are order-dependent and Spark's partial/final
  * aggregation order differs from DuckDB's single-threaded order. All
  * money-like 2-decimal doubles are therefore aggregated as exact integer
  * cents ([[cents]]) and only divided back to doubles *after* aggregation
  * (a single IEEE division of exact integers is bit-identical in both
  * engines).
  */
object GraftFunctions {

  /** Exact integer cents for a 2-decimal double (prices, balances,
    * quantities in the fixtures). `x*100` is within 1e-10 of an integer for
    * any 2-decimal value, so `round` recovers it exactly; the aggregate of
    * longs is then order-independent. */
  def cents(c: Column): Column = round(c * lit(100)).cast("long")

  /** Whitespace tokenization. The fixture `documents.text` is
    * single-space-separated with no leading/trailing spaces, so this is
    * identical to DuckDB's `string_split(text, ' ')`. */
  def tokens(text: Column): Column = split(text, " ")

  /** Word n-gram shingles, the unit of near-duplicate detection
    * (reference analog: the text-shaping loop at
    * rws_data_ingester src/rotterdam_swimming_advice.py:79-91).
    * Returns an empty array for documents shorter than `n` tokens.
    * 1-based `element_at` keeps the expression portable to DuckDB's
    * 1-based list indexing. */
  def shingles(text: Column, n: Int): Column = {
    val toks = tokens(text)
    val L = size(toks)
    // zip_with over shifted slices instead of element_at over a position
    // sequence: HOF array arguments are evaluated once per ROW, whereas a
    // row-dependent subexpression inside the lambda (element_at(toks, ...))
    // is re-evaluated per ELEMENT — that turned each 50-token doc into
    // ~150 regex splits and made shingling ~1000x slower than it should be.
    // zip_with null-pads the shorter side and concat propagates the null,
    // so the trailing (n-1) incomplete shingles become null and are cut by
    // the final slice. Guard L >= n: when() branches evaluate lazily, so
    // the negative slice length in the short-doc case is never executed.
    val joined = (2 to n).foldLeft(toks) { (acc, k) =>
      zip_with(acc, slice(toks, lit(k), L - (k - 1)), (x, y) => concat(x, lit(" "), y))
    }
    when(L >= n, slice(joined, lit(1), L - (n - 1)))
      .otherwise(array().cast("array<string>"))
  }

  /** Distinct shingles (set semantics for Jaccard). */
  def shingleSet(text: Column, n: Int): Column = array_distinct(shingles(text, n))

  /** Portable per-token integer: `length(t)*256 + ascii(t)`. Computable
    * identically in DuckDB SQL (both `ascii` return the first char's code
    * point), used where the oracle must reproduce a hash-like value. */
  def tokenCode(t: Column): Column = length(t) * lit(256) + ascii(t)

  /** Rolling polynomial fingerprint of a document: a sequential left-fold
    * `acc = (acc*31 + tokenCode(t)) mod 1e9+7` over the token stream.
    * Both Spark's `aggregate` HOF and DuckDB's `list_reduce` fold
    * left-to-right, and the modulus keeps every intermediate well inside
    * Int64 (no overflow — DuckDB errors on BIGINT overflow rather than
    * wrapping). Fixed-width result regardless of document size. */
  def rollingFingerprint(text: Column): Column =
    aggregate(
      tokens(text),
      lit(0L),
      (acc, t) => pmod(acc * lit(31L) + tokenCode(t).cast("long"), lit(1000000007L)))

  /** Render a map column as a canonical sorted `k=v,k=v` string so results
    * are hashable/comparable across engines (maps have no defined order). */
  def mapToSortedString(m: Column): Column =
    array_join(
      transform(
        array_sort(map_entries(m)),
        e => concat(e.getField("key"), lit("="), e.getField("value").cast("string"))),
      ",")
}
