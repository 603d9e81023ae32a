package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Engine-portable hashing: every function here is defined so the DuckDB
  * oracle can reproduce it bit-for-bit with plain SQL (md5 + integer
  * folds), while staying inside Spark whole-stage codegen (no UDFs).
  *
  * This is the foundation of the dedup / near-dup operators (SURVEY.md
  * §2.2 LLM-pipeline rows): MinHash signatures, SimHash bits and rolling
  * fingerprints all reduce to md5Code60 + modular arithmetic, so their
  * results are identical in any engine with md5 and 64-bit integers.
  */
object HashFunctions {
  /** Mersenne prime 2^31-1: big enough for minhash universes, small
    * enough that (a*x+b) stays inside Int64 (a,x < 2^31 -> a*x < 2^62). */
  val P31 = 2147483647L

  /** Value of one lowercase hex digit char. */
  def hexDigit(ch: Column): Column =
    when(ascii(ch) >= 97, ascii(ch) - 87).otherwise(ascii(ch) - 48)

  /** 60-bit integer from the first 15 hex chars of md5(c), parsed directly
    * with conv(hex, 16, 10) — one digest + one base conversion per call
    * (the earlier per-character regex-split fold was ~30 expression
    * evaluations per hash and dominated dedup runtime). */
  def md5Code60(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  /** DuckDB SQL text computing the same 60-bit code for expression `e`.
    * list_reduce without an init seeds with the first element, which
    * equals Spark's fold from 0 because 0*16 + d1 == d1. */
  def md5Code60Sql(e: String): String =
    s"""list_reduce(list_transform((string_split(md5($e),''))[1:15],
       | ch -> CAST(CASE WHEN ascii(ch) >= 97 THEN ascii(ch)-87 ELSE ascii(ch)-48 END AS BIGINT)),
       | (acc, d) -> acc*16 + d)""".stripMargin.replace("\n", " ")

  /** Universal-hash family over [0, P31): h_i(x) = (a_i * (x mod p) + b_i) mod p
    * with a_i, b_i derived from the index — reproducible anywhere. */
  def affineHash(i: Column, x: Column): Column = {
    val a = (i * lit(2654435761L)) % lit(P31)
    val b = (i * lit(40503L)) % lit(P31)
    (a * (x % lit(P31)) + b) % lit(P31)
  }

  def affineHashSql(i: String, x: String): String =
    s"((($i)*2654435761 % 2147483647) * (($x) % 2147483647) + ($i)*40503 % 2147483647) % 2147483647"
}
