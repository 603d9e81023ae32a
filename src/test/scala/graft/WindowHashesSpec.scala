package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.plans.WindowHashesExpr

/** Bit-parity of the fused window-hash kernel against its HOF twin
  * `xxhash64(array_join(slice(split(text,' '), i, w), ' '))` — the
  * byte-identity claim (a single-space split/join reconstructs the
  * original bytes) checked on the corpus AND on adversarial token
  * shapes: consecutive spaces (empty tokens), leading/trailing spaces,
  * single-token windows, multi-byte UTF-8. */
class WindowHashesSpec extends AnyFunSuite {
  import TestSpark.{spark, sfDir}
  import spark.implicits._

  private def hof(w: Int) = when(size(split($"text", " ")) >= w,
    transform(
      sequence(lit(1), size(split($"text", " ")) - lit(w - 1)),
      i => xxhash64(array_join(slice(split($"text", " "), i, lit(w)), " "))))
    .otherwise(array().cast("array<bigint>"))

  private def assertParity(df: org.apache.spark.sql.DataFrame, w: Int): Unit = {
    val bad = df
      .select($"text", WindowHashesExpr.windowHashes($"text", w).as("native"),
        hof(w).as("twin"))
      .filter(not($"native" <=> $"twin"))
      .limit(1).collect()
    assert(bad.isEmpty, s"w=$w mismatch on: ${bad.headOption.map(_.getString(0))}")
  }

  test("bit-parity on every corpus document at several widths") {
    val docs = graft.engine.Tables.documents(spark, sfDir).select($"text")
    Seq(1, 2, 20).foreach(w => assertParity(docs, w))
  }

  test("bit-parity on adversarial token shapes") {
    val tricky = Seq(
      "a b c d e",
      "a  b", // consecutive spaces -> empty token
      " a b", // leading space -> leading empty token
      "a b ", // trailing space -> trailing empty token
      "   ", // only empty tokens
      "single",
      "héllo wörld ünicode bytes", // multi-byte UTF-8
      "a"
    ).toDF("text")
    Seq(1, 2, 3).foreach(w => assertParity(tricky, w))
  }

  test("short documents yield an empty array, null yields null") {
    val df = Seq(Some("a b"), None).toDF("text")
      .select($"text", WindowHashesExpr.windowHashes($"text", 5).as("h"))
    val rows = df.collect()
    assert(rows.find(_.getString(0) == "a b").get.getSeq[Long](1).isEmpty)
    assert(rows.find(_.isNullAt(0)).get.isNullAt(1))
  }
}
