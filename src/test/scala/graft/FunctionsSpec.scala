package graft

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.GraftFunctions._
import graft.functions.HashFunctions._

class FunctionsSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  private def oneText(t: String) = Seq(t).toDF("text")

  test("shingles: normal, boundary, and short documents") {
    def sh(t: String): Seq[String] =
      oneText(t).select(shingles(col("text"), 3)).as[Seq[String]].head()
    assert(sh("a b c d e") == Seq("a b c", "b c d", "c d e"))
    assert(sh("a b c") == Seq("a b c"))
    assert(sh("a b") == Seq.empty)
    assert(sh("a") == Seq.empty)
  }

  test("shingleSet deduplicates repeated shingles") {
    val s = oneText("x y z x y z x y z")
      .select(shingleSet(col("text"), 3)).as[Seq[String]].head()
    assert(s.toSet == Set("x y z", "y z x", "z x y"))
    assert(s.length == 3)
  }

  test("md5Code60 equals the first 15 hex digits of java MD5") {
    for (v <- Seq("hello world", "", "graft", "a b c")) {
      val hex = MessageDigest.getInstance("MD5")
        .digest(v.getBytes(StandardCharsets.UTF_8)).map(b => f"$b%02x").mkString
      val expected = java.lang.Long.parseLong(hex.take(15), 16)
      val got = Seq(v).toDF("v").select(md5Code60(col("v"))).as[Long].head()
      assert(got == expected, s"for input '$v'")
    }
  }

  test("affineHash stays in [0, P31) and is reproducible") {
    val df = Seq((1L, 42L), (7L, 123456789L), (16L, Long.MaxValue / 4)).toDF("i", "x")
    val got = df.select(affineHash(col("i"), col("x"))).as[Long].collect()
    assert(got.forall(h => h >= 0 && h < P31))
    val again = df.select(affineHash(col("i"), col("x"))).as[Long].collect()
    assert(got.sameElements(again))
  }

  test("cents recovers exact integer cents from 2-decimal doubles") {
    val df = Seq(0.01, 12.34, 99999.99, 0.0, 7.1).toDF("v")
    assert(df.select(cents(col("v"))).as[Long].collect().toSeq ==
      Seq(1L, 1234L, 9999999L, 0L, 710L))
  }

  test("rollingFingerprint matches a manual fold") {
    val text = "ab cde f"
    def code(t: String): Long = t.length.toLong * 256 + t.head.toInt
    val expected = text.split(" ").foldLeft(0L)((acc, t) =>
      java.lang.Math.floorMod(acc * 31 + code(t), 1000000007L))
    val got = oneText(text).select(rollingFingerprint(col("text"))).as[Long].head()
    assert(got == expected)
  }

  test("mapToSortedString renders keys in sorted order") {
    val df = Seq(1).toDF("x").select(
      map_from_arrays(array(lit("b"), lit("a")), array(lit("2"), lit("1"))).as("m"))
    assert(df.select(mapToSortedString(col("m"))).as[String].head() == "a=1,b=2")
  }
}
