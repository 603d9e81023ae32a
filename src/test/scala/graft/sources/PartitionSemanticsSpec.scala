package graft.sources

import java.nio.file.{Files, Path}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Partition-tuple evaluation is EXACT, so its comparison semantics
  * must be the COLUMN's SQL semantics, not a guess from the value's
  * shape: a STRING partition holding numeric-looking values compares
  * as a string ('7' > '10' is TRUE), doubles compare as doubles, and
  * an undecidable static-overwrite filter fails loudly instead of
  * silently degrading the overwrite into an append. */
class PartitionSemanticsSpec extends AnyFunSuite {
  import graft.TestSpark.spark
  import spark.implicits._

  private val wh: Path = {
    val p = Files.createTempDirectory("graft-psem")
    p.toFile.deleteOnExit()
    spark.conf.set("spark.sql.catalog.pscat", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.pscat.warehouse", p.toString)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS pscat.db")
    p
  }
  private def root(t: String): Path = wh.resolve("db").resolve(t)

  test("string partitions with numeric-looking values compare as STRINGS") {
    spark.sql("CREATE TABLE pscat.db.s (id BIGINT, grp STRING) PARTITIONED BY (grp)")
    spark.sql("INSERT INTO pscat.db.s VALUES (1, '7'), (2, '7'), (3, '10')")
    // SQL string semantics: '7' > '10' is TRUE — numeric evaluation
    // would prune the '7' partition and silently lose both rows
    assert(spark.table("pscat.db.s").filter($"grp" > "10")
      .select($"id").as[Long].collect().sorted.toSeq == Seq(1L, 2L))
    // and the metadata-only delete must agree: this PROVES '7' matches
    import org.apache.spark.sql.sources.GreaterThan
    val res = ManifestSink.deleteWhere(root("s").toString,
      Seq(GreaterThan("grp", "10")))
    assert(res.deletedRows == 2L && res.provenFiles > 0, s"got $res")
    assert(spark.table("pscat.db.s").select($"grp").as[String].collect().toSeq ==
      Seq("10"))
  }

  test("double partitions compare as DOUBLES, not lexically") {
    spark.sql("CREATE TABLE pscat.db.d (id BIGINT, d DOUBLE) PARTITIONED BY (d)")
    spark.sql("INSERT INTO pscat.db.d VALUES (1, CAST(2.0 AS DOUBLE)), (2, CAST(10.0 AS DOUBLE))")
    // lexical comparison says '10.0' < '9.0' and would prune the
    // matching partition
    assert(spark.table("pscat.db.d").filter($"d" > 9.0)
      .select($"id").as[Long].collect().toSeq == Seq(2L))
  }

  test("undecidable static-overwrite filters fail loudly, never append") {
    spark.sql("CREATE TABLE pscat.db.o (id BIGINT, grp STRING) PARTITIONED BY (grp)")
    spark.sql("INSERT INTO pscat.db.o VALUES (1, 'aaa'), (2, 'bbb')")
    // endsWith has no partition-tuple decision (startsWith gained an
    // exact one with the hidden-partitioning work, so it's no longer
    // the undecidable example)
    val err = intercept[Exception] {
      spark.range(10, 12).select($"id", lit("aaa").as("grp"))
        .writeTo("pscat.db.o").overwrite($"grp".endsWith("a"))
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Seq.empty else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(err).exists(m => m.contains("not decidable") ||
      m.contains("Invalid overwrite") || m.contains("unsupported")), s"got: ${msgs(err)}")
    // the failed overwrite must not have appended its files
    assert(spark.table("pscat.db.o").count() == 2L)

    // startsWith on a partition column is now DECIDABLE — the overwrite
    // replaces exactly the matching partition
    spark.range(10, 12).select($"id", lit("aaa").as("grp"))
      .writeTo("pscat.db.o").overwrite($"grp".startsWith("a"))
    assert(spark.table("pscat.db.o").select($"id").as[Long].collect().sorted.toSeq
      == Seq(2L, 10L, 11L))
  }

  test("exact evaluation orders strings by UTF-8 bytes and doubles by SQL equality") {
    import org.apache.spark.sql.sources.{EqualTo, GreaterThan, In}
    // U+1F600 (😀) is surrogate pair D83D/DE00 in UTF-16, so
    // String.compareTo puts it BELOW U+FFFD — but Spark's row comparison
    // (UTF8String bytes) puts it ABOVE. A wrong exact-false here would
    // drop the file from scans and metadata-delete it.
    assert(ManifestSink.evalPartFilter(GreaterThan("s", "�"),
      Map("s" -> "😀")).contains(true))
    assert(ManifestSink.evalPartFilter(GreaterThan("s", "😀"),
      Map("s" -> "�")).contains(false))
    // SQL double equality: -0.0 = 0.0 (java compare says -0.0 < 0.0)
    assert(ManifestSink.evalPartFilter(EqualTo("d", 0.0d),
      Map("d" -> "-0.0")).contains(true))
    assert(ManifestSink.evalPartFilter(In("d", Array[Any](-0.0d)),
      Map("d" -> "0.0")).contains(true))
    // NaN is self-equal and largest under SQL semantics
    assert(ManifestSink.evalPartFilter(EqualTo("d", Double.NaN),
      Map("d" -> "NaN")).contains(true))
    assert(ManifestSink.evalPartFilter(GreaterThan("d", 1e308),
      Map("d" -> "NaN")).contains(true))
  }

  test("unsupported partition column types are rejected at CREATE") {
    val err = intercept[Exception] {
      spark.sql("CREATE TABLE pscat.db.bad (id BIGINT, d DATE) PARTITIONED BY (d)")
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Seq.empty else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(err).exists(_.contains("unsupported type")), s"got: ${msgs(err)}")
  }

  test("ADD COLUMN FIRST/AFTER fails loudly instead of silently appending") {
    spark.sql("CREATE TABLE pscat.db.ac (id BIGINT, v BIGINT)")
    intercept[Exception] {
      spark.sql("ALTER TABLE pscat.db.ac ADD COLUMN w BIGINT FIRST")
    }
    intercept[Exception] {
      spark.sql("ALTER TABLE pscat.db.ac ADD COLUMN w BIGINT AFTER id")
    }
    assert(spark.table("pscat.db.ac").schema.fieldNames.toSeq == Seq("id", "v"))
    spark.sql("ALTER TABLE pscat.db.ac ADD COLUMN w BIGINT") // plain add still works
    assert(spark.table("pscat.db.ac").schema.fieldNames.toSeq == Seq("id", "v", "w"))
  }

  test("ZORDER rejects 5+ columns; wide domains cluster without overflow") {
    spark.sql("CREATE TABLE pscat.db.z " +
      "(a BIGINT, b BIGINT, c BIGINT, d BIGINT, e BIGINT)")
    spark.sql("INSERT INTO pscat.db.z SELECT id, id, id, id, id FROM range(10)")
    intercept[Exception] {
      ManifestSink.compactZOrder(spark, root("z").toString,
        Seq("a", "b", "c", "d", "e"), 100L)
    }
    // wide domain: values up to ~4.6e18 — the unshifted (v-lo)*65535
    // would overflow Long and clamp every z-key to 0
    spark.sql("CREATE TABLE pscat.db.w (id BIGINT, v BIGINT)")
    spark.sql("INSERT INTO pscat.db.w SELECT id, id * 461168601842738790 FROM range(10)")
    val res = ManifestSink.compactZOrder(spark, root("w").toString, Seq("v"), 5L)
    assert(res.rewrittenRows == 10L)
    val es = ManifestSink.committedEntries(root("w"), None)
    assert(es.size >= 2, s"expected multiple clustered files: $es")
    // clustering must be real: per-file v-ranges disjoint
    val ranges = es.map(e => (e.mins("v"), e.maxs("v"))).sortBy(_._1)
    ranges.sliding(2).foreach {
      case Seq((_, hi), (lo, _)) => assert(hi < lo, s"ranges overlap: $ranges")
      case _ => ()
    }
  }
}
