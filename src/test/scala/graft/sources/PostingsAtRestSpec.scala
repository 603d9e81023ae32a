package graft.sources

import java.nio.file.{Files, Path, Paths}

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.operators.SimilarityOps

/** The inverted index at rest (q148): the index must never change the
  * answer, and term clustering must make a query's term predicate
  * FILE-pruning — proved physically on a controlled-granularity
  * postings table by deleting every file whose bloom/string-bounds
  * exclude the query terms and showing the read still answers. */
class PostingsAtRestSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("q148 equals the index-free scorer q144 row for row") {
    val dir = TestSpark.sfDir
    val viaIndex = SimilarityOps.queries("q148_bm25_at_rest")(spark, dir)
      .collect().toSeq
    val direct = SimilarityOps.queries("q144_bm25")(spark, dir).collect().toSeq
    assert(viaIndex == direct, "the index must change I/O, never the answer")
  }

  test("term-clustered posting files prune physically on the query terms") {
    val wh: Path = Files.createTempDirectory("graft-postings")
    wh.toFile.deleteOnExit()
    spark.conf.set("spark.sql.catalog.postc", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.postc.warehouse", wh.toString)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS postc.db")
    spark.sql("CREATE TABLE postc.db.idx (term STRING, doc_id BIGINT, tf BIGINT) " +
      "TBLPROPERTIES ('write.sort-by' = 'term', 'bloom.columns' = 'term')")
    // vocabulary a..z, several docs per term; force real range fan-out
    // so files own narrow term ranges even at fixture size
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try spark.sql(
      """INSERT INTO postc.db.idx
        |SELECT chr(97 + CAST(id % 26 AS INT)), id, 1 + id % 3
        |FROM range(2600)""".stripMargin)
    finally spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
    val root = wh.resolve("db").resolve("idx")
    val entries = ManifestSink.committedEntries(root, None)
    assert(entries.size > 1, s"need multiple posting files, got ${entries.size}")

    val terms = Array[Any]("a", "m")
    val inFilter = org.apache.spark.sql.sources.In("term", terms)
    val expect = spark.table("postc.db.idx")
      .filter(org.apache.spark.sql.functions.col("term").isin(terms: _*))
      .selectExpr("term", "count(*) OVER ()").collect().length

    // delete every file whose bounds/bloom exclude BOTH query terms —
    // only file pruning can still answer after this
    val prunable = entries.filterNot(e => ManifestSink.mayMatchEntry(e, inFilter))
    assert(prunable.nonEmpty,
      s"sort clustering should leave non-matching files; bounds: " +
        entries.map(e => s"${e.name}:${e.slows.get("term")}..${e.sups.get("term")}")
          .mkString(", "))
    prunable.foreach(e => Files.delete(root.resolve(e.name)))
    val got = spark.table("postc.db.idx")
      .filter(org.apache.spark.sql.functions.col("term").isin(terms: _*))
      .collect()
    assert(got.length == expect && got.length == 200,
      s"expected 200 posting rows for 2 of 26 terms, got ${got.length}")
  }
}
