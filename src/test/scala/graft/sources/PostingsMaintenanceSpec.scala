package graft.sources

import java.nio.file.{Files, Path}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The search-ingest loop: document appends incrementally maintain the
  * BM25 postings table + corpus constants through the change feed —
  * index maintenance as a change-feed consumer ([[PostingsMaintenance]]).
  * Proofs: the maintained index equals a from-scratch rebuild (postings
  * row multiset AND constants), refresh I/O is proportional to the
  * delta (consumed doc files are DELETED before the next refresh),
  * replays are no-ops, crash states roll forward exactly-once, and a
  * rewrite in the window fails loudly. */
class PostingsMaintenanceSpec extends AnyFunSuite {
  import graft.TestSpark.spark
  import spark.implicits._

  private val wh: Path = {
    val p = Files.createTempDirectory("graft-post")
    p.toFile.deleteOnExit()
    spark.conf.set("spark.sql.catalog.pmcat", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.pmcat.warehouse", p.toString)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS pmcat.db")
    p
  }
  private def root(t: String): Path = wh.resolve("db").resolve(t)

  private def postings(t: String): Set[(String, Long, Long, Long)] =
    spark.table(s"pmcat.db.$t").as[(String, Long, Long, Long)].collect().toSet

  /** From-scratch postings of the docs table — the rebuild oracle. */
  private def rebuilt(docs: String): Set[(String, Long, Long, Long)] =
    spark.table(s"pmcat.db.$docs")
      .select(col("doc_id"),
        expr("filter(split(text, ' '), t -> t != '')").as("toks"))
      .select(col("doc_id"), size(col("toks")).as("dl"),
        explode_outer(col("toks")).as("term"))
      .filter(col("term").isNotNull)
      .groupBy("term", "doc_id", "dl").agg(count(lit(1)).as("tf"))
      .select(col("term"), col("doc_id"), col("tf"), col("dl"))
      .as[(String, Long, Long, Long)].collect().toSet

  private def constants(t: String): (Long, Long) = {
    val p = ManifestSink.readHeader(root(t)).props
    (p.getOrElse("bm25.n-docs", "0").toLong, p.getOrElse("bm25.sum-dl", "0").toLong)
  }

  test("appends maintain the index; refresh reads ONLY the delta; equals a rebuild") {
    spark.sql("CREATE TABLE pmcat.db.docs (doc_id BIGINT, text STRING)")
    PostingsMaintenance.createPostingsTable(spark, "pmcat", "db.idx")
    spark.sql("INSERT INTO pmcat.db.docs VALUES " +
      "(1, 'the cat sat'), (2, 'the dog ran the mile')")
    PostingsMaintenance.refresh(spark, "pmcat", "db.docs", "db.idx")
    assert(postings("idx") == rebuilt("docs"))
    assert(constants("idx") == ((2L, 8L)))

    // round 2: DELETE the consumed doc files first — an incremental
    // refresh never re-opens them; a rebuild would die here
    val consumed = ManifestSink.committedEntries(root("docs"), None).map(_.name)
    spark.sql("INSERT INTO pmcat.db.docs VALUES (3, 'a cat and a dog')")
    consumed.foreach(n => Files.delete(root("docs").resolve(n)))
    PostingsMaintenance.refresh(spark, "pmcat", "db.docs", "db.idx")
    // the maintained index holds ALL rounds' postings; constants folded
    assert(constants("idx") == ((3L, 13L)))
    assert(postings("idx").map(_._2).max == 3L)
    assert(postings("idx").count(_._1 == "cat") == 2)
    assert(postings("idx").filter(_._2 == 3L) ==
      Set(("a", 3L, 2L, 5L), ("cat", 3L, 1L, 5L), ("and", 3L, 1L, 5L),
        ("dog", 3L, 1L, 5L)))

    // replay: a duplicate trigger finds nothing new and commits nothing
    val v = ManifestSink.currentVersion(root("idx"))
    PostingsMaintenance.refresh(spark, "pmcat", "db.docs", "db.idx")
    assert(ManifestSink.currentVersion(root("idx")) == v)
  }

  test("the maintained index answers term queries like the rebuild (and prunes at rest)") {
    spark.sql("CREATE TABLE pmcat.db.docs2 (doc_id BIGINT, text STRING)")
    PostingsMaintenance.createPostingsTable(spark, "pmcat", "db.idx2")
    spark.sql("INSERT INTO pmcat.db.docs2 SELECT id, " +
      "concat('term', id % 7, ' filler common') FROM range(0, 50, 1, 1)")
    PostingsMaintenance.refresh(spark, "pmcat", "db.docs2", "db.idx2")
    spark.sql("INSERT INTO pmcat.db.docs2 SELECT id, " +
      "concat('term', id % 7, ' extra common') FROM range(50, 80, 1, 1)")
    PostingsMaintenance.refresh(spark, "pmcat", "db.docs2", "db.idx2")
    assert(postings("idx2") == rebuilt("docs2"))
    assert(constants("idx2") == ((80L, 240L)))
    // the at-rest layout still prunes: a probe for one term opens only
    // may-matching files (term bloom + bounds) — physical proof
    val es = ManifestSink.committedEntries(root("idx2"), None)
    import org.apache.spark.sql.sources.EqualTo
    val pruned = es.filterNot(e => ManifestSink.mayMatchEntry(e, EqualTo("term", "term3")))
    pruned.foreach(e => Files.delete(root("idx2").resolve(e.name)))
    val hits = spark.table("pmcat.db.idx2").filter($"term" === "term3").count()
    assert(hits == (0 until 80).count(_ % 7 == 3).toLong)
  }

  test("crash states roll forward exactly-once (no duplicate postings)") {
    spark.sql("CREATE TABLE pmcat.db.docs3 (doc_id BIGINT, text STRING)")
    PostingsMaintenance.createPostingsTable(spark, "pmcat", "db.idx3")
    spark.sql("INSERT INTO pmcat.db.docs3 VALUES (1, 'alpha beta')")
    val to = ManifestSink.currentVersion(root("docs3"))
    // crash after stage: marker durable, nothing applied
    PostingsMaintenance.stagePending(root("idx3"), 0L, to)
    PostingsMaintenance.refresh(spark, "pmcat", "db.docs3", "db.idx3")
    assert(postings("idx3") == rebuilt("docs3"))
    assert(constants("idx3") == ((1L, 2L)))
    // crash after the APPEND (before finalize): must not re-append
    spark.sql("INSERT INTO pmcat.db.docs3 VALUES (2, 'gamma')")
    val to2 = ManifestSink.currentVersion(root("docs3"))
    PostingsMaintenance.stagePending(root("idx3"), to, to2)
    PostingsMaintenance.applyWindow(spark, "pmcat", root("docs3"), "db.idx3", to, to2)
    PostingsMaintenance.refresh(spark, "pmcat", "db.docs3", "db.idx3")
    assert(postings("idx3") == rebuilt("docs3"),
      "recovery re-appended an already-applied window (duplicate postings)")
    assert(constants("idx3") == ((2L, 3L)))
  }

  test("a rewrite (or equality delete) in the window fails the refresh loudly") {
    spark.sql("CREATE TABLE pmcat.db.docs4 (doc_id BIGINT, text STRING)")
    PostingsMaintenance.createPostingsTable(spark, "pmcat", "db.idx4")
    spark.sql("INSERT INTO pmcat.db.docs4 VALUES (1, 'x y'), (2, 'y z')")
    PostingsMaintenance.refresh(spark, "pmcat", "db.docs4", "db.idx4")
    ManifestSink.deleteWhereEq(root("docs4").toString, "doc_id", Seq("1"))
    val e = intercept[Exception] {
      PostingsMaintenance.refresh(spark, "pmcat", "db.docs4", "db.idx4")
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Seq.empty else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("EQUALITY DELETE")), msgs(e).mkString("|"))
  }
}
