package graft.sources

import java.nio.file.{Files, Path}

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.DedupOps

/** The exact set-sim prefix index AT REST (q199): the probe's token
  * set must reach the manifest scan as a RUNTIME filter (the broadcast
  * batch prefixes feed Spark's dynamic-pruning machinery into
  * `SupportsRuntimeFiltering.filter` — no literal IN-list in the plan)
  * and PRUNE whole index data files — proved physically by deleting
  * every file outside the probe's token range; a probe that opened
  * them would throw. A static plan cannot pass this test: the probe's
  * tokens are join-derived, so the only way the deleted files stay
  * unread is runtime file pruning. */
class SetSimAtRestSpec extends AnyFunSuite {
  import graft.TestSpark.spark
  import spark.implicits._

  private val wh: Path = {
    val p = Files.createTempDirectory("graft-ssim-rest")
    p.toFile.deleteOnExit()
    spark.conf.set("spark.sql.catalog.ssrcat", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.ssrcat.warehouse", p.toString)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS ssrcat.db")
    p
  }

  private def words(p: String, n: Int) =
    (1 to n).map(i => f"$p$i%02d").mkString(" ")

  test("probe runtime filter prunes index files — physical no-read proof") {
    wh
    spark.sql("CREATE TABLE ssrcat.db.sdf (token STRING, df BIGINT)")
    spark.sql("CREATE TABLE ssrcat.db.spre (token STRING, doc_id BIGINT, m BIGINT) " +
      "TBLPROPERTIES ('write.sort-by' = 'token', 'bloom.columns' = 'token')")
    // two token universes in two COMMITS → disjoint index files:
    // the 'aa' corpus at build time, a 'zz' batch appended after
    val aCorpus = Seq(
      1L -> words("aa", 20),
      2L -> (words("aa", 19) + " aaxx"), // near-dup of doc 1 (J = 15/17)
      3L -> words("ab", 12)
    ).toDF("doc_id", "text")
    DedupOps.ssimBuildIndex(aCorpus, "ssrcat.db.sdf", "ssrcat.db.spre")
    val zBatch = Seq(100L -> words("zz", 20), 101L -> words("zy", 16))
      .toDF("doc_id", "text")
    DedupOps.ssimAppend(spark, zBatch, "ssrcat.db.sdf", "ssrcat.db.spre")
    val root = wh.resolve("db").resolve("spre")
    val es = ManifestSink.committedEntries(root, None)
    val zFiles = es.filter(_.slows.get("token").exists(_.startsWith("z")))
    assert(zFiles.nonEmpty && zFiles.size < es.size,
      s"fixture must split index files by token range: ${es.map(_.slows.get("token"))}")
    // delete every z-range file: a probe whose IN-list pruning failed
    // would open them and throw FileNotFound
    zFiles.foreach(e => Files.delete(root.resolve(e.name)))
    // probe shares 15 of 16 windows with docs 1 AND 2 (J = 15/17 ≈ 0.88)
    val probeBatch = Seq(10L -> (words("aa", 19) + " aazz"))
      .toDF("doc_id", "text")
    val got = DedupOps.ssimProbe(spark, probeBatch,
        aCorpus.union(zBatch), "ssrcat.db.sdf", "ssrcat.db.spre")
      .select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((10L, 1L), (10L, 2L)),
      s"the pruned probe must still find both aa-range near-dups: $got")
    // and it equals the inline join over the surviving (a-range) corpus
    val want = DedupOps.setSimIncremental(aCorpus, probeBatch)
      .select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == want,
      s"pruned at-rest probe diverged from the inline join: $got vs $want")
  }
}
