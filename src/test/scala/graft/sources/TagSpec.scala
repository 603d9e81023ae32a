package graft.sources

import java.nio.file.{Files, Path}

import org.scalatest.funsuite.AnyFunSuite

/** Snapshot TAGS (the Iceberg tag shape): named immutable references to
  * one manifest version, created/dropped by metadata-only CAS commits
  * (`CALL graft.system.tag` / `drop_tag`), resolved by
  * `VERSION AS OF '<name>'`, PINNED by vacuum like live branch anchors,
  * and reserved from SET TBLPROPERTIES forgery. */
class TagSpec extends AnyFunSuite {
  import graft.TestSpark.spark

  private val wh: Path = {
    val p = Files.createTempDirectory("graft-tag")
    p.toFile.deleteOnExit()
    spark.conf.set("spark.sql.catalog.tg", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.tg.warehouse", p.toString)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS tg.db")
    p
  }
  private def root(t: String): Path = wh.resolve("db").resolve(t)
  private def ids(sql: String): Seq[Long] =
    spark.sql(sql).collect().map(_.getLong(0)).sorted.toSeq

  test("a tag freezes a snapshot: VERSION AS OF resolves it across later commits") {
    spark.sql("CREATE TABLE tg.db.t (id BIGINT)")
    spark.sql("INSERT INTO tg.db.t SELECT id FROM range(5)")
    val v = spark.sql("CALL tg.system.tag(table => 'db.t', name => 'run-1')")
      .collect().head
    assert(v.getString(0) == "run-1" && v.getLong(1) == 2L)
    spark.sql("INSERT INTO tg.db.t SELECT id + 100 FROM range(5)")
    spark.sql("DELETE FROM tg.db.t WHERE id < 2")
    assert(ids("SELECT id FROM tg.db.t VERSION AS OF 'run-1'") == (0L until 5L))
    assert(ids("SELECT id FROM tg.db.t").size == 8)
    // the tag is visible as a reserved property
    assert(ManifestSink.tagsOf(root("t")) == Map("run-1" -> 2L))
  }

  test("tags pin their snapshot through vacuum; drop_tag releases it") {
    spark.sql("CREATE TABLE tg.db.p (id BIGINT)")
    spark.sql("INSERT INTO tg.db.p SELECT id FROM range(3)") // v2
    spark.sql("CALL tg.system.tag(table => 'db.p', name => 'keep', version => 2)")
    (0 until 6).foreach(i =>
      spark.sql(s"INSERT INTO tg.db.p SELECT id + ${10 * (i + 1)} FROM range(3)"))
    ManifestSink.vacuum(root("p"), retain = 1, orphanGraceMs = 0L, dryRun = false)
    // the tagged snapshot (and its files) survived retention
    assert(ids("SELECT id FROM tg.db.p VERSION AS OF 'keep'") == (0L until 3L))
    val dropped = spark.sql("CALL tg.system.drop_tag(table => 'db.p', name => 'keep')")
      .collect().head
    assert(dropped.getLong(1) == 2L)
    ManifestSink.vacuum(root("p"), retain = 1, orphanGraceMs = 0L, dryRun = false)
    // released: the old manifest expires and the tag read fails loudly
    val e = intercept[Exception](
      spark.sql("SELECT id FROM tg.db.p VERSION AS OF 'keep'").collect())
    assert(e.getMessage.contains("keep") || e.getMessage.contains("version"))
  }

  test("db.t.refs lists main, tags and branch anchors") {
    spark.sql("CREATE TABLE tg.db.r (id BIGINT)")
    spark.sql("INSERT INTO tg.db.r SELECT id FROM range(2)") // v2
    spark.sql("CALL tg.system.tag(table => 'db.r', name => 'rel')")  // v3 (tag commit)
    spark.sql("CALL tg.system.create_branch(table => 'db.r', branch => 'wip')")
    spark.sql("INSERT INTO tg.db.r SELECT id + 10 FROM range(2)") // v4
    val refs = spark.sql("SELECT name, type, version FROM tg.db.r.refs")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    assert(refs === Set(("main", "branch", 4L), ("rel", "tag", 2L),
      ("wip", "branch", 3L)), refs.toString)
  }

  test("rollback carries the CURRENT tag set: refs survive, none resurrect") {
    spark.sql("CREATE TABLE tg.db.rb (id BIGINT)")
    spark.sql("INSERT INTO tg.db.rb SELECT id FROM range(3)") // v2
    spark.sql("CALL tg.system.tag(table => 'db.rb', name => 'old')") // v3
    spark.sql("CALL tg.system.drop_tag(table => 'db.rb', name => 'old')") // v4
    spark.sql("INSERT INTO tg.db.rb SELECT id + 10 FROM range(3)") // v5
    spark.sql("CALL tg.system.tag(table => 'db.rb', name => 'live')") // v6
    // roll back to v3 — where 'old' existed and 'live' did not
    ManifestSink.rollback(root("rb").toString, 3L)
    val tags = ManifestSink.tagsOf(root("rb"))
    assert(tags == Map("live" -> 5L),
      s"rollback must keep current refs and not resurrect dropped ones: $tags")
    // the live tag still reads its snapshot
    assert(ids("SELECT id FROM tg.db.rb VERSION AS OF 'live'").size == 6)
  }

  test("tag guards: duplicates, missing targets, branch collisions, forgery") {
    spark.sql("CREATE TABLE tg.db.g (id BIGINT)")
    spark.sql("INSERT INTO tg.db.g SELECT id FROM range(2)")
    spark.sql("CALL tg.system.tag(table => 'db.g', name => 'a')")
    // immutable: re-tagging the same name refuses
    assert(intercept[Exception](
      spark.sql("CALL tg.system.tag(table => 'db.g', name => 'a')").collect())
      .getMessage.contains("already exists"))
    // a version that never existed refuses
    assert(intercept[Exception](
      spark.sql("CALL tg.system.tag(table => 'db.g', name => 'b', version => 99)").collect())
      .getMessage.contains("does not exist"))
    // a live branch's name refuses (shared VERSION AS OF namespace)
    spark.sql("CALL tg.system.create_branch(table => 'db.g', branch => 'lane')")
    assert(intercept[Exception](
      spark.sql("CALL tg.system.tag(table => 'db.g', name => 'lane')").collect())
      .getMessage.contains("branch"))
    // forgery through SET TBLPROPERTIES refuses (reserved prefix)
    assert(intercept[Exception](
      spark.sql("ALTER TABLE tg.db.g SET TBLPROPERTIES ('graft.tag.x' = '1')"))
      .getMessage.contains("reserved"))
    // dropping an unknown tag names the survivors
    assert(intercept[Exception](
      spark.sql("CALL tg.system.drop_tag(table => 'db.g', name => 'nope')").collect())
      .getMessage.contains("no tag"))
  }
}
