package graft.sources

import java.nio.file.{Files, Path}

import org.scalatest.funsuite.AnyFunSuite

/** PARTITION-SPEC EVOLUTION (the Iceberg shape): `evolve_spec` is a
  * metadata-only commit; files written under an archived spec keep
  * their tuples AND their spec id, and every pruning/proof decision
  * evaluates each file under the spec it was WRITTEN with — an identity
  * value and a bucket id can share the same string, so re-interpreting
  * old tuples under the new spec would prune or prove wrong files.
  * Operations whose semantics cannot span two specs (dynamic partition
  * overwrite, OPTIMIZE ZORDER) fail loudly until `migrate_spec`
  * rewrites the stragglers through the current layout. */
class SpecEvolutionSpec extends AnyFunSuite {
  import graft.TestSpark.spark

  private val U = ManifestSink.MicrosPerDay

  private val wh: Path = {
    val p = Files.createTempDirectory("graft-specevo")
    p.toFile.deleteOnExit()
    spark.conf.set("spark.sql.catalog.evcat", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.evcat.warehouse", p.toString)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS evcat.db")
    p
  }
  private def root(t: String): Path = wh.resolve("db").resolve(t)
  private def entries(t: String): Seq[ManifestSink.FileEntry] =
    ManifestSink.committedEntries(root(t), None)

  test("unpartitioned -> days(ts): both generations answer raw-range queries; new files prune") {
    spark.sql("CREATE TABLE evcat.db.ev (ts BIGINT, v BIGINT)")
    spark.sql(s"INSERT INTO evcat.db.ev SELECT id * ${U / 4} + 1, id FROM range(0, 8, 1, 1)")
    spark.sql("CALL evcat.system.evolve_spec(table => 'db.ev', spec => 'days(ts)')")
    spark.sql(s"INSERT INTO evcat.db.ev SELECT id * ${U / 4} + ${8 * (U / 4)} + 1, " +
      "id + 8 FROM range(0, 8, 1, 1)")
    val es = entries("ev")
    assert(es.exists(_.specId == 0L) && es.exists(_.specId == 1L),
      s"expected both generations, got ${es.map(e => (e.name, e.specId, e.parts))}")
    // gen-2 files carry day tuples; gen-1 has none
    assert(es.filter(_.specId == 1L).forall(_.parts.contains("ts")))
    assert(es.filter(_.specId == 0L).forall(_.parts.isEmpty))
    // physical prune proof for the NEW layout: delete gen-2 files whose
    // day is not day 3; a day-3 range query must still answer exactly
    // (gen-1 holds days 0-1 only, stats exclude it)
    es.filter(e => e.specId == 1L && e.parts.get("ts").exists(_ != "3"))
      .foreach(e => Files.delete(root("ev").resolve(e.name)))
    val got = spark.sql(
      s"SELECT v FROM evcat.db.ev WHERE ts >= ${3 * U} AND ts < ${4 * U}")
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(got == (12L to 15L), s"got $got")
  }

  test("identity -> bucket: old tuples are never re-read as bucket ids (the collision case)") {
    spark.sql("CREATE TABLE evcat.db.cb (k BIGINT, v BIGINT) PARTITIONED BY (k)")
    spark.sql("INSERT INTO evcat.db.cb VALUES (3, 30), (5, 50)") // identity tuples "3","5"
    spark.sql("CALL evcat.system.evolve_spec(table => 'db.cb', spec => 'bucket(4, k)')")
    spark.sql("INSERT INTO evcat.db.cb VALUES (3, 31), (7, 70)") // bucket tuples
    // pick a probe key X != 3 whose bucket id IS 3: if the old identity
    // tuple "3" were read as a bucket id, the k=3 file would wrongly
    // serve X. Prove the engine never opens it: delete it physically.
    val x = (10L to 200L).find(x =>
      ManifestSink.bucketOfLong(x, 4) == 3 && x != 3L).get
    val oldK3 = entries("cb").filter(e => e.specId == 0L && e.parts.get("k").contains("3"))
    assert(oldK3.nonEmpty)
    oldK3.foreach(e => Files.delete(root("cb").resolve(e.name)))
    // X matches nothing: old k=5 prunes by identity, old k=3 (deleted)
    // prunes by identity, new files prune by bucket or hold no X row
    assert(spark.sql(s"SELECT count(*) FROM evcat.db.cb WHERE k = $x")
      .collect().head.getLong(0) == 0L)
    // and the un-deleted old file still answers ITS key exactly
    assert(spark.sql("SELECT v FROM evcat.db.cb WHERE k = 5")
      .collect().map(_.getLong(0)).toSeq == Seq(50L))
  }

  test("metadata-delete proofs stay exact across specs") {
    spark.sql("CREATE TABLE evcat.db.md (ts BIGINT, v BIGINT)")
    spark.sql(s"INSERT INTO evcat.db.md VALUES (${5 * U + 7}, 1)") // day 5, no tuple
    spark.sql("CALL evcat.system.evolve_spec(table => 'db.md', spec => 'days(ts)')")
    spark.sql(s"INSERT INTO evcat.db.md SELECT id * $U + 2, id + 10 FROM range(0, 3, 1, 1)")
    // the new day-0 partition retires metadata-only: delete its file
    // first to prove zero reads; the old (tuple-less) file survives the
    // proof pass untouched because no tuple can prove it
    entries("md").filter(e => e.specId == 1L && e.parts.get("ts").contains("0"))
      .foreach(e => Files.delete(root("md").resolve(e.name)))
    spark.sql(s"DELETE FROM evcat.db.md WHERE ts < $U")
    assert(spark.sql("SELECT sum(v) FROM evcat.db.md").collect().head.getLong(0)
      == 1L + 11L + 12L)
  }

  test("dynamic overwrite fails loudly across specs; migrate_spec unlocks it") {
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try {
      spark.sql("CREATE TABLE evcat.db.ow (k BIGINT, v BIGINT) PARTITIONED BY (k)")
      spark.sql("INSERT INTO evcat.db.ow VALUES (1, 10), (2, 20)")
      spark.sql("CALL evcat.system.evolve_spec(table => 'db.ow', spec => 'bucket(4, k)')")
      val e = intercept[Exception] {
        spark.sql("INSERT OVERWRITE evcat.db.ow VALUES (1, 11)")
      }
      def msgs(t: Throwable): Seq[String] =
        Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ msgs(x.getCause))
      assert(msgs(e).exists(_.contains("partition-spec evolution")), s"got: $e")
      assert(spark.sql("SELECT sum(v) FROM evcat.db.ow").collect().head.getLong(0) == 30L)
      // migrate, then the same overwrite works (replaces bucket(1)'s rows
      // for key 1 — i.e. the whole bucket partition containing k=1)
      val m = spark.sql("CALL evcat.system.migrate_spec(table => 'db.ow')").collect().head
      assert(m.getLong(1) == 2L, s"expected 2 migrated files, got $m") // one per identity tuple
      assert(entries("ow").forall(_.specId == 1L))
      assert(entries("ow").forall(e =>
        e.parts.get("k").exists(b => b.toLong >= 0L && b.toLong < 4L)))
      spark.sql("INSERT OVERWRITE evcat.db.ow VALUES (1, 11)")
      // k=2 survives iff it sits in a different bucket than k=1 (it does
      // unless the hash collides; assert via the routing function)
      val sameBucket = ManifestSink.bucketOfLong(1L, 4) == ManifestSink.bucketOfLong(2L, 4)
      val expect = if (sameBucket) 11L else 31L
      assert(spark.sql("SELECT sum(v) FROM evcat.db.ow").collect().head.getLong(0) == expect)
    } finally spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
  }

  test("migration preserves every row exactly and re-routes by the current spec") {
    spark.sql("CREATE TABLE evcat.db.mg (k BIGINT, s STRING, v BIGINT) PARTITIONED BY (s)")
    spark.sql("INSERT INTO evcat.db.mg SELECT id, concat('g', id % 3), id * 7 " +
      "FROM range(0, 30, 1, 1)")
    val before = spark.sql("SELECT sum(v), count(*), min(k), max(k) FROM evcat.db.mg")
      .collect().head
    spark.sql("CALL evcat.system.evolve_spec(table => 'db.mg', spec => 'bucket(8, k)')")
    spark.sql("CALL evcat.system.migrate_spec(table => 'db.mg')")
    assert(entries("mg").forall(_.specId == 1L))
    assert(entries("mg").forall(_.parts.keySet == Set("k")))
    val after = spark.sql("SELECT sum(v), count(*), min(k), max(k) FROM evcat.db.mg")
      .collect().head
    assert(before == after)
    // idempotent: a second migrate moves nothing
    val again = spark.sql("CALL evcat.system.migrate_spec(table => 'db.mg')").collect().head
    assert(again.getLong(1) == 0L && again.getLong(2) == 0L)
  }

  test("ZORDER refuses mixed specs; time travel reads the pinned version's spec") {
    spark.sql("CREATE TABLE evcat.db.zo (k BIGINT, v BIGINT) PARTITIONED BY (k)")
    spark.sql("INSERT INTO evcat.db.zo VALUES (1, 10), (2, 20)")
    val vBefore = ManifestSink.currentVersion(root("zo"))
    spark.sql("CALL evcat.system.evolve_spec(table => 'db.zo', spec => 'bucket(4, k)')")
    spark.sql("INSERT INTO evcat.db.zo VALUES (9, 90)")
    val e = intercept[Exception] {
      ManifestSink.compactZOrder(spark, root("zo").toString, Seq("v"), 1000L)
    }
    assert(Option(e.getMessage).exists(_.contains("migrateToCurrentSpec")), s"got: $e")
    // a pinned read BEFORE the evolution sees the identity spec
    assert(ManifestSink.partitionSpec(root("zo"), Some(vBefore)) ==
      Seq(ManifestSink.PIdentity("k")))
    assert(spark.sql(s"SELECT sum(v) FROM evcat.db.zo VERSION AS OF $vBefore")
      .collect().head.getLong(0) == 30L)
  }

  test("RENAME COLUMN renames the column inside ARCHIVED specs too") {
    spark.sql("CREATE TABLE evcat.db.rn (ts BIGINT, v BIGINT) PARTITIONED BY (days(ts))")
    spark.sql(s"INSERT INTO evcat.db.rn VALUES (${U + 1}, 1)")
    spark.sql("CALL evcat.system.evolve_spec(table => 'db.rn', spec => 'months(ts)')")
    spark.sql("ALTER TABLE evcat.db.rn RENAME COLUMN ts TO event_ts")
    val hdr = ManifestSink.readHeader(root("rn"))
    assert(hdr.effectiveSpec == Seq(ManifestSink.PMonths("event_ts")))
    assert(hdr.pastSpecs == Map(0L -> Seq(ManifestSink.PDays("event_ts"))))
    // the archived-spec file still prunes under the renamed raw column
    assert(spark.sql(s"SELECT count(*) FROM evcat.db.rn WHERE event_ts < $U")
      .collect().head.getLong(0) == 0L)
  }

  test("identity(STRING) -> bucket evolution keeps every scan readable (no key decode crash)") {
    // regression: partKeyOf used to decode old-spec tuples under the
    // CURRENT transforms — a non-numeric identity tuple under a bucket
    // spec crashed planInputPartitions with NumberFormatException
    spark.sql("CREATE TABLE evcat.db.sk (s STRING, v BIGINT) PARTITIONED BY (s)")
    spark.sql("INSERT INTO evcat.db.sk VALUES ('alpha', 1), ('beta', 2)")
    spark.sql("CALL evcat.system.evolve_spec(table => 'db.sk', spec => 'bucket(8, s)')")
    spark.sql("INSERT INTO evcat.db.sk VALUES ('gamma', 3)")
    assert(spark.sql("SELECT sum(v) FROM evcat.db.sk").collect().head.getLong(0) == 6L)
    assert(spark.sql("SELECT v FROM evcat.db.sk WHERE s = 'beta'")
      .collect().map(_.getLong(0)).toSeq == Seq(2L))
  }

  test("the partitions metadata view separates spec generations") {
    spark.sql("CREATE TABLE evcat.db.pv (k BIGINT, v BIGINT) PARTITIONED BY (k)")
    spark.sql("INSERT INTO evcat.db.pv VALUES (3, 30)") // identity tuple "k=3"
    spark.sql("CALL evcat.system.evolve_spec(table => 'db.pv', spec => 'bucket(4, k)')")
    // route a key into bucket 3 so the tuple STRING collides with the
    // identity generation's "k=3"
    val x = (1L to 200L).find(x => ManifestSink.bucketOfLong(x, 4) == 3).get
    spark.sql(s"INSERT INTO evcat.db.pv VALUES ($x, 99)")
    val rows = spark.sql(
      "SELECT partition, spec_id, rows FROM evcat.db.pv.partitions")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(rows == Set(("k=3", 0L, 1L), ("k=3", 1L, 1L)),
      s"same tuple string, two meanings -> two rows; got $rows")
  }

  test("evolve validates the spec and is a no-op for an identical one") {
    spark.sql("CREATE TABLE evcat.db.vd (k BIGINT, s STRING) PARTITIONED BY (k)")
    spark.sql("INSERT INTO evcat.db.vd VALUES (1, 'a')")
    intercept[Exception] {
      spark.sql("CALL evcat.system.evolve_spec(table => 'db.vd', spec => 'days(s)')")
    }
    intercept[Exception] {
      spark.sql("CALL evcat.system.evolve_spec(table => 'db.vd', spec => 'bucket(1, k)')")
    }
    intercept[Exception] {
      spark.sql("CALL evcat.system.evolve_spec(table => 'db.vd', spec => 'nope(3, k)')")
    }
    val v0 = ManifestSink.currentVersion(root("vd"))
    spark.sql("CALL evcat.system.evolve_spec(table => 'db.vd', spec => 'k')")
    assert(ManifestSink.currentVersion(root("vd")) == v0,
      "an identical spec must not publish a new version")
  }
}
