package graft.sources

import java.nio.file.{Files, Path}

import org.scalatest.funsuite.AnyFunSuite

/** Hidden partitioning (the Iceberg shape): a partition FIELD is an
  * exact-interval TRANSFORM of a source column — `days(ts)` for the
  * production time layout, `truncate(W, col)` for integer widths and
  * string prefixes — while queries keep filtering the RAW column. The
  * proofs are physical wherever they matter: pruned files are deleted
  * before the scan, and a day-aligned DELETE retires whole partitions
  * with the doomed data files already gone (zero reads). bucket(N) is
  * PRUNE-ONLY (covered by BucketPartitionSpec): equality/IN skip
  * non-matching buckets, ranges and full-match proofs fall back. */
class HiddenPartitionSpec extends AnyFunSuite {
  import graft.TestSpark.spark

  private val U = ManifestSink.MicrosPerDay

  private val wh: Path = {
    val p = Files.createTempDirectory("graft-hidden")
    p.toFile.deleteOnExit()
    spark.conf.set("spark.sql.catalog.hcat", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.hcat.warehouse", p.toString)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS hcat.db")
    p
  }
  private def root(t: String): Path = wh.resolve("db").resolve(t)
  private def entries(t: String): Seq[ManifestSink.FileEntry] =
    ManifestSink.committedEntries(root(t), None)

  test("days(ts): rows route to day partitions; raw-column filters prune files physically") {
    spark.sql("CREATE TABLE hcat.db.ev (ts BIGINT, v BIGINT) PARTITIONED BY (days(ts))")
    // three days of events, one insert (single task — fan-out writer
    // splits by derived day)
    spark.sql("INSERT INTO hcat.db.ev SELECT id * 3600000000 + 1, id " +
      "FROM range(0, 72, 1, 1)") // 72 hours -> days 0, 1, 2
    val es = entries("ev")
    assert(es.map(_.parts("ts")).sorted == Seq("0", "1", "2"),
      s"expected one file per DAY, got ${es.map(_.parts)}")
    // the filter is on the RAW ts — hidden partitioning must prune to
    // day 1; physical proof: delete the other days' files first
    es.filterNot(_.parts("ts") == "1")
      .foreach(e => Files.delete(root("ev").resolve(e.name)))
    val day1 = spark.sql(
      s"SELECT v FROM hcat.db.ev WHERE ts >= ${U} AND ts < ${2 * U}")
      .collect().map(_.getLong(0)).sorted
    assert(day1.toSeq == (24L until 48L), s"got ${day1.mkString(",")}")
  }

  test("a day-aligned DELETE retires whole partitions metadata-only (zero reads)") {
    spark.sql("CREATE TABLE hcat.db.ret (ts BIGINT, v BIGINT) PARTITIONED BY (days(ts))")
    spark.sql("INSERT INTO hcat.db.ret SELECT id * 3600000000 + 1, id " +
      "FROM range(0, 72, 1, 1)")
    // the doomed day's data files are DELETED before the SQL DELETE: a
    // proof that the retire path never opens them
    entries("ret").filter(_.parts("ts") == "0")
      .foreach(e => Files.delete(root("ret").resolve(e.name)))
    spark.sql(s"DELETE FROM hcat.db.ret WHERE ts < $U")
    assert(entries("ret").forall(_.parts("ts") != "0"))
    assert(spark.sql("SELECT count(*) FROM hcat.db.ret").collect().head.getLong(0)
      == 48L)
    // an UNALIGNED delete still works — through the ordinary rewrite
    spark.sql(s"DELETE FROM hcat.db.ret WHERE ts < ${U + 7200000000L}") // day1 02:00
    assert(spark.sql("SELECT count(*) FROM hcat.db.ret").collect().head.getLong(0)
      == 46L)
  }

  test("truncate(2, cat): string prefix partitions prune equality, range and prefix filters") {
    spark.sql("CREATE TABLE hcat.db.pre (cat STRING, v BIGINT) " +
      "PARTITIONED BY (truncate(2, cat))")
    spark.sql("INSERT INTO hcat.db.pre VALUES " +
      "('alpha', 1), ('alloy', 2), ('beta', 3), ('bean', 4), ('x', 5)")
    val es = entries("pre")
    assert(es.map(_.parts("cat")).toSet == Set("al", "be", "x"),
      s"got ${es.map(_.parts)}")
    // equality on the raw column opens only the 'al' partition
    es.filterNot(_.parts("cat") == "al")
      .foreach(e => Files.delete(root("pre").resolve(e.name)))
    assert(spark.sql("SELECT v FROM hcat.db.pre WHERE cat = 'alpha'")
      .collect().map(_.getLong(0)).toSeq == Seq(1L))
    assert(spark.sql("SELECT count(*) FROM hcat.db.pre WHERE cat LIKE 'al%'")
      .collect().head.getLong(0) == 2L)
  }

  test("truncate(100, k): integer width partitions; width-aligned DELETE is metadata-only") {
    spark.sql("CREATE TABLE hcat.db.tw (k BIGINT, v BIGINT) " +
      "PARTITIONED BY (truncate(100, k))")
    spark.sql("INSERT INTO hcat.db.tw SELECT id, id FROM range(0, 300, 1, 1)")
    assert(entries("tw").map(_.parts("k")).sorted == Seq("0", "100", "200"))
    entries("tw").filter(_.parts("k") == "0")
      .foreach(e => Files.delete(root("tw").resolve(e.name)))
    spark.sql("DELETE FROM hcat.db.tw WHERE k < 100")
    assert(spark.sql("SELECT count(*) FROM hcat.db.tw").collect().head.getLong(0)
      == 200L)
  }

  test("hours(ts) rides the integer-truncate machinery (hour-aligned metadata delete)") {
    spark.sql("CREATE TABLE hcat.db.hr (ts BIGINT, v BIGINT) PARTITIONED BY (hours(ts))")
    spark.sql("INSERT INTO hcat.db.hr SELECT id * 1200000000, id FROM range(0, 9, 1, 1)")
    // 9 events at 20-minute spacing -> hours 0, 1, 2 (3 per hour)
    assert(entries("hr").map(_.parts("ts")).sorted ==
      Seq("0", "3600000000", "7200000000"))
    entries("hr").filter(_.parts("ts") == "0")
      .foreach(e => Files.delete(root("hr").resolve(e.name)))
    spark.sql("DELETE FROM hcat.db.hr WHERE ts < 3600000000") // zero reads
    assert(spark.sql("SELECT count(*) FROM hcat.db.hr").collect().head.getLong(0) == 6L)
  }

  test("months(ts)/years(ts): calendar intervals stay exact (leap boundaries included)") {
    // months are VARIABLE-width — the interval bounds come from real
    // calendar arithmetic, so Feb/leap-year edges must decide exactly
    spark.sql("CREATE TABLE hcat.db.mo (ts BIGINT, v BIGINT) PARTITIONED BY (months(ts))")
    // 2024 is a leap year: Jan 31, Feb 29 (leap day!), Mar 1
    val jan31 = java.time.LocalDate.of(2024, 1, 31).toEpochDay * U
    val feb29 = java.time.LocalDate.of(2024, 2, 29).toEpochDay * U
    val mar01 = java.time.LocalDate.of(2024, 3, 1).toEpochDay * U
    spark.sql(s"INSERT INTO hcat.db.mo VALUES ($jan31, 1), ($feb29, 2), ($mar01, 3)")
    val idx = (2024 - 1970) * 12 // Jan 2024
    assert(entries("mo").map(_.parts("ts")).sorted ==
      Seq(idx, idx + 1, idx + 2).map(_.toString))
    // month-aligned delete retires February metadata-only: the leap day
    // must go WITH it, March must survive
    entries("mo").filter(_.parts("ts") == (idx + 1).toString)
      .foreach(e => Files.delete(root("mo").resolve(e.name)))
    val febStart = java.time.LocalDate.of(2024, 2, 1).toEpochDay * U
    spark.sql(s"DELETE FROM hcat.db.mo WHERE ts >= $febStart AND ts < $mar01")
    assert(spark.sql("SELECT v FROM hcat.db.mo").collect().map(_.getLong(0)).sorted
      .toSeq == Seq(1L, 3L))

    spark.sql("CREATE TABLE hcat.db.yr (ts BIGINT) PARTITIONED BY (years(ts))")
    val dec31 = java.time.LocalDate.of(2023, 12, 31).toEpochDay * U
    val jan01 = java.time.LocalDate.of(2024, 1, 1).toEpochDay * U
    spark.sql(s"INSERT INTO hcat.db.yr VALUES ($dec31), ($jan01)")
    assert(entries("yr").map(_.parts("ts")).sorted == Seq("53", "54"))
    // year-boundary range filter prunes exactly (physical proof)
    entries("yr").filter(_.parts("ts") == "53")
      .foreach(e => Files.delete(root("yr").resolve(e.name)))
    assert(spark.sql(s"SELECT count(*) FROM hcat.db.yr WHERE ts >= $jan01")
      .collect().head.getLong(0) == 1L)
  }

  test("NULL source values land in the null partition and answer IS NULL exactly") {
    spark.sql("CREATE TABLE hcat.db.nl (ts BIGINT, v BIGINT) PARTITIONED BY (days(ts))")
    spark.sql("INSERT INTO hcat.db.nl VALUES (NULL, 1), (NULL, 2), " +
      s"(${U + 5}, 3)")
    // IS NULL prunes to the null partition (physical proof)
    entries("nl").filter(_.parts("ts") != ManifestSink.NullPartValue)
      .foreach(e => Files.delete(root("nl").resolve(e.name)))
    assert(spark.sql("SELECT count(*) FROM hcat.db.nl WHERE ts IS NULL")
      .collect().head.getLong(0) == 2L)
  }

  test("GROUP BY the raw column is NOT answered from day metadata (results stay exact)") {
    spark.sql("CREATE TABLE hcat.db.gb (ts BIGINT, v BIGINT) PARTITIONED BY (days(ts))")
    spark.sql(s"INSERT INTO hcat.db.gb VALUES (1, 1), (1, 2), (${U + 1}, 3)")
    // two distinct raw ts values share day 0's sibling... grouping by ts
    // must produce RAW-value groups, not day groups
    val got = spark.sql("SELECT ts, count(*) AS n FROM hcat.db.gb GROUP BY ts")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((1L, 2L), (U + 1L, 1L)), got)
  }

  test("the spec survives commits, renames and reports through partitioning()") {
    spark.sql("CREATE TABLE hcat.db.sv (ts BIGINT, v BIGINT) PARTITIONED BY (days(ts))")
    spark.sql(s"INSERT INTO hcat.db.sv VALUES (1, 1)")
    spark.sql(s"INSERT INTO hcat.db.sv VALUES (${U + 1}, 2)") // second commit
    assert(ManifestSink.partitionSpec(root("sv")) == Seq(ManifestSink.PDays("ts")),
      "the transform must survive every publish, not just CREATE")
    spark.sql("ALTER TABLE hcat.db.sv RENAME COLUMN ts TO event_ts")
    assert(ManifestSink.partitionSpec(root("sv")) ==
      Seq(ManifestSink.PDays("event_ts")))
    // raw-column filters keep pruning under the new name
    assert(spark.sql(s"SELECT count(*) FROM hcat.db.sv WHERE event_ts < $U")
      .collect().head.getLong(0) == 1L)
  }

  test("bucket demands INT/BIGINT/STRING and a sane count; days demands BIGINT; truncate demands INT/BIGINT/STRING") {
    intercept[Exception] {
      spark.sql("CREATE TABLE hcat.db.bad1 (d DOUBLE) PARTITIONED BY (bucket(8, d))")
    }
    intercept[Exception] {
      spark.sql("CREATE TABLE hcat.db.bad1b (id BIGINT) PARTITIONED BY (bucket(1, id))")
    }
    intercept[Exception] {
      spark.sql("CREATE TABLE hcat.db.bad2 (s STRING) PARTITIONED BY (days(s))")
    }
    intercept[Exception] {
      spark.sql("CREATE TABLE hcat.db.bad3 (d DOUBLE) PARTITIONED BY (truncate(5, d))")
    }
  }

  test("interval decisions: exact at boundaries, undecided inside, never wrong") {
    import org.apache.spark.sql.sources._
    val tf: Map[String, ManifestSink.PartTransform] = Map("ts" -> ManifestSink.PDays("ts"))
    val day1 = Map("ts" -> "1") // rows in [U, 2U)
    def ev(f: Filter) = ManifestSink.evalPartFilter(f, day1, tf)
    assert(ev(LessThan("ts", 2 * U)).contains(true)) // whole day below
    assert(ev(LessThan("ts", U)).contains(false)) // whole day at/above
    assert(ev(GreaterThanOrEqual("ts", U)).contains(true))
    assert(ev(GreaterThan("ts", 2 * U - 1)).contains(false)) // last micro of the day
    assert(ev(EqualTo("ts", U - 1)).contains(false)) // outside
    assert(ev(EqualTo("ts", U + 5)).isEmpty) // inside: only rows know
    assert(ev(LessThanOrEqual("ts", 2 * U - 1)).contains(true))
    // string prefixes: a value SHORTER than the truncation length pins
    // the whole partition to one exact value
    val stf: Map[String, ManifestSink.PartTransform] = Map("c" -> ManifestSink.PTruncStr("c", 4))
    assert(ManifestSink.evalPartFilter(EqualTo("c", "ab"), Map("c" -> "ab"), stf)
      .contains(true)) // |"ab"| < 4: every row IS "ab"
    assert(ManifestSink.evalPartFilter(EqualTo("c", "abcdX"), Map("c" -> "abcd"), stf)
      .isEmpty) // same prefix: undecided
    assert(ManifestSink.evalPartFilter(EqualTo("c", "abce"), Map("c" -> "abcd"), stf)
      .contains(false)) // different prefix
    assert(ManifestSink.evalPartFilter(StringStartsWith("c", "ab"), Map("c" -> "abcd"), stf)
      .contains(true))
    assert(ManifestSink.evalPartFilter(StringStartsWith("c", "zz"), Map("c" -> "abcd"), stf)
      .contains(false))
  }

  test("NOT IN over a NULL partition tuple is never 'proven' (three-valued logic)") {
    // the pre-fix hazard: In over a null tuple decided Some(false), and
    // Not flipped it to a Some(true) PROOF — deleting null rows that SQL
    // (NULL NOT IN (...) = UNKNOWN) keeps. The null tuple must stay
    // undecided for comparison shapes.
    import org.apache.spark.sql.sources._
    val nullTuple = Map("c" -> ManifestSink.NullPartValue)
    assert(ManifestSink.evalPartFilter(
      Not(In("c", Array[Any]("x"))), nullTuple, Map.empty).isEmpty)
    // end-to-end: a NOT IN delete must keep null-key rows
    spark.sql("CREATE TABLE hcat.db.tv (c STRING, v BIGINT) PARTITIONED BY (c)")
    spark.sql("INSERT INTO hcat.db.tv VALUES ('x', 1), (NULL, 2), (NULL, 3)")
    ManifestSink.deleteWhere(root("tv").toString,
      Seq(Not(In("c", Array[Any]("zzz")))))
    val left = spark.sql("SELECT v FROM hcat.db.tv").collect().map(_.getLong(0)).sorted
    assert(left.toSeq == Seq(2L, 3L),
      "NULL NOT IN (...) is UNKNOWN — null rows must survive the delete")
  }
}
