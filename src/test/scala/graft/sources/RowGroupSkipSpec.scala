package graft.sources

import java.nio.file.{Files, Path}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.scalatest.funsuite.AnyFunSuite

/** Row-group-level predicate pushdown inside manifest parquet scans:
  * pushed filters translate to a parquet FilterPredicate
  * ([[ParquetPredicates]]) and the vectorized reader consults per-group
  * footer stats EXECUTOR-side, so a selective predicate on a
  * multi-row-group file decodes only the matching groups — the native
  * `FileSourceScanExec` contract the manifest format previously lacked
  * (a file surviving manifest-level pruning was decoded in FULL).
  *
  * The proofs read the scan's `numOutputRows` metric: rows SURFACED by
  * the scan before Spark's residual FilterExec. File-level pruning
  * cannot explain a reduction here — each fixture is a single file
  * whose manifest stats span every probed value, so any drop below the
  * row count is row-group skipping at work. */
class RowGroupSkipSpec extends AnyFunSuite {
  import graft.TestSpark.spark

  private val wh: Path = {
    val p = Files.createTempDirectory("graft-rg")
    p.toFile.deleteOnExit()
    spark.conf.set("spark.sql.catalog.rgc", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.rgc.warehouse", p.toString)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS rgc.db")
    p
  }
  private def root(t: String): Path = wh.resolve("db").resolve(t)

  private val Rows = 20000L

  /** One data file, many row groups: tiny row-group budget + id-sorted
    * single-task insert → disjoint per-group id ranges. */
  private lazy val table: String = {
    spark.sql("CREATE TABLE rgc.db.rg (id BIGINT, v BIGINT, s STRING) " +
      "TBLPROPERTIES ('write.parquet.row-group-bytes' = '4096')")
    spark.sql("INSERT INTO rgc.db.rg " +
      s"SELECT id, id * 2, concat('s', id) FROM range(0, $Rows, 1, 1)")
    val entries = ManifestSink.committedEntries(root("rg"), None)
    assert(entries.size == 1, s"fixture wants ONE file, got ${entries.size}")
    val groups = ManifestParquet.rowGroupCount(
      root("rg").resolve(entries.head.name).toString)
    assert(groups >= 8, s"fixture wants a multi-row-group file, got $groups")
    "rgc.db.rg"
  }

  private def scanRows(df: DataFrame): Long = {
    df.collect()
    def scans(p: SparkPlan): Seq[BatchScanExec] = p match {
      case a: AdaptiveSparkPlanExec => scans(a.executedPlan)
      case b: BatchScanExec => Seq(b)
      case other => other.children.flatMap(scans)
    }
    scans(df.queryExecution.executedPlan).map(_.metrics("numOutputRows").value).sum
  }

  test("a point predicate decodes one row group, not the file") {
    val df = spark.sql(s"SELECT * FROM $table WHERE id = 12345")
    val surfaced = scanRows(df)
    assert(df.collect().map(_.getLong(1)).toSeq == Seq(24690L))
    assert(surfaced < Rows / 4,
      s"scan surfaced $surfaced of $Rows rows — row groups were not skipped")
    // control: the unfiltered scan surfaces every row
    assert(scanRows(spark.sql(s"SELECT * FROM $table")) == Rows)
  }

  test("a range predicate decodes only the covering groups; results exact") {
    val df = spark.sql(s"SELECT id, v FROM $table WHERE id >= 5000 AND id < 5100")
    assert(df.collect().map(_.getLong(0)).sorted.toSeq == (5000L until 5100L))
    val surfaced = scanRows(
      spark.sql(s"SELECT id, v FROM $table WHERE id >= 5000 AND id < 5100"))
    assert(surfaced < Rows / 4, s"surfaced $surfaced")
  }

  test("OR of two tails skips the middle of the file") {
    val df = spark.sql(s"SELECT id FROM $table WHERE id < 64 OR id >= ${Rows - 64}")
    assert(df.collect().length == 128)
    val surfaced = scanRows(
      spark.sql(s"SELECT id FROM $table WHERE id < 64 OR id >= ${Rows - 64}"))
    assert(surfaced < Rows / 4, s"surfaced $surfaced")
  }

  test("a probe in a value gap decodes only the group straddling the hole") {
    // the file's GLOBAL range covers the probe (manifest file pruning
    // keeps the file); of the many row groups, exactly ONE straddles
    // the hole (…4999, 30000…) and its [min,max] covers the probe — so
    // that single group decodes, every other group drops, and the
    // residual filter returns nothing
    spark.sql("CREATE TABLE rgc.db.rggap (id BIGINT) " +
      "TBLPROPERTIES ('write.parquet.row-group-bytes' = '4096')")
    spark.sql("INSERT INTO rgc.db.rggap " +
      "SELECT id FROM (SELECT id FROM range(0, 5000) UNION ALL " +
      "SELECT id FROM range(30000, 35000)) DISTRIBUTE BY 1 SORT BY id")
    val probe = "SELECT * FROM rgc.db.rggap WHERE id = 20000"
    assert(spark.sql(probe).collect().isEmpty)
    val surfaced = scanRows(spark.sql(probe))
    val entries0 = ManifestSink.committedEntries(root("rggap"), None)
    val groups = ManifestParquet.rowGroupCount(
      root("rggap").resolve(entries0.head.name).toString)
    assert(groups >= 8, s"fixture wants many groups, got $groups")
    // bound: at most ~2 groups' worth of rows (the straddler, plus
    // writer-dependent slack), far below the 10k file rows
    assert(surfaced <= 2L * 10000L / groups + 600L,
      s"surfaced $surfaced of 10000 rows across $groups groups")
    // and the (single) file was NOT pruned away at manifest level: its
    // global [0, 34999] span contains the probe
    val e = ManifestSink.committedEntries(root("rggap"), None)
    assert(e.size == 1 && e.head.mins("id") <= 20000L && e.head.maxs("id") >= 20000L)
  }

  test("string equality prunes via row-group dictionary/stats") {
    val df = spark.sql(s"SELECT id FROM $table WHERE s = 's777'")
    assert(df.collect().map(_.getLong(0)).toSeq == Seq(777L))
    // string stats exist per group (Spark writes min/max for strings);
    // the sorted 's<id>' values are NOT lexicographically ordered, so
    // only correctness (not a skip bound) is asserted here
  }

  test("LIKE 'x%' prunes row groups via the prefix predicate") {
    // zero-padded keys make byte order == numeric order, so the sorted
    // single file's groups carry disjoint string ranges
    spark.sql("CREATE TABLE rgc.db.rgpre (s STRING, v BIGINT) " +
      "TBLPROPERTIES ('write.parquet.row-group-bytes' = '4096')")
    spark.sql("INSERT INTO rgc.db.rgpre " +
      "SELECT concat('p', lpad(CAST(id AS STRING), 6, '0')), id " +
      "FROM range(0, 20000, 1, 1)")
    val probe = "SELECT v FROM rgc.db.rgpre WHERE s LIKE 'p01234%'"
    // p012340..p012349 → ten rows
    assert(spark.sql(probe).collect().map(_.getLong(0)).sorted.toSeq ==
      (12340L until 12350L))
    val surfaced = scanRows(spark.sql(probe))
    assert(surfaced < Rows / 4,
      s"scan surfaced $surfaced of $Rows rows — prefix groups were not skipped")
  }

  test("row-group skipping never fires where positions matter (DV'd files stay exact)") {
    spark.sql("CREATE TABLE rgc.db.rgmor (id BIGINT, v BIGINT) TBLPROPERTIES " +
      "('write.parquet.row-group-bytes' = '4096', 'delete.mode' = 'merge-on-read')")
    spark.sql("INSERT INTO rgc.db.rgmor SELECT id, id FROM range(0, 5000, 1, 1)")
    spark.sql("DELETE FROM rgc.db.rgmor WHERE id = 1000") // DV sidecar, no rewrite
    assert(ManifestSink.committedEntries(root("rgmor"), None).exists(_.dvName.isDefined),
      "fixture expects a deletion vector")
    // the filter targets a row AFTER the deleted position: if the
    // reader skipped leading row groups the DV positions would shift
    // and this row would be mis-identified
    val got = spark.sql("SELECT v FROM rgc.db.rgmor WHERE id >= 4000")
      .collect().map(_.getLong(0)).sorted
    assert(got.toSeq == (4000L until 5000L))
    assert(spark.sql("SELECT count(*) FROM rgc.db.rgmor").collect().head.getLong(0)
      == 4999L)
  }

  test("filters on evolved tables stay correct (per-file eligibility, residual applies)") {
    spark.sql("CREATE TABLE rgc.db.rgev (id BIGINT, v BIGINT) " +
      "TBLPROPERTIES ('write.parquet.row-group-bytes' = '4096')")
    spark.sql("INSERT INTO rgc.db.rgev SELECT id, id FROM range(0, 2000, 1, 1)")
    spark.sql("ALTER TABLE rgc.db.rgev ADD COLUMN w BIGINT")
    spark.sql("INSERT INTO rgc.db.rgev SELECT id, id, id FROM range(2000, 4000, 1, 1)")
    // w exists only in the second file; a parquet predicate naming it
    // would blow up (or mis-prune) on the first — per-file eligibility
    // withholds the filter exactly there and the residual decides
    val got = spark.sql("SELECT id FROM rgc.db.rgev WHERE w = 3000 OR id = 7")
      .collect().map(_.getLong(0)).sorted
    assert(got.toSeq == Seq(7L, 3000L))
  }

  test("evolved tables keep row-group skipping on files where the filter columns are exact") {
    // one ALTER must not disable the skip layer for the table's life:
    // a filter on an UNCHANGED column still prunes groups per file
    spark.sql("CREATE TABLE rgc.db.rgev2 (id BIGINT, v BIGINT) " +
      "TBLPROPERTIES ('write.parquet.row-group-bytes' = '4096')")
    spark.sql("INSERT INTO rgc.db.rgev2 SELECT id, id FROM range(0, 20000, 1, 1)")
    spark.sql("ALTER TABLE rgc.db.rgev2 ADD COLUMN note STRING")
    val probe = "SELECT v FROM rgc.db.rgev2 WHERE id = 12345"
    assert(spark.sql(probe).collect().map(_.getLong(0)).toSeq == Seq(12345L))
    val surfaced = scanRows(spark.sql(probe))
    assert(surfaced < 20000L / 4,
      s"scan surfaced $surfaced rows — evolution disabled skipping on an exact column")
    // a WIDENED filter column withholds the filter on old narrow files
    // (correctness) while results stay exact
    spark.sql("ALTER TABLE rgc.db.rgev2 ALTER COLUMN v TYPE BIGINT") // no-op widen, epoch bump
    spark.sql("CREATE TABLE rgc.db.rgev3 (id BIGINT, n INT) " +
      "TBLPROPERTIES ('write.parquet.row-group-bytes' = '4096')")
    spark.sql("INSERT INTO rgc.db.rgev3 SELECT id, CAST(id AS INT) FROM range(0, 5000, 1, 1)")
    spark.sql("ALTER TABLE rgc.db.rgev3 ALTER COLUMN n TYPE BIGINT")
    assert(spark.sql("SELECT id FROM rgc.db.rgev3 WHERE n = 777")
      .collect().map(_.getLong(0)).toSeq == Seq(777L))
  }

  test("the row-group-bytes property validates loudly") {
    spark.sql("CREATE TABLE rgc.db.rgbad (id BIGINT)")
    val e = intercept[Exception] {
      spark.sql("ALTER TABLE rgc.db.rgbad SET TBLPROPERTIES " +
        "('write.parquet.row-group-bytes' = 'not-a-number')")
    }
    assert(e.getMessage.contains("row-group-bytes"), e.getMessage)
  }
}
