package graft.sources

import java.nio.file.{Files, Path}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** V2 column statistics ([[ManifestScan.estimateStatistics]]'s
  * `columnStats`): the manifest's per-file metadata becomes CBO food —
  * exact NDV/null counts for identity partition keys, folded min/max
  * for integer columns — with zero data I/O and no ANALYZE pass. The
  * proofs read the optimizer's own `attributeStats` (what join
  * reordering and FilterEstimation actually consume) and check the
  * numbers are the manifest's, not defaults. */
class CboStatsSpec extends AnyFunSuite {
  import graft.TestSpark.spark

  private val wh: Path = {
    val p = Files.createTempDirectory("graft-cbo")
    p.toFile.deleteOnExit()
    spark.conf.set("spark.sql.catalog.cbo", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.cbo.warehouse", p.toString)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS cbo.db")
    spark.sql("CREATE TABLE cbo.db.t (k BIGINT, v BIGINT, s STRING) PARTITIONED BY (k)")
    spark.sql("INSERT INTO cbo.db.t SELECT id % 5, id * 7, concat('x', id) FROM range(100)")
    p
  }

  private def withCbo[A](body: => A): A = {
    val prev = spark.conf.getOption("spark.sql.cbo.enabled")
    spark.conf.set("spark.sql.cbo.enabled", "true")
    try body
    finally prev match {
      case Some(v) => spark.conf.set("spark.sql.cbo.enabled", v)
      case None => spark.conf.unset("spark.sql.cbo.enabled")
    }
  }

  test("manifest column stats reach the optimizer exactly") {
    withCbo {
      wh // force setup
      val stats = spark.table("cbo.db.t").queryExecution.optimizedPlan.stats
      assert(stats.rowCount.contains(BigInt(100)))
      val byName = stats.attributeStats.map { case (a, st) => a.name -> st }
      val k = byName("k")
      assert(k.distinctCount.contains(BigInt(5)), s"k stats: $k")
      assert(k.min.contains(0L) && k.max.contains(4L), s"k stats: $k")
      assert(k.nullCount.contains(BigInt(0)), s"k stats: $k")
      val v = byName("v")
      assert(v.min.contains(0L) && v.max.contains(693L), s"v stats: $v")
      // data-column counts now answer from the MERGED per-file HLL
      // sketches (deterministic; ~6.5% standard error): 5 files × 20
      // distinct v estimate the true 100 within the sketch band. Zero
      // nulls is a recorded zero, not an absence.
      assert(v.distinctCount.exists(d => d >= BigInt(90) && d <= BigInt(110)),
        s"v stats: $v")
      assert(v.nullCount.contains(BigInt(0)), s"v stats: $v")
      // the string column reports its (exact) null count but no
      // integer bounds
      assert(byName.get("s").forall(st => st.min.isEmpty && st.max.isEmpty))
    }
  }

  test("a pushed partition filter narrows the reported column stats") {
    withCbo {
      val df = spark.table("cbo.db.t").filter(col("k") === 2L)
      val scans = df.queryExecution.optimizedPlan.collect {
        case r: org.apache.spark.sql.execution.datasources.v2.DataSourceV2ScanRelation => r
      }
      assert(scans.size === 1)
      val byName = scans.head.stats.attributeStats.map { case (a, st) => a.name -> st }
      assert(scans.head.stats.rowCount.contains(BigInt(20)))
      val k = byName("k")
      assert(k.distinctCount.contains(BigInt(1)) &&
        k.min.contains(2L) && k.max.contains(2L), s"k stats after prune: $k")
    }
  }

  test("db.t.stats metadata view reports per-column stats with exactness flags") {
    wh // force setup
    val rows = spark.sql("SELECT * FROM cbo.db.t.stats").collect()
      .map(r => r.getString(0) -> r).toMap
    assert(rows.keySet === Set("k", "v", "s"))
    val k = rows("k")
    assert(k.getLong(1) === 5L && k.getBoolean(2), s"k: $k") // exact NDV
    assert(k.getLong(3) === 0L && k.getLong(4) === 0L && k.getLong(5) === 4L)
    val v = rows("v")
    // multi-file data column: merged-sketch estimate, flagged inexact
    assert(v.getLong(1) >= 90L && v.getLong(1) <= 110L && !v.getBoolean(2), s"v: $v")
    assert(v.getLong(3) === 0L && v.getLong(4) === 0L && v.getLong(5) === 693L)
    val s = rows("s")
    // string columns answer from their fingerprint-fed sketches too
    // (inexact), with null counts exact and no integer bounds
    assert(s.getLong(1) >= 90L && s.getLong(1) <= 110L && !s.getBoolean(2) &&
      s.getLong(3) === 0L && s.isNullAt(4), s"s: $s")
  }

  test("outstanding equality deletes withdraw the stats view's exactness flag") {
    spark.sql("CREATE TABLE cbo.db.eq (id BIGINT, v BIGINT) PARTITIONED BY (id)")
    spark.sql("INSERT INTO cbo.db.eq SELECT id % 3, id FROM range(9)")
    def exactFlags() = spark.sql("SELECT column, exact_ndv FROM cbo.db.eq.stats")
      .collect().map(r => r.getString(0) -> r.getBoolean(1)).toMap
    assert(exactFlags()("id"), "clean table: identity key NDV is exact")
    ManifestSink.deleteWhereEq(wh.resolve("db").resolve("eq").toString, "id", Seq("2"))
    // the record hides rows the manifest still counts — every count is
    // now an upper bound, so exactness must not be claimed
    assert(!exactFlags()("id"), "eq-del-governed table must not claim exactness")
  }

  test("FilterEstimation prices a range predicate off the manifest bounds") {
    withCbo {
      // v ∈ [0, 693]; v >= 630 covers ~9% of the range — CBO must
      // estimate far fewer rows than the table's 100, without reading
      // any data. Actual matching rows: ids 90..99 → 10.
      val est = spark.table("cbo.db.t").filter(col("v") >= 630L)
        .queryExecution.optimizedPlan.stats.rowCount
      assert(est.isDefined && est.get > BigInt(0) && est.get <= BigInt(30),
        s"range estimate off bounds: $est")
    }
  }
}
