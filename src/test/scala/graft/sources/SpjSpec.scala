package graft.sources

import java.nio.file.{Files, Path}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Storage-partitioned joins (the Iceberg SPJ shape): two manifest
  * tables partitioned the same way report [[ManifestScan]]'s
  * KeyGroupedPartitioning, every file partition carries its typed key
  * ([[ManifestFilePartition.partitionKey]]), and with
  * `spark.sql.sources.v2.bucketing.enabled` Spark aligns the two scans
  * key-by-key — the join plans with ZERO shuffle exchanges on either
  * side. At 100 TB this is the one join shape where co-designing layout
  * and query deletes the dominant cost outright: a fact-fact join over
  * a shared partitioning moves no bytes between executors at all.
  *
  * The proofs here are plan-structural AND value-exact: every test
  * asserts the executed physical plan's exchange count and checks the
  * joined values against the same join computed the shuffling way. */
class SpjSpec extends AnyFunSuite {
  import graft.TestSpark.spark
  import spark.implicits._

  private val wh: Path = {
    val p = Files.createTempDirectory("graft-spj")
    p.toFile.deleteOnExit()
    spark.conf.set("spark.sql.catalog.spj", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.spj.warehouse", p.toString)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS spj.db")
    p
  }

  /** Data-distribution exchanges only: the single-partition gather a
    * GLOBAL aggregate always ends with is not a shuffle SPJ could ever
    * remove (it moves one row per upstream task), so the plan proofs
    * count hash/range repartitions and ignore SinglePartition. */
  private def shuffles(p: SparkPlan): Seq[ShuffleExchangeExec] =
    p.collect {
      case s: ShuffleExchangeExec
        if s.outputPartitioning !=
          org.apache.spark.sql.catalyst.plans.physical.SinglePartition => s
    }

  private def executedPlan(df: DataFrame): SparkPlan = {
    df.collect() // force execution so AQE (if any) finalizes
    df.queryExecution.executedPlan
  }

  /** Run `body` under the SPJ confs, restoring previous values after. */
  private def withSpjConf[A](extra: (String, String)*)(body: => A): A = {
    val confs = Seq(
      "spark.sql.sources.v2.bucketing.enabled" -> "true",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.enabled" -> "false") ++ extra
    val prev = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("co-partitioned join plans with zero shuffles and exact results") {
    spark.sql("CREATE TABLE spj.db.fact (k BIGINT, id BIGINT, v BIGINT) PARTITIONED BY (k)")
    spark.sql("CREATE TABLE spj.db.dim (k BIGINT, name STRING) PARTITIONED BY (k)")
    spark.sql("INSERT INTO spj.db.fact SELECT id % 8, id, id * 3 FROM range(400)")
    spark.sql("INSERT INTO spj.db.dim SELECT id, concat('g', id) FROM range(8)")

    withSpjConf() {
      val joined = spark.table("spj.db.fact")
        .join(spark.table("spj.db.dim"), "k")
        .groupBy($"name").agg(sum($"v").as("sv"))
      val plan = executedPlan(joined)
      // the JOIN itself is shuffle-free: with 8 distinct keys the only
      // permissible exchange is the one the groupBy(name) adds AFTER it
      val sh = shuffles(plan)
      assert(sh.size <= 1, s"expected at most the post-join aggregate exchange:\n$plan")
      val rows = joined.as[(String, Long)].collect().toMap
      val expect = (0L until 400L).groupBy(id => s"g${id % 8}")
        .view.mapValues(_.map(_ * 3L).sum).toMap
      assert(rows == expect)
    }
  }

  test("join ON the partition key alone keeps both scans exchange-free end-to-end") {
    spark.sql("CREATE TABLE spj.db.l (k BIGINT, a BIGINT) PARTITIONED BY (k)")
    spark.sql("CREATE TABLE spj.db.r (k BIGINT, b BIGINT) PARTITIONED BY (k)")
    spark.sql("INSERT INTO spj.db.l SELECT id % 4, id FROM range(40)")
    spark.sql("INSERT INTO spj.db.r SELECT id % 4, id * 2 FROM range(40)")
    withSpjConf() {
      val j = spark.table("spj.db.l").join(spark.table("spj.db.r"), "k")
        .agg(count(lit(1)).as("n"), sum($"a" + $"b").as("s"))
      val plan = executedPlan(j)
      assert(shuffles(plan).isEmpty, s"expected a fully shuffle-free plan:\n$plan")
      val (n, s) = j.as[(Long, Long)].head()
      // per key: 10 l-rows × 10 r-rows
      assert(n == 4L * 10L * 10L)
      val expectS = (0L until 4L).map { k =>
        val ls = (0L until 40L).filter(_ % 4 == k)
        val rs = (0L until 40L).filter(_ % 4 == k).map(_ * 2L)
        ls.map(a => rs.map(b => a + b).sum).sum
      }.sum
      assert(s == expectS)
    }
  }

  test("multiple files per key group into one input partition per key") {
    spark.sql("CREATE TABLE spj.db.multi (k BIGINT, v BIGINT) PARTITIONED BY (k)")
    // three separate inserts → three files per key
    (0 until 3).foreach { i =>
      spark.sql(s"INSERT INTO spj.db.multi SELECT id % 3, id + ${i * 100} FROM range(30)")
    }
    val root = wh.resolve("db").resolve("multi")
    assert(ManifestSink.committedEntries(root, None).size == 9)
    withSpjConf() {
      val df = spark.table("spj.db.multi").groupBy($"k").agg(sum($"v").as("s"))
      val plan = executedPlan(df)
      // KeyGroupedPartitioning already clusters by k → aggregate needs
      // no exchange, and the scan runs one task per key, not per file
      assert(shuffles(plan).isEmpty, s"groupBy(partition key) must not shuffle:\n$plan")
      val scans = plan.collect {
        case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => b
      }
      assert(scans.nonEmpty)
      assert(scans.head.inputRDD.getNumPartitions == 3,
        "expected one grouped task per partition key")
      assert(df.as[(Long, Long)].collect().toMap ==
        (0L until 3L).map(k => k ->
          (0L until 30L).filter(_ % 3 == k).map(v => 3 * v + 300).sum).toMap)
    }
  }

  test("mismatched partition value sets still join correctly (push-part-values)") {
    spark.sql("CREATE TABLE spj.db.lm (k BIGINT, a BIGINT) PARTITIONED BY (k)")
    spark.sql("CREATE TABLE spj.db.rm (k BIGINT, b BIGINT) PARTITIONED BY (k)")
    spark.sql("INSERT INTO spj.db.lm SELECT id % 6, id FROM range(60)") // keys 0..5
    spark.sql("INSERT INTO spj.db.rm SELECT id % 4, id FROM range(40)") // keys 0..3
    withSpjConf("spark.sql.sources.v2.bucketing.pushPartValues.enabled" -> "true") {
      val j = spark.table("spj.db.lm").join(spark.table("spj.db.rm"), "k")
        .agg(count(lit(1)).as("n"))
      val plan = executedPlan(j)
      assert(shuffles(plan).isEmpty,
        s"push-part-values must absorb the value-set mismatch:\n$plan")
      assert(j.as[Long].head() == 4L * 10L * 10L)
    }
  }

  test("string partition keys round-trip typed and join shuffle-free") {
    spark.sql("CREATE TABLE spj.db.sl (g STRING, a BIGINT) PARTITIONED BY (g)")
    spark.sql("CREATE TABLE spj.db.sr (g STRING, b BIGINT) PARTITIONED BY (g)")
    spark.sql("INSERT INTO spj.db.sl SELECT concat('p', id % 3), id FROM range(30)")
    spark.sql("INSERT INTO spj.db.sr SELECT concat('p', id % 3), id * 7 FROM range(30)")
    withSpjConf() {
      val j = spark.table("spj.db.sl").join(spark.table("spj.db.sr"), "g")
        .agg(count(lit(1)).as("n"))
      val plan = executedPlan(j)
      assert(shuffles(plan).isEmpty, s"string-keyed SPJ must not shuffle:\n$plan")
      assert(j.as[Long].head() == 3L * 10L * 10L)
    }
  }

  test("high-cardinality fact-fact join: materialized bucket columns give bucketed SPJ") {
    // the scale pattern for join keys too selective to partition by
    // directly (the Iceberg bucket(N, col) shape, achieved here with an
    // identity partition over a MATERIALIZED bucket column): both facts
    // store bucket = pmod(xxhash64(key), 8), partition by it, and join
    // ON (bucket, key). Cluster keys ⊂ join keys needs the
    // co-partition check relaxed; the join itself stays exchange-free.
    spark.sql("CREATE TABLE spj.db.fa (b BIGINT, k BIGINT, x BIGINT) PARTITIONED BY (b)")
    spark.sql("CREATE TABLE spj.db.fb (b BIGINT, k BIGINT, y BIGINT) PARTITIONED BY (b)")
    spark.sql("INSERT INTO spj.db.fa SELECT pmod(xxhash64(id), 8), id, id * 2 FROM range(500)")
    spark.sql("INSERT INTO spj.db.fb SELECT pmod(xxhash64(id), 8), id, id * 3 FROM range(250, 750)")
    withSpjConf("spark.sql.requireAllClusterKeysForCoPartition" -> "false") {
      val j = spark.table("spj.db.fa")
        .join(spark.table("spj.db.fb"), Seq("b", "k"))
        .agg(count(lit(1)).as("n"), sum($"x" + $"y").as("s"))
      val plan = executedPlan(j)
      assert(shuffles(plan).isEmpty, s"bucketed SPJ must not shuffle:\n$plan")
      val (n, s) = j.as[(Long, Long)].head()
      assert(n == 250L) // keys 250..499 overlap
      assert(s == (250L until 500L).map(k => k * 2 + k * 3).sum)
    }
  }

  test("SPJ report is withdrawn when a partition column is pruned from the output") {
    // a scan that does not carry the key cannot claim key grouping;
    // the query must still answer (with ordinary shuffles)
    withSpjConf() {
      val df = spark.table("spj.db.fact").select($"id", $"v")
        .join(spark.range(400).select($"id"), "id")
        .agg(count(lit(1)).as("n"))
      assert(df.as[Long].head() == 400L)
    }
  }

  test("NATIVE bucket(N, k) transforms join shuffle-free through the FunctionCatalog handshake") {
    // the real Iceberg bucketed-SPJ shape — no materialized bucket
    // column: both facts declare PARTITIONED BY (bucket(8, k)), each
    // scan reports bucket(8, k) as its KeyGroupedPartitioning, Spark
    // binds both through GraftCatalog's FunctionCatalog (same
    // canonicalName -> compatible), and the join on the RAW key plans
    // with zero exchanges. At 100 TB this is the fact-fact join with
    // high-cardinality keys: layout does the shuffle once at write
    // time, every subsequent join is free.
    spark.sql("CREATE TABLE spj.db.na (k BIGINT, x BIGINT) PARTITIONED BY (bucket(8, k))")
    spark.sql("CREATE TABLE spj.db.nb (k BIGINT, y BIGINT) PARTITIONED BY (bucket(8, k))")
    spark.sql("INSERT INTO spj.db.na SELECT id, id * 2 FROM range(500)")
    spark.sql("INSERT INTO spj.db.nb SELECT id, id * 3 FROM range(250, 750)")
    withSpjConf() {
      val j = spark.table("spj.db.na").join(spark.table("spj.db.nb"), "k")
        .agg(count(lit(1)).as("n"), sum($"x" + $"y").as("s"))
      val plan = executedPlan(j)
      assert(shuffles(plan).isEmpty, s"native bucket SPJ must not shuffle:\n$plan")
      val (n, s) = j.as[(Long, Long)].head()
      assert(n == 250L)
      assert(s == (250L until 500L).map(k => k * 2 + k * 3).sum)
    }
  }

  test("mismatched bucket counts never lie: the join falls back to shuffles, values exact") {
    spark.sql("CREATE TABLE spj.db.ma (k BIGINT, x BIGINT) PARTITIONED BY (bucket(8, k))")
    spark.sql("CREATE TABLE spj.db.mb (k BIGINT, y BIGINT) PARTITIONED BY (bucket(4, k))")
    spark.sql("INSERT INTO spj.db.ma SELECT id, id FROM range(100)")
    spark.sql("INSERT INTO spj.db.mb SELECT id, id FROM range(100)")
    withSpjConf() {
      val j = spark.table("spj.db.ma").join(spark.table("spj.db.mb"), "k")
        .agg(count(lit(1)).as("n"))
      val plan = executedPlan(j)
      // bucket(8) and bucket(4) are NOT compatible partitionings — an
      // aligned read would mis-join; correctness comes first, so Spark
      // must insert exchanges
      assert(shuffles(plan).nonEmpty,
        s"incompatible bucket counts must shuffle:\n$plan")
      assert(j.as[Long].head() == 100L)
    }
  }

  test("bucketed groupBy of the raw key still shuffles (a bucket is not the key)") {
    // the dual guard: KeyGroupedPartitioning(bucket(8, k)) must NOT
    // satisfy a clustering on raw k for aggregation — two k values
    // share a bucket, so a per-task aggregate would merge them only
    // with an exchange. Wrong here = silently wrong GROUP BY results.
    spark.sql("CREATE TABLE spj.db.gb (k BIGINT, v BIGINT) PARTITIONED BY (bucket(4, k))")
    spark.sql("INSERT INTO spj.db.gb SELECT id % 10, id FROM range(100)")
    withSpjConf() {
      val df = spark.table("spj.db.gb").groupBy($"k").agg(sum($"v").as("s"))
      val got = df.as[(Long, Long)].collect().toMap
      assert(got == (0L until 10L).map(k =>
        k -> (0L until 100L).filter(_ % 10 == k).sum).toMap)
    }
  }

  test("identity-keyed SMJ plans with ZERO sorts: the scan reports its ordering") {
    // SupportsReportOrdering: identity partition columns are constant
    // within every planned partition, so the scan reports them as
    // ascending output ordering and EnsureRequirements drops BOTH
    // SortExecs of the storage-partitioned sort-merge join — zero
    // exchanges AND zero sorts.
    spark.sql("CREATE TABLE spj.db.sfact (k BIGINT, id BIGINT, v BIGINT) PARTITIONED BY (k)")
    spark.sql("CREATE TABLE spj.db.sdim (k BIGINT, name STRING) PARTITIONED BY (k)")
    spark.sql("INSERT INTO spj.db.sfact SELECT id % 8, id, id * 3 FROM range(400)")
    spark.sql("INSERT INTO spj.db.sdim SELECT id, concat('g', id) FROM range(8)")
    withSpjConf() {
      val joined = spark.table("spj.db.sfact")
        .join(spark.table("spj.db.sdim"), "k")
        .select($"k", $"id", $"v", $"name")
      val plan = executedPlan(joined)
      assert(shuffles(plan).isEmpty, s"expected zero exchanges:\n$plan")
      assert(plan.collect {
        case s: org.apache.spark.sql.execution.SortExec => s
      }.isEmpty, s"expected zero sorts:\n$plan")
      // values exact against the analytic truth
      val expected = (0L until 400L)
        .map(id => (id % 8, id, id * 3, s"g${id % 8}")).sorted
      assert(joined.as[(Long, Long, Long, String)].collect().sorted.toSeq === expected)
    }
  }

  test("bucket transforms do NOT report ordering: bucketed SMJ keeps its sorts") {
    // the dual guard: a bucket id is constant per partition but the RAW
    // key is not — reporting ordering there would let SMJ merge unsorted
    // streams and return wrong rows. The bucketed SPJ join must still
    // sort (while staying exchange-free).
    spark.sql("CREATE TABLE spj.db.obf (k BIGINT, v BIGINT) PARTITIONED BY (bucket(4, k))")
    spark.sql("CREATE TABLE spj.db.obd (k BIGINT, name STRING) PARTITIONED BY (bucket(4, k))")
    spark.sql("INSERT INTO spj.db.obf SELECT id % 10, id FROM range(100)")
    spark.sql("INSERT INTO spj.db.obd SELECT id, concat('g', id) FROM range(10)")
    withSpjConf() {
      val joined = spark.table("spj.db.obf").join(spark.table("spj.db.obd"), "k")
      val plan = executedPlan(joined)
      assert(shuffles(plan).isEmpty, s"bucketed SPJ lost:\n$plan")
      assert(plan.collect {
        case s: org.apache.spark.sql.execution.SortExec => s
      }.nonEmpty, s"bucketed SMJ must keep its sorts:\n$plan")
      assert(joined.count() === 100L)
    }
  }

  test("bucketed tables with ATTESTED sort order join with zero exchanges AND zero sorts") {
    // the Hive/Iceberg bucketed-sorted-table join: bucket(N, k) layout
    // gives the zero-exchange SPJ, write.sort-by=k gives per-file
    // k-ordering which the writer VERIFIES and the manifest attests —
    // with one file per bucket the scan reports k-ascending ordering
    // and the SMJ drops both sorts too
    spark.sql("CREATE TABLE spj.db.bsf (k BIGINT, v BIGINT) PARTITIONED BY (bucket(4, k)) " +
      "TBLPROPERTIES ('write.sort-by'='k')")
    spark.sql("CREATE TABLE spj.db.bsd (k BIGINT, name STRING) PARTITIONED BY (bucket(4, k)) " +
      "TBLPROPERTIES ('write.sort-by'='k')")
    spark.sql("INSERT INTO spj.db.bsf SELECT id % 10, id FROM range(100)")
    spark.sql("INSERT INTO spj.db.bsd SELECT id, concat('g', id) FROM range(10)")
    withSpjConf() {
      val joined = spark.table("spj.db.bsf").join(spark.table("spj.db.bsd"), "k")
      val plan = executedPlan(joined)
      assert(shuffles(plan).isEmpty, s"bucketed SPJ lost:\n$plan")
      assert(plan.collect {
        case s: org.apache.spark.sql.execution.SortExec => s
      }.isEmpty, s"attested ordering should remove BOTH sorts:\n$plan")
      val got = joined.select($"k", $"v", $"name")
        .as[(Long, Long, String)].collect().sorted.toSeq
      assert(got === (0L until 100L).map(id => (id % 10, id, s"g${id % 10}")).sorted)
    }
  }

  test("a second file per bucket withdraws the attested suffix: sorts return") {
    // two sorted files concatenated into one bucket partition are not
    // sorted — the scan must stop reporting the suffix the moment a
    // key group holds more than one file (while the zero-exchange SPJ
    // claim survives)
    spark.sql("INSERT INTO spj.db.bsf SELECT id % 10, id + 100 FROM range(100)")
    withSpjConf() {
      val joined = spark.table("spj.db.bsf").join(spark.table("spj.db.bsd"), "k")
      val plan = executedPlan(joined)
      assert(shuffles(plan).isEmpty, s"bucketed SPJ lost:\n$plan")
      assert(plan.collect {
        case s: org.apache.spark.sql.execution.SortExec => s
      }.nonEmpty, s"multi-file buckets must sort again:\n$plan")
      assert(joined.count() === 200L)
    }
  }

  test("identity partitioning + attested sort-by: a (k, t) sort-aggregate needs no sorts") {
    // partition-key constancy orders the prefix, the attested file
    // order the suffix — a SortAggregate over (k, t) (collect_list has
    // no hash-aggregate form) runs with zero exchanges (KeyGrouped(k)
    // satisfies the (k, t) clustering) and ZERO sorts
    spark.sql("CREATE TABLE spj.db.ksf (k BIGINT, t BIGINT, v BIGINT) PARTITIONED BY (k) " +
      "TBLPROPERTIES ('write.sort-by'='t')")
    spark.sql("INSERT INTO spj.db.ksf SELECT id % 4, id % 20, id FROM range(200)")
    // object-hash agg off so collect_list genuinely plans SortAggregate
    withSpjConf("spark.sql.execution.useObjectHashAggregateExec" -> "false") {
      val agg = spark.table("spj.db.ksf").groupBy($"k", $"t")
        .agg(sum($"v").as("sv"), collect_list($"v").as("vs"))
        .select($"k", $"t", $"sv", size($"vs").as("nv"))
      val plan = executedPlan(agg)
      assert(plan.collect {
        case a: org.apache.spark.sql.execution.aggregate.SortAggregateExec => a
      }.nonEmpty, s"test premise: must plan SortAggregate:\n$plan")
      assert(shuffles(plan).isEmpty, s"grouped-by-superset exchange appeared:\n$plan")
      assert(plan.collect {
        case s: org.apache.spark.sql.execution.SortExec => s
      }.isEmpty, s"attested (k, t) ordering should feed SortAggregate sortless:\n$plan")
      val got = agg.as[(Long, Long, Long, Int)].collect().sorted.toSeq
      val expected = (0L until 200L).groupBy(id => (id % 4, id % 20)).toSeq
        .map { case ((k, t), ids) => (k, t, ids.sum, ids.size) }.sorted
      assert(got === expected)
    }
  }

  test("SORTED COMPACTION: OPTIMIZE restores the zero-sort plan it would otherwise destroy") {
    spark.sql("CREATE TABLE spj.db.scf (k BIGINT, t BIGINT, v BIGINT) PARTITIONED BY (k) " +
      "TBLPROPERTIES ('write.sort-by'='t')")
    // two appends with DISJOINT t ranges per key: each file is attested
    // sorted, but two files per key withdraw the ordering suffix
    spark.sql("INSERT INTO spj.db.scf SELECT id % 3, id, id * 2 FROM range(0, 30)")
    spark.sql("INSERT INTO spj.db.scf SELECT id % 3, id, id * 2 FROM range(30, 60)")
    def aggPlan() =
      withSpjConf("spark.sql.execution.useObjectHashAggregateExec" -> "false") {
        val agg = spark.table("spj.db.scf").groupBy($"k", $"t")
          .agg(collect_list($"v").as("vs"))
          .select($"k", $"t", size($"vs").as("nv"))
        val plan = executedPlan(agg)
        assert(plan.collect {
          case a: org.apache.spark.sql.execution.aggregate.SortAggregateExec => a
        }.nonEmpty, s"test premise: must plan SortAggregate:\n$plan")
        plan
      }
    assert(aggPlan().collect {
      case s: org.apache.spark.sql.execution.SortExec => s
    }.nonEmpty, "two files per key must sort")
    // compaction reorders each bin by the sort key, proves the ranges
    // strictly disjoint, and attests the merged file — the sortless
    // plan comes BACK after OPTIMIZE
    ManifestSink.compact(wh.resolve("db").resolve("scf").toString, targetRows = 1000L)
    val entries = ManifestSink.committedEntries(wh.resolve("db").resolve("scf"), None)
    assert(entries.size === 3 && entries.forall(_.sorted == Seq("t")),
      s"merged entries must attest: ${entries.map(e => (e.name, e.sorted))}")
    assert(aggPlan().collect {
      case s: org.apache.spark.sql.execution.SortExec => s
    }.isEmpty, "compacted single-file keys must plan sortless again")
    // values exact through the whole cycle
    val got = spark.table("spj.db.scf").select($"k", $"t", $"v")
      .as[(Long, Long, Long)].collect().sorted.toSeq
    assert(got === (0L until 60L).map(id => (id % 3, id, id * 2)).sorted)
  }

  test("overlapping key ranges refuse the compaction attestation") {
    spark.sql("CREATE TABLE spj.db.sco (k BIGINT, t BIGINT) PARTITIONED BY (k) " +
      "TBLPROPERTIES ('write.sort-by'='t')")
    // both appends cover the SAME t range: concatenation in any order
    // is unsorted, so the merged file must NOT attest
    spark.sql("INSERT INTO spj.db.sco SELECT id % 3, id FROM range(0, 30)")
    spark.sql("INSERT INTO spj.db.sco SELECT id % 3, id FROM range(0, 30)")
    ManifestSink.compact(wh.resolve("db").resolve("sco").toString, targetRows = 1000L)
    val entries = ManifestSink.committedEntries(wh.resolve("db").resolve("sco"), None)
    assert(entries.forall(_.sorted.isEmpty),
      s"overlapping ranges must refuse: ${entries.map(e => (e.name, e.sorted))}")
    assert(spark.table("spj.db.sco").count() === 60L)
  }

  test("RENAME carries the attestation; DROP truncates it at the dropped column") {
    spark.sql("CREATE TABLE spj.db.rsf (k BIGINT, t BIGINT, x BIGINT) PARTITIONED BY (k) " +
      "TBLPROPERTIES ('write.sort-by'='t')")
    spark.sql("INSERT INTO spj.db.rsf SELECT id % 3, id, id * 2 FROM range(30)")
    def sortedOf(): Seq[Seq[String]] =
      ManifestSink.committedEntries(wh.resolve("db").resolve("rsf"), None).map(_.sorted)
    assert(sortedOf().forall(_ == Seq("t")))
    spark.sql("ALTER TABLE spj.db.rsf RENAME COLUMN t TO ts")
    assert(sortedOf().forall(_ == Seq("ts")), "rename must carry the attestation")
    withSpjConf("spark.sql.execution.useObjectHashAggregateExec" -> "false") {
      // ordering survives the rename end-to-end: the sort-aggregate on
      // (k, ts) still plans sortless
      val agg = spark.table("spj.db.rsf").groupBy($"k", $"ts")
        .agg(collect_list($"x").as("xs"))
        .select($"k", $"ts", size($"xs").as("nx"))
      val plan = executedPlan(agg)
      assert(plan.collect {
        case s: org.apache.spark.sql.execution.SortExec => s
      }.isEmpty, s"renamed sort column lost its attestation:\n$plan")
    }
    spark.sql("ALTER TABLE spj.db.rsf DROP COLUMN ts")
    assert(sortedOf().forall(_.isEmpty), "dropping the sort column clears the claim")
  }

  test("deletes and compaction preserve key grouping") {
    spark.sql("CREATE TABLE spj.db.mut (k BIGINT, v BIGINT) PARTITIONED BY (k)")
    spark.sql("INSERT INTO spj.db.mut SELECT id % 3, id FROM range(30)")
    spark.sql("DELETE FROM spj.db.mut WHERE v >= 20")
    val root = wh.resolve("db").resolve("mut")
    ManifestSink.compact(root.toString, targetRows = 1000L)
    withSpjConf() {
      val df = spark.table("spj.db.mut").groupBy($"k").agg(count(lit(1)).as("n"))
      val plan = executedPlan(df)
      assert(shuffles(plan).isEmpty, s"post-OPTIMIZE grouping lost:\n$plan")
      assert(df.as[(Long, Long)].collect().toMap ==
        (0L until 3L).map(k => k -> (0L until 20L).count(_ % 3 == k).toLong).toMap)
    }
  }
}
