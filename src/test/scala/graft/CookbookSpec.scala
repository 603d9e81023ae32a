package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.engine.Tables
import graft.functions.GraftFunctions
import graft.operators.EnrichOps
import graft.plans.{AsOfJoin, FloatVectorDot}

/** Executable twin of COOKBOOK.md: every snippet in the doc appears here
  * verbatim (modulo the surrounding assert), so the cookbook can never
  * drift into code that doesn't compile or run. Keep section numbers in
  * sync with the doc headings. */
class CookbookSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sfDir = TestSpark.sfDir

  test("§2 load tables and query with SQL") {
    Tables.registerAll(spark, sfDir)
    val top = spark.sql("""
      SELECT n_name, count(*) AS n_customers
      FROM customer JOIN nation ON c_nationkey = n_nationkey
      GROUP BY n_name ORDER BY n_customers DESC LIMIT 5""")
    assert(top.count() == 5)
  }

  test("§3 money-exact aggregation") {
    import GraftFunctions.cents
    val revenue = Tables.lineitem(spark, sfDir)
      .groupBy("l_returnflag")
      .agg((sum(cents(col("l_extendedprice"))) / 100.0).as("revenue"))
    assert(revenue.count() == 3)
  }

  test("§4 broadcast dimension join + per-group top-k") {
    import org.apache.spark.sql.expressions.Window
    val orders = Tables.orders(spark, sfDir)
    val customer = Tables.customer(spark, sfDir)
    val perNation = orders.join(broadcast(customer),
        col("o_custkey") === col("c_custkey"))
      .withColumn("rk", row_number().over(
        Window.partitionBy("c_nationkey").orderBy(col("o_totalprice").desc)))
      .filter(col("rk") <= 3) // compiles to WindowGroupLimit: no full sort
    assert(perNation.count() > 0)
  }

  test("§5 as-of join") {
    val trades = Tables.events(spark, sfDir)
      .select(col("user_id"), col("ts_us"), col("value"))
    val quotes = Tables.events(spark, sfDir)
      .filter(col("event_type") === "purchase")
      .select(col("user_id").as("q_user"), col("ts_us").as("q_ts"))
    val matched = AsOfJoin.asof(trades, quotes,
      trades("user_id"), quotes("q_user"), trades("ts_us"), quotes("q_ts"))
    assert(matched.columns.contains("asof_time") && matched.count() > 0)
  }

  test("§6 near-duplicate detection") {
    val verdicts = SparkEntry.queries("q41_minhash_lsh")(spark, sfDir)
    val clusters = SparkEntry.queries("q77_dedup_clusters")(spark, sfDir)
    assert(verdicts.count() > 0 && clusters.count() > 0)
  }

  test("§7 vector similarity top-k") {
    import org.apache.spark.sql.expressions.Window
    val emb = Tables.embeddings(spark, sfDir)
    val probes = emb.filter(col("vec_id") < 3)
      .select(col("vec_id").as("p_id"), col("embedding").as("p_vec"))
    val topk = emb.crossJoin(broadcast(probes))
      .filter(col("vec_id") =!= col("p_id"))
      .withColumn("cos",
        FloatVectorDot.cosineNative(col("embedding"), col("p_vec")))
      .withColumn("rk", row_number().over(
        Window.partitionBy("p_id").orderBy(col("cos").desc, col("vec_id"))))
      .filter(col("rk") <= 5)
    assert(topk.count() == 15)
  }

  test("§8 text analysis primitives") {
    import GraftFunctions.{shingleSet, rollingFingerprint}
    val profiled = Tables.documents(spark, sfDir).select(
      col("doc_id"),
      size(split(col("text"), " ")).as("n_tokens"),
      size(shingleSet(col("text"), 3)).as("distinct_shingles"),
      rollingFingerprint(col("text")).as("fingerprint"))
    assert(profiled.filter(col("fingerprint").isNull).count() == 0)
  }

  test("§9 LLM enrichment with an injectable service") {
    val reports = SparkEntry.queries("q34_template_report")(spark, sfDir)
    val advised = EnrichOps.enrich(reports, EnrichOps.StubChat)
    assert(advised.filter(col("advice").startsWith("ADVICE[")).count()
      == reports.count())
  }

  test("§10 run any canned operator query") {
    val names = Seq("q01_pricing_summary", "q45_ann_lsh", "q60_tumbling_window")
    names.foreach { n =>
      assert(SparkEntry.queries(n)(spark, sfDir).count() > 0, n)
    }
    // every SQL-expressible query ships its DuckDB-equivalent oracle text
    assert(SparkEntry.oracleSql.contains("q01_pricing_summary"))
  }

  test("§11 training-corpus preparation") {
    val scrubbed  = SparkEntry.queries("q102_pii_redact")(spark, sfDir)      // regex PII scrub + audit counts
    val chunks    = SparkEntry.queries("q103_chunk_overlap")(spark, sfDir)   // 50-token windows, stride 40
    val tainted   = SparkEntry.queries("q104_decontaminate")(spark, sfDir)   // 5-gram overlap vs eval stratum
    val order     = SparkEntry.queries("q105_shuffle_order")(spark, sfDir)   // reproducible (shard, pos) permutation
    val clusters  = SparkEntry.queries("q106_kmeans_assign")(spark, sfDir)   // Lloyd assignment vs fixed codebook
    assert(scrubbed.count() > 0 && chunks.count() > 0 && order.count() > 0
      && clusters.count() > 0)
    assert(tainted.columns.contains("quarantine"))
  }

  test("§6b incremental dedup + sketch calibration") {
    val verdicts = SparkEntry.queries("q119_incremental_dedup")(spark, sfDir)
    val calibration = SparkEntry.queries("q120_minhash_calibration")(spark, sfDir)
    assert(verdicts.select("verdict").distinct().collect()
      .map(_.getString(0)).toSet.subsetOf(Set("exact", "near", "new")))
    assert(calibration.columns.toSeq ==
      Seq("doc_a", "doc_b", "jac_bp", "est_bp", "err_bp"))
  }

  test("§6c exact set-similarity family") {
    val allPairs    = SparkEntry.queries("q190_setsim_join")(spark, sfDir)
    val midPairs    = SparkEntry.queries("q196_setsim_ppjoin")(spark, sfDir)
    val batchPairs  = SparkEntry.queries("q198_setsim_incremental")(spark, sfDir)
    val atRestPairs = SparkEntry.queries("q199_setsim_index")(spark, sfDir)
    // t=0.5 finds a superset of t=0.8's pairs; at-rest equals inline
    def ab(df: org.apache.spark.sql.DataFrame) = df.select("doc_a", "doc_b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(ab(allPairs).subsetOf(ab(midPairs)))
    assert(ab(atRestPairs) == ab(batchPairs))
  }

  test("§13 DSv2 sources & sinks") {
    // fanout scan with the permissive error channel (deterministic
    // payloads here; GateSpec drives the HTTP + retry path end to end)
    val feed = spark.read.format("graft.sources.FanoutSource")
      .option("ids", "2,5,7,11").option("rowsPerId", "10")
      .option("errorMode", "permissive")
      .load()
    assert(feed.schema.fieldNames.toSeq ==
      Seq("source_id", "seq", "payload", "error"))
    assert(feed.count() == 40 && feed.filter(col("error").isNotNull).count() == 0)

    // manifest table: append + metadata count + stats-pruned filter scan
    val dir = java.nio.file.Files.createTempDirectory("cookbook-manifest").toString
    val df = spark.range(400).select(col("id"), lit("v").as("s"), lit(1.0).as("x"))
      .repartitionByRange(4, col("id")).sortWithinPartitions("id")
    df.write.format("graft.sources.ManifestSink")
      .option("path", dir).mode("overwrite").save()
    val t = spark.read.format("graft.sources.ManifestSink")
      .option("path", dir).load()
    assert(t.count() == 400)
    val narrow = t.filter(col("id") >= 150 && col("id") < 160)
    assert(narrow.rdd.getNumPartitions == 1 && narrow.count() == 10)

    // change feed: an append publishes v2; reading changesFromVersion=1
    // returns ONLY the appended rows (the streaming write and retention
    // GC halves of §13 are lifecycle-heavy — ManifestStreamSpec and
    // ManifestCasSpec run them end to end)
    spark.range(10).select(col("id") + 1000, lit("w").as("s"), lit(2.0).as("x"))
      .toDF("id", "s", "x")
      .write.format("graft.sources.ManifestSink")
      .option("path", dir).mode("append").save()
    val delta = spark.read.format("graft.sources.ManifestSink")
      .option("path", dir).option("changesFromVersion", "1").load()
    assert(delta.count() == 10 && t.count() == 410)
  }

  test("§16 row lineage & incremental consumption") {
    val wh = java.nio.file.Files.createTempDirectory("cookbook-lineage")
    spark.conf.set("spark.sql.catalog.ck16", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.ck16.warehouse", wh.toString)
    spark.sql("CREATE NAMESPACE ck16.db")
    spark.sql("CREATE TABLE ck16.db.t (id BIGINT, v BIGINT)")
    spark.sql("INSERT INTO ck16.db.t SELECT id, id * 2 FROM range(9)") // v2

    val ids = spark.sql("SELECT id, _row_id FROM ck16.db.t")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(ids.values.toSeq.sorted == (0L until 9L))

    spark.sql("UPDATE ck16.db.t SET v = v + 1 WHERE id % 3 = 0") // v3
    val after = spark.sql(
      "SELECT id, _row_id, _last_updated_version FROM ck16.db.t")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    after.foreach { case (id, (rid, lu)) =>
      assert(rid == ids(id)) // identity survives the update
      assert(lu == (if (id % 3 == 0) 3L else 2L))
    }

    // incremental read: only rows changed after v2
    val changed = spark.sql(
      "SELECT id FROM ck16.db.t WHERE _last_updated_version > 2")
      .collect().map(_.getLong(0)).toSet
    assert(changed == Set(0L, 3L, 6L))

    // per-file lineage accounting readout
    assert(spark.sql(
      "SELECT * FROM ck16.db.t.files WHERE first_row_id IS NOT NULL").count() >= 1)
  }

  test("§15 snapshot refs, column stats, read coalescing") {
    val wh = java.nio.file.Files.createTempDirectory("cookbook-refs")
    spark.conf.set("spark.sql.catalog.ck15", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.ck15.warehouse", wh.toString)
    spark.sql("CREATE NAMESPACE ck15.db")
    spark.sql("CREATE TABLE ck15.db.t (id BIGINT, v BIGINT)")
    spark.sql("INSERT INTO ck15.db.t SELECT id, id * 2 FROM range(20)")

    spark.sql("CALL ck15.system.tag(table => 'db.t', name => 'run-2024-06')")
    spark.sql("INSERT INTO ck15.db.t SELECT id + 100, id FROM range(5)")
    assert(spark.sql("SELECT * FROM ck15.db.t VERSION AS OF 'run-2024-06'").count() == 20)
    assert(spark.sql("SELECT * FROM ck15.db.t.refs").count() >= 2) // main + tag
    spark.sql("CALL ck15.system.drop_tag(table => 'db.t', name => 'run-2024-06')")

    val stats = spark.sql("SELECT * FROM ck15.db.t.stats")
      .collect().map(r => r.getString(0) -> r).toMap
    // multi-file NDV answers from the MERGED per-file HLL sketches
    // (deterministic, ~6.5% standard error; true distinct count is 25)
    assert(math.abs(stats("id").getLong(1) - 25L) <= 3L, s"ndv: ${stats("id")}")

    spark.conf.set("graft.scan.bin-rows", "1048576")
    try assert(spark.table("ck15.db.t").rdd.getNumPartitions >= 1)
    finally spark.conf.unset("graft.scan.bin-rows")
  }

  test("§14 lakehouse catalog: WAP, CDC, MVs, metadata views") {
    val wh = java.nio.file.Files.createTempDirectory("cookbook-lake")
    spark.conf.set("spark.sql.catalog.lake", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.lake.warehouse", wh.toString)
    spark.sql("CREATE NAMESPACE lake.db")
    spark.sql("CREATE TABLE lake.db.t (id BIGINT, day STRING, v DOUBLE) " +
      "PARTITIONED BY (day) TBLPROPERTIES ('delete.mode' = 'merge-on-read')")
    spark.sql("INSERT INTO lake.db.t SELECT id, concat('d', id % 3), id * 1.0 FROM range(30)")

    // write-audit-publish
    spark.sql("CALL lake.system.create_branch(table => 'db.t', branch => 'ingest')")
    spark.range(100, 106).selectExpr("id", "concat('d', id % 3) AS day", "id * 1.0 AS v")
      .writeTo("lake.db.t.branch_ingest").append()
    assert(spark.table("lake.db.t").count() == 30)             // invisible to main
    assert(spark.table("lake.db.t.branch_ingest").count() == 36) // audit
    assert(spark.sql("SELECT * FROM lake.db.t VERSION AS OF 'ingest'").count() == 36)
    spark.sql("CALL lake.system.fast_forward(table => 'db.t', branch => 'ingest')")
    assert(spark.table("lake.db.t").count() == 36)

    // row change feed: a MoR delete arrives as typed delete images
    val vBefore = spark.table("lake.db.t.history")
      .agg(max(col("version"))).head().getLong(0)
    spark.sql("DELETE FROM lake.db.t WHERE id IN (1, 2)")
    val feed = spark.read.format("graft.sources.ManifestSink")
      .option("path", wh.resolve("db").resolve("t").toString)
      .option("changesFromVersion", vBefore.toString)
      .option("changeFeedMode", "cdc").load()
    assert(feed.filter(col("_change_type") === "delete").count() == 2)

    // incrementally-maintained view with retractions
    spark.sql("CREATE TABLE lake.db.t_by_day (day STRING, n BIGINT, sum_v BIGINT)")
    spark.sql("CREATE TABLE lake.db.src (day STRING, v BIGINT) " +
      "TBLPROPERTIES ('delete.mode' = 'merge-on-read')")
    spark.sql("INSERT INTO lake.db.src SELECT concat('d', id % 2), id FROM range(10)")
    graft.sources.IncrementalMv.refresh(spark, "lake", "db.src", "db.t_by_day",
      Seq("day"), Seq("v"))
    spark.sql("DELETE FROM lake.db.src WHERE v = 0")
    graft.sources.IncrementalMv.refresh(spark, "lake", "db.src", "db.t_by_day",
      Seq("day"), Seq("v"))
    assert(spark.table("lake.db.t_by_day").count() == 2)

    // metadata views answer with zero data I/O
    assert(spark.table("lake.db.t.history").count() >= 3)
    assert(spark.table("lake.db.t.partitions").count() == 3)
    assert(spark.table("lake.db.t.files").count() > 0)

    // hidden partitioning: filter the RAW column, prune by derived day;
    // a day-aligned delete retires the partition metadata-only
    spark.sql("CREATE TABLE lake.db.ev (ts BIGINT, v DOUBLE) " +
      "PARTITIONED BY (days(ts))")
    spark.sql("INSERT INTO lake.db.ev SELECT id * 43200000000, id * 1.0 FROM range(6)")
    spark.sql("DELETE FROM lake.db.ev WHERE ts < 86400000000 * 1")
    assert(spark.table("lake.db.ev").count() == 4)

    // lossless type widening, metadata-only
    spark.sql("CREATE TABLE lake.db.wt (id BIGINT, n INT)")
    spark.sql("INSERT INTO lake.db.wt SELECT id, CAST(id AS INT) FROM range(3)")
    spark.sql("ALTER TABLE lake.db.wt ALTER COLUMN n TYPE BIGINT")
    spark.sql("INSERT INTO lake.db.wt VALUES (9, 3000000000)")
    assert(spark.sql("SELECT max(n) FROM lake.db.wt").head().getLong(0) == 3000000000L)

    // delete-by-key with a zero-read commit; re-inserts survive
    graft.sources.ManifestSink.deleteWhereEq(
      wh.resolve("db").resolve("wt").toString, "id", Seq("0"))
    assert(spark.table("lake.db.wt").count() == 3)

    // row-group sizing knob validates on ALTER
    spark.sql("ALTER TABLE lake.db.wt SET TBLPROPERTIES " +
      "('write.parquet.row-group-bytes' = '16777216')")

    // the search-ingest loop: appends maintain the postings index
    spark.sql("CREATE TABLE lake.db.docs (doc_id BIGINT, text STRING)")
    graft.sources.PostingsMaintenance.createPostingsTable(spark, "lake", "db.postings")
    spark.sql("INSERT INTO lake.db.docs VALUES (1, 'spark scales out')")
    graft.sources.PostingsMaintenance.refresh(spark, "lake", "db.docs", "db.postings")
    assert(spark.table("lake.db.postings").count() == 3)
  }

  test("§12 behavioral analytics & data quality") {
    val sessions  = SparkEntry.queries("q109_sessionize")(spark, sfDir)        // 30-min-gap sessions per user
    val retention = SparkEntry.queries("q110_retention")(spark, sfDir)         // cohort x day-offset active users
    val matrix    = SparkEntry.queries("q112_transition_matrix")(spark, sfDir) // event-type Markov bigrams (bp)
    val skew      = SparkEntry.queries("q113_skew_profile")(spark, sfDir)      // heavy join keys -> salting decision
    val gate      = SparkEntry.queries("q115_expectations")(spark, sfDir)      // batch admit/reject rule report
    val outliers  = SparkEntry.queries("q116_outliers")(spark, sfDir)          // |z| >= 2.5 sigma per event type
    val merged    = SparkEntry.queries("q122_merge_upsert")(spark, sfDir)      // MERGE: one full-outer join + CASE
    val scd2      = SparkEntry.queries("q123_scd2")(spark, sfDir)              // SCD2 validity intervals (lag/lead)
    val heavy     = SparkEntry.queries("q121_heavy_hitters")(spark, sfDir)     // exact > N/(K+1) tokens, 2-pass MG
    assert(sessions.count() > 0 && retention.count() > 0 && matrix.count() > 0
      && skew.count() > 0 && gate.count() == 5)
    assert(outliers.columns.contains("z_bp"))
    assert(merged.count() > 0 && scd2.count() > 0 && heavy.count() > 0)
  }
}
