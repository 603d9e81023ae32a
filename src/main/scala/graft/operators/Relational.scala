package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.engine.Tables
import graft.functions.GraftFunctions._

/** Relational operator breadth: one named query per SURVEY.md §2.2 row
  * (scan, filter/project, every join flavor, aggregation incl. rollup/cube/
  * grouping sets, windows, top-k, set ops, scalar-function gauntlet).
  *
  * Reference analogs (rws_data_ingester src/rotterdam_swimming_advice.py):
  * the filter→extract→aggregate→format spine at :169-227 is the shape of
  * q01; the keyed fan-out scan at :105-108 is the broadcast-join shape of
  * q03; the first-match select at :170-185 is the semi-join shape of q06.
  *
  * Determinism & oracle-parity rules (see SURVEY.md §4.3/§7.4):
  *   - money doubles aggregate as exact integer cents, divided back to
  *     double only after the sum (bit-identical in Spark and DuckDB);
  *   - passthrough doubles (read from parquet, never re-accumulated) are
  *     safe to emit raw;
  *   - integer outputs are cast on the DuckDB side to Spark's natural type
  *     (duckdb sum(BIGINT)→HUGEINT, year()→BIGINT, ceil(DOUBLE)→DOUBLE);
  *   - every query ends in a total ORDER BY on its key columns.
  *
  * Scale notes: joins against `supplier`/`nation`/`region`/`part` are
  * explicit `broadcast()` (dims stay KB-scale even at 100 TB fact size);
  * the large-large join (q04) is hinted sort-merge; aggregates are plain
  * `groupBy` so Catalyst plans partial→final (map-side combine) and AQE
  * coalesces post-shuffle partitions.
  */
object Relational {
  type Q = (SparkSession, String) => DataFrame

  /** revenue in 1e-4 units: extendedprice_cents * (100 - discount_cents) */
  private def revE4 = sum(cents(col("l_extendedprice")) * (lit(100L) - cents(col("l_discount"))))

  /** Recursive CTE (q95, Spark 4 WITH RECURSIVE): a calendar spine over
    * Q1-1995 left-joined to orders so ZERO-order days still appear — the
    * gap-filling date-dimension pattern, recursion bounded by the date
    * range. Identical text runs in DuckDB as the oracle. */
  val recursiveSpineText: String =
    """WITH RECURSIVE d(dt) AS (
      |  SELECT DATE '1995-01-01'
      |  UNION ALL SELECT CAST(dt + INTERVAL 1 DAY AS DATE) FROM d
      |  WHERE dt < DATE '1995-03-31')
      |SELECT dt, count(o_orderkey) AS n_orders
      |FROM d LEFT JOIN orders ON o_orderdate = dt
      |GROUP BY dt ORDER BY dt""".stripMargin

  /** Correlated LATERAL join (q96): top-2 orders per customer via a
    * correlated ordered-limit subquery — the per-row dependent-join SQL
    * surface (Spark plans it as a rank-limited join, not a loop).
    * Identical text runs in DuckDB as the oracle. */
  val lateralText: String =
    """SELECT c_custkey, o.o_orderkey, o.cents
      |FROM customer, LATERAL (
      |  SELECT o_orderkey, CAST(round(o_totalprice * 100) AS BIGINT) AS cents
      |  FROM orders WHERE o_custkey = c_custkey
      |  ORDER BY cents DESC, o_orderkey LIMIT 2) o
      |WHERE c_custkey < 50
      |ORDER BY c_custkey, cents DESC, o_orderkey""".stripMargin

  /** One SQL text, two engines (q89): runs verbatim through `spark.sql`
    * over the registered views AND through DuckDB as its own oracle —
    * only portable constructs (exact-cents money, ANSI date literal). */
  val sqlApiText: String =
    """SELECT n_name, o_orderpriority, count(*) AS n_orders,
      |  CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS sum_cents
      |FROM orders
      |JOIN customer ON o_custkey = c_custkey
      |JOIN nation ON c_nationkey = n_nationkey
      |WHERE o_orderdate >= DATE '1995-01-01'
      |GROUP BY n_name, o_orderpriority
      |ORDER BY n_name, o_orderpriority""".stripMargin

  val queries: Map[String, Q] = Map(
    "q01_pricing_summary" -> ((s, dir) => {
      Tables.lineitem(s, dir)
        .filter(col("l_shipdate") <= lit("2000-06-30 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          (sum(cents(col("l_quantity"))).cast("double") / lit(100.0)).as("sum_qty"),
          (sum(cents(col("l_extendedprice"))).cast("double") / lit(100.0)).as("sum_base_price"),
          (revE4.cast("double") / lit(10000.0)).as("sum_disc_price"),
          (sum(cents(col("l_extendedprice")) * (lit(100L) - cents(col("l_discount")))
            * (lit(100L) + cents(col("l_tax")))).cast("double") / lit(1000000.0)).as("sum_charge"),
          (sum(cents(col("l_quantity"))).cast("double") / lit(100.0) / count(lit(1))).as("avg_qty"),
          (sum(cents(col("l_extendedprice"))).cast("double") / lit(100.0) / count(lit(1))).as("avg_price"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus")
    }),

    "q02_filter_project" -> ((s, dir) => {
      Tables.orders(s, dir)
        .filter((col("o_orderpriority").startsWith("1") || col("o_orderpriority").contains("HIGH"))
          && col("o_totalprice") > 100000.0 && col("o_orderstatus") === "O")
        .select("o_orderkey", "o_custkey", "o_orderpriority", "o_totalprice")
        .orderBy("o_orderkey")
    }),

    "q03_broadcast_join" -> ((s, dir) => {
      Tables.lineitem(s, dir)
        .join(broadcast(Tables.supplier(s, dir)), col("l_suppkey") === col("s_suppkey"))
        .groupBy("s_name")
        .agg(count(lit(1)).as("n_items"),
          (revE4.cast("double") / lit(10000.0)).as("revenue"))
        .orderBy("s_name")
    }),

    "q04_sortmerge_join" -> ((s, dir) => {
      val l = Tables.lineitem(s, dir).hint("merge")
      l.join(Tables.orders(s, dir), col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n_items"),
          (revE4.cast("double") / lit(10000.0)).as("revenue"))
        .orderBy("o_orderpriority")
    }),

    "q05_star_join" -> ((s, dir) => {
      Tables.lineitem(s, dir)
        .join(Tables.orders(s, dir), col("l_orderkey") === col("o_orderkey"))
        .join(Tables.customer(s, dir), col("o_custkey") === col("c_custkey"))
        .join(broadcast(Tables.nation(s, dir)), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(Tables.region(s, dir)), col("n_regionkey") === col("r_regionkey"))
        .filter(col("r_name") === "ASIA"
          && col("o_orderdate") >= lit("1996-01-01 00:00:00").cast("timestamp")
          && col("o_orderdate") < lit("1999-01-01 00:00:00").cast("timestamp"))
        .groupBy("n_name")
        .agg((revE4.cast("double") / lit(10000.0)).as("revenue"),
          count(lit(1)).as("n_items"))
        .orderBy("n_name")
    }),

    "q06_semi_join" -> ((s, dir) => {
      Tables.customer(s, dir)
        .join(Tables.orders(s, dir).filter(col("o_totalprice") > 400000.0),
          col("c_custkey") === col("o_custkey"), "left_semi")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    }),

    "q07_anti_join" -> ((s, dir) => {
      Tables.customer(s, dir)
        .join(Tables.orders(s, dir).filter(col("o_totalprice") > 450000.0),
          col("c_custkey") === col("o_custkey"), "left_anti")
        .select("c_custkey", "c_name", "c_mktsegment")
        .orderBy("c_custkey")
    }),

    "q08_theta_join" -> ((s, dir) => {
      // pure non-equi predicate -> broadcast nested-loop join on the dim
      // side. BNLJ is O(|probe| x |build|), so like q44's brute-force
      // cosine this capability demo runs on a bounded probe set; the
      // full-corpus inequality aggregate is q108's band decomposition
      // (same semantics, near-linear — 147s -> ~2s at sf1).
      Tables.supplier(s, dir)
        .filter(col("s_suppkey") < 100)
        .join(broadcast(Tables.part(s, dir)), col("s_acctbal") > col("p_retailprice"))
        .groupBy("s_name")
        .agg(count(lit(1)).as("n_cheaper_parts"))
        .orderBy("s_name")
    }),

    // The scalable statement of q08's inequality join: count, per
    // supplier, the parts cheaper than its balance — WITHOUT a nested
    // loop. Decomposition: band the price domain (width 10, ~100 parts
    // per band at sf1); parts in bands strictly below a supplier's band
    // are all cheaper (one lookup in a dense cumulative band table, ~1k
    // rows, broadcast), and only the supplier's OWN band needs exact
    // comparison (equi-join on band, fanout = parts-per-band, bounded by
    // the width choice — at a larger corpus, narrow the width to hold
    // the per-band count). Both shuffles are keyed by band; nothing is
    // quadratic at any scale. The oracle states the same aggregate as a
    // plain theta join — banding must be invisible in the result.
    "q108_theta_band" -> ((s, dir) => {
      val BandW = 10
      // explicit attribute-level null filters: a null price/balance can
      // never satisfy the inequality, and filtering the ATTRIBUTE reaches
      // the parquet scan (isnotnull(p_retailprice) is pushable), whereas
      // the equivalent constraint Catalyst infers from the band join —
      // isnotnull(floor(price/W)) — is an expression and can only run as
      // an unpushed row filter
      val parts = Tables.part(s, dir)
        .filter(col("p_retailprice").isNotNull)
        .select(floor(col("p_retailprice") / BandW).cast("long").as("pband"),
          col("p_retailprice").as("price"))
      val bandCounts = parts.groupBy("pband").agg(count(lit(1)).as("n"))
      val bounds = parts.agg(min(col("pband")).as("lo"), max(col("pband")).as("hi"))
      // dense band spine lo..hi+1 so every supplier band <= hi+1 has a
      // cumulative row even when no part lands in it; the spine is tiny
      // (price-domain/100 rows), so the single-partition window is fine
      val spine = bounds.select(explode(sequence(col("lo"), col("hi") + 1)).as("pband"))
      val wcum = Window.orderBy("pband").rowsBetween(Window.unboundedPreceding, -1)
      val cum = spine.join(bandCounts, Seq("pband"), "left")
        .select(col("pband"), coalesce(col("n"), lit(0L)).as("n"))
        .withColumn("cum_below", coalesce(sum(col("n")).over(wcum), lit(0L)))
        .select(col("pband").as("sband"), col("cum_below"))
      val sup = Tables.supplier(s, dir)
        .filter(col("s_acctbal").isNotNull)
        .select(col("s_suppkey"), col("s_name"), col("s_acctbal"),
          floor(col("s_acctbal") / BandW).cast("long").as("band"))
        .crossJoin(broadcast(bounds))
        .withColumn("sband", least(greatest(col("band"), col("lo")), col("hi") + 1))
      val below = sup.join(broadcast(cum), "sband")
      val inBand = below
        .join(parts, col("sband") === col("pband") && col("price") < col("s_acctbal"), "left")
      // per supplier ROW first (s_name is not unique across sf tiles),
      // then per name — matching q08's groupBy(s_name) over the raw pairs
      inBand.groupBy("s_suppkey", "s_name")
        .agg((sum(when(col("price").isNotNull, 1L).otherwise(0L))
          + first(col("cum_below"))).as("nc"))
        .groupBy("s_name")
        .agg(sum(col("nc")).as("n_cheaper_parts"))
        .filter(col("n_cheaper_parts") > 0)
        .orderBy("s_name")
    }),

    // distribution window functions: quartile bucket, percent_rank,
    // cume_dist over each customer's order history
    "q74_window_distribution" -> ((s, dir) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("o_custkey").orderBy(col("o_totalprice"), col("o_orderkey"))
      Tables.orders(s, dir)
        .filter(col("o_custkey") < 20)
        .select(col("o_custkey"), col("o_orderkey"),
          ntile(4).over(w).as("quartile"),
          round(percent_rank().over(w) * 10000).cast("long").as("pr_bp"),
          round(cume_dist().over(w) * 10000).cast("long").as("cd_bp"))
        .orderBy("o_custkey", "o_orderkey")
    }),

    // exact interpolated percentiles over integer cents (both engines use
    // the percentile_cont definition: (1-d)*lo + d*hi on doubles)
    "q49_quantiles" -> ((s, dir) => {
      Tables.events(s, dir)
        .select(col("event_type"), cents(col("value")).as("vc"))
        .groupBy("event_type")
        .agg(expr("percentile(vc, 0.5)").as("p50_cents"),
          expr("percentile(vc, 0.9)").as("p90_cents"),
          count(lit(1)).as("n"))
        .orderBy("event_type")
    }),

    // pivot: one column per event_type, counts per user (top-20 users)
    "q59_pivot" -> ((s, dir) => {
      Tables.events(s, dir)
        .filter(col("user_id") < 20)
        .groupBy("user_id")
        .pivot("event_type", Seq("click", "view", "purchase", "error", "signup"))
        .count()
        .na.fill(0L)
        .orderBy("user_id")
    }),

    // unpivot/melt: wide part attributes back to (key, attr, val) rows
    "q66_unpivot" -> ((s, dir) => {
      Tables.part(s, dir)
        .select(col("p_partkey"),
          expr("stack(2, 'size', CAST(p_size AS DOUBLE), 'retailprice', p_retailprice) AS (attr, val)"))
        .orderBy("p_partkey", "attr")
    }),

    "q28_shuffle_hash_join" -> ((s, dir) => {
      // explicit SHUFFLE_HASH strategy (vs q03's broadcast and q04's SMJ):
      // both sides shuffle on the key, build side hashed per partition —
      // the right plan when both sides are large but one hashes in memory
      Tables.lineitem(s, dir).hint("SHUFFLE_HASH")
        .join(Tables.part(s, dir).hint("SHUFFLE_HASH"),
          col("l_partkey") === col("p_partkey"))
        .groupBy("p_brand")
        .agg(count(lit(1)).as("n_items"),
          (sum(cents(col("l_quantity"))).cast("double") / lit(100.0)).as("sum_qty"))
        .orderBy("p_brand")
    }),

    "q29_salted_skew_join" -> ((s, dir) => {
      // Skew-mitigation pattern: events is heavily skewed on event_type
      // (5 hot keys for the whole table), so a plain shuffle join would
      // put each key on ONE reducer. Salting spreads each hot key over
      // SaltN reducers: fact rows get salt = event_id % SaltN, the small
      // side is replicated xSaltN, and the join key becomes (key, salt).
      // AQE skew-split solves this adaptively; salting is the explicit,
      // planner-independent form.
      val SaltN = 8
      val e = Tables.events(s, dir)
        .withColumn("salt", (col("event_id") % SaltN).cast("int"))
      // exact integer mean test: value > sum/n  <=>  cents(value)*n > sum_cents
      val dim = Tables.events(s, dir)
        .groupBy("event_type")
        .agg(sum(cents(col("value"))).as("sum_cents"), count(lit(1)).as("n_type"))
        .withColumn("salt", explode(sequence(lit(0), lit(SaltN - 1))))
      e.join(dim, Seq("event_type", "salt"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"),
          sum(when(cents(col("value")) * col("n_type") > col("sum_cents"), 1L)
            .otherwise(0L)).as("n_above_avg"))
        .orderBy("event_type")
    }),

    "q09_asof_join" -> ((s, dir) => {
      // as-of merge: for each purchase, the most recent click at/before it,
      // per user — single shuffle on user_id + sort, no range explosion.
      val e = Tables.events(s, dir)
      val w = Window.partitionBy("user_id").orderBy(col("ts_us"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      e.withColumn("click_ts", when(col("event_type") === "click", col("ts_us")))
        .withColumn("asof_click_ts", coalesce(max(col("click_ts")).over(w), lit(-1L)))
        .filter(col("event_type") === "purchase")
        .select("event_id", "user_id", "ts_us", "asof_click_ts")
        .orderBy("event_id")
    }),

    // The same as-of alignment as a WHOLE-OPERATOR extension: custom
    // logical node + strategy + physical merge (graft.plans.AsOfJoin,
    // ladder tier (c)). One exchange + sort per side, O(1) merge state —
    // the plan the window formulation (q09) cannot reach when the right
    // side is a separate, larger table.
    "q86_asof_native" -> ((s, dir) => {
      val p = Tables.events(s, dir).filter(col("event_type") === "purchase")
        .select("event_id", "user_id", "ts_us")
      val c = Tables.events(s, dir).filter(col("event_type") === "click")
        .select(col("user_id").as("c_user"), col("ts_us").as("c_ts"))
      graft.plans.AsOfJoin.asof(p, c,
          p("user_id"), c("c_user"), p("ts_us"), c("c_ts"))
        .select(col("event_id"), col("user_id"), col("ts_us"),
          coalesce(col("asof_time"), lit(-1L)).as("asof_click_ts"))
        .orderBy("event_id")
    }),

    // Histogram binning: value distribution per event type in 10 fixed
    // 100.00-wide buckets. Buckets are computed on exact integer cents
    // (Spark `div` truncates toward zero while DuckDB `//` floors — they
    // disagree on negatives, so both sides clamp into [0, 9]).
    "q87_histogram" -> ((s, dir) => {
      Tables.events(s, dir)
        .withColumn("c", cents(col("value")))
        .withColumn("bucket", greatest(least(expr("c div 10000"), lit(9L)), lit(0L)))
        .groupBy("event_type", "bucket")
        .agg(count(lit(1)).as("n"),
          min(col("c")).as("min_cents"), max(col("c")).as("max_cents"))
        .orderBy("event_type", "bucket")
    }),

    // Funnel conversion: per user, first click -> first purchase at or
    // after it. Two bounded aggregations + one keyed join — each phase
    // shuffles once on user_id and the per-user state is O(1).
    "q88_funnel" -> ((s, dir) => {
      val e = Tables.events(s, dir)
      val clicks = e.filter(col("event_type") === "click")
        .groupBy("user_id")
        .agg(min(col("ts_us")).as("first_click_us"), count(lit(1)).as("n_clicks"))
      val conv = e.filter(col("event_type") === "purchase")
        .join(clicks.select("user_id", "first_click_us"), "user_id")
        .filter(col("ts_us") >= col("first_click_us"))
        .groupBy("user_id")
        .agg(min(col("ts_us")).as("first_conv_us"))
      clicks.join(conv, Seq("user_id"), "left")
        .select(col("user_id"), col("n_clicks"), col("first_click_us"),
          coalesce(col("first_conv_us"), lit(-1L)).as("first_conv_us"),
          when(col("first_conv_us").isNotNull, 1).otherwise(0).as("converted"),
          coalesce(col("first_conv_us") - col("first_click_us"), lit(-1L)).as("lag_us"))
        .orderBy("user_id")
    }),

    // The SQL front door: the engine's tables registered as views and
    // queried with the IDENTICAL ANSI SQL text the DuckDB oracle runs —
    // a user can drive this engine entirely through spark.sql.
    "q89_sql_api" -> ((s, dir) => {
      Tables.registerAll(s, dir)
      s.sql(Relational.sqlApiText)
    }),

    "q95_recursive_spine" -> ((s, dir) => {
      Tables.registerAll(s, dir)
      s.sql(Relational.recursiveSpineText)
    }),

    "q96_lateral_topk" -> ((s, dir) => {
      Tables.registerAll(s, dir)
      s.sql(Relational.lateralText)
    }),

    "q10_agg_distinct" -> ((s, dir) => {
      Tables.events(s, dir)
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"),
          countDistinct(col("user_id")).as("n_users"),
          (sum(cents(col("value"))).cast("double") / lit(100.0)).as("sum_value"))
        .orderBy("event_type")
    }),

    // HLL++ sketch internals differ from DuckDB's, so the approximate
    // count itself can't be oracle-hashed — instead emit the EXACT count
    // plus a within-5% verdict on the sketch (integer math: |a-e|*20<=e).
    // The oracle asserts verdict=true, so a drifting sketch hash-fails.
    "q11_approx_distinct" -> ((s, dir) => {
      Tables.events(s, dir)
        .groupBy("event_type")
        .agg(countDistinct(col("user_id")).as("exact_users"),
          // rsd=0.01: the verdict band below is 5%, so the estimator's own
          // relative error must sit well inside it at ANY cardinality (the
          // default 5% rsd straddles the band and flipped at sf1 scale)
          approx_count_distinct("user_id", 0.01).as("approx"),
          count(lit(1)).as("n"))
        .select(col("event_type"), col("exact_users"), col("n"),
          (abs(col("approx") - col("exact_users")) * 20 <= col("exact_users"))
            .as("approx_ok"))
        .orderBy("event_type")
    }),

    "q12_rollup" -> ((s, dir) => {
      Tables.lineitem(s, dir)
        .rollup("l_returnflag", "l_linestatus")
        .agg(count(lit(1)).as("n"),
          (sum(cents(col("l_quantity"))).cast("double") / lit(100.0)).as("sum_qty"))
        .select(coalesce(col("l_returnflag"), lit("ALL")).as("rf"),
          coalesce(col("l_linestatus"), lit("ALL")).as("ls"),
          col("n"), col("sum_qty"))
        .orderBy("rf", "ls")
    }),

    "q13_cube" -> ((s, dir) => {
      Tables.orders(s, dir)
        .cube("o_orderstatus", "o_orderpriority")
        .agg(count(lit(1)).as("n"),
          (sum(cents(col("o_totalprice"))).cast("double") / lit(100.0)).as("sum_price"))
        .select(coalesce(col("o_orderstatus"), lit("ALL")).as("st"),
          coalesce(col("o_orderpriority"), lit("ALL")).as("pri"),
          col("n"), col("sum_price"))
        .orderBy("st", "pri")
    }),

    "q14_window_rank" -> ((s, dir) => {
      val byPrice = Window.partitionBy("o_custkey").orderBy(col("o_totalprice").desc)
      val unique = Window.partitionBy("o_custkey").orderBy(col("o_totalprice").desc, col("o_orderkey"))
      Tables.orders(s, dir)
        .withColumn("rn", row_number().over(unique))
        .withColumn("rnk", rank().over(byPrice))
        .withColumn("drnk", dense_rank().over(byPrice))
        .filter(col("rn") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rn", "rnk", "drnk")
        .orderBy("o_custkey", "rn")
    }),

    "q15_window_frames" -> ((s, dir) => {
      val w = Window.partitionBy("o_custkey").orderBy(col("o_orderdate"), col("o_orderkey"))
      val running = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val mov3 = w.rowsBetween(-2, Window.currentRow)
      val tp = cents(col("o_totalprice"))
      Tables.orders(s, dir)
        .select(col("o_custkey"), col("o_orderkey"),
          (sum(tp).over(running).cast("double") / lit(100.0)).as("running_total"),
          (sum(tp).over(mov3).cast("double") / lit(100.0) / count(lit(1)).over(mov3)).as("moving_avg3"))
        .orderBy("o_custkey", "o_orderkey")
    }),

    // Percent-of-total contribution: each nation's share of global
    // revenue — a grouped aggregate plus an UNPARTITIONED window over
    // the already-aggregated rows (25 rows: the SinglePartition exchange
    // sits above the aggregate, which is the one place it is free).
    // Shares are basis points from exact integer cents.
    "q99_contribution" -> ((s, dir) => {
      val agg = Tables.orders(s, dir)
        .join(Tables.customer(s, dir), col("o_custkey") === col("c_custkey"))
        .join(broadcast(Tables.nation(s, dir)), col("c_nationkey") === col("n_nationkey"))
        .groupBy("n_name")
        .agg(sum(cents(col("o_totalprice"))).as("cents"))
      // global total via a separate partial→final aggregate broadcast back
      // onto the per-nation rows — NOT an unpartitioned window, which would
      // shuffle every group through a single task (fine at 25 nations,
      // a funnel if the group key were high-cardinality). The grouped agg's
      // shuffle is reused across both consumers (ReusedExchange).
      val total = agg.agg(sum(col("cents")).as("total"))
      agg
        .crossJoin(broadcast(total))
        .withColumn("share_bp", expr("cents * 10000 div total"))
        .select("n_name", "cents", "share_bp")
        .orderBy("n_name")
    }),

    // Positional explode: tokens with their ordinal — the enumerated
    // flatten (posexplode) the plain explode queries don't exercise.
    "q100_posexplode" -> ((s, dir) => {
      Tables.documents(s, dir)
        .filter(col("doc_id") < 20)
        .select(col("doc_id"), posexplode(tokens(col("text"))).as(Seq("pos", "tok")))
        .select(col("doc_id"), col("pos"), col("tok"), length(col("tok")).as("tok_len"))
        .orderBy("doc_id", "pos")
    }),

    // Time-RANGE frame: rolling 1-hour count/sum per user keyed on the
    // VALUE of ts_us, not a row count — the event-time rolling aggregate
    // that needs no window table (q15 covers ROWS frames).
    "q97_range_frame" -> ((s, dir) => {
      val w = Window.partitionBy("user_id").orderBy("ts_us")
        .rangeBetween(-3600000000L, Window.currentRow)
      Tables.events(s, dir)
        .withColumn("n_1h", count(lit(1)).over(w))
        .withColumn("sum_1h_cents", sum(cents(col("value"))).over(w))
        .select("event_id", "user_id", "ts_us", "n_1h", "sum_1h_cents")
        .orderBy("event_id")
    }),

    "q16_window_laglead" -> ((s, dir) => {
      val w = Window.partitionBy("user_id").orderBy(col("ts_us"), col("event_id"))
      Tables.events(s, dir)
        .select(col("user_id"), col("event_id"), col("ts_us"),
          coalesce(col("ts_us") - lag("ts_us", 1).over(w), lit(-1L)).as("gap_us"),
          coalesce(lead("event_type", 1).over(w), lit("none")).as("next_type"))
        .orderBy("user_id", "ts_us", "event_id")
    }),

    "q17_topk" -> ((s, dir) => {
      // orderBy+limit -> Catalyst TakeOrderedAndProject (no global sort)
      Tables.lineitem(s, dir)
        .select("l_orderkey", "l_linenumber", "l_extendedprice")
        .orderBy(col("l_extendedprice").desc, col("l_orderkey"), col("l_linenumber"))
        .limit(10)
    }),

    "q18_setops" -> ((s, dir) => {
      val c = Tables.customer(s, dir)
      val a = c.filter(col("c_mktsegment") === "BUILDING").select("c_custkey")
      val b = c.filter(col("c_acctbal") > 5000.0).select("c_custkey")
      a.union(b).distinct().withColumn("op", lit("union"))
        .unionByName(a.intersect(b).withColumn("op", lit("intersect")))
        .unionByName(a.except(b).withColumn("op", lit("except")))
        .select("op", "c_custkey")
        .orderBy("op", "c_custkey")
    }),

    "q19_string_funcs" -> ((s, dir) => {
      Tables.part(s, dir)
        .select(col("p_partkey"),
          lower(col("p_name")).as("lo"),
          upper(col("p_name")).as("up"),
          length(col("p_name")).as("len"),
          regexp_replace(col("p_name"), "[aeiou]", "_").as("novowels"),
          split(col("p_name"), " ").getItem(0).as("first_word"),
          substring(col("p_name"), 1, 4).as("pre"),
          concat_ws("|", col("p_brand"), col("p_type")).as("bt"),
          translate(col("p_brand"), "#", "-").as("brand2"),
          lpad(col("p_partkey").cast("string"), 8, "0").as("padded"),
          reverse(col("p_type")).as("rev"))
        .orderBy("p_partkey")
    }),

    "q20_date_funcs" -> ((s, dir) => {
      Tables.orders(s, dir)
        .select(col("o_orderkey"),
          year(col("o_orderdate")).as("yr"),
          month(col("o_orderdate")).as("mo"),
          dayofmonth(col("o_orderdate")).as("dom"),
          quarter(col("o_orderdate")).as("qtr"),
          date_format(col("o_orderdate"), "yyyy-MM-dd").as("ymd"),
          date_format(date_trunc("month", col("o_orderdate")), "yyyy-MM-dd").as("month_start"),
          date_format(last_day(col("o_orderdate")), "yyyy-MM-dd").as("month_end"),
          datediff(col("o_orderdate").cast("date"), lit("1995-01-01").cast("date")).cast("long").as("days_since"))
        .orderBy("o_orderkey")
    }),

    "q21_math_funcs" -> ((s, dir) => {
      Tables.lineitem(s, dir)
        .filter(col("l_orderkey") < 50)
        .select(col("l_orderkey"), col("l_linenumber"),
          round(col("l_extendedprice"), 0).as("rounded"),
          abs(col("l_extendedprice") - col("l_quantity") * lit(100.0)).as("absdiff"),
          ceil(col("l_discount") * lit(10)).as("c10"),
          floor(col("l_tax") * lit(10)).as("f10"),
          pmod(col("l_orderkey"), lit(7)).as("m7"),
          greatest(col("l_quantity"), col("l_discount") * lit(100)).as("g"),
          least(col("l_quantity"), col("l_tax") * lit(100)).as("le"),
          sqrt(col("l_quantity")).as("sq"),
          (col("l_quantity") * col("l_quantity")).as("q2"))
        .orderBy("l_orderkey", "l_linenumber")
    }),

    "q22_array_hof" -> ((s, dir) => {
      // P2/P5/E3 analogs: per-user ordered event-type array, then HOF
      // transform/filter/slice/element_at/array_join over it.
      val e = Tables.events(s, dir)
      e.groupBy("user_id")
        .agg(sort_array(collect_list(struct(col("ts_us"), col("event_type")))).as("evs"))
        .select(col("user_id"),
          transform(col("evs"), x => x.getField("event_type")).as("types"))
        .select(col("user_id"),
          size(col("types")).as("n"),
          array_join(slice(col("types"), 1, 3), "->").as("path3"),
          size(filter(col("types"), t => t === "click")).as("n_clicks"),
          array_join(array_sort(array_distinct(col("types"))), ",").as("distinct_types"),
          element_at(col("types"), 1).as("first_type"),
          element_at(col("types"), -1).as("last_type"))
        .orderBy("user_id")
    }),

    "q23_map_funcs" -> ((s, dir) => {
      // P3 analog: kv-pairs -> MapType -> canonical sorted rendering
      Tables.events(s, dir)
        .groupBy("user_id", "event_type").agg(count(lit(1)).as("cnt"))
        .groupBy("user_id")
        .agg(map_from_entries(sort_array(collect_list(struct(col("event_type"), col("cnt"))))).as("m"))
        .select(col("user_id"),
          size(col("m")).as("n_keys"),
          mapToSortedString(col("m")).as("kv"),
          coalesce(element_at(col("m"), "purchase"), lit(0L)).as("purchases"))
        .orderBy("user_id")
    }),

    "q24_json_funcs" -> ((s, dir) => {
      // E1 analog: semi-structured projection with null-default
      val e = Tables.events(s, dir)
      val k = from_json(col("props"), org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("k", org.apache.spark.sql.types.IntegerType)))).getField("k")
      e.select(col("event_id"),
        k.as("k"),
        get_json_object(col("props"), "$.k").as("k_str"),
        coalesce(k % 5, lit(-1)).as("k_mod"))
        .orderBy("event_id")
    }),

    "q25_conditional" -> ((s, dir) => {
      Tables.customer(s, dir)
        .select(col("c_custkey"),
          when(col("c_acctbal") < 0.0, "neg")
            .when(col("c_acctbal") < 5000.0, "mid")
            .otherwise("high").as("bal_class"),
          coalesce(nullif(col("c_mktsegment"), lit("BUILDING")), lit("(build)")).as("seg"),
          (col("c_nationkey") % 5).as("nk_mod"))
        .orderBy("c_custkey")
    }),

    // Correlated scalar subqueries (Catalyst decorrelation) — SQL text is
    // shared verbatim with the DuckDB oracle. Integer-only comparison
    // (cents * count > sum-of-cents) avoids float division entirely.
    "q26_correlated_subquery" -> ((s, dir) => {
      Tables.registerAll(s, dir)
      s.sql(Shared.q26)
    }),

    "q27_grouping_sets" -> ((s, dir) => {
      Tables.registerAll(s, dir)
      s.sql(Shared.q27)
    }))

  object Shared {
    val q26: String =
      """SELECT o_orderkey, o_custkey FROM orders o
        |WHERE CAST(round(o_totalprice*100) AS BIGINT) *
        |      (SELECT count(*) FROM orders i WHERE i.o_custkey = o.o_custkey)
        |    > (SELECT sum(CAST(round(i.o_totalprice*100) AS BIGINT))
        |       FROM orders i WHERE i.o_custkey = o.o_custkey)
        |ORDER BY o_orderkey""".stripMargin

    val q27: String =
      """SELECT coalesce(l_returnflag,'ALL') AS rf, coalesce(l_linestatus,'ALL') AS ls,
        |       CAST(count(*) AS BIGINT) AS n
        |FROM lineitem
        |GROUP BY GROUPING SETS ((l_returnflag),(l_linestatus),(l_returnflag,l_linestatus))
        |ORDER BY rf, ls""".stripMargin
  }

  private val centsSql = (c: String) => s"CAST(round($c*100) AS BIGINT)"
  private val revSql = s"sum(${centsSql("l_extendedprice")} * (100 - ${centsSql("l_discount")}))/10000.0"

  val oracle: Map[String, String] = Map(
    "q01_pricing_summary" ->
      s"""SELECT l_returnflag, l_linestatus,
         | sum(${centsSql("l_quantity")})/100.0 AS sum_qty,
         | sum(${centsSql("l_extendedprice")})/100.0 AS sum_base_price,
         | $revSql AS sum_disc_price,
         | sum(${centsSql("l_extendedprice")} * (100 - ${centsSql("l_discount")}) * (100 + ${centsSql("l_tax")}))/1000000.0 AS sum_charge,
         | sum(${centsSql("l_quantity")})/100.0/count(*) AS avg_qty,
         | sum(${centsSql("l_extendedprice")})/100.0/count(*) AS avg_price,
         | count(*) AS count_order
         |FROM lineitem WHERE l_shipdate <= TIMESTAMP '2000-06-30 00:00:00'
         |GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "q02_filter_project" ->
      """SELECT o_orderkey, o_custkey, o_orderpriority, o_totalprice FROM orders
        |WHERE (o_orderpriority LIKE '1%' OR o_orderpriority LIKE '%HIGH%')
        |  AND o_totalprice > 100000.0 AND o_orderstatus = 'O'
        |ORDER BY o_orderkey""".stripMargin,

    "q03_broadcast_join" ->
      s"""SELECT s_name, count(*) AS n_items, $revSql AS revenue
         |FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
         |GROUP BY s_name ORDER BY s_name""".stripMargin,

    "q04_sortmerge_join" ->
      s"""SELECT o_orderpriority, count(*) AS n_items, $revSql AS revenue
         |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,

    "q05_star_join" ->
      s"""SELECT n_name, $revSql AS revenue, count(*) AS n_items
         |FROM lineitem
         |JOIN orders ON l_orderkey = o_orderkey
         |JOIN customer ON o_custkey = c_custkey
         |JOIN nation ON c_nationkey = n_nationkey
         |JOIN region ON n_regionkey = r_regionkey
         |WHERE r_name = 'ASIA'
         |  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
         |  AND o_orderdate <  TIMESTAMP '1999-01-01 00:00:00'
         |GROUP BY n_name ORDER BY n_name""".stripMargin,

    "q06_semi_join" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_totalprice > 400000.0)
        |ORDER BY c_custkey""".stripMargin,

    "q07_anti_join" ->
      """SELECT c_custkey, c_name, c_mktsegment FROM customer
        |WHERE c_custkey NOT IN (SELECT o_custkey FROM orders WHERE o_totalprice > 450000.0)
        |ORDER BY c_custkey""".stripMargin,

    "q08_theta_join" ->
      """SELECT s_name, count(*) AS n_cheaper_parts
        |FROM supplier, part WHERE s_suppkey < 100 AND s_acctbal > p_retailprice
        |GROUP BY s_name ORDER BY s_name""".stripMargin,

    // same aggregate as an unbounded theta join — the Spark side's band
    // decomposition must be invisible in the result
    "q108_theta_band" ->
      """SELECT s_name, count(*) AS n_cheaper_parts
        |FROM supplier, part WHERE s_acctbal > p_retailprice
        |GROUP BY s_name ORDER BY s_name""".stripMargin,

    "q74_window_distribution" ->
      """SELECT o_custkey, o_orderkey,
        |  CAST(ntile(4) OVER w AS INTEGER) AS quartile,
        |  CAST(round(percent_rank() OVER w * 10000) AS BIGINT) AS pr_bp,
        |  CAST(round(cume_dist() OVER w * 10000) AS BIGINT) AS cd_bp
        |FROM orders WHERE o_custkey < 20
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice, o_orderkey)
        |ORDER BY o_custkey, o_orderkey""".stripMargin,

    "q49_quantiles" ->
      """SELECT event_type,
        |  quantile_cont(CAST(round(value*100) AS BIGINT), 0.5) AS p50_cents,
        |  quantile_cont(CAST(round(value*100) AS BIGINT), 0.9) AS p90_cents,
        |  count(*) AS n
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    "q59_pivot" ->
      """SELECT user_id,
        |  CAST(count(*) FILTER (WHERE event_type = 'click') AS BIGINT) AS click,
        |  CAST(count(*) FILTER (WHERE event_type = 'view') AS BIGINT) AS view,
        |  CAST(count(*) FILTER (WHERE event_type = 'purchase') AS BIGINT) AS purchase,
        |  CAST(count(*) FILTER (WHERE event_type = 'error') AS BIGINT) AS error,
        |  CAST(count(*) FILTER (WHERE event_type = 'signup') AS BIGINT) AS signup
        |FROM events WHERE user_id < 20
        |GROUP BY user_id ORDER BY user_id""".stripMargin,

    "q66_unpivot" ->
      """SELECT p_partkey, attr, val FROM (
        |  SELECT p_partkey, 'size' AS attr, CAST(p_size AS DOUBLE) AS val FROM part
        |  UNION ALL
        |  SELECT p_partkey, 'retailprice' AS attr, p_retailprice AS val FROM part)
        |ORDER BY p_partkey, attr""".stripMargin,

    "q28_shuffle_hash_join" ->
      """SELECT p_brand, count(*) AS n_items,
        |  CAST(sum(CAST(round(l_quantity*100) AS BIGINT)) AS DOUBLE)/100.0 AS sum_qty
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |GROUP BY p_brand ORDER BY p_brand""".stripMargin,

    "q29_salted_skew_join" ->
      """SELECT e.event_type, count(*) AS n,
        |  CAST(sum(CASE WHEN CAST(round(e.value*100) AS BIGINT) * d.n_type > d.sum_cents
        |                THEN 1 ELSE 0 END) AS BIGINT) AS n_above_avg
        |FROM events e JOIN (
        |  SELECT event_type, CAST(sum(CAST(round(value*100) AS BIGINT)) AS BIGINT) AS sum_cents,
        |         count(*) AS n_type
        |  FROM events GROUP BY event_type) d
        |ON e.event_type = d.event_type
        |GROUP BY e.event_type ORDER BY e.event_type""".stripMargin,

    "q09_asof_join" ->
      """SELECT event_id, user_id, ts_us, asof_click_ts FROM (
        |  SELECT event_id, user_id, event_type, epoch_us(ts) AS ts_us,
        |    coalesce(max(CASE WHEN event_type = 'click' THEN epoch_us(ts) END)
        |      OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id
        |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), -1) AS asof_click_ts
        |  FROM events)
        |WHERE event_type = 'purchase' ORDER BY event_id""".stripMargin,

    // max-click-at-or-before per purchase: the as-of semantics of the
    // custom operator, stated as a (bounded) left range join + group-by
    "q86_asof_native" ->
      """SELECT p.event_id, p.user_id, epoch_us(p.ts) AS ts_us,
        |  coalesce(max(epoch_us(c.ts)), -1) AS asof_click_ts
        |FROM events p LEFT JOIN events c
        |  ON c.user_id = p.user_id AND c.event_type = 'click'
        | AND epoch_us(c.ts) <= epoch_us(p.ts)
        |WHERE p.event_type = 'purchase'
        |GROUP BY p.event_id, p.user_id, epoch_us(p.ts)
        |ORDER BY p.event_id""".stripMargin,

    "q99_contribution" ->
      """SELECT n_name, CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents,
        |  CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) * 10000
        |    // (sum(sum(CAST(round(o_totalprice * 100) AS BIGINT))) OVER ()) AS BIGINT) AS share_bp
        |FROM orders
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY n_name ORDER BY n_name""".stripMargin,

    "q100_posexplode" ->
      """WITH e AS (
        |  SELECT doc_id, unnest(list_transform(
        |    generate_series(1, len(string_split(text, ' '))),
        |    i -> struct_pack(pos := i - 1, tok := (string_split(text, ' '))[i]))) AS u
        |  FROM documents WHERE doc_id < 20)
        |SELECT doc_id, CAST(u.pos AS INTEGER) AS pos, u.tok AS tok,
        |  CAST(length(u.tok) AS INTEGER) AS tok_len
        |FROM e ORDER BY doc_id, pos""".stripMargin,

    "q97_range_frame" ->
      """SELECT event_id, user_id, epoch_us(ts) AS ts_us,
        |  count(*) OVER w AS n_1h,
        |  CAST(sum(CAST(round(value * 100) AS BIGINT)) OVER w AS BIGINT) AS sum_1h_cents
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
        |  RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
        |ORDER BY event_id""".stripMargin,

    "q89_sql_api" -> Relational.sqlApiText,
    "q95_recursive_spine" -> Relational.recursiveSpineText,
    "q96_lateral_topk" -> Relational.lateralText,

    "q87_histogram" ->
      """SELECT event_type, greatest(least(c // 10000, 9), 0) AS bucket,
        |  count(*) AS n, min(c) AS min_cents, max(c) AS max_cents
        |FROM (SELECT event_type, CAST(round(value * 100) AS BIGINT) AS c FROM events)
        |GROUP BY 1, 2 ORDER BY event_type, bucket""".stripMargin,

    "q88_funnel" ->
      """WITH clicks AS (
        |  SELECT user_id, min(epoch_us(ts)) AS first_click_us, count(*) AS n_clicks
        |  FROM events WHERE event_type = 'click' GROUP BY user_id),
        |conv AS (
        |  SELECT e.user_id, min(epoch_us(e.ts)) AS first_conv_us
        |  FROM events e JOIN clicks c ON e.user_id = c.user_id
        |  WHERE e.event_type = 'purchase' AND epoch_us(e.ts) >= c.first_click_us
        |  GROUP BY e.user_id)
        |SELECT c.user_id, n_clicks, first_click_us,
        |  coalesce(first_conv_us, -1) AS first_conv_us,
        |  CASE WHEN first_conv_us IS NOT NULL THEN 1 ELSE 0 END AS converted,
        |  coalesce(first_conv_us - first_click_us, -1) AS lag_us
        |FROM clicks c LEFT JOIN conv ON c.user_id = conv.user_id
        |ORDER BY c.user_id""".stripMargin,

    "q10_agg_distinct" ->
      s"""SELECT event_type, count(*) AS n, count(DISTINCT user_id) AS n_users,
         | sum(${centsSql("value")})/100.0 AS sum_value
         |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    "q11_approx_distinct" ->
      """SELECT event_type, count(DISTINCT user_id) AS exact_users,
        | count(*) AS n, TRUE AS approx_ok
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    "q12_rollup" ->
      s"""SELECT coalesce(l_returnflag,'ALL') AS rf, coalesce(l_linestatus,'ALL') AS ls,
         | count(*) AS n, sum(${centsSql("l_quantity")})/100.0 AS sum_qty
         |FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
         |ORDER BY rf, ls""".stripMargin,

    "q13_cube" ->
      s"""SELECT coalesce(o_orderstatus,'ALL') AS st, coalesce(o_orderpriority,'ALL') AS pri,
         | count(*) AS n, sum(${centsSql("o_totalprice")})/100.0 AS sum_price
         |FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority)
         |ORDER BY st, pri""".stripMargin,

    "q14_window_rank" ->
      """SELECT o_custkey, o_orderkey, o_totalprice, rn, rnk, drnk FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |    row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rn,
        |    rank()       OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC) AS rnk,
        |    dense_rank() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC) AS drnk
        |  FROM orders)
        |WHERE rn <= 3 ORDER BY o_custkey, rn""".stripMargin,

    "q15_window_frames" ->
      s"""SELECT o_custkey, o_orderkey,
         |  sum(${centsSql("o_totalprice")}) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)/100.0 AS running_total,
         |  sum(${centsSql("o_totalprice")}) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
         |      ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)/100.0
         |   / count(*) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
         |      ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS moving_avg3
         |FROM orders ORDER BY o_custkey, o_orderkey""".stripMargin,

    "q16_window_laglead" ->
      """SELECT user_id, event_id, epoch_us(ts) AS ts_us,
        |  coalesce(epoch_us(ts) - lag(epoch_us(ts), 1) OVER
        |    (PARTITION BY user_id ORDER BY epoch_us(ts), event_id), -1) AS gap_us,
        |  coalesce(lead(event_type, 1) OVER
        |    (PARTITION BY user_id ORDER BY epoch_us(ts), event_id), 'none') AS next_type
        |FROM events ORDER BY user_id, ts_us, event_id""".stripMargin,

    "q17_topk" ->
      """SELECT l_orderkey, l_linenumber, l_extendedprice FROM lineitem
        |ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber LIMIT 10""".stripMargin,

    "q18_setops" ->
      """SELECT op, c_custkey FROM (
        |  SELECT 'union' AS op, c_custkey FROM (
        |    SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
        |    UNION SELECT c_custkey FROM customer WHERE c_acctbal > 5000.0)
        |  UNION ALL
        |  SELECT 'intersect' AS op, c_custkey FROM (
        |    SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
        |    INTERSECT SELECT c_custkey FROM customer WHERE c_acctbal > 5000.0)
        |  UNION ALL
        |  SELECT 'except' AS op, c_custkey FROM (
        |    SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
        |    EXCEPT SELECT c_custkey FROM customer WHERE c_acctbal > 5000.0))
        |ORDER BY op, c_custkey""".stripMargin,

    "q19_string_funcs" ->
      """SELECT p_partkey,
        |  lower(p_name) AS lo, upper(p_name) AS up,
        |  CAST(length(p_name) AS INTEGER) AS len,
        |  regexp_replace(p_name, '[aeiou]', '_', 'g') AS novowels,
        |  string_split(p_name, ' ')[1] AS first_word,
        |  substring(p_name, 1, 4) AS pre,
        |  concat_ws('|', p_brand, p_type) AS bt,
        |  translate(p_brand, '#', '-') AS brand2,
        |  lpad(CAST(p_partkey AS VARCHAR), 8, '0') AS padded,
        |  reverse(p_type) AS rev
        |FROM part ORDER BY p_partkey""".stripMargin,

    "q20_date_funcs" ->
      """SELECT o_orderkey,
        |  CAST(year(o_orderdate) AS INTEGER) AS yr,
        |  CAST(month(o_orderdate) AS INTEGER) AS mo,
        |  CAST(day(o_orderdate) AS INTEGER) AS dom,
        |  CAST(quarter(o_orderdate) AS INTEGER) AS qtr,
        |  strftime(o_orderdate, '%Y-%m-%d') AS ymd,
        |  strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS month_start,
        |  strftime(last_day(CAST(o_orderdate AS DATE)), '%Y-%m-%d') AS month_end,
        |  date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS days_since
        |FROM orders ORDER BY o_orderkey""".stripMargin,

    "q21_math_funcs" ->
      """SELECT l_orderkey, l_linenumber,
        |  round(l_extendedprice, 0) AS rounded,
        |  abs(l_extendedprice - l_quantity * 100.0) AS absdiff,
        |  CAST(ceil(l_discount * 10) AS BIGINT) AS c10,
        |  CAST(floor(l_tax * 10) AS BIGINT) AS f10,
        |  l_orderkey % 7 AS m7,
        |  greatest(l_quantity, l_discount * 100) AS g,
        |  least(l_quantity, l_tax * 100) AS le,
        |  sqrt(l_quantity) AS sq,
        |  l_quantity * l_quantity AS q2
        |FROM lineitem WHERE l_orderkey < 50 ORDER BY l_orderkey, l_linenumber""".stripMargin,

    "q22_array_hof" ->
      """SELECT user_id,
        |  CAST(len(types) AS INTEGER) AS n,
        |  array_to_string(types[1:3], '->') AS path3,
        |  CAST(len(list_filter(types, t -> t = 'click')) AS INTEGER) AS n_clicks,
        |  array_to_string(list_sort(list_distinct(types)), ',') AS distinct_types,
        |  types[1] AS first_type,
        |  types[-1] AS last_type
        |FROM (SELECT user_id, list(event_type ORDER BY epoch_us(ts), event_type) AS types
        |      FROM events GROUP BY user_id)
        |ORDER BY user_id""".stripMargin,

    "q23_map_funcs" ->
      """SELECT user_id,
        |  CAST(count(*) AS INTEGER) AS n_keys,
        |  array_to_string(list(event_type || '=' || CAST(cnt AS VARCHAR) ORDER BY event_type), ',') AS kv,
        |  coalesce(max(CASE WHEN event_type = 'purchase' THEN cnt END), 0) AS purchases
        |FROM (SELECT user_id, event_type, count(*) AS cnt FROM events GROUP BY 1, 2)
        |GROUP BY user_id ORDER BY user_id""".stripMargin,

    "q24_json_funcs" ->
      """SELECT event_id,
        |  CAST(regexp_extract(props, '"k": ([0-9]+)', 1) AS INTEGER) AS k,
        |  regexp_extract(props, '"k": ([0-9]+)', 1) AS k_str,
        |  coalesce(CAST(regexp_extract(props, '"k": ([0-9]+)', 1) AS INTEGER) % 5, -1) AS k_mod
        |FROM events ORDER BY event_id""".stripMargin,

    "q25_conditional" ->
      """SELECT c_custkey,
        |  CASE WHEN c_acctbal < 0.0 THEN 'neg'
        |       WHEN c_acctbal < 5000.0 THEN 'mid' ELSE 'high' END AS bal_class,
        |  coalesce(nullif(c_mktsegment, 'BUILDING'), '(build)') AS seg,
        |  c_nationkey % 5 AS nk_mod
        |FROM customer ORDER BY c_custkey""".stripMargin,

    "q26_correlated_subquery" -> Shared.q26,
    "q27_grouping_sets" -> Shared.q27)
}
