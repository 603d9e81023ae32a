package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.engine.Tables
import graft.functions.GraftFunctions.cents
import graft.streaming.StreamTransforms

/** Batch twins of the streaming operators (SURVEY.md §2.2 Streaming rows).
  *
  * q60-q62 run the EXACT transform the streaming path uses
  * ([[StreamTransforms]] — the unified API makes the same plan incremental
  * under a streaming source), so the DuckDB oracle checks the streaming
  * semantics; the test suite additionally drives them through MemoryStream
  * and asserts the final state equals these batch results.
  *
  * q63/q64 are the deterministic batch statements of the two semantics
  * that only exist in streaming (arrival-order dedup state, watermark
  * late-drop): q63 is keep-earliest-by-event-time dedup; q64 classifies
  * each event as late/on-time against the PER-USER running max event
  * time in arrival (event_id) order — what a 1-hour watermark over a
  * keyed stream drops. Keying the running max by user keeps the window
  * partitionable (a global arrival-order max is inherently a
  * SinglePartition sort — a scale-killer; that global-order semantics is
  * covered by StreamingSpec's actual watermark late-drop test instead).
  *
  * All sums are integer cents (order-independent, oracle-stable).
  */
object StreamingOps {
  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    "q60_tumbling_window" -> ((s, dir) => {
      StreamTransforms.tumblingCounts(Tables.events(s, dir))
        .orderBy("win_us", "event_type")
    }),

    "q61_sliding_window" -> ((s, dir) => {
      StreamTransforms.slidingCounts(Tables.events(s, dir))
        .orderBy("win_us", "event_type")
    }),

    "q62_session_window" -> ((s, dir) => {
      StreamTransforms.sessionize(Tables.events(s, dir))
        .orderBy("user_id", "session_start_us")
    }),

    "q63_stateful_dedup" -> ((s, dir) => {
      val w = Window.partitionBy("user_id", "event_type")
        .orderBy(col("ts_us"), col("event_id"))
      Tables.events(s, dir)
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select("user_id", "event_type", "ts_us", "event_id")
        .orderBy("user_id", "event_type")
    }),

    "q75_interval_join" -> ((s, dir) => {
      val e = Tables.events(s, dir)
      StreamTransforms.clickPurchaseJoin(e, e)
        .orderBy("user_id", "purchase_id", "click_id")
    }),

    // Left-outer stream-stream interval join, batch twin: unmatched
    // purchases keep their row with -1 click columns.
    "q92_interval_join_outer" -> ((s, dir) => {
      val e = Tables.events(s, dir)
      StreamTransforms.clickPurchaseJoinOuter(e, e)
        .orderBy("user_id", "purchase_id", "click_id")
    }),

    "q65_arbitrary_state" -> ((s, dir) => {
      StreamTransforms.runningTotals(Tables.events(s, dir))
        .orderBy("user_id")
    }),

    // Stream-static join batch twin: the same enrichByNation plan the
    // streaming path runs per micro-batch (StreamingSpec drives it
    // through MemoryStream and asserts convergence to this result).
    "q82_stream_static_join" -> ((s, dir) => {
      StreamTransforms.enrichByNation(Tables.events(s, dir),
        Tables.customer(s, dir), Tables.nation(s, dir))
        .orderBy("n_name")
    }),

    "q64_watermark_late" -> ((s, dir) => {
      val arrival = Window.partitionBy("user_id").orderBy("event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
      Tables.events(s, dir)
        .withColumn("seen_max_us", max(col("ts_us")).over(arrival))
        .withColumn("late",
          when(col("ts_us") < col("seen_max_us") - lit(3600000000L), 1).otherwise(0))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n_events"), sum(col("late")).as("n_late"))
        .orderBy("event_type")
    }))

  // ---- DuckDB oracle ------------------------------------------------------

  private val centsSql = "CAST(round(value * 100) AS BIGINT)"

  val oracle: Map[String, String] = Map(
    "q60_tumbling_window" ->
      s"""SELECT (epoch_us(ts) // 3600000000) * 3600000000 AS win_us, event_type,
         |  count(*) AS n_events, CAST(sum($centsSql) AS BIGINT) AS sum_cents
         |FROM events GROUP BY 1, 2 ORDER BY win_us, event_type""".stripMargin,

    "q61_sliding_window" ->
      s"""SELECT win_us, event_type, count(*) AS n_events,
         |  CAST(sum($centsSql) AS BIGINT) AS sum_cents
         |FROM (
         |  SELECT (epoch_us(ts) // 1800000000 - j) * 1800000000 AS win_us, event_type, value
         |  FROM events, generate_series(0, 1) t(j)
         |  WHERE epoch_us(ts) >= (epoch_us(ts) // 1800000000 - j) * 1800000000
         |    AND epoch_us(ts) <  (epoch_us(ts) // 1800000000 - j) * 1800000000 + 3600000000)
         |GROUP BY 1, 2 ORDER BY win_us, event_type""".stripMargin,

    "q62_session_window" ->
      s"""WITH e AS (SELECT user_id, epoch_us(ts) AS tu, $centsSql AS vc FROM events),
         |m AS (SELECT user_id, tu, vc,
         |  CASE WHEN lag(tu) OVER (PARTITION BY user_id ORDER BY tu) IS NULL
         |         OR tu - lag(tu) OVER (PARTITION BY user_id ORDER BY tu) >= 1800000000
         |       THEN 1 ELSE 0 END AS brk FROM e),
         |s AS (SELECT user_id, tu, vc,
         |  sum(brk) OVER (PARTITION BY user_id ORDER BY tu
         |                 ROWS UNBOUNDED PRECEDING) AS sid FROM m)
         |SELECT user_id, min(tu) AS session_start_us, max(tu) AS session_last_us,
         |  count(*) AS n_events, CAST(sum(vc) AS BIGINT) AS sum_cents
         |FROM s GROUP BY user_id, sid ORDER BY user_id, session_start_us""".stripMargin,

    "q63_stateful_dedup" ->
      """SELECT user_id, event_type, epoch_us(ts) AS ts_us, event_id FROM (
        |  SELECT user_id, event_type, ts, event_id, row_number() OVER
        |    (PARTITION BY user_id, event_type ORDER BY epoch_us(ts), event_id) AS rn
        |  FROM events)
        |WHERE rn = 1 ORDER BY user_id, event_type""".stripMargin,

    "q75_interval_join" ->
      """SELECT p.user_id AS user_id, p.event_id AS purchase_id,
        |  c.event_id AS click_id,
        |  epoch_us(p.ts) - epoch_us(c.ts) AS lag_us
        |FROM events p JOIN events c
        |  ON p.user_id = c.user_id
        | AND p.event_type = 'purchase' AND c.event_type = 'click'
        | AND epoch_us(c.ts) >= epoch_us(p.ts) - 3600000000
        | AND epoch_us(c.ts) <= epoch_us(p.ts)
        |ORDER BY user_id, purchase_id, click_id""".stripMargin,

    "q92_interval_join_outer" ->
      """SELECT p.user_id AS user_id, p.event_id AS purchase_id,
        |  coalesce(c.event_id, -1) AS click_id,
        |  coalesce(epoch_us(p.ts) - epoch_us(c.ts), -1) AS lag_us
        |FROM events p LEFT JOIN events c
        |  ON p.user_id = c.user_id AND c.event_type = 'click'
        | AND epoch_us(c.ts) >= epoch_us(p.ts) - 3600000000
        | AND epoch_us(c.ts) <= epoch_us(p.ts)
        |WHERE p.event_type = 'purchase'
        |ORDER BY user_id, purchase_id, click_id""".stripMargin,

    "q65_arbitrary_state" ->
      s"""SELECT user_id, count(*) AS n_events,
         |  CAST(sum($centsSql) AS BIGINT) AS sum_cents
         |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin,

    "q82_stream_static_join" ->
      s"""SELECT n_name, count(*) AS n_events,
         |  CAST(sum($centsSql) AS BIGINT) AS sum_cents
         |FROM events
         |JOIN customer ON user_id = c_custkey
         |JOIN nation ON c_nationkey = n_nationkey
         |GROUP BY n_name ORDER BY n_name""".stripMargin,

    "q64_watermark_late" ->
      """SELECT event_type, count(*) AS n_events, CAST(sum(late) AS BIGINT) AS n_late FROM (
        |  SELECT event_type,
        |    CASE WHEN epoch_us(ts) < max(epoch_us(ts)) OVER
        |      (PARTITION BY user_id ORDER BY event_id
        |       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
        |      - 3600000000 THEN 1 ELSE 0 END AS late
        |  FROM events)
        |GROUP BY event_type ORDER BY event_type""".stripMargin)
}
