package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.engine.Tables
import graft.plans.{AsOfJoin, AsOfJoinExec}

/** The custom whole-operator as-of join (logical node + strategy +
  * physical merge) must (1) compute the documented semantics — greatest
  * right time <= left time per key, null when none — and (2) plan as one
  * exchange + sort per side with NO window or range-join explosion. */
class AsOfJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = TestSpark.sfDir

  private def purchases = Tables.events(spark, dir)
    .filter(col("event_type") === "purchase")
    .select("event_id", "user_id", "ts_us")
  private def clicks = Tables.events(spark, dir)
    .filter(col("event_type") === "click")
    .select(col("user_id").as("c_user"), col("ts_us").as("c_ts"))

  test("matches the SQL statement of the as-of semantics") {
    val p = purchases
    val c = clicks
    val got = AsOfJoin.asof(p, c, p("user_id"), c("c_user"), p("ts_us"), c("c_ts"))
      .select(col("event_id"), coalesce(col("asof_time"), lit(-1L)).as("t"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    Tables.events(spark, dir).createOrReplaceTempView("ev_asof")
    val expected = spark.sql(
      """SELECT p.event_id, coalesce(max(c.ts_us), -1) AS t
        |FROM ev_asof p LEFT JOIN ev_asof c
        |  ON c.user_id = p.user_id AND c.event_type = 'click'
        | AND c.ts_us <= p.ts_us
        |WHERE p.event_type = 'purchase'
        |GROUP BY p.event_id""".stripMargin)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got == expected)
    assert(got.nonEmpty)
  }

  test("plans as one exchange + sort per side, no window, no cartesian") {
    val p = purchases
    val c = clicks
    val df = AsOfJoin.asof(p, c, p("user_id"), c("c_user"), p("ts_us"), c("c_ts"))
    val plan = df.queryExecution.executedPlan
    val s = plan.toString
    assert(s.contains("AsOfJoin"), s"custom exec missing:\n$s")
    assert(s.sliding("Exchange".length).count(_ == "Exchange") == 2,
      s"expected exactly 2 exchanges:\n$s")
    assert(!s.contains("Window") && !s.contains("CartesianProduct"))
  }

  test("keys with no right rows get a null asof_time") {
    import spark.implicits._
    val l = Seq((1L, 10L), (2L, 20L), (2L, 30L)).toDF("k", "t")
    val r = Seq((2L, 5L), (2L, 25L), (3L, 1L)).toDF("k", "t")
    val got = AsOfJoin.asof(l, r, l("k"), r("k"), l("t"), r("t"))
      .select(col("k"), col("t"), col("asof_time"))
      .collect()
      .map(row => (row.getLong(0), row.getLong(1),
        if (row.isNullAt(2)) None else Some(row.getLong(2)))).toSet
    assert(got == Set(
      (1L, 10L, None),        // key 1 has no right rows
      (2L, 20L, Some(5L)),    // 25 is after 20, 5 is the latest <= 20
      (2L, 30L, Some(25L))))  // 25 is the latest <= 30
  }

  test("exact time ties are included (right time == left time matches)") {
    import spark.implicits._
    val l = Seq((7L, 100L)).toDF("k", "t")
    val r = Seq((7L, 100L), (7L, 101L)).toDF("k", "t")
    val got = AsOfJoin.asof(l, r, l("k"), r("k"), l("t"), r("t"))
      .select(col("asof_time")).collect().head.getLong(0)
    assert(got == 100L)
  }
}
