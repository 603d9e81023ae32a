package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.engine.Tables
import graft.operators.{AnalyticsOps, CurationOps}

/** Semantic assertions for the behavioral analytics operators (q109–q114)
  * beyond OperatorSpec's determinism + oracle checks. */
class AnalyticsSpec extends AnyFunSuite {
  import TestSpark.{spark, sfDir}

  test("q109: sessions partition each user's events exactly") {
    val sessions = AnalyticsOps.queries("q109_sessionize")(spark, sfDir)
    val totalEvents = Tables.events(spark, sfDir).count()
    val summed = sessions.agg(sum("n_events")).head.getLong(0)
    assert(summed == totalEvents)
    // session indices are dense from 1 per user
    val dense = sessions.groupBy("user_id")
      .agg(max("sess_idx").as("mx"), count(lit(1)).as("n"))
      .filter(col("mx") =!= col("n"))
    assert(dense.count() == 0)
    // durations are non-negative and each session fits inside the gap rule
    assert(sessions.filter(col("duration_us") < 0).count() == 0)
    // the defining properties: consecutive sessions of a user are
    // separated by MORE than the gap, and no within-session step exceeds it
    val gap = AnalyticsOps.SessionGapUs
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy("sess_idx")
    val between = sessions
      .withColumn("prev_end", lag(col("end_us"), 1).over(w))
      .filter(col("prev_end").isNotNull
        && col("start_us") - col("prev_end") <= gap)
    assert(between.count() == 0, "adjacent sessions closer than the gap")
    val we = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy(col("ts_us"), col("event_id"))
    val badStep = Tables.events(spark, sfDir)
      .select(col("user_id"), col("event_id"), col("ts_us"))
      .withColumn("step", col("ts_us") - lag(col("ts_us"), 1).over(we))
      .filter(col("step").isNotNull && col("step") <= gap)
    // count of within-gap steps == total events - total sessions (every
    // non-boundary step is inside some session)
    assert(badStep.count() == totalEvents - sessions.count())
  }

  test("q110: day-0 retention equals cohort size and offsets are non-negative") {
    val r = AnalyticsOps.queries("q110_retention")(spark, sfDir)
    assert(r.filter(col("day_offset") < 0).count() == 0)
    // every user appears in their own cohort's day-0 row
    val day0 = r.filter(col("day_offset") === 0).agg(sum("n_users")).head.getLong(0)
    val users = Tables.events(spark, sfDir).select("user_id").distinct().count()
    assert(day0 == users)
  }

  test("q111: fuzzy matches are near but not exact") {
    val m = AnalyticsOps.queries("q111_fuzzy_match")(spark, sfDir).collect()
    assert(m.nonEmpty)
    assert(m.forall { r =>
      val d = r.getAs[Int]("dist")
      d >= 1 && d <= 4 && r.getAs[String]("probe_name") != r.getAs[String]("p_name")
    })
  }

  test("q118: blocked fuzzy matching finds at least the probe-bounded matches") {
    val blocked = AnalyticsOps.queries("q118_fuzzy_block")(spark, sfDir)
      .select(col("name_a"), col("name_b")).collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    val probe = AnalyticsOps.queries("q111_fuzzy_match")(spark, sfDir)
      .select(least(col("probe_name"), col("p_name")).as("a"),
        greatest(col("probe_name"), col("p_name")).as("b")).collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(probe.subsetOf(blocked),
      s"blocking lost ${(probe -- blocked).size} true matches")
    assert(blocked.nonEmpty)
  }

  test("q112: transition probabilities sum to ~1 per source state") {
    val t = AnalyticsOps.queries("q112_transition_matrix")(spark, sfDir)
    val sums = t.groupBy("prev_type").agg(sum("prob_bp").as("s")).collect()
    // integer division truncates: sum in (10000 - n_states, 10000]
    assert(sums.forall { r => val v = r.getAs[Long]("s"); v > 9990 && v <= 10000 })
  }

  test("q113: skew profile ranks the true heaviest keys") {
    val p = AnalyticsOps.queries("q113_skew_profile")(spark, sfDir).collect()
    assert(p.length == 5)
    val counts = p.map(_.getAs[Long]("cnt"))
    assert(counts.sameElements(counts.sorted.reverse))
    val exactMax = Tables.lineitem(spark, sfDir)
      .groupBy("l_partkey").count().agg(max("count")).head.getLong(0)
    assert(counts.head == exactMax)
  }

  test("q115: the clean fixture passes every expectation; a poisoned copy fails the right rules") {
    val r = AnalyticsOps.queries("q115_expectations")(spark, sfDir).collect()
    assert(r.length == 5 && r.forall(_.getAs[Int]("pass") == 1))
    // cross-check one rule against a direct count
    val nTextViolations = Tables.documents(spark, sfDir)
      .filter(col("text").isNull || length(col("text")) === 0).count()
    assert(r.find(_.getAs[String]("rule") == "text_nonempty")
      .get.getAs[Long]("n_violations") == nTextViolations)
  }

  test("q116: z-scores are symmetric-scaled — flagged rows really deviate") {
    val out = AnalyticsOps.queries("q116_outliers")(spark, sfDir)
    val flagged = out.collect()
    assert(flagged.forall(r => math.abs(r.getAs[Long]("z_bp")) >= 25000))
    // every flagged value really is far from its type's mean (loose
    // independent check: beyond 2 sigma computed directly)
    val stats = Tables.events(spark, sfDir)
      .groupBy("event_type")
      .agg(avg(col("value")).as("mu"), stddev_pop(col("value")).as("sd"))
      .collect().map(r => r.getAs[String]("event_type") ->
        (r.getAs[Double]("mu"), r.getAs[Double]("sd"))).toMap
    flagged.foreach { r =>
      val (mu, sd) = stats(r.getAs[String]("event_type"))
      val x = r.getAs[Long]("c") / 100.0
      assert(math.abs(x - mu) > 2 * sd,
        s"flagged event ${r.getAs[Long]("event_id")} is within 2 sigma")
    }
  }

  test("q122: merge accounting — every base row passes, updates, or deletes; inserts are new keys") {
    val merged = AnalyticsOps.queries("q122_merge_upsert")(spark, sfDir)
    val base = Tables.customer(spark, sfDir)
    val ordersPerCust = Tables.orders(spark, sfDir)
      .groupBy("o_custkey").agg(count(lit(1)).as("n_ord"))
    val nDeletes = ordersPerCust.filter(col("n_ord") % 10 === 0).count()
    val nInserts = ordersPerCust.filter(col("n_ord") % 10 === 1).count()
    // row accounting: |merged| = |base| - deletes + inserts
    assert(merged.count() == base.count() - nDeletes + nInserts)
    // inserts are exactly the negative keys; no base key is negative
    assert(merged.filter(col("c_custkey") < 0).count() == nInserts)
    // untouched rows survive bit-identically (spot the no-change class)
    val untouched = merged.join(ordersPerCust,
      merged("c_custkey") === ordersPerCust("o_custkey"), "left_anti")
    val baseCents = base.filter(col("c_custkey") > 0)
      .select(col("c_custkey"),
        graft.functions.GraftFunctions.cents(col("c_acctbal")).as("acctbal_cents"))
    val drifted = untouched.filter(col("c_custkey") > 0)
      .select("c_custkey", "acctbal_cents")
      .except(baseCents)
    assert(drifted.count() == 0, "a row with no change op drifted")
  }

  test("q123: SCD2 intervals are disjoint, ordered, dense-versioned, and cover all changes") {
    val scd = AnalyticsOps.queries("q123_scd2")(spark, sfDir)
    // versions dense from 1 per user
    val dense = scd.groupBy("user_id")
      .agg(max("version").as("mx"), count(lit(1)).as("n"))
      .filter(col("mx") =!= col("n"))
    assert(dense.count() == 0)
    // each interval is non-empty-ordered and abuts the next exactly
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy("version")
    val bad = scd
      .withColumn("next_from", lead(col("valid_from_us"), 1).over(w))
      .filter(col("valid_to_us") < col("valid_from_us") ||
        (col("next_from").isNotNull && col("valid_to_us") =!= col("next_from")))
    assert(bad.count() == 0, "intervals must chain [from, to) -> [to, ...)")
    // exactly one open interval (MaxValue) per user
    val open = scd.filter(col("valid_to_us") === Long.MaxValue)
      .groupBy("user_id").agg(count(lit(1)).as("n")).filter(col("n") =!= 1)
    assert(open.count() == 0)
    // no two consecutive intervals carry the same type (runs are maximal)
    val rep = scd.withColumn("prev_type", lag(col("event_type"), 1).over(w))
      .filter(col("prev_type") === col("event_type"))
    assert(rep.count() == 0, "consecutive intervals with equal type")
  }

  test("q114: negatives are valid docs, never the probe, and deterministic") {
    val a = CurationOps.queries("q114_negative_sampling")(spark, sfDir).collect()
    val b = CurationOps.queries("q114_negative_sampling")(spark, sfDir).collect()
    assert(a.map(_.toString).toSeq == b.map(_.toString).toSeq)
    assert(a.forall(r => r.getAs[Long]("neg_id") != r.getAs[Long]("doc_id")))
    val maxId = Tables.documents(spark, sfDir).agg(max("doc_id")).head.getLong(0)
    assert(a.forall { r => val n = r.getAs[Long]("neg_id"); n >= 0 && n <= maxId })
  }
}
