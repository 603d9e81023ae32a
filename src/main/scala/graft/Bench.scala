package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Warm the JVM, codegen and parquet footers once so per-query numbers
    // measure the plan, not first-touch session costs.
    graft.engine.Tables.all.foreach(t =>
      try graft.engine.Tables.load(spark, sfDir, t).count()
      catch { case _: Throwable => () })
    // The session-shared LSH near-dup pair staging (reused by q41/q43/
    // q77/q90/q117) is timed as its OWN phase so no query's line absorbs
    // it — the bench runs alphabetically, which otherwise billed it to
    // q117, the first heavy LSH query (PERF.md "staged vs cold").
    val tStage = System.nanoTime()
    val stagingSec =
      try { graft.operators.DedupOps.verifiedNearDupPairs(spark, sfDir).count()
            (System.nanoTime() - tStage) / 1e9 }
      catch { case e: Throwable =>
        System.err.println(s"BENCH FAIL staging: ${e.getMessage}"); -1.0 }
    // a failed query records -1, never a normal-looking timing — a broken
    // query must read as broken in the bench JSON, not as a fast one.
    // Each query runs TWICE and reports the min: a single-shot timing on a
    // shared machine drifts with ambient load (the round-5 driver artifact
    // ran uniformly 1.74x round 4 on identical plans), and best-of-2 is
    // robust to one-sided noise while still penalizing real plan
    // regressions. The per-query max/min spread is emitted alongside so a
    // noisy run is VISIBLE in the artifact instead of silently inflating it.
    def once(name: String, fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count(); (System.nanoTime() - t0) / 1e9 }
      catch { case e: Throwable =>
        System.err.println(s"BENCH FAIL $name: ${e.getMessage}"); -1.0 }
    }
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val a = once(name, fn)
      val b = if (a < 0) -1.0 else once(name, fn)
      val best = if (a < 0 || b < 0) -1.0 else math.min(a, b)
      val spread = if (best > 0) math.max(a, b) / best else -1.0
      (name, best, spread)
    }
    val qs = results.map { case (k, v, _) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val sp = results.map { case (k, _, s) => s"\"" + k + "\":" + f"$s%.2f" }
      .mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum + math.max(stagingSec, 0)
    val nFailed = results.count(_._2 < 0) + (if (stagingSec < 0) 1 else 0)
    println(s"""{"metric":"total","value":$total,"unit":"sec","failed":$nFailed,"staging_sec":$stagingSec,"repeats":2,"spread":$sp,"queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
