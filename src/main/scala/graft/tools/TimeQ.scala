package graft.tools

import org.apache.spark.sql.SparkSession

/** Time individual queries: runMain graft.tools.TimeQ <sfDir> <q1> [q2 ...]
  * Prints one `name seconds rows` line per query — the per-query dev loop
  * behind Bench's full sweep. */
object TimeQ {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names = args.drop(1).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      // AQE headroom: start shuffles fine-grained (8x cores) and let
      // coalescing shrink the small ones — a fixed 1-partition-per-core
      // count makes the heavy set-sim verification shuffles spill at
      // sf3+ (the r15 sf10 spot-check's q190 5.2x reading; one bench
      // session recorded q190/q196 OOM at sf3 under accumulated state).
      // At cluster scale this IS the documented knob; adaptive initial
      // sizing is its data-proportional form.
      .config("spark.sql.adaptive.coalescePartitions.initialPartitionNum",
        (cpus.toInt * 8).toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // product-session parity (q193's views need the analyzer wiring)
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val explain = sys.env.get("SPARK_GRAFT_EXPLAIN").contains("1")
    names.foreach { n =>
      // time construction + count, exactly like Bench.once: queries with
      // eager staging (localCheckpoint loops — q107, the staged index
      // builders) do their real work during CONSTRUCTION, and timing
      // only the count() under-measured them by 20x+
      graft.engine.Staging.beginTransient() // Bench.once parity
      val t0 = System.nanoTime()
      try {
        val df = graft.SparkEntry.queries(n)(spark, sfDir)
        if (explain) { println(s"=== PLAN $n ==="); df.explain("formatted") }
        val rows = df.count()
        println(f"TIMEQ $n ${(System.nanoTime() - t0) / 1e9}%.2f s rows=$rows")
      } finally graft.engine.Staging.releaseTransient()
    }
    spark.stop()
  }
}
