package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev-only perf harness: time one named SparkEntry query at a given sf
  * and optionally print its formatted physical plan.
  * Usage: runMain graft.tools.Perf <queryName> [sfDir] [explain] */
object Perf {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val doExplain = args.contains("explain")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = graft.SparkEntry.queries(name)(spark, sfDir)
    if (doExplain) df.explain("formatted")
    val t0 = System.nanoTime()
    val n = df.count()
    println(f"[perf] $name rows=$n time=${(System.nanoTime() - t0) / 1e9}%.2f s")
    spark.stop()
  }
}
