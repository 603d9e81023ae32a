package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev-only: time each at-rest index-family build (the Bench
  * index_build_sec phase) separately, same session shape as Bench.
  * Usage: runMain graft.tools.IdxProfile [sfDir]
  */
object IdxProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.coalescePartitions.initialPartitionNum",
        (cpus.toInt * 8).toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.engine.Tables.all.foreach(t =>
      try graft.engine.Tables.load(spark, sfDir, t).count()
      catch { case _: Throwable => () })
    def time(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      try { f; println(f"IDX $name ${(System.nanoTime() - t0) / 1e9}%.2f s") }
      catch { case e: Throwable => println(s"IDX $name FAILED ${e.getMessage}") }
    }
    time("staging:nearDupPairs") {
      graft.operators.DedupOps.verifiedNearDupPairs(spark, sfDir).count() }
    time("staging:setSimTokens") {
      Seq("all", "corpus", "batch").foreach(sl =>
        graft.operators.DedupOps.stagedSetSimTokens(spark, sfDir, sl)._1.count()) }
    time("staging:mediaGrid") {
      spark.table(graft.operators.MultimodalOps.mediaGridTable(spark, sfDir)).count() }
    time("codebookTable") { graft.operators.SimilarityOps.codebookTable(spark, sfDir) }
    time("postingsTable") { graft.operators.SimilarityOps.postingsTable(spark, sfDir) }
    time("maintainedPostingsTable") { graft.operators.SimilarityOps.maintainedPostingsTable(spark, sfDir) }
    time("codesTables") { graft.operators.IvfPqOps.codesTables(spark, sfDir) }
    time("maintainedAnnIndex") { graft.operators.IvfPqOps.maintainedAnnIndex(spark, sfDir) }
    time("ssimIndexTables") { graft.operators.DedupOps.ssimIndexTables(spark, sfDir) }
    time("ssimMaintainedTables") { graft.operators.DedupOps.ssimMaintainedTables(spark, sfDir) }
    time("mhIndexTables") { graft.operators.DedupOps.mhIndexTables(spark, sfDir) }
    time("mhMaintainedTables") { graft.operators.DedupOps.mhMaintainedTables(spark, sfDir) }
    time("clusterMaintainedTables") { graft.operators.DedupOps.clusterMaintainedTables(spark, sfDir) }
    time("phashIndexTables") { graft.operators.MultimodalOps.phashIndexTables(spark, sfDir) }
    time("phashMaintainedTables") { graft.operators.MultimodalOps.phashMaintainedTables(spark, sfDir) }
    spark.stop()
  }
}
