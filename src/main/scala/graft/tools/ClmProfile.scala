package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.engine.Tables
import graft.operators.DedupOps

/** Dev-only: time each protocol step of the maintained cluster index
  * (the dominant Bench index_build item) — mirrors
  * DedupOps.clusterMaintainedTables with per-step timers. */
object ClmProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
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
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"CLM $label ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    val s = spark
    // pre-stage the session pair table the way Bench's staging phase does
    t("staging:nearDupPairs") {
      DedupOps.verifiedNearDupPairs(s, sfDir).count() }
    val ns = DedupOps.graftNs(s, sfDir)
    val (src, lab, edg, bnd) =
      (s"$ns.clmp_src", s"$ns.clmp_labels", s"$ns.clmp_edges", s"$ns.clmp_bands")
    s.sql(s"CREATE TABLE graft.$src (doc_id BIGINT, text STRING) " +
      "TBLPROPERTIES ('delete.mode' = 'merge-on-read')")
    val docs = Tables.documents(s, sfDir).select(col("doc_id"), col("text"))
    t("append1") {
      docs.filter(col("doc_id") % 10 <= 4).writeTo(s"graft.$src").append() }
    t("createIndex") {
      graft.sources.ClusterIndexMaintenance.createIndex(s, "graft", src, lab, edg, bnd) }
    val chain = t("bridgeChainDocs") { DedupOps.bridgeChainDocs(s, sfDir) }
    println(s"CLM chain_len=${chain.length}")
    val chainDf = {
      import s.implicits._
      chain.toDF("doc_id", "text")
    }
    t("append2") {
      docs.filter(col("doc_id") % 10 >= 5).unionByName(chainDf)
        .writeTo(s"graft.$src").append() }
    t("refreshCdc1") {
      graft.sources.ClusterIndexMaintenance.refreshCdc(s, "graft", src, lab, edg, bnd) }
    t("delete") {
      s.sql(s"DELETE FROM graft.$src WHERE doc_id >= ${DedupOps.StitchBase} OR doc_id = 45") }
    t("refreshCdc2") {
      graft.sources.ClusterIndexMaintenance.refreshCdc(s, "graft", src, lab, edg, bnd) }
    spark.stop()
  }
}
