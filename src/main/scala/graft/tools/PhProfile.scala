package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only: decompose the phash index create cost. */
object PhProfile {
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
    def time(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f; println(f"PH $name ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    time("mediaGridTable") {
      spark.table(graft.operators.MultimodalOps.mediaGridTable(spark, sfDir)).count() }
    val ns = graft.operators.DedupOps.graftNs(spark, sfDir)
    val media = s"graft.$ns.media_px"
    time("snapshot-checkpoint") {
      spark.table(media).select(col("doc_id"), col("px")).localCheckpoint().count() }
    val snap = spark.table(media).select(col("doc_id"), col("px")).localCheckpoint()
    time("hashRows-compute") {
      graft.sources.PhashIndexMaintenance.hashRows(snap)
        .write.format("noop").mode("overwrite").save() }
    time("bandRows-compute") {
      graft.sources.PhashIndexMaintenance.bandRows(snap)
        .write.format("noop").mode("overwrite").save() }
    spark.sql(s"CREATE TABLE graft.$ns.pp_hash (doc_id BIGINT, bands ARRAY<BIGINT>) " +
      "TBLPROPERTIES ('write.sort-by' = 'doc_id')")
    spark.sql(s"CREATE TABLE graft.$ns.pp_bands (band STRING, doc_id BIGINT) " +
      "TBLPROPERTIES ('write.sort-by' = 'band', 'bloom.columns' = 'band')")
    time("hashRows-write") {
      graft.sources.PhashIndexMaintenance.hashRows(snap)
        .writeTo(s"graft.$ns.pp_hash").append() }
    time("bandRows-write") {
      graft.sources.PhashIndexMaintenance.bandRows(snap)
        .writeTo(s"graft.$ns.pp_bands").append() }
    time("full-createIndex") {
      graft.sources.PhashIndexMaintenance.createIndex(spark, "graft",
        s"$ns.media_px", s"$ns.pp2_hash", s"$ns.pp2_bands") }
    spark.stop()
  }
}
