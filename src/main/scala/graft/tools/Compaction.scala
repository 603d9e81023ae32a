package graft.tools

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Small-file compaction — the table-maintenance operator every
  * long-running ingest pipeline needs at scale: streaming sinks and
  * per-batch writers accumulate many small files, and at 100 TB the
  * resulting per-file open/footer costs dominate scans.
  *
  * Strategy: size the output file count from the INPUT BYTES (listing
  * metadata only — no data read), then rewrite with a shuffle-free
  * `coalesce` when shrinking. `repartition` is used only when the caller
  * asks for MORE files than exist (rare; requires a shuffle).
  */
object Compaction {

  /** Compact `inDir` (parquet) into `outDir` targeting
    * `targetFileBytes` per output file (pre-compression estimate from
    * input sizes). Returns (filesBefore, filesAfter, rows). */
  def compact(spark: SparkSession, inDir: String, outDir: String,
      targetFileBytes: Long = 128L * 1024 * 1024): (Int, Int, Long) = {
    val fs = new Path(inDir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val files = fs.listStatus(new Path(inDir))
      .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
    val totalBytes = files.map(_.getLen).sum
    val nOut = math.max(1, math.ceil(totalBytes.toDouble / targetFileBytes).toInt)
    val df = spark.read.parquet(inDir)
    val writer =
      if (nOut <= files.length) df.coalesce(nOut) // shuffle-free shrink
      else df.repartition(nOut)
    writer.write.mode("overwrite").parquet(outDir)
    val outFiles = fs.listStatus(new Path(outDir))
      .count(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
    (files.length, outFiles, spark.read.parquet(outDir).count())
  }
}
