package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev-only scaling probe for the q42 SimHash rebuild: documents with
  * 10x the tokens must cost ~10x, not ~160x. The pre-fix formulation
  * referenced the computed `codes` array inside a transform() lambda —
  * CollapseProject inlined the md5 chain into the lambda body, so every
  * one of the 16 bit positions re-hashed every token (16x per-token
  * work, and the blowup grows with document length).
  *
  * Usage: runMain graft.tools.SimhashScale [sfDir]
  */
object SimhashScale {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "text", "lang", "source", "n_chars")
    // 10x token count: the same text repeated with distinct suffixes so
    // array_distinct doesn't collapse the repeats
    val docs10 = docs.withColumn("text",
      array_join(transform(sequence(lit(0), lit(9)),
        i => array_join(transform(split(col("text"), " "),
          t => concat(i.cast("string"), lit("_"), t)), " ")), " "))

    def time(tag: String, base: DataFrame): Double = {
      val t0 = System.nanoTime()
      val n = simhashOver(base).count()
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"[simhash-scale] $tag%-8s rows=$n time=$sec%.2f s")
      sec
    }
    simhashOver(docs).count() // warm-up: codegen + session init off the clock
    val t1 = time("1x", docs)
    val t10 = time("10x", docs10)
    // At fixture scale both runs are overhead-bound, so a healthy ratio
    // is ~1; the per-token work only becomes visible at much larger
    // corpora. The pre-fix lambda-trap shape showed ~16x EXTRA work per
    // token, i.e. a ratio far above the token multiple.
    println(f"[simhash-scale] ratio=${t10 / t1}%.1f (healthy: <= token multiple; lambda-trap: >> it)")
    spark.stop()
  }

  /** The exact q42 shape parameterized by the input table. */
  private def simhashOver(documents: DataFrame): DataFrame = {
    import graft.functions.GraftFunctions._
    import graft.functions.HashFunctions._
    val base = documents
      .select(col("doc_id"), array_distinct(tokens(col("text"))).as("toks"))
    val codes = base
      .select(col("doc_id"), explode(col("toks")).as("t"))
      .select(col("doc_id"), (md5Code60(col("t")) % lit(65536L)).as("code"))
    val bitSums = (0 until 16).map(j =>
      sum(((col("code") / lit(1L << j)).cast("long") % lit(2L)) * lit(2L) - lit(1L))
        .as(s"s$j"))
    val sums = codes.groupBy("doc_id").agg(bitSums.head, bitSums.tail: _*)
    val sim = (0 until 16)
      .map(j => when(col(s"s$j") >= 0, lit(1L << j)).otherwise(lit(0L)))
      .reduce(_ + _)
    base.join(sums, Seq("doc_id"), "left")
      .select(col("doc_id"),
        when(col("s0").isNull, lit(65535L)).otherwise(sim).as("simhash"),
        size(col("toks")).as("n_toks"))
  }
}
