package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Fixture-table loaders for the TPC-H-ish star schema plus the
  * `events` / `documents` / `embeddings` tables described in
  * /root/repo/FIXTURES.md.
  *
  * Every loader is a plain parquet scan so Catalyst predicate pushdown,
  * nested-schema pruning and the vectorized reader all apply. Loaders take
  * the scale-factor directory explicitly — at 100 TB the same call pattern
  * points at a partitioned table root instead of a single file and the
  * plans are unchanged.
  *
  * Mirrors the reference's source layer (rws_data_ingester
  * src/rotterdam_swimming_advice.py:118-155 — fixed-endpoint scans) as
  * declarative scans instead of imperative fetches.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def lineitem(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "lineitem")
  def orders(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "orders")
  def customer(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "customer")
  def supplier(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "supplier")
  def part(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "part")
  def nation(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "nation")
  def region(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "region")
  def events(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "events")
  def documents(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "documents")
  def embeddings(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "embeddings")

  /** Register every fixture table as a temp view so `spark.sql` queries can
    * reference them by the same names the DuckDB oracle uses. */
  def registerAll(spark: SparkSession, sfDir: String): Unit =
    all.foreach(n => load(spark, sfDir, n).createOrReplaceTempView(n))
}
