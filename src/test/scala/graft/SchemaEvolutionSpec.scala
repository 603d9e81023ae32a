package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Mechanics of the q101 evolving-schema read: mergeSchema unions writer
  * generations' field sets, per-file absent fields surface as null, and
  * coalesce defaults heal added + renamed columns. (Values are checked by
  * the DuckDB oracle; this spec pins the schema-level behavior.) */
class SchemaEvolutionSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  test("mergeSchema read spans an added and a renamed column") {
    val root = java.nio.file.Files.createTempDirectory("graft_evo_spec").toString
    Seq((1L, 10.0), (2L, 20.0)).toDF("k", "price")
      .write.parquet(s"$root/gen1")
    Seq((3L, 30.0, "HIGH"), (4L, 40.0, "LOW")).toDF("k", "price_v2", "prio")
      .write.parquet(s"$root/gen2")

    val merged = spark.read.option("mergeSchema", "true")
      .parquet(s"$root/gen1", s"$root/gen2")
    assert(merged.columns.toSet == Set("k", "price", "price_v2", "prio"))

    val healed = merged.select(col("k"),
      coalesce(col("price_v2"), col("price")).as("p"),
      coalesce(col("prio"), lit("UNKNOWN")).as("prio"))
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getString(2))).toSet
    assert(healed == Set((1L, 10.0, "UNKNOWN"), (2L, 20.0, "UNKNOWN"),
      (3L, 30.0, "HIGH"), (4L, 40.0, "LOW")))
  }

  test("q101 runs and buckets every order by priority") {
    val out = SparkEntry.queries("q101_schema_evolution")(spark, TestSpark.sfDir)
      .collect()
    assert(out.length == 6) // 5 priorities + UNKNOWN
    val unknown = out.find(_.getString(0) == "UNKNOWN").get
    val total = graft.engine.Tables.orders(spark, TestSpark.sfDir).count()
    assert(out.map(_.getLong(1)).sum == total)
    assert(unknown.getLong(1) == total / 2) // even orderkeys
  }
}
