package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev-only diagnostics main: prints fixture schemas + a few rows so we
  * know exactly how Spark 4.1 maps the parquet types (notably the
  * nanosecond `events.ts`). Not part of the driver contract. */
object Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    Seq("events").foreach { t =>
      println(s"=== $t ===")
      try {
        val df = spark.read.parquet(s"$sfDir/$t.parquet")
        df.printSchema()
        df.show(3, truncate = 60)
      } catch {
        case e: Throwable => println(s"READ FAILED: ${e.getClass.getName}: ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
