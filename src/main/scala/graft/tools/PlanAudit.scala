package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev-only plan auditor: prints a condensed formatted plan per query and
  * flags scale smells (cartesian products, missing pushed filters on
  * filtered scans, single-partition exchanges). */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val only = args.drop(1).toSet
    graft.SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.isEmpty || only.contains(n) }
      .foreach { case (name, fn) =>
        try {
          val df = fn(spark, sfDir)
          val plan = df.queryExecution.executedPlan.toString
          val ops = plan.linesIterator
            .map(_.replaceAll("#\\d+[L]?", "").trim)
            .filter(l => l.startsWith("+-") || l.startsWith(":") || l.startsWith("*"))
            .map(_.replaceAll("\\(\\d+\\)", "").split(" ").filter(_.nonEmpty).take(3).mkString(" "))
            .mkString(" | ")
          val smells = Seq(
            if (plan.contains("CartesianProduct")) Some("CARTESIAN") else None,
            if (plan.contains("PushedFilters: []") && plan.contains("Filter")) Some("NO-PUSHDOWN") else None,
            if (plan.contains("SinglePartition") && !name.contains("q64")) Some("SINGLE-PARTITION") else None
          ).flatten
          println(f"== $name%-28s ${if (smells.isEmpty) "ok" else smells.mkString(",")}")
          if (smells.nonEmpty || only.nonEmpty) println("   " + ops.take(2000))
        } catch { case e: Throwable => println(s"== $name EXPLAIN FAILED: ${e.getMessage.take(120)}") }
      }
    spark.stop()
  }
}
