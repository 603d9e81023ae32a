package graft.streaming

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types._

/** The reference's report sink + publish loop as a Structured Streaming
  * pipeline (rws_data_ingester K1/K2/K3/O2: export_to_html at
  * src/rotterdam_swimming_advice.py:248-296, generate.sh:13-17 git publish,
  * cronjob.sh:1-3 cron tick):
  *
  *   - file source over an events directory (new files = new micro-batch;
  *     the cron tick becomes `Trigger.AvailableNow`)
  *   - a complete-mode aggregate summarizing the stream so far
  *   - `foreachBatch` publish: render ONE html artifact per micro-batch,
  *     idempotent by batchId (re-running a failed batch never publishes
  *     twice — the reference got this from git's content addressing)
  *
  * Rendering stays distributed until the final one-row collect_list; only
  * the finished ~KB report ever reaches a single task.
  */
object ReportStream {

  /** Schema of the events fixture as the *streaming* source sees it
    * (nanos read as raw long — same convention as Tables.events). */
  val eventsSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", LongType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** Summary aggregate over everything seen so far (streaming-safe:
    * exact integer cents, no order-dependent float math). */
  def summarize(events: DataFrame): DataFrame =
    events.groupBy("event_type")
      .agg(count(lit(1)).as("n_events"),
        sum(round(col("value") * 100).cast("long")).as("sum_cents"))

  /** K1/K2: render the per-type summary rows into one HTML report row.
    * `collect_list` over the handful of aggregate rows, sorted for
    * determinism, newline -> <br> for the sink format. */
  def render(summary: DataFrame, stamp: String): DataFrame =
    summary
      .select(concat(lit("- "), col("event_type"), lit(": "),
        col("n_events").cast("string"), lit(" events, total "),
        (col("sum_cents").cast("double") / 100.0).cast("string")).as("line"))
      .agg(array_join(sort_array(collect_list(col("line"))), "\n").as("body"))
      .select(concat(
        lit("<html><body><h1>Event report</h1><p>"),
        regexp_replace(col("body"), "\n", "<br>"),
        lit(s"</p><i>generated $stamp</i></body></html>")).as("report"))

  /** K3: idempotent publish — one artifact per micro-batch id; a marker
    * makes re-delivery of a batch a no-op (the streaming analog of
    * generate.sh's commit-if-changed). */
  def publish(summary: DataFrame, batchId: Long, outDir: String): Unit = {
    val marker = Paths.get(outDir, s"batch-$batchId.done")
    if (!Files.exists(marker)) {
      // single ~KB row by construction (global agg); headOption guards a
      // pathological empty micro-batch so the query never dies publishing
      val report = render(summary, s"batch $batchId")
        .collect().headOption.map(_.getString(0))
        .getOrElse("<html><body><h1>Event report</h1><p>(no data)</p></body></html>")
      Files.createDirectories(Paths.get(outDir))
      Files.writeString(Paths.get(outDir, s"report-$batchId.html"), report)
      Files.writeString(marker, "")
    }
  }

  /** O2: one cron-equivalent tick — drain whatever input is available,
    * publish per micro-batch, stop. Returns the number of published
    * artifacts so far.
    *
    * `maxFilesPerTrigger` is the file source's backpressure knob: it caps
    * how many new files enter each micro-batch, so a backlog drains as a
    * series of bounded batches instead of one giant one (state, shuffle
    * and publish cost per batch stay sized to the knob, not to the
    * backlog). AvailableNow still processes EVERYTHING available — just
    * in ceil(backlog/knob) batches. */
  def runAvailableNow(spark: SparkSession, srcDir: String, outDir: String,
      checkpointDir: String, maxFilesPerTrigger: Option[Int] = None): Long = {
    val q = start(spark, srcDir, outDir, checkpointDir, Trigger.AvailableNow(),
      maxFilesPerTrigger)
    q.awaitTermination()
    publishedCount(outDir)
  }

  /** O2 long-lived mode: the cron loop as one continuously-running query
    * (SURVEY §3.3 maps the reference's cron either to AvailableNow ticks
    * or to this). New files are picked up every `intervalMs`; a trigger
    * with no new input publishes nothing, so an idle loop writes no
    * duplicate artifacts. The caller owns the query's lifecycle (stop /
    * awaitTermination); the same checkpoint + batch markers make restarts
    * idempotent exactly like the AvailableNow path. */
  def runProcessingTime(spark: SparkSession, srcDir: String, outDir: String,
      checkpointDir: String, intervalMs: Long = 500): StreamingQuery =
    start(spark, srcDir, outDir, checkpointDir,
      Trigger.ProcessingTime(intervalMs))

  private def start(spark: SparkSession, srcDir: String, outDir: String,
      checkpointDir: String, trigger: Trigger,
      maxFilesPerTrigger: Option[Int] = None): StreamingQuery = {
    val reader = spark.readStream.schema(eventsSchema)
    val events = maxFilesPerTrigger
      .fold(reader)(n => reader.option("maxFilesPerTrigger", n))
      .parquet(srcDir)
    summarize(events)
      .writeStream
      .outputMode("complete")
      .option("checkpointLocation", checkpointDir)
      .foreachBatch((batch: DataFrame, id: Long) => publish(batch, id, outDir))
      .trigger(trigger)
      .start()
  }

  def publishedCount(outDir: String): Long =
    Files.list(Paths.get(outDir)).filter(_.toString.endsWith(".html")).count()

  /** CDC-upsert sink: maintain a latest-row-per-user parquet table from
    * the event stream (the streaming twin of the q81 batch upsert). Each
    * micro-batch merges its rows with the current state by rank-1 over
    * (ts_us, event_id), writes a NEW versioned state directory, then
    * atomically flips a pointer file — the reader never observes a
    * half-written state, and a crash at any point leaves the pointer on
    * the last complete version (re-running the batch rebuilds the same
    * versioned dir and re-flips: idempotent). At warehouse scale the same
    * foreachBatch body targets a MERGE-capable table format instead. */
  def runUpsert(spark: SparkSession, srcDir: String, stateDir: String,
      checkpointDir: String): Unit = {
    import org.apache.spark.sql.expressions.Window
    val events = spark.readStream
      .schema(eventsSchema)
      .parquet(srcDir)
      .select(col("event_id"), col("user_id"), col("event_type"),
        col("value"), expr("ts div 1000").as("ts_us"))
    val q = events.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, id: Long) =>
        val s = batch.sparkSession
        val current = upsertState(s, stateDir).getOrElse(
          s.createDataFrame(
            s.sparkContext.emptyRDD[org.apache.spark.sql.Row], batch.schema))
        val w = Window.partitionBy("user_id")
          .orderBy(col("ts_us").desc, col("event_id").desc)
        val merged = current.unionByName(batch)
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") === 1)
          .drop("rn")
        val version = s"state-$id"
        merged.write.mode("overwrite")
          .parquet(Paths.get(stateDir, version).toString)
        // flip the pointer atomically (tmp file + ATOMIC_MOVE): readers
        // and crash-restarts only ever see a fully-written version
        val tmpPtr = Paths.get(stateDir, s"CURRENT.tmp-$id")
        Files.writeString(tmpPtr, version)
        Files.move(tmpPtr, Paths.get(stateDir, "CURRENT"),
          java.nio.file.StandardCopyOption.ATOMIC_MOVE,
          java.nio.file.StandardCopyOption.REPLACE_EXISTING)
        // GC superseded versions — best-effort: correctness never depends
        // on a delete succeeding (the pointer already moved on)
        val fs = new org.apache.hadoop.fs.Path(stateDir)
          .getFileSystem(s.sparkContext.hadoopConfiguration)
        Files.list(Paths.get(stateDir)).forEach { p =>
          val name = p.getFileName.toString
          if (name.startsWith("state-") && name != version)
            fs.delete(new org.apache.hadoop.fs.Path(p.toString), true)
        }
        ()
      }
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }

  /** Read the current upsert state (None before the first batch). The
    * pointer file names the last completely-written version directory. */
  def upsertState(spark: SparkSession, stateDir: String): Option[DataFrame] = {
    val ptr = Paths.get(stateDir, "CURRENT")
    if (Files.exists(ptr))
      Some(spark.read.parquet(
        Paths.get(stateDir, Files.readString(ptr).trim).toString))
    else None
  }
}
