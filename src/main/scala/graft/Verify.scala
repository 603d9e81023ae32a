package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
import java.util.concurrent.{CompletableFuture, TimeUnit, TimeoutException}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare.
  *
  * Hardened after the round-10 gate came back `{}`: the sweep is built so
  * that a driver-side timeout, a wedged query, or a mid-run process kill
  * degrades to PARTIAL correctness instead of zero.
  *  - oracle_sql.json is written FIRST (it is pure metadata): whatever
  *    subset of query dumps exists when the process dies is gradeable.
  *  - every query runs under a watchdog (SPARK_GRAFT_VERIFY_TIMEOUT_SEC,
  *    default 600 s): on expiry its Spark job group is cancelled and the
  *    sweep continues, so one pathological query can no longer starve
  *    every query after it out of the gate.
  *  - per-query wall timings go to stderr so a slow gate is diagnosable
  *    from the driver's captured log.
  */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      // AQE headroom: start shuffles fine-grained (8x cores) and let
      // coalescing shrink the small ones — a fixed 1-partition-per-core
      // count makes the heavy set-sim verification shuffles spill at
      // sf3+ (the r15 sf10 spot-check's q190 5.2x reading; one bench
      // session recorded q190/q196 OOM at sf3 under accumulated state).
      // At cluster scale this IS the documented knob; adaptive initial
      // sizing is its data-proportional form.
      .config("spark.sql.adaptive.coalescePartitions.initialPartitionNum",
        (cpus.toInt * 8).toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    // Optional single-query loop: SPARK_GRAFT_ONLY=q124_x,q07_y dumps just
    // those queries (the driver never sets it, so its sweep stays full).
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(',').map(_.trim).filter(_.nonEmpty).toSet)
    only.foreach { names =>
      val unknown = names.diff(SparkEntry.queries.keySet)
      require(unknown.isEmpty, s"SPARK_GRAFT_ONLY names unknown queries: $unknown")
    }
    val timeoutSec = sys.env.getOrElse("SPARK_GRAFT_VERIFY_TIMEOUT_SEC", "600").toLong
    // Concurrent sweep: Spark sessions are thread-safe and the staged
    // fixtures build once-per-key with BLOCKING guards
    // (graft.engine.Staging), so queries are independent units of work.
    // local[32] at sf0.01 leaves most cores idle under a sequential
    // sweep — a small pool roughly divides the wall-clock that the
    // driver's gate timeout is spent against. SPARK_GRAFT_VERIFY_PAR=1
    // restores the sequential sweep.
    val par = math.max(1, sys.env.getOrElse("SPARK_GRAFT_VERIFY_PAR", "4").toInt)
    val todo = SparkEntry.queries
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .toSeq.sortBy(_._1)
    val t0 = System.nanoTime()
    val nOk = new java.util.concurrent.atomic.AtomicInteger
    val nFail = new java.util.concurrent.atomic.AtomicInteger
    // queries whose watchdog fired: their workers may still be running
    // driver-side (cancelJobGroup only stops ACTIVE jobs, and an
    // interrupt cannot break a lock wait) — their output dirs are
    // deleted again at sweep end so a late half-written dump can never
    // be graded as a present-but-wrong result. The worker THREAD is
    // tracked alongside the name: the cleanup sweep joins it (bounded)
    // and only removes dumps after spark.stop(), because a still-live
    // worker could otherwise commit its parquet write BETWEEN the rm
    // and process exit, re-landing the dump the rm just deleted.
    val timedOut =
      new java.util.concurrent.ConcurrentHashMap[String, Thread]()
    val pool = java.util.concurrent.Executors.newFixedThreadPool(par, r => {
      val t = new Thread(r, "verify-pool"); t.setDaemon(true); t
    })
    todo.foreach { case (name, fn) => pool.submit(new Runnable { def run(): Unit = {
      val tq = System.nanoTime()
      // The query body runs on its own (daemon) thread inside a named
      // job group so the watchdog can cancel its Spark jobs; driver-side
      // loops additionally get an interrupt. The sweep itself never dies
      // with a query.
      val done = new CompletableFuture[Unit]()
      val worker = new Thread(() => {
        try {
          spark.sparkContext.setJobGroup(name, name, interruptOnCancel = true)
          // transient-checkpoint scope (see Staging): per-call stage
          // checkpoints free once this query's write lands, instead of
          // residing until the ContextCleaner notices
          graft.engine.Staging.beginTransient()
          try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
            .parquet(s"$outDir/$name")
          finally graft.engine.Staging.releaseTransient()
          done.complete(())
        } catch { case e: Throwable => done.completeExceptionally(e) }
      }, s"verify-$name")
      worker.setDaemon(true)
      worker.start()
      try { done.get(timeoutSec, TimeUnit.SECONDS); nOk.incrementAndGet() }
      catch {
        case _: TimeoutException =>
          spark.sparkContext.cancelJobGroup(name)
          worker.interrupt()
          timedOut.put(name, worker)
          nFail.incrementAndGet()
          System.err.println(s"[verify] $name TIMED OUT after $timeoutSec s (cancelled)")
        case e: Throwable =>
          nFail.incrementAndGet()
          val cause = Option(e.getCause).getOrElse(e)
          System.err.println(s"[verify] $name failed: ${cause.getMessage}")
      }
      System.err.println(f"[verify] $name ${(System.nanoTime() - tq) / 1e9}%.2f s" +
        f" (${nOk.get + nFail.get}/${todo.size}, total ${(System.nanoTime() - t0) / 1e9}%.1f s)")
    }})}
    pool.shutdown()
    // generous hard stop: the per-query watchdogs bound each unit, so
    // this only fires if the pool itself wedges
    pool.awaitTermination(todo.size.toLong * timeoutSec + 60L, TimeUnit.SECONDS)
    // second sweep over the timed-out stragglers: cancel whatever jobs
    // they started since and give each worker a bounded join so the
    // common case (a straggler that dies promptly once cancelled)
    // finishes BEFORE the dump removal below
    timedOut.forEach { (name, worker) =>
      spark.sparkContext.cancelJobGroup(name)
      worker.interrupt()
      worker.join(5000L)
    }
    System.err.println(
      f"VERIFY_SUMMARY ok=${nOk.get} fail=${nFail.get} " +
        f"total_sec=${(System.nanoTime() - t0) / 1e9}%.1f")
    // stop Spark FIRST, then remove the stragglers' dumps: after stop()
    // no parquet commit can land, so a worker that outlived its bounded
    // join (an interrupt cannot break a lock wait) can no longer
    // re-land the dump this sweep deletes
    spark.stop()
    timedOut.keySet.forEach { name =>
      val d = new java.io.File(s"$outDir/$name")
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(): Unit
      }
      if (d.exists()) { rm(d)
        System.err.println(s"[verify] $name: partial dump removed") }
    }
    // A timed-out query's daemon thread may still hold non-daemon Spark
    // resources; exit explicitly so a wedged straggler can't hang the
    // process after the sweep (and its partial results) are complete.
    // rc stays 0: per-query failures are visible in the dump (missing
    // query dirs) and in stderr, and a non-zero rc must not discard the
    // queries that DID pass.
    sys.exit(0)
  }
}
