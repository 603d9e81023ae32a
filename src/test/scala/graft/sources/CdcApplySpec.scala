package graft.sources

import java.nio.file.{Files, Path}

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The standard streaming-CDC-apply loop (the Delta `foreachBatch` +
  * MERGE pattern) composed from this engine's pieces: a stream of keyed
  * changes (upserts and deletes) applied into a manifest table with one
  * MERGE INTO per micro-batch. Proves last-writer-wins convergence,
  * per-batch atomicity (each micro-batch is one CAS commit in the
  * history), and that a replayed batch cannot corrupt state when the
  * apply is written idempotently (MERGE with identical input is a
  * no-op on the row values). */
case class Change(key: Long, value: String, op: String, seq: Long)

class CdcApplySpec extends AnyFunSuite {
  import graft.TestSpark.spark
  import spark.implicits._

  private val wh: Path = {
    val p = Files.createTempDirectory("graft-cdc")
    p.toFile.deleteOnExit()
    spark.conf.set("spark.sql.catalog.ccat", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.ccat.warehouse", p.toString)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS ccat.db")
    p
  }

  test("foreachBatch MERGE applies a change stream with last-writer-wins semantics") {
    spark.sql("CREATE TABLE ccat.db.state (key BIGINT, value STRING, seq BIGINT)")
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = MemoryStream[Change]
    val q = ms.toDS().writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[Change], batchId: Long) =>
        // within one batch, keep only the latest change per key (MERGE
        // rejects multiple source matches per target row — as it must)
        batch.createOrReplaceTempView("changes_raw")
        batch.sparkSession.sql(
          """MERGE INTO ccat.db.state t
            |USING (SELECT key, value, op, seq FROM (
            |  SELECT *, row_number() OVER (PARTITION BY key ORDER BY seq DESC) rn
            |  FROM changes_raw) WHERE rn = 1) s
            |ON t.key = s.key
            |WHEN MATCHED AND s.op = 'D' THEN DELETE
            |WHEN MATCHED AND s.seq > t.seq THEN UPDATE SET value = s.value, seq = s.seq
            |WHEN NOT MATCHED AND s.op != 'D' THEN INSERT (key, value, seq)
            |  VALUES (s.key, s.value, s.seq)""".stripMargin).collect()
        ()
      }
      .option("checkpointLocation",
        Files.createTempDirectory("graft-cdc-ckpt").toString)
      .start()

    // batch 1: inserts
    ms.addData(Change(1, "a", "U", 1), Change(2, "b", "U", 2), Change(3, "c", "U", 3))
    q.processAllAvailable()
    assert(spark.table("ccat.db.state").as[(Long, String, Long)].collect().toSet ==
      Set((1L, "a", 1L), (2L, "b", 2L), (3L, "c", 3L)))

    // batch 2: update key 1 (two changes — latest wins), delete key 2,
    // insert key 4, and a STALE change for key 3 that must be ignored
    ms.addData(Change(1, "a2", "U", 4), Change(1, "a3", "U", 5),
      Change(2, "", "D", 6), Change(4, "d", "U", 7), Change(3, "stale", "U", 0))
    q.processAllAvailable()
    assert(spark.table("ccat.db.state").as[(Long, String, Long)].collect().toSet ==
      Set((1L, "a3", 5L), (3L, "c", 3L), (4L, "d", 7L)))

    // re-applying batch 2's content is a value-level no-op (idempotent
    // apply): same rows after
    ms.addData(Change(1, "a3", "U", 5), Change(4, "d", "U", 7))
    q.processAllAvailable()
    assert(spark.table("ccat.db.state").as[(Long, String, Long)].collect().toSet ==
      Set((1L, "a3", 5L), (3L, "c", 3L), (4L, "d", 7L)))
    q.stop()

    // each applied batch is one atomic commit in the table history
    val ops = spark.sql("SELECT operation FROM ccat.db.state.history ORDER BY version")
      .as[String].collect().toSeq
    assert(ops.head == "create" && ops.count(_ != "create") >= 3, s"got $ops")
  }
}
