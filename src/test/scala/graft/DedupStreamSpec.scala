package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.engine.Tables
import graft.streaming.DedupStream

/** Convergence oracle for the incremental dedup stream: streaming the
  * corpus through [[DedupStream]] in micro-batches must reproduce the
  * BATCH q41 verdicts exactly — same pairs, same inter/uni/jac_bp. */
case class Doc(doc_id: Long, text: String)

class DedupStreamSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  private val stateKey = "spark.sql.streaming.stateStore.providerClass"

  private def withRocksDb[T](body: => T): T = {
    val prev = spark.conf.getOption(stateKey)
    spark.conf.set(stateKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try body finally {
      prev match {
        case Some(v) => spark.conf.set(stateKey, v)
        case None => spark.conf.unset(stateKey)
      }
    }
  }

  private lazy val allDocs: Seq[Doc] = Tables.documents(spark, TestSpark.sfDir)
    .select(col("doc_id"), col("text")).orderBy("doc_id").as[Doc].collect().toSeq

  test("per-row signature is bit-identical to the batch explode+groupBy signature") {
    val viaRow = DedupStream.withRowSignature(
      Tables.documents(spark, TestSpark.sfDir)).select("doc_id", "sig")
    val viaBatch = graft.operators.DedupOps.withSignature(
      graft.operators.DedupOps.shingleSets(spark, TestSpark.sfDir))
    val joined = viaRow.join(viaBatch.withColumnRenamed("sig", "sig_b"), "doc_id")
    assert(joined.count() == viaBatch.count())
    assert(joined.filter(col("sig") =!= col("sig_b")).count() == 0)
  }

  test("streamed near-dup verdicts equal the batch q41 verdicts on the same corpus") {
    withRocksDb {
      implicit val sqlCtx = spark.sqlContext
      val corpusBands = DedupStream.corpusBandIndex(spark, TestSpark.sfDir)
        .localCheckpoint()
      val corpusSh = DedupStream.corpusShingles(spark, TestSpark.sfDir)
        .localCheckpoint()
      val ms = MemoryStream[Doc]
      val q = DedupStream.nearDupAgainstCorpus(ms.toDF(), corpusBands, corpusSh)
        .writeStream.outputMode("append")
        .format("memory").queryName("t_dedup_stream")
        .start()
      allDocs.grouped(math.max(1, allDocs.size / 3)).foreach { b =>
        ms.addData(b); q.processAllAvailable()
      }
      // re-deliver the first chunk: idempotency under at-least-once
      ms.addData(allDocs.take(allDocs.size / 3))
      q.processAllAvailable()
      q.stop()

      // normalize streamed (new, old) verdicts to unordered pairs
      val streamed = spark.table("t_dedup_stream")
        .select(least(col("doc_new"), col("doc_old")).as("doc_a"),
          greatest(col("doc_new"), col("doc_old")).as("doc_b"),
          col("inter").cast("long"), col("uni").cast("long"), col("jac_bp"))
        .distinct()
      val batch = graft.SparkEntry.queries("q41_minhash_lsh")(spark, TestSpark.sfDir)
        .select("doc_a", "doc_b", "inter", "uni", "jac_bp")
      val s = streamed.collect().map(_.toString).sorted.toSeq
      val b = batch.collect().map(_.toString).sorted.toSeq
      assert(s == b, s"streamed=${s.size} batch=${b.size}")
      // each unordered pair emits at most twice (once per endpoint arrival),
      // and re-delivery added nothing: raw rows <= 2 * pairs
      val raw = spark.table("t_dedup_stream").count()
      assert(raw <= 2 * b.size)
    }
  }

  test("seen-signature dedup: first arrival is keeper, re-arrivals flag to it") {
    withRocksDb {
      implicit val sqlCtx = spark.sqlContext
      val ms = MemoryStream[Doc]
      val q = DedupStream.seenSignatureDedup(ms.toDF())
        .writeStream.outputMode("append")
        .format("memory").queryName("t_sig_dedup")
        .start()
      val base = allDocs.take(50)
      // duplicate the first 10 docs under NEW ids in a later batch
      val dups = base.take(10).map(d => Doc(d.doc_id + 100000, d.text))
      ms.addData(base); q.processAllAvailable()
      ms.addData(dups); q.processAllAvailable()
      q.stop()
      val out = spark.table("t_sig_dedup")
      // batch-computed expectation: keeper = min doc_id among same-signature
      // docs (base ids < dup ids and base arrives first, so the global min
      // is the first arrival in stream order too)
      val all = (base ++ dups).toDF("doc_id", "text")
      val expected = DedupStream.withRowSignature(all)
        .select(col("doc_id"), array_join(
          transform(col("sig"), v => v.cast("string")), "_").as("k"))
        .withColumn("keeper_id", min("doc_id").over(
          org.apache.spark.sql.expressions.Window.partitionBy("k")))
        .select(col("doc_id"), col("keeper_id"),
          (col("doc_id") === col("keeper_id")).as("is_first"))
      val got = out.collect().map(_.toString).sorted.toSeq
      val want = expected.collect().map(_.toString).sorted.toSeq
      assert(got == want)
      // and the planted re-arrivals all point at their original, not themselves
      assert(out.filter(col("doc_id") >= 100000 &&
        col("keeper_id") === col("doc_id")).count() == 0)
    }
  }
}
