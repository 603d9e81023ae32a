package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.engine.Tables
import graft.streaming.AnnStream

/** Convergence oracle for the streaming ANN: probing the corpus vectors
  * through [[AnnStream]] must reproduce the BATCH q45 rows exactly —
  * same candidates, ranks, and bit-identical scores. */
case class Probe(probe_id: Long, embedding: Seq[Float])

class AnnStreamSpec extends AnyFunSuite {
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

  test("streamed ANN results equal the batch q45 rows for the same probes") {
    withRocksDb {
      implicit val sqlCtx = spark.sqlContext
      val index = AnnStream.corpusIndex(spark, TestSpark.sfDir).localCheckpoint()
      val probes = Tables.embeddings(spark, TestSpark.sfDir)
        .filter(col("vec_id") < graft.operators.SimilarityOps.NumProbes)
        .select(col("vec_id").as("probe_id"), col("embedding"))
        .as[Probe].collect().toSeq

      val ms = MemoryStream[Probe]
      val q = AnnStream.annAgainstCorpus(ms.toDF(), index)
        .writeStream.outputMode("append")
        .format("memory").queryName("t_ann_stream")
        .start()
      // two arrival waves + a re-delivery of the first
      val (w1, w2) = probes.splitAt(probes.size / 2)
      ms.addData(w1); q.processAllAvailable()
      ms.addData(w2); q.processAllAvailable()
      ms.addData(w1); q.processAllAvailable()
      q.stop()

      val streamed = spark.table("t_ann_stream")
        .select(col("probe_id"), col("cand_id"), col("rn"), col("score"))
      val batch = SparkEntry.queries("q45_ann_lsh")(spark, TestSpark.sfDir)
      val s = streamed.collect().map(_.toString).sorted.toSeq
      val b = batch.collect().map(_.toString).sorted.toSeq
      assert(s == b, s"streamed=${s.size} batch=${b.size}")
      // re-delivery emitted nothing: raw row count == distinct row count
      assert(spark.table("t_ann_stream").count() == b.size)
    }
  }
}
