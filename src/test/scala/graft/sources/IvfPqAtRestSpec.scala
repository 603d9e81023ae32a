package graft.sources

import java.nio.file.{Files, Path}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{IvfPqOps, PqOps}

/** IVFPQ index AT REST (q183): the codes table is CLUSTERED BY COARSE
  * CELL, so the probed-cell IN list prunes candidate FILES via ordinary
  * integer stats — the q140 composition over the compressed
  * representation. The physical proof deletes every file outside the
  * probed cells and shows the operator still answers identically; the
  * identity proof pins q183 == q182 row for row. */
class IvfPqAtRestSpec extends AnyFunSuite {
  import graft.TestSpark.spark
  import spark.implicits._

  test("q183 matches q182 row for row — layout changes I/O, never the answer") {
    val dir = graft.TestSpark.sfDir
    val base = IvfPqOps.queries("q182_ivfpq_search")(spark, dir).collect().toSeq
    val atRest = IvfPqOps.queries("q183_ivfpq_at_rest")(spark, dir).collect().toSeq
    assert(base.nonEmpty)
    assert(atRest == base)
  }

  test("probed-cell search survives deleting every other cell's files") {
    val wh: Path = Files.createTempDirectory("graft-ivfpqrest")
    wh.toFile.deleteOnExit()
    spark.conf.set("spark.sql.catalog.ipqc", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.ipqc.warehouse", wh.toString)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS ipqc.db")
    spark.sql("CREATE TABLE ipqc.db.codes " +
      "(vec_id BIGINT, cell BIGINT, codes ARRAY<BIGINT>) " +
      "TBLPROPERTIES ('write.sort-by' = 'cell')")

    // planted geometry (IvfPqSpec's): 3 well-separated centers, vector i
    // near center i % 3; the coarse codebook is the quantized centers
    val dimT = 8; val mT = 2; val subT = dimT / mT; val ksubT = 3
    val centers = Map(
      0 -> List.fill(dimT)(0.5f),
      1 -> List.fill(dimT)(-0.5f),
      2 -> (0 until dimT).map(d => if (d % 2 == 0) 0.5f else -0.5f).toList)
    val rnd = new scala.util.Random(7)
    val emb = (0 until 24).map { i =>
      (i.toLong, centers(i % 3).map(c => c + (rnd.nextFloat() - 0.5f) * 0.1f))
    }.toDF("vec_id", "embedding")
    def quantRow(v: List[Float]): Seq[Long] =
      v.map(x => math.round(x.toDouble * 1000) + 1000L)
    val cents = centers.toSeq.sortBy(_._1)
      .map { case (c, v) => (c.toLong, quantRow(v)) }.toDF("cluster", "cvec")

    // real fit, codes persisted wide through the real clustered write;
    // force a multi-file layout (one file per cell) so pruning is provable
    val (pqc, codes, _) = IvfPqOps.ivfpqFit(emb, cents, mT, subT, ksubT, PqOps.PqIters)
    val coalesceKey = "spark.sql.adaptive.coalescePartitions.enabled"
    val prev = spark.conf.get(coalesceKey, "true")
    spark.conf.set(coalesceKey, "false")
    try codes.groupBy(col("vec_id"), col("cluster").as("cell"))
      .agg(transform(array_sort(collect_list(struct(col("sub"), col("code")))),
        e => e.getField("code")).as("codes"))
      .repartition(3, col("cell"))
      .writeTo("ipqc.db.codes").append()
    finally spark.conf.set(coalesceKey, prev)

    val root = wh.resolve("db").resolve("codes")
    val es = ManifestSink.committedEntries(root, None).filter(_.rows > 0)
    assert(es.size > 1, s"need a multi-file cell layout, got ${es.size}")
    assert(es.forall(e => e.mins.contains("cell") && e.maxs.contains("cell")))

    // probe vector 0 with ONE probed cell: the answer must come from its
    // own cell's files alone
    val probes = emb.filter(col("vec_id") === 0L)
    def search() = IvfPqOps.adcFromCodes(spark, "ipqc.db.codes", pqc, cents,
      probes, nProbeCells = 1, topK = 24, mT, subT).collect().toSeq
    val before = search()
    assert(before.nonEmpty)
    val probedCells = before.map(_.getLong(3)).distinct
    val keep = es.filter(e =>
      probedCells.exists(c => e.mins("cell") <= c && c <= e.maxs("cell")))
    assert(keep.size < es.size, "other cells' files must be prunable")
    es.filterNot(keep.contains).foreach(e => Files.delete(root.resolve(e.name)))
    assert(search() == before, "pruned layout must answer identically")
  }
}
