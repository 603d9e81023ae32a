package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.engine.Tables

/** Diversity-based CORESET SELECTION over `embeddings.embedding` —
  * k-Center-Greedy (Sener & Savarese 2018, the active-learning /
  * data-pruning selection rule: repeatedly pick the point farthest from
  * everything already selected), in the engine's exact-integer replay
  * contract (q139/q176's convention):
  *
  *   - q179 K-CENTER GREEDY — seed at the smallest vec_id, then
  *     [[CoresetRounds]] rounds of "argmax over the corpus of the min
  *     squared L2 distance to the selected set". Each round is ONE
  *     corpus scan: the selected centers are literal arrays folded into
  *     a per-row `least(zip_with-dot, …)` expression (no join, no
  *     explode), and the argmax plans as TakeOrderedAndProject —
  *     bounded per-task heaps, one row through the final merge. The
  *     single-row collect per round is a model fetch, not data
  *     movement. All arithmetic is exact integer over milli-unit
  *     quantized components (max term 64·4·10⁶ ≈ 2.6×10⁸ — far inside
  *     int64), so the DuckDB oracle replays every selection (including
  *     vec_id tie-breaks) bit-for-bit.
  *
  * Scale design: k scans with an O(k·d)-byte broadcast each — the
  * textbook distributed k-center-greedy; selection cost grows linearly
  * in corpus size and k, never quadratically. (Production at 100 TB
  * runs the greedy loop on a cluster-proportional subsample and this
  * operator unchanged on the sample — the selection quality bound in
  * the paper is on the k-center objective either way.) The coverage
  * radius (last selection's distance) is the standard stopping
  * diagnostic and lands in the output.
  */
object CoresetOps {
  type Q = (SparkSession, String) => DataFrame

  val Dim: Int = SimilarityOps.Dim
  /** Selection rounds AFTER the seed — fixed so the oracle replays the
    * same count. */
  val CoresetRounds = 5
  /** q184 keep rate: the hardest KeepPct% of each cluster survives —
    * Sorscher et al.'s data-abundant regime rule (keep hard examples;
    * easy/prototypical ones are the redundant mass). */
  val KeepPct = 70

  /** Exact integer squared L2 distance from `qvec` to a literal
    * center. */
  private def sqDist(center: Seq[Long]): Column =
    graft.plans.L2SqExpr.l2sqNative(col("qvec"), typedlit(center))

  /** Run the greedy loop: returns (selection order, vec_id, distance to
    * the previously-selected set at selection time; 0 for the seed). */
  private[graft] def kCenterGreedy(emb: DataFrame,
      rounds: Int): Seq[(Long, Long, Long)] = {
    val q = SimilarityOps.quantized(emb)
    // seed: the smallest vec_id — deterministic, oracle-replayable
    val seed = q.orderBy(col("vec_id")).limit(1)
      .select(col("vec_id"), col("qvec")).head
    var centers = Vector(seed.getSeq[Long](1).toVector)
    var picked = Vector((1L, seed.getLong(0), 0L))
    for (r <- 2 to rounds + 1) {
      val dmin = centers.map(c => sqDist(c)).reduce(least(_, _))
      // farthest-first: max distance, smallest vec_id on ties
      val next = q.select(col("vec_id"), col("qvec"), dmin.as("d"))
        .orderBy(col("d").desc, col("vec_id")).limit(1).head
      picked :+= ((r.toLong, next.getLong(0), next.getLong(2)))
      centers :+= next.getSeq[Long](1).toVector
    }
    picked
  }

  def queries: Map[String, Q] = Map(
    // The selected coreset in selection order with each pick's distance
    // to the set selected before it (the k-center objective trace; the
    // last distance is the corpus coverage radius). 6 rows.
    "q179_kcenter_coreset" -> ((s, dir) => {
      import s.implicits._
      kCenterGreedy(Tables.embeddings(s, dir), CoresetRounds)
        .toDF("sel_order", "vec_id", "dist").orderBy("sel_order")
    }),

    // PROTOTYPE-BASED DATA PRUNING (Sorscher et al. 2022, "Beyond
    // neural scaling laws: beating power law scaling via data
    // pruning"): the paper's self-supervised metric — distance to the
    // assigned k-means prototype — ranked WITHIN each cluster, keeping
    // the hardest KeepPct% (when data is abundant, prototypical
    // examples are the redundant mass; pruning them beats random and
    // can beat the power law). Composes the q139-trained codebook the
    // way q106/q48/q134 do: one broadcast assignment pass + one
    // cluster-keyed window — no pairwise work, linear at any corpus
    // size. Integer d2 over milli-unit cells, so the verdicts (and
    // every tie-break) replay exactly in the oracle.
    "q184_prototype_pruning" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val qemb = SimilarityOps.quantized(Tables.embeddings(s, dir))
      val cents = s.table(SimilarityOps.codebookTable(s, dir))
      val wA = Window.partitionBy("vec_id").orderBy(col("d2"), col("cluster"))
      val assigned = qemb.join(broadcast(cents))
        .withColumn("d2", graft.plans.L2SqExpr.l2sqNative(col("qvec"), col("cvec")))
        .withColumn("rn", row_number().over(wA))
        .filter(col("rn") === 1)
        .select(col("vec_id"), col("cluster"), col("d2"))
      val wH = Window.partitionBy("cluster").orderBy(col("d2").desc, col("vec_id"))
      val wC = Window.partitionBy("cluster")
      assigned
        .withColumn("hard_rank", row_number().over(wH).cast("long"))
        .withColumn("csz", count(lit(1)).over(wC))
        .withColumn("verdict",
          when(col("hard_rank") * 100 <= col("csz") * KeepPct, "keep")
            .otherwise("drop"))
        .select("vec_id", "cluster", "d2", "hard_rank", "csz", "verdict")
        .orderBy("vec_id")
    }))

  // ---- DuckDB oracle ------------------------------------------------------

  /** Unrolled greedy rounds. Every multi-referenced CTE is MATERIALIZED
    * (DuckDB inlines plain CTEs at every reference site — exponential
    * over chained rounds). Round r: dist of every vector to pick r−1,
    * fold into the running min, argmax with vec_id tie-break.
    *
    * Each round's center is its OWN materialized 64-row CTE (`c$i`)
    * rather than a scalar-subquery filter inside a `qv a JOIN qv b`
    * self-join: DuckDB planned that earlier form by hashing the FULL
    * second qv instance (n·Dim rows) and treating the center filter as
    * a post-join predicate, so the join on `j` (Dim distinct values)
    * degenerated toward n²·Dim intermediate pairs — at sf1 the temp
    * spill exceeded container disk and the full-scale oracle sweep had
    * to exclude this query (round-11 verdict item 1). With the center
    * pre-reduced to Dim rows the join is provably n·Dim work per round
    * at any corpus size. */
  def oracle: Map[String, String] = {
    def round(i: Int): String =
      // round 2's min-distance to the selected set IS dm1 (the set is
      // just the seed) — recomputing nd2 would re-run the corpus
      // distance pass for a no-op least() fold
      if (i == 2)
        """dm2 AS MATERIALIZED (SELECT * FROM dm1),
          |p2 AS MATERIALIZED (
          |  SELECT vec_id, d FROM dm2 ORDER BY d DESC, vec_id LIMIT 1)""".stripMargin
      else s"""c$i AS MATERIALIZED (
         |  SELECT j, x FROM qv WHERE vec_id = (SELECT vec_id FROM p${i - 1})),
         |nd$i AS MATERIALIZED (
         |  SELECT a.vec_id, CAST(sum((a.x - b.x) * (a.x - b.x)) AS BIGINT) AS d
         |  FROM qv a JOIN c$i b USING (j)
         |  GROUP BY 1),
         |dm$i AS MATERIALIZED (
         |  SELECT m.vec_id, least(m.d, n.d) AS d
         |  FROM dm${i - 1} m JOIN nd$i n USING (vec_id)),
         |p$i AS MATERIALIZED (
         |  SELECT vec_id, d FROM dm$i ORDER BY d DESC, vec_id LIMIT 1)""".stripMargin
    val rounds = (2 to CoresetRounds + 1).map(round).mkString(",\n")
    val picks = (2 to CoresetRounds + 1)
      .map(i => s"SELECT $i AS sel_order, vec_id, d AS dist FROM p$i")
      .mkString("\nUNION ALL ")
    val t = SimilarityOps.KmIters
    Map(
      // fresh assignment against the FINAL trained centroids (what a
      // codebook-table consumer computes), then the per-cluster
      // hardness rank — shares q139's Lloyd CTEs verbatim
      "q184_prototype_pruning" ->
        s"""WITH ${SimilarityOps.kmeansCtesSql},
           |cT AS MATERIALIZED (SELECT cluster, dim, c FROM c$t),
           |dF AS (
           |  SELECT q.vec_id, c.cluster, sum((q.x - c.c) * (q.x - c.c)) AS d2
           |  FROM qv q JOIN cT c USING (dim) GROUP BY 1, 2),
           |aF AS MATERIALIZED (
           |  SELECT vec_id, cluster, d2 FROM (
           |    SELECT vec_id, cluster, d2, row_number()
           |      OVER (PARTITION BY vec_id ORDER BY d2, cluster) AS rn
           |    FROM dF) WHERE rn = 1)
           |SELECT vec_id, cluster, CAST(d2 AS BIGINT) AS d2,
           |  CAST(hard_rank AS BIGINT) AS hard_rank,
           |  CAST(csz AS BIGINT) AS csz,
           |  CASE WHEN hard_rank * 100 <= csz * $KeepPct
           |    THEN 'keep' ELSE 'drop' END AS verdict
           |FROM (
           |  SELECT vec_id, cluster, d2,
           |    row_number() OVER (PARTITION BY cluster ORDER BY d2 DESC, vec_id)
           |      AS hard_rank,
           |    count(*) OVER (PARTITION BY cluster) AS csz
           |  FROM aF)
           |ORDER BY vec_id""".stripMargin,
      "q179_kcenter_coreset" ->
        s"""WITH qv AS MATERIALIZED (
           |  SELECT vec_id, d.d AS j,
           |    CAST(round(CAST(embedding[d.d] AS DOUBLE) * 1000) AS BIGINT) + 1000 AS x
           |  FROM embeddings,
           |    (SELECT unnest(generate_series(1, $Dim)) AS d) d),
           |p1 AS MATERIALIZED (
           |  SELECT min(vec_id) AS vec_id FROM qv),
           |c1 AS MATERIALIZED (
           |  SELECT j, x FROM qv WHERE vec_id = (SELECT vec_id FROM p1)),
           |dm1 AS MATERIALIZED (
           |  SELECT a.vec_id, CAST(sum((a.x - b.x) * (a.x - b.x)) AS BIGINT) AS d
           |  FROM qv a JOIN c1 b USING (j)
           |  GROUP BY 1),
           |$rounds
           |SELECT CAST(sel_order AS BIGINT) AS sel_order,
           |  vec_id, CAST(dist AS BIGINT) AS dist
           |FROM (
           |  SELECT 1 AS sel_order, (SELECT vec_id FROM p1) AS vec_id,
           |    CAST(0 AS BIGINT) AS dist
           |  UNION ALL $picks)
           |ORDER BY sel_order""".stripMargin)
  }
}
