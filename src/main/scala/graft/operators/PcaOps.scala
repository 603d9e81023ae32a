package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.engine.Tables

/** Distributed PCA over `embeddings.embedding` — the classic one-pass
  * covariance + power-iteration pipeline, in the engine's exact-integer
  * replay contract (q139/q174's convention):
  *
  *   - q176 TOP PRINCIPAL COMPONENT — the corpus is touched EXACTLY
  *     ONCE to accumulate the d×d Gram matrix (per-row outer products,
  *     map-side partial aggregation; d²=4096 cells regardless of corpus
  *     size), the covariance derives by the computational formula
  *     `N·Σxᵢxⱼ − Σxᵢ·Σxⱼ` (integers only — no mean subtraction, no
  *     division), and a fixed number of power-iteration rounds runs
  *     over the TINY d²-cell matrix with L∞ (max-abs) normalization in
  *     portable truncated integer division.
  *   - q177 PROJECTION — every vector's exact integer score along the
  *     trained component (`Σⱼ (N·xⱼ−Sⱼ)·vⱼ`), top-10. One scan,
  *     partial-aggregated; component + column sums broadcast.
  *
  * Scale design: the only data-sized stage is the Gram accumulation —
  * one scan emitting d² products per row into a d²-group partial
  * aggregate (the textbook outer-product covariance; communication is
  * O(partitions·d²), independent of N). Power iteration never touches
  * the corpus: it runs on the 4096-cell matrix. All arithmetic is
  * exact-integer with sign-split truncated division, so the DuckDB
  * oracle replays every round bit-for-bit. (At N ≳ 10⁹ rows the
  * `N·Σxᵢxⱼ` term approaches int64 range — production at that scale
  * moves the Gram cells to DECIMAL(38,0); the plan shape is unchanged.)
  */
object PcaOps {
  type Q = (SparkSession, String) => DataFrame

  val Dim: Int = SimilarityOps.Dim
  /** Power-iteration rounds — fixed (not convergence-tested) so the
    * oracle replays the same count (q139's convention). */
  val PcaIters = 6
  /** Covariance cells rescale to ≤ ~10⁶ before iteration (eigenvectors
    * are scale-invariant) so `Σⱼ c·v` stays far inside int64. */
  val CellCap = 1000000L
  val PcaTopK = 10

  /** Sign-split truncated integer division over NAMED columns —
    * identical in Spark and DuckDB because both operands of the inner
    * `div`/`//` are nonnegative (negative-operand integer-division
    * semantics differ between engines). */
  private def tdiv(a: String, b: String): Column =
    expr(s"CASE WHEN $a < 0 THEN -((-($a)) div $b) ELSE ($a) div $b END")

  /** (cov (i, j, c) rescaled, sums (j, sx, n)) — the one corpus scan. */
  private[graft] def covariance(emb: DataFrame): (DataFrame, DataFrame) = {
    val q = SimilarityOps.quantized(emb)
    val sums = q.select(posexplode(col("qvec")))
      .groupBy((col("pos") + 1).cast("long").as("j"))
      .agg(sum(col("col")).as("sx"), count(lit(1)).as("n"))
    val gram = q.select(explode(flatten(
        transform(sequence(lit(1), lit(Dim)), i =>
          transform(sequence(lit(1), lit(Dim)), j =>
            struct(i.cast("long").as("i"), j.cast("long").as("j"),
              (element_at(col("qvec"), i) * element_at(col("qvec"), j)).as("p"))))))
        .as("e"))
      .groupBy(col("e.i").as("i"), col("e.j").as("j"))
      .agg(sum(col("e.p")).as("sp"))
    val si = sums.select(col("j").as("i"), col("sx").as("sxi"), col("n"))
    val sj = sums.select(col("j"), col("sx").as("sxj"))
    val cov = gram
      .join(broadcast(si), Seq("i"))
      .join(broadcast(sj), Seq("j"))
      .select(col("i"), col("j"),
        (col("n") * col("sp") - col("sxi") * col("sxj")).as("c"))
    val dscale = cov.agg(expr(s"max(abs(c)) div $CellCap + 1").as("d"))
    val rescaled = cov.crossJoin(broadcast(dscale))
      .select(col("i"), col("j"), tdiv("c", "d").as("c"))
    (rescaled, sums)
  }

  /** [[PcaIters]] power-iteration rounds from v₀ = (1000, …, 1000):
    * wᵢ = Σⱼ cᵢⱼ·vⱼ, then L∞ renormalize to milli-units. Returns
    * (j, v, w) — the final component and its pre-normalization image
    * (two independent integer checksums of the round replay). */
  private[graft] def powerIterate(cov: DataFrame, iters: Int): DataFrame = {
    val cs = cov.localCheckpoint()
    var v = cs.sparkSession.range(1, Dim + 1)
      .select(col("id").as("j"), lit(1000L).as("v"))
    var w: DataFrame = null
    for (_ <- 1 to iters) {
      w = cs.join(broadcast(v), Seq("j"))
        .groupBy(col("i").as("jn")).agg(sum(col("c") * col("v")).as("w"))
        .select(col("jn").as("j"), col("w"))
        .localCheckpoint()
      val m = w.agg(greatest(max(abs(col("w"))), lit(1L)).as("m"))
      v = w.crossJoin(broadcast(m))
        .select(col("j"), expr(
          "CASE WHEN w < 0 THEN -((abs(w) * 1000) div m) ELSE (w * 1000) div m END")
          .as("v"))
        .localCheckpoint()
    }
    v.join(w, Seq("j")).select(col("j").as("dim"), col("v"), col("w"))
  }

  def queries: Map[String, Q] = Map(
    // Top principal component in milli-units (L∞-normalized) with the
    // final un-normalized image w as a second checksum. 64 rows.
    "q176_pca_power" -> ((s, dir) => {
      val (cov, _) = covariance(Tables.embeddings(s, dir))
      powerIterate(cov, PcaIters).orderBy("dim")
    }),
    // Exact integer projection of every vector onto the component
    // (centered by the computational formula: N·x−S), top-10 by score.
    "q177_pca_project" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      val (cov, sums) = covariance(emb)
      val comp = powerIterate(cov, PcaIters).select(col("dim").as("j"), col("v"))
      SimilarityOps.quantized(emb)
        .select(col("vec_id"), posexplode(col("qvec")))
        .select(col("vec_id"), (col("pos") + 1).cast("long").as("j"), col("col").as("x"))
        .join(broadcast(sums), Seq("j"))
        .join(broadcast(comp), Seq("j"))
        .groupBy("vec_id")
        .agg(sum((col("n") * col("x") - col("sx")) * col("v")).as("score"))
        .orderBy(col("score").desc, col("vec_id"))
        .limit(PcaTopK)
    }))

  // ---- DuckDB oracle ------------------------------------------------------

  /** Covariance + unrolled power-iteration rounds. Every CTE referenced
    * more than once is MATERIALIZED (DuckDB inlines plain CTEs at every
    * reference site — exponential over chained rounds). Ends with
    * v$PcaIters / w$PcaIters. */
  private def pcaCtesSql: String = {
    def round(i: Int): String =
      s"""w$i AS MATERIALIZED (
         |  SELECT c.i AS j, sum(c.c * v.v) AS w
         |  FROM cs c JOIN v${i - 1} v ON c.j = v.j GROUP BY 1),
         |m$i AS MATERIALIZED (SELECT greatest(max(abs(w)), 1) AS m FROM w$i),
         |v$i AS MATERIALIZED (
         |  SELECT j, CASE WHEN w < 0 THEN -((abs(w) * 1000) // m)
         |    ELSE (w * 1000) // m END AS v
         |  FROM w$i, m$i)""".stripMargin
    s"""qv AS MATERIALIZED (
       |  SELECT vec_id, d.d AS j,
       |    CAST(round(CAST(embedding[d.d] AS DOUBLE) * 1000) AS BIGINT) + 1000 AS x
       |  FROM embeddings,
       |    (SELECT unnest(generate_series(1, $Dim)) AS d) d),
       |sums AS MATERIALIZED (
       |  SELECT j, CAST(sum(x) AS BIGINT) AS sx, count(*) AS n FROM qv GROUP BY 1),
       |gram AS MATERIALIZED (
       |  SELECT a.j AS i, b.j AS j, CAST(sum(a.x * b.x) AS BIGINT) AS sp
       |  FROM qv a JOIN qv b USING (vec_id) GROUP BY 1, 2),
       |cov AS MATERIALIZED (
       |  SELECT g.i, g.j, s1.n * g.sp - s1.sx * s2.sx AS c
       |  FROM gram g JOIN sums s1 ON g.i = s1.j JOIN sums s2 ON g.j = s2.j),
       |dscale AS MATERIALIZED (
       |  SELECT max(abs(c)) // $CellCap + 1 AS d FROM cov),
       |cs AS MATERIALIZED (
       |  SELECT i, j, CASE WHEN c < 0 THEN -((-c) // d) ELSE c // d END AS c
       |  FROM cov, dscale),
       |v0 AS MATERIALIZED (
       |  SELECT unnest(generate_series(1, $Dim)) AS j, CAST(1000 AS BIGINT) AS v),
       |${(1 to PcaIters).map(round).mkString(",\n")}""".stripMargin
  }

  def oracle: Map[String, String] = {
    val t = PcaIters
    Map(
      "q176_pca_power" ->
        s"""WITH $pcaCtesSql
           |SELECT v.j AS dim, CAST(v.v AS BIGINT) AS v, CAST(w.w AS BIGINT) AS w
           |FROM v$t v JOIN w$t w USING (j) ORDER BY dim""".stripMargin,
      "q177_pca_project" ->
        s"""WITH $pcaCtesSql
           |SELECT q.vec_id,
           |  CAST(sum((s.n * q.x - s.sx) * v.v) AS BIGINT) AS score
           |FROM qv q JOIN sums s ON q.j = s.j JOIN v$t v ON q.j = v.j
           |GROUP BY 1 ORDER BY score DESC, vec_id LIMIT $PcaTopK""".stripMargin)
  }
}
