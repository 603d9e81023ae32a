package graft.operators

import org.apache.spark.sql.{DataFrame, Encoder, SparkSession}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

import graft.engine.Tables

/** Distributed PCA over `embeddings.embedding` — the classic one-pass
  * Gram accumulation + power iteration, in the engine's exact-integer
  * replay contract (q139/q174's convention):
  *
  *   - q176 TOP PRINCIPAL COMPONENT — the corpus is touched EXACTLY
  *     ONCE: a typed Aggregator accumulates the per-dim column sums,
  *     the upper-triangle Gram products and the row count in one fused
  *     buffer (d + d(d+1)/2 + 1 = 2,145 longs at d=64), partial
  *     map-side, merged across partitions — communication is
  *     O(partitions · d²), independent of N, with zero per-row object
  *     explosion. The covariance derives by the computational formula
  *     `N·Σxᵢxⱼ − Σxᵢ·Σxⱼ` (integers only), and the fixed
  *     power-iteration rounds run DRIVER-SIDE on the bounded d²-cell
  *     matrix (the public MLlib RowMatrix pattern: Gram distributed,
  *     eigen-iteration local — d is a model constant, so this is O(1)
  *     work at any corpus size, and it replaces 12 tiny cluster jobs
  *     per training with none).
  *   - q177 PROJECTION — every vector's exact integer score along the
  *     trained component, algebraically split as
  *     `N·Σⱼxⱼvⱼ − Σⱼ Sⱼvⱼ` so the per-row work is ONE zip_with dot
  *     product against a literal component array (no explode, no
  *     probe-side join, no per-vector shuffle); top-10 via
  *     TakeOrderedAndProject's bounded per-task heaps.
  *
  * All arithmetic is exact-integer with sign-split truncated division,
  * so the DuckDB oracle replays every round bit-for-bit. (At N ≳ 10⁹
  * rows the `N·Σxᵢxⱼ` term approaches int64 range — production at that
  * scale moves the Gram cells to DECIMAL(38,0); the plan shape is
  * unchanged.)
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

  /** Truncated integer division with sign split — both operands of the
    * inner `/` are nonnegative, so Spark, DuckDB and JVM semantics all
    * agree (negative-operand integer division differs between engines). */
  private def tdiv(a: Long, b: Long): Long =
    if (a < 0) -((-a) / b) else a / b

  /** Trained model: row count, per-dim column sums, and the final
    * component v (L∞-normalized milli-units) with its pre-normalization
    * image w (two independent integer checksums of the round replay). */
  private[graft] final case class PcaModel(
      n: Long, sx: Array[Long], v: Array[Long], w: Array[Long])

  /** Fused one-pass buffer: per-dim column sums, upper-triangle Gram
    * products (row-major, k walks i then j≥i) and the row count, all in
    * one long array — partial map-side, element-wise merge. Top-level
    * class so the closure carries no session state. */
  private final class GramAgg(dim: Int)
      extends Aggregator[Seq[Long], Array[Long], Seq[Long]] {
    private val tri = dim * (dim + 1) / 2
    override def zero: Array[Long] = new Array[Long](dim + tri + 1)
    override def reduce(b: Array[Long], x: Seq[Long]): Array[Long] = {
      if (x != null && x.length == dim) {
        val a = x.toArray
        var i = 0
        var k = dim
        while (i < dim) {
          b(i) += a(i)
          var j = i
          while (j < dim) { b(k) += a(i) * a(j); k += 1; j += 1 }
          i += 1
        }
        b(dim + tri) += 1L
      }
      b
    }
    override def merge(x: Array[Long], y: Array[Long]): Array[Long] = {
      var i = 0
      while (i < x.length) { x(i) += y(i); i += 1 }
      x
    }
    override def finish(b: Array[Long]): Seq[Long] = b.toSeq
    override def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
    override def outputEncoder: Encoder[Seq[Long]] = ExpressionEncoder[Seq[Long]]()
  }

  /** ONE corpus pass: fused (column sums, upper-triangle Gram, count)
    * accumulation, then the fixed power-iteration rounds on the
    * driver-resident d×d matrix. The collect is bounded by construction
    * (one row of d + d(d+1)/2 + 1 longs — a model, not data). */
  private[graft] def train(emb: DataFrame): PcaModel = {
    val dim = Dim
    val tri = dim * (dim + 1) / 2
    val b = SimilarityOps.quantized(emb)
      .select(udaf(new GramAgg(dim), ExpressionEncoder[Seq[Long]]())(col("qvec")))
      .head.getSeq[Long](0).toArray
    val sx = b.slice(0, dim)
    val n = b(dim + tri)
    // expand the triangle via the computational covariance formula
    val cov = Array.ofDim[Long](dim, dim)
    var k = dim
    var i = 0
    while (i < dim) {
      var j = i
      while (j < dim) {
        val c = n * b(k) - sx(i) * sx(j)
        cov(i)(j) = c
        cov(j)(i) = c
        k += 1
        j += 1
      }
      i += 1
    }
    val d = cov.map(_.map(math.abs).max).max / CellCap + 1
    val cs = cov.map(_.map(tdiv(_, d)))
    // power rounds from v₀ = (1000, …, 1000): w = cs·v, then L∞
    // renormalize to milli-units — identical integers to the oracle's
    // unrolled rounds
    var v = Array.fill(dim)(1000L)
    var w = Array.fill(dim)(0L)
    for (_ <- 1 to PcaIters) {
      w = Array.tabulate(dim) { r =>
        var s = 0L
        var j = 0
        while (j < dim) { s += cs(r)(j) * v(j); j += 1 }
        s
      }
      val m = math.max(w.map(math.abs).max, 1L)
      v = w.map(x => if (x < 0) -((-x * 1000L) / m) else (x * 1000L) / m)
    }
    PcaModel(n, sx, v, w)
  }

  def queries: Map[String, Q] = Map(
    // Top principal component in milli-units (L∞-normalized) with the
    // final un-normalized image w as a second checksum. 64 rows.
    "q176_pca_power" -> ((s, dir) => {
      import s.implicits._
      val m = train(Tables.embeddings(s, dir))
      (1 to Dim).map(j => (j.toLong, m.v(j - 1), m.w(j - 1)))
        .toDF("dim", "v", "w").orderBy("dim")
    }),
    // Exact integer projection of every vector onto the component
    // (centered by the computational formula: N·x−S), top-10 by score.
    // score = Σⱼ(N·xⱼ−Sⱼ)·vⱼ = N·Σⱼxⱼvⱼ − Σⱼ Sⱼvⱼ — the second term is
    // a scalar and the first is a per-row zip_with dot product against
    // the literal component, so the probe scan carries no join, no
    // explode and no shuffle; the only data movement is TakeOrdered's
    // bounded per-task top-k merge.
    "q177_pca_project" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      val m = train(emb)
      val c0 = (0 until Dim).map(j => m.sx(j) * m.v(j)).sum
      SimilarityOps.quantized(emb)
        .select(col("vec_id"),
          (lit(m.n) * aggregate(
            zip_with(col("qvec"), typedlit(m.v.toSeq), (x, v) => x * v),
            lit(0L), (acc, e) => acc + e) - lit(c0)).as("score"))
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
