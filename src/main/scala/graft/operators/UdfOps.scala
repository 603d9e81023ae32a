package graft.operators

import org.apache.spark.sql.{DataFrame, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.engine.Tables
import graft.plans.FloatVectorDot

/** The engine's user-extension surface (SURVEY.md §2.2 "UDF surface" row),
  * one query per tier of the extension ladder:
  *
  *   - q70 scalar Scala UDF       — opaque JVM function (the ladder's
  *     floor: correct but codegen-opaque; kept for API completeness)
  *   - q71 typed Aggregator UDAF  — custom merge-able aggregation state
  *     (count + exact-cents sum-of-squares: order-independent, so the
  *     partial/final merge tree cannot drift from the oracle)
  *   - q72 flatMap generator UDTF — one input row -> N typed output rows
  *   - q73 native Catalyst Expression with codegen (FloatVectorDot) —
  *     the ladder's ceiling: primitive loop inside whole-stage codegen,
  *     here re-ranking cosine top-k against the embeddings table
  *
  * Reference analog: P1's HTML->struct parse (rws_data_ingester
  * src/rotterdam_swimming_advice.py:52-95) is a scalar-UDF shape; U1's
  * enrichment (:230-245) is the mapPartitions shape (EnrichOps).
  */
object UdfOps {
  type Q = (SparkSession, String) => DataFrame

  /** q71's aggregation state: (row count, sum of squared cents). Both
    * commutative+associative in Long — safe under any merge order. */
  case class SqState(n: Long, sumSq: Long)

  val sumSqCents: Aggregator[Long, SqState, Double] =
    new Aggregator[Long, SqState, Double] {
      override def zero: SqState = SqState(0L, 0L)
      override def reduce(b: SqState, a: Long): SqState = SqState(b.n + 1, b.sumSq + a * a)
      override def merge(x: SqState, y: SqState): SqState = SqState(x.n + y.n, x.sumSq + y.sumSq)
      override def finish(r: SqState): Double =
        if (r.n == 0) 0.0 else r.sumSq.toDouble / r.n / 10000.0
      override def bufferEncoder = Encoders.product[SqState]
      override def outputEncoder = Encoders.scalaDouble
    }

  /** q72's generated row: token positions of one document. */
  case class TokenRow(doc_id: Long, pos: Int, token: String, tok_len: Int)

  val queries: Map[String, Q] = Map(
    "q70_scalar_udf" -> ((s, dir) => {
      val vowels = udf((t: String) => t.count("aeiou".contains(_)))
      Tables.part(s, dir)
        .select(col("p_partkey"), col("p_name"),
          vowels(col("p_name")).as("n_vowels"))
        .orderBy("p_partkey")
    }),

    "q71_udaf_aggregator" -> ((s, dir) => {
      val meanSq = udaf(sumSqCents, Encoders.scalaLong)
      Tables.lineitem(s, dir)
        .select(col("l_returnflag"),
          round(col("l_quantity") * 100).cast("long").as("q_cents"))
        .groupBy("l_returnflag")
        .agg(meanSq(col("q_cents")).as("mean_sq_qty"),
          count(lit(1)).as("n_rows"))
        .select("l_returnflag", "mean_sq_qty", "n_rows")
        .orderBy("l_returnflag")
    }),

    "q72_udtf_tokens" -> ((s, dir) => {
      import s.implicits._
      Tables.documents(s, dir)
        .select(col("doc_id"), col("text")).as[(Long, String)]
        .flatMap { case (id, text) =>
          text.split(" ").iterator.zipWithIndex.map {
            case (t, i) => TokenRow(id, i + 1, t, t.length)
          }
        }
        .toDF()
        .filter(col("doc_id") < 50)
        .orderBy("doc_id", "pos")
    }),

    "q73_native_expr_topk" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      val probes = emb.filter(col("vec_id") < 5)
        .select(col("vec_id").as("probe_id"), col("embedding").as("pe"))
      val cands = emb.select(col("vec_id").as("cand_id"), col("embedding").as("ce"))
      val w = Window.partitionBy("probe_id").orderBy(col("score").desc, col("cand_id"))
      broadcast(probes)
        .join(cands, col("probe_id") =!= col("cand_id"))
        .withColumn("score", FloatVectorDot.cosineNative(col("pe"), col("ce")))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 5)
        .select("probe_id", "cand_id", "rn", "score")
        .orderBy("probe_id", "rn")
    }))

  // ---- DuckDB oracle ------------------------------------------------------

  private def dotSql(a: String, b: String): String =
    s"""list_reduce(list_transform(generate_series(1, 64),
       | i -> CAST(($a)[i] AS DOUBLE) * CAST(($b)[i] AS DOUBLE)), (x, y) -> x + y)""".stripMargin.replace("\n", " ")

  val oracle: Map[String, String] = Map(
    "q70_scalar_udf" ->
      """SELECT p_partkey, p_name,
        |  CAST(length(p_name) - length(regexp_replace(p_name, '[aeiou]', '', 'g')) AS INTEGER) AS n_vowels
        |FROM part ORDER BY p_partkey""".stripMargin,

    "q71_udaf_aggregator" ->
      """SELECT l_returnflag,
        |  CASE WHEN count(*) = 0 THEN 0.0
        |       ELSE CAST(sum(CAST(round(l_quantity*100) AS BIGINT) * CAST(round(l_quantity*100) AS BIGINT)) AS DOUBLE)
        |            / count(*) / 10000.0 END AS mean_sq_qty,
        |  count(*) AS n_rows
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "q72_udtf_tokens" ->
      """WITH d AS (SELECT doc_id, string_split(text, ' ') AS toks
        |           FROM documents WHERE doc_id < 50),
        |p AS (SELECT doc_id, toks,
        |        unnest(generate_series(1, len(toks))) AS pos FROM d)
        |SELECT doc_id, CAST(pos AS INTEGER) AS pos, toks[pos] AS token,
        |  CAST(length(toks[pos]) AS INTEGER) AS tok_len
        |FROM p ORDER BY doc_id, pos""".stripMargin,

    "q73_native_expr_topk" ->
      s"""SELECT probe_id, cand_id, rn, score FROM (
         |  SELECT probe_id, cand_id,
         |    row_number() OVER (PARTITION BY probe_id ORDER BY score DESC, cand_id) AS rn, score
         |  FROM (
         |    SELECT p.vec_id AS probe_id, c.vec_id AS cand_id,
         |      ${dotSql("p.embedding", "c.embedding")} /
         |      (sqrt(${dotSql("p.embedding", "p.embedding")}) * sqrt(${dotSql("c.embedding", "c.embedding")})) AS score
         |    FROM embeddings p JOIN embeddings c ON p.vec_id != c.vec_id
         |    WHERE p.vec_id < 5))
         |WHERE rn <= 5 ORDER BY probe_id, rn""".stripMargin)
}
