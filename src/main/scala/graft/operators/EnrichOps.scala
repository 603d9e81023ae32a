package graft.operators

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** LLM enrichment boundary (reference U1: rws_data_ingester
  * src/rotterdam_swimming_advice.py:230-245 — one chat call per report).
  *
  * The service is injected (`ChatService`) and called via
  * `Dataset.mapPartitions`, so a real HTTP client is constructed once per
  * partition and requests batch naturally — the scalable shape for
  * inference over a 100 TB corpus (bounded per-partition batches, no
  * driver fan-out, task retries give at-least-once semantics). The stub
  * is deterministic (md5 of the prompt), which keeps the operator inside
  * the DuckDB-oracle gate; the real client would be config-gated exactly
  * like the reference's env check (:17-20).
  */
object EnrichOps {
  type Q = (SparkSession, String) => DataFrame

  /** Injectable completion service (U1). Implementations must be
    * serializable — they ship to executors. */
  trait ChatService extends Serializable {
    def complete(prompt: String): String
  }

  /** Deterministic offline stub: echoes a bounded fingerprint of the
    * prompt, so enrichment output is reproducible in any engine. */
  object StubChat extends ChatService {
    override def complete(prompt: String): String = {
      val d = MessageDigest.getInstance("MD5")
        .digest(prompt.getBytes(StandardCharsets.UTF_8))
      val hex = d.map(b => f"$b%02x").mkString
      s"ADVICE[${hex.take(8)}]"
    }
  }

  /** Attach `svc.complete(prompt)` per row. Typed boundary: rows cross
    * into JVM objects only here (SURVEY.md §1.3). */
  def enrich(reports: DataFrame, svc: ChatService): DataFrame = {
    val spark = reports.sparkSession
    import spark.implicits._
    reports.select(col("n_name"), col("report"))
      .as[(String, String)]
      .mapPartitions { it =>
        // one service binding per partition — a real client would open its
        // connection pool here, once, not per row
        it.map { case (key, prompt) => (key, prompt, svc.complete(prompt)) }
      }
      .toDF("n_name", "report", "advice")
  }

  val queries: Map[String, Q] = Map(
    // U1 end-to-end: template assembly (q34) -> per-partition enrichment.
    "q37_llm_enrich" -> ((s, dir) => {
      val reports = IngestOps.queries("q34_template_report")(s, dir)
      enrich(reports, StubChat)
        .select("n_name", "advice")
        .orderBy("n_name")
    }))

  val oracle: Map[String, String] = Map(
    // The stub is md5-reproducible, so the oracle rebuilds the exact prompt
    // string (same SQL as q34's report column) and fingerprints it.
    "q37_llm_enrich" -> {
      val total = "(CASE WHEN sum(CAST(round(o_totalprice*100) AS BIGINT)) < 0 THEN '-' ELSE '' END || " +
        "CAST(abs(sum(CAST(round(o_totalprice*100) AS BIGINT)))//100 AS VARCHAR) || '.' || " +
        "lpad(CAST(abs(sum(CAST(round(o_totalprice*100) AS BIGINT)))%100 AS VARCHAR), 2, '0'))"
      s"""SELECT n_name, 'ADVICE[' || substring(md5(
         |  'Report for ' || n_name || chr(10) ||
         |  '- customers: ' || CAST(count(DISTINCT c_custkey) AS VARCHAR) || chr(10) ||
         |  '- order total: ' || $total || chr(10) ||
         |  '- last order: ' || strftime(max(o_orderdate), '%Y-%m-%d')), 1, 8) || ']' AS advice
         |FROM orders JOIN customer ON o_custkey = c_custkey
         |JOIN nation ON c_nationkey = n_nationkey
         |GROUP BY n_name ORDER BY n_name""".stripMargin
    })
}
