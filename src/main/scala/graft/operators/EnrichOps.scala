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
  * the DuckDB-oracle gate; the real client ([[HttpChat]]) is config-gated
  * by [[ChatGate]] exactly like the reference's env check (:13-20).
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

  /** A service that fails deterministically on some prompts — stands in
    * for HTTP timeouts/5xx (reference O3). Failure keying is md5-based so
    * any engine reproduces which rows land in the error channel. */
  object FlakyChat extends ChatService {
    override def complete(prompt: String): String = {
      val r = StubChat.complete(prompt)
      // ADVICE[<8 hex>] — first digest nibble 0-3 (1/4 of rows) "times out"
      if ("0123".contains(r.charAt(7))) throw new RuntimeException("simulated timeout")
      r
    }
  }

  /** Enrichment with a per-row error channel (P6 x U1): a failed call
    * becomes a typed {advice=null, error} record instead of a task
    * failure, downstream filterable — the job survives flaky endpoints. */
  def enrichTolerant(reports: DataFrame, svc: ChatService): DataFrame = {
    val spark = reports.sparkSession
    import spark.implicits._
    reports.select(col("n_name"), col("report"))
      .as[(String, String)]
      .mapPartitions(_.map { case (key, prompt) =>
        try (key, svc.complete(prompt), null: String)
        catch { case e: Exception => (key, null: String, e.getMessage) }
      })
      .toDF("n_name", "advice", "error")
  }

  val queries: Map[String, Q] = Map(
    // U1 end-to-end: template assembly (q34) -> per-partition enrichment.
    // The service comes through the O4 gate: env-selected, fail-fast on a
    // missing secret, stub when no live mode is configured (this sandbox).
    "q37_llm_enrich" -> ((s, dir) => {
      val reports = IngestOps.queries("q34_template_report")(s, dir)
      enrich(reports, ChatGate.select())
        .select("n_name", "advice")
        .orderBy("n_name")
    }),

    // U1 + P6 + O3: enrichment under a flaky service — failures become a
    // typed error channel, not job failures.
    "q69_enrich_errors" -> ((s, dir) => {
      val reports = IngestOps.queries("q34_template_report")(s, dir)
      enrichTolerant(reports, FlakyChat)
        .select(col("n_name"),
          coalesce(col("advice"), lit("")).as("advice"),
          when(col("error").isNotNull, 1).otherwise(0).as("is_err"))
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
    },

    "q69_enrich_errors" -> {
      val total = "(CASE WHEN sum(CAST(round(o_totalprice*100) AS BIGINT)) < 0 THEN '-' ELSE '' END || " +
        "CAST(abs(sum(CAST(round(o_totalprice*100) AS BIGINT)))//100 AS VARCHAR) || '.' || " +
        "lpad(CAST(abs(sum(CAST(round(o_totalprice*100) AS BIGINT)))%100 AS VARCHAR), 2, '0'))"
      s"""WITH h AS (
         |  SELECT n_name, substring(md5(
         |    'Report for ' || n_name || chr(10) ||
         |    '- customers: ' || CAST(count(DISTINCT c_custkey) AS VARCHAR) || chr(10) ||
         |    '- order total: ' || $total || chr(10) ||
         |    '- last order: ' || strftime(max(o_orderdate), '%Y-%m-%d')), 1, 8) AS hx
         |  FROM orders JOIN customer ON o_custkey = c_custkey
         |  JOIN nation ON c_nationkey = n_nationkey
         |  GROUP BY n_name)
         |SELECT n_name,
         |  CASE WHEN substring(hx, 1, 1) IN ('0','1','2','3') THEN ''
         |       ELSE 'ADVICE[' || hx || ']' END AS advice,
         |  CASE WHEN substring(hx, 1, 1) IN ('0','1','2','3') THEN 1 ELSE 0 END AS is_err
         |FROM h ORDER BY n_name""".stripMargin
    })
}
