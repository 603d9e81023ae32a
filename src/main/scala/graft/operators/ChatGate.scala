package graft.operators

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.charset.StandardCharsets
import java.time.Duration

/** O4: env/secret config gate (reference: rws_data_ingester
  * src/rotterdam_swimming_advice.py:13-20 and generate.sh:7-9 — a missing
  * API key aborts the run with exit 1 BEFORE any work starts).
  *
  * The gate is driver-side and runs at plan-construction time: selecting
  * the service never submits a Spark job, so a misconfigured secret fails
  * in milliseconds instead of after a cluster spin-up. Offline (no mode
  * env) the deterministic [[EnrichOps.StubChat]] is selected, which keeps
  * every enrichment query inside the DuckDB-oracle gate.
  */
object ChatGate {
  /** "live" selects the real HTTP client; anything else selects the stub. */
  val ModeEnv = "GRAFT_CHAT_MODE"
  val EndpointEnv = "GRAFT_CHAT_ENDPOINT"
  val KeyEnv = "GRAFT_CHAT_API_KEY"

  /** Fail-fast service selection. Call on the driver before building the
    * enrichment plan; `env` is injectable for tests. */
  def select(env: Map[String, String] = sys.env): EnrichOps.ChatService =
    env.get(ModeEnv) match {
      case Some("live") =>
        val endpoint = env.get(EndpointEnv).filter(_.nonEmpty).getOrElse(
          fail(s"$ModeEnv=live but $EndpointEnv is unset"))
        val key = env.get(KeyEnv).filter(_.nonEmpty).getOrElse(
          fail(s"$ModeEnv=live but $KeyEnv is unset"))
        new HttpChat(endpoint, key)
      case _ => EnrichOps.StubChat
    }

  private def fail(msg: String): Nothing =
    throw new IllegalStateException(
      s"chat config invalid — aborting before any job is submitted: $msg")

  /** Minimal JSON string escaping for the request body. */
  private[operators] def jsonEscape(s: String): String =
    s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    }
}

/** The real-client skeleton behind the O4 gate: a JDK `java.net.http`
  * POST per completion (reference U1 httpx call,
  * src/rotterdam_swimming_advice.py:230-245; the 10 s default timeout
  * mirrors the reference's per-request timeout at :136).
  *
  * Serializable so it ships to executors inside
  * [[EnrichOps.enrich]]'s `mapPartitions`; the HttpClient itself is
  * `@transient lazy`, so each executor JVM builds its connection pool
  * once on first use — never per row.
  */
final class HttpChat(endpoint: String, apiKey: String, timeoutMs: Long = 10000)
    extends EnrichOps.ChatService {

  @transient private lazy val client: HttpClient = HttpClient.newBuilder()
    .connectTimeout(Duration.ofMillis(timeoutMs))
    .build()

  override def complete(prompt: String): String = {
    val body = s"""{"prompt":"${ChatGate.jsonEscape(prompt)}"}"""
    val req = HttpRequest.newBuilder(URI.create(endpoint))
      .timeout(Duration.ofMillis(timeoutMs))
      .header("Content-Type", "application/json")
      .header("Authorization", s"Bearer $apiKey")
      .POST(HttpRequest.BodyPublishers.ofString(body, StandardCharsets.UTF_8))
      .build()
    val resp = client.send(req, HttpResponse.BodyHandlers.ofString())
    if (resp.statusCode() / 100 != 2)
      throw new RuntimeException(s"chat endpoint returned HTTP ${resp.statusCode()}")
    resp.body()
  }
}
