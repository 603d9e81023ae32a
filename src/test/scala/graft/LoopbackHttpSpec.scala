package graft

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets
import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.atomic.AtomicInteger

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{ChatGate, EnrichOps}
import graft.streaming.ReportStream

/** The LIVE-HTTP integration path, end to end over real loopback
  * sockets: the DSv2 fan-out source's `payload=http` fetch (reference
  * per-id GET with timeout, rws_data_ingester
  * src/rotterdam_swimming_advice.py:98-109,136), the `ChatGate`
  * live-mode POST with bearer auth (reference :230-245 + the
  * generate.sh:7-9 key gate), and the idempotent report sink — plus
  * the timeout, retry, and permissive-error branches that previously
  * had only offline (stubbed) coverage. */
class LoopbackHttpSpec extends AnyFunSuite with BeforeAndAfterAll {
  import TestSpark.spark

  private val attempts = new ConcurrentHashMap[String, AtomicInteger]()
  private def bump(key: String): Int =
    attempts.computeIfAbsent(key, _ => new AtomicInteger).incrementAndGet()

  private def respond(x: HttpExchange, code: Int, body: String): Unit = {
    val b = body.getBytes(StandardCharsets.UTF_8)
    x.sendResponseHeaders(code, b.length)
    x.getResponseBody.write(b)
    x.close()
  }

  private var server: HttpServer = _
  private def base: String =
    s"http://127.0.0.1:${server.getAddress.getPort}"

  override def beforeAll(): Unit = {
    server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.setExecutor(java.util.concurrent.Executors.newFixedThreadPool(8))
    // /data/{id}/{seq}: the keyed endpoint scan's happy path
    server.createContext("/data", { x =>
      val Array(_, _, id, seq) = x.getRequestURI.getPath.split('/')
      respond(x, 200, s"payload-$id-$seq")
    })
    // /slow: never answers within any probe's request timeout
    server.createContext("/slow", { x =>
      bump("slow" + x.getRequestURI.getPath): Unit
      Thread.sleep(2000)
      respond(x, 200, "too late")
    })
    // /flaky/{id}/{seq}: HTTP 500 on the first attempt per key, 200 after
    server.createContext("/flaky", { x =>
      val key = x.getRequestURI.getPath
      if (bump(key) == 1) respond(x, 500, "transient")
      else respond(x, 200, s"recovered${key.replace('/', '-')}")
    })
    // /chat: the LLM POST — bearer-gated, deterministic body echo
    server.createContext("/chat", { x =>
      val auth = Option(x.getRequestHeaders.getFirst("Authorization"))
      val body = new String(x.getRequestBody.readAllBytes(), StandardCharsets.UTF_8)
      if (!auth.contains("Bearer sk-loopback")) respond(x, 401, "bad key")
      else if (x.getRequestURI.getPath.endsWith("down")) respond(x, 503, "down")
      else respond(x, 200, s"advice[len=${body.length}]")
    })
    server.start()
  }

  override def afterAll(): Unit = if (server != null) server.stop(0)

  test("fetch -> enrich -> publish runs end to end over real sockets") {
    // 1. FETCH: one task per id against the live endpoint template
    val fetched = spark.read.format("graft.sources.FanoutSource")
      .option("ids", "1,2,3").option("rowsPerId", "2")
      .option("payload", "http")
      .option("endpoint", s"$base/data/{id}/{seq}")
      .load()
    val rows = fetched.collect()
    assert(rows.length == 6)
    rows.foreach { r =>
      assert(r.getAs[String]("payload") ==
        s"payload-${r.getAs[Long]("source_id")}-${r.getAs[Long]("seq")}")
    }
    // 2. ENRICH: ChatGate live mode — the gate validates endpoint+key,
    // the client POSTs with bearer auth (the server 401s anything else)
    val svc = ChatGate.select(Map(
      ChatGate.ModeEnv -> "live",
      ChatGate.EndpointEnv -> s"$base/chat",
      ChatGate.KeyEnv -> "sk-loopback"))
    val reports = fetched
      .select(concat(lit("src-"), col("source_id")).as("n_name"),
        col("payload").as("report"))
    val enriched = EnrichOps.enrich(reports, svc).collect()
    assert(enriched.length == 6)
    enriched.foreach(r => assert(r.getAs[String]("advice").startsWith("advice[len=")))
    // 3. PUBLISH: the K1/K3 idempotent report sink on the enriched
    // summary — re-publishing the same batch id is a marker no-op
    val out = java.nio.file.Files.createTempDirectory("loopback-pub")
    val summary = EnrichOps.enrich(reports, svc)
      .groupBy(col("n_name").as("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(length(col("advice")) * 100).cast("long").as("sum_cents"))
    ReportStream.publish(summary, 0L, out.toString)
    val html = java.nio.file.Files.readString(out.resolve("report-0.html"))
    assert(html.contains("src-1") && html.contains("Event report"))
    ReportStream.publish(summary, 0L, out.toString)
    assert(ReportStream.publishedCount(out.toString) == 1L,
      "re-delivery of a published batch must be a no-op")
  }

  test("timeout branch: a hung endpoint exhausts bounded retries into the error channel") {
    val df = spark.read.format("graft.sources.FanoutSource")
      .option("ids", "9").option("rowsPerId", "1")
      .option("payload", "http")
      .option("endpoint", s"$base/slow/{id}/{seq}")
      .option("timeoutMs", "200")
      .option("maxRetries", "1").option("retryBackoffMs", "1")
      .option("errorMode", "permissive")
      .load()
    val r = df.collect().head
    assert(r.getAs[String]("payload") == null)
    assert(r.getAs[String]("error").contains("failed after 2 attempts"),
      s"timeout must land in the error channel after 1+maxRetries tries: $r")
    assert(attempts.get("slow/slow/9/0").get() == 2,
      "the server must have seen exactly the bounded attempt count")
  }

  test("retry branch: a transient 500 is retried and succeeds in fail mode") {
    val df = spark.read.format("graft.sources.FanoutSource")
      .option("ids", "4,5").option("rowsPerId", "1")
      .option("payload", "http")
      .option("endpoint", s"$base/flaky/{id}/{seq}")
      .option("maxRetries", "2").option("retryBackoffMs", "1")
      .load()
    val got = df.collect().map(r =>
      (r.getAs[Long]("source_id"), r.getAs[String]("payload"))).toMap
    assert(got == Map(4L -> "recovered-flaky-4-0", 5L -> "recovered-flaky-5-0"))
    Seq("/flaky/4/0", "/flaky/5/0").foreach(k =>
      assert(attempts.get(k).get() == 2, s"$k: expected exactly 2 attempts"))
  }

  test("live chat failures: wrong key 401s, a 5xx endpoint routes rows to the error channel") {
    import spark.implicits._
    val reports = Seq(("n1", "hello")).toDF("n_name", "report")
    val badKey = new graft.operators.HttpChat(s"$base/chat", "sk-wrong")
    val ex = intercept[org.apache.spark.SparkException] {
      EnrichOps.enrich(reports, badKey).collect()
    }
    assert(ex.getMessage.contains("HTTP 401") ||
      Option(ex.getCause).exists(_.getMessage.contains("HTTP 401")))
    // enrichTolerant converts a down endpoint into typed error rows
    val down = new graft.operators.HttpChat(s"$base/chat/down", "sk-loopback")
    val rows = EnrichOps.enrichTolerant(reports, down).collect()
    assert(rows.length == 1 && rows.head.getAs[String]("advice") == null)
    assert(rows.head.getAs[String]("error").contains("HTTP 503"))
  }
}
