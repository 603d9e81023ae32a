package graft.sources

import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

import scala.jdk.CollectionConverters._

/** DataSource V2 fan-out source — the at-scale form of the reference's
  * keyed endpoint scan (rws_data_ingester
  * src/rotterdam_swimming_advice.py:98-109: one fetch per id in
  * ZWEMWATER_IDS). Each configured id becomes ONE `InputPartition`, so a
  * thousand endpoints scan as a thousand parallel tasks with no driver
  * fan-out loop; the reader generates its partition's rows lazily (a real
  * implementation would hold the HTTP/API client where the row iterator
  * is). Deterministic payloads keep it inside the DuckDB-oracle gate.
  *
  * Usage:
  *   spark.read.format("graft.sources.FanoutSource")
  *     .option("ids", "2,5,7,11").option("rowsPerId", "1000").load()
  */
class FanoutSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    FanoutSource.schemaFor(FanoutSource.policy(options.asCaseSensitiveMap()))

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new FanoutTable(
      properties.getOrDefault("ids", "0").split(",").map(_.trim.toLong),
      properties.getOrDefault("rowsPerId", "10").toLong,
      FanoutSource.provider(properties),
      FanoutSource.policy(properties))
}

object FanoutSource {
  val schema: StructType = StructType(Seq(
    StructField("source_id", LongType, nullable = false),
    StructField("seq", LongType, nullable = false),
    StructField("payload", StringType, nullable = false)))

  /** In permissive mode a fetch that exhausts its retries lands in the
    * `error` column (q33's error-tolerant-record shape) instead of
    * aborting the task; `payload` goes nullable to carry the null. */
  def schemaFor(policy: FetchPolicy): StructType =
    if (!policy.permissive) schema
    else StructType(Seq(
      StructField("source_id", LongType, nullable = false),
      StructField("seq", LongType, nullable = false),
      StructField("payload", StringType, nullable = true),
      StructField("error", StringType, nullable = true)))

  /** Retry/timeout policy options (reference O3: `timeout=10` +
    * `raise_for_status` at src/rotterdam_swimming_advice.py:136-137 —
    * there a failed fetch kills the run; here bounded retries with
    * exponential backoff absorb transient faults, and `errorMode=
    * permissive` converts a permanent fault into an error-channel row). */
  def policy(properties: util.Map[String, String]): FetchPolicy =
    FetchPolicy(
      maxRetries = {
        val r = properties.getOrDefault("maxRetries", "2").toInt
        // < 0 would skip the fetch loop entirely and NPE on the empty
        // error state instead of producing an error row — fail at plan
        require(r >= 0, s"maxRetries must be >= 0, got $r")
        r
      },
      backoffMs = properties.getOrDefault("retryBackoffMs", "100").toLong,
      permissive = properties.getOrDefault("errorMode", "fail") match {
        case "fail" => false
        case "permissive" => true
        case other => throw new IllegalArgumentException(
          s"errorMode must be `fail` or `permissive`, got `$other`")
      })

  /** O4-style gate at PLANNING time: `payload=http` requires `endpoint`;
    * a missing endpoint aborts before any task launches. Default is the
    * deterministic provider (oracle-reproducible). */
  def provider(properties: util.Map[String, String]): PayloadProvider =
    properties.getOrDefault("payload", "deterministic") match {
      case "http" =>
        val tpl = properties.get("endpoint")
        if (tpl == null || tpl.isEmpty)
          throw new IllegalArgumentException(
            "payload=http requires an `endpoint` option (template with {id}/{seq}) — aborting at planning time")
        new HttpPayloads(tpl,
          properties.getOrDefault("timeoutMs", "10000").toLong)
      case _ => DeterministicPayloads
    }
}

/** Where the real per-id fetch plugs in: constructed on the driver,
  * shipped to each InputPartition's reader. Implementations must be
  * serializable. */
trait PayloadProvider extends Serializable {
  def payload(id: Long, seq: Long): String
}

/** Offline default: payload derivable from (id, seq), so the DuckDB
  * oracle reproduces the whole scan. */
object DeterministicPayloads extends PayloadProvider {
  override def payload(id: Long, seq: Long): String = s"$id-$seq"
}

/** HTTP-shaped provider (reference S4: one fetch per id,
  * src/rotterdam_swimming_advice.py:98-109, 10 s timeout at :136): GET
  * the endpoint template with {id}/{seq} substituted. The client is
  * `@transient lazy` — built once per executor JVM where the reader
  * iterates, not per row. */
final class HttpPayloads(template: String, timeoutMs: Long) extends PayloadProvider {
  @transient private lazy val client: java.net.http.HttpClient =
    java.net.http.HttpClient.newBuilder()
      .connectTimeout(java.time.Duration.ofMillis(timeoutMs))
      .build()

  override def payload(id: Long, seq: Long): String = {
    val uri = template.replace("{id}", id.toString).replace("{seq}", seq.toString)
    val req = java.net.http.HttpRequest.newBuilder(java.net.URI.create(uri))
      .timeout(java.time.Duration.ofMillis(timeoutMs))
      .GET().build()
    val resp = client.send(req, java.net.http.HttpResponse.BodyHandlers.ofString())
    if (resp.statusCode() / 100 != 2)
      throw new RuntimeException(s"fanout endpoint returned HTTP ${resp.statusCode()}")
    resp.body()
  }
}

/** Bounded-retry fetch policy, applied inside the PartitionReader. */
case class FetchPolicy(maxRetries: Int, backoffMs: Long, permissive: Boolean)
    extends Serializable

class FanoutTable(ids: Array[Long], rowsPerId: Long, provider: PayloadProvider,
    policy: FetchPolicy) extends Table with SupportsRead {
  override def name(): String = s"fanout(${ids.mkString(",")})"
  override def schema(): StructType = FanoutSource.schemaFor(policy)
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ).asJava
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new FanoutScanBuilder(ids, rowsPerId, provider, policy)
}

/** Column pruning is honored: the reader only materializes requested
  * columns (at scale, skipping `payload` skips the expensive fetch). */
class FanoutScanBuilder(ids: Array[Long], rowsPerId: Long, provider: PayloadProvider,
    policy: FetchPolicy) extends ScanBuilder with SupportsPushDownRequiredColumns {
  private var required: StructType = FanoutSource.schemaFor(policy)
  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema
  override def build(): Scan = new FanoutScan(ids, rowsPerId, required, provider, policy)
}

class FanoutScan(ids: Array[Long], rowsPerId: Long, required: StructType,
    provider: PayloadProvider, policy: FetchPolicy) extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def planInputPartitions(): Array[InputPartition] =
    ids.map(id => FanoutPartition(id, rowsPerId): InputPartition)
  override def createReaderFactory(): PartitionReaderFactory =
    new FanoutReaderFactory(required, provider, policy)
}

case class FanoutPartition(id: Long, rows: Long) extends InputPartition

class FanoutReaderFactory(required: StructType, provider: PayloadProvider,
    policy: FetchPolicy) extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[FanoutPartition]
    new PartitionReader[InternalRow] {
      private var seq = -1L
      override def next(): Boolean = { seq += 1; seq < p.rows }

      /** Attempts 1 + maxRetries fetches with exponential backoff; a
        * transient fault (server error, timeout) is retried, a permanent
        * one either fails the task (mode `fail` — Spark's task retry is
        * then the outer policy) or becomes a Left for the error column. */
      private def fetchWithRetry(id: Long, seq: Long): Either[String, String] = {
        var attempt = 0
        var last: Throwable = null
        while (attempt <= policy.maxRetries) {
          try return Right(provider.payload(id, seq))
          catch {
            case e: Exception =>
              last = e
              attempt += 1
              if (attempt <= policy.maxRetries && policy.backoffMs > 0)
                Thread.sleep(policy.backoffMs << math.min(attempt - 1, 10))
          }
        }
        if (policy.permissive)
          Left(s"fetch id=$id seq=$seq failed after $attempt attempts: ${last.getMessage}")
        else throw new RuntimeException(
          s"fanout fetch id=$id seq=$seq failed after $attempt attempts", last)
      }

      override def get(): InternalRow = {
        // at most ONE fetch per row even when both payload and error are
        // projected; no fetch at all if neither survives column pruning
        lazy val fetched = fetchWithRetry(p.id, seq)
        val values = required.fields.map(_.name match {
          case "source_id" => p.id: Any
          case "seq" => seq: Any
          case "payload" =>
            fetched.fold(_ => null, s => UTF8String.fromString(s)): Any
          case "error" =>
            fetched.fold(e => UTF8String.fromString(e), _ => null): Any
        })
        InternalRow.fromSeq(values.toIndexedSeq)
      }
      override def close(): Unit = ()
    }
  }
}
