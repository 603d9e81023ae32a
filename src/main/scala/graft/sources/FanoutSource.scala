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
    FanoutSource.schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new FanoutTable(
      properties.getOrDefault("ids", "0").split(",").map(_.trim.toLong),
      properties.getOrDefault("rowsPerId", "10").toLong,
      FanoutSource.provider(properties))
}

object FanoutSource {
  val schema: StructType = StructType(Seq(
    StructField("source_id", LongType, nullable = false),
    StructField("seq", LongType, nullable = false),
    StructField("payload", StringType, nullable = false)))

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

class FanoutTable(ids: Array[Long], rowsPerId: Long, provider: PayloadProvider)
    extends Table with SupportsRead {
  override def name(): String = s"fanout(${ids.mkString(",")})"
  override def schema(): StructType = FanoutSource.schema
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ).asJava
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new FanoutScanBuilder(ids, rowsPerId, provider)
}

/** Column pruning is honored: the reader only materializes requested
  * columns (at scale, skipping `payload` skips the expensive fetch). */
class FanoutScanBuilder(ids: Array[Long], rowsPerId: Long, provider: PayloadProvider)
    extends ScanBuilder with SupportsPushDownRequiredColumns {
  private var required: StructType = FanoutSource.schema
  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema
  override def build(): Scan = new FanoutScan(ids, rowsPerId, required, provider)
}

class FanoutScan(ids: Array[Long], rowsPerId: Long, required: StructType,
    provider: PayloadProvider) extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def planInputPartitions(): Array[InputPartition] =
    ids.map(id => FanoutPartition(id, rowsPerId): InputPartition)
  override def createReaderFactory(): PartitionReaderFactory =
    new FanoutReaderFactory(required, provider)
}

case class FanoutPartition(id: Long, rows: Long) extends InputPartition

class FanoutReaderFactory(required: StructType, provider: PayloadProvider)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[FanoutPartition]
    new PartitionReader[InternalRow] {
      private var seq = -1L
      override def next(): Boolean = { seq += 1; seq < p.rows }
      override def get(): InternalRow = {
        val values = required.fields.map(_.name match {
          case "source_id" => p.id: Any
          case "seq" => seq: Any
          // only evaluated when `payload` survives column pruning
          case "payload" => UTF8String.fromString(provider.payload(p.id, seq)): Any
        })
        InternalRow.fromSeq(values.toIndexedSeq)
      }
      override def close(): Unit = ()
    }
  }
}
