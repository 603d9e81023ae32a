package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.engine.Tables

/** Multimodal columns: media as opaque `binary` with typed metadata
  * (SURVEY.md §2.2). The fixture corpus has no real image/audio bytes, so
  * the *decode* step is a clearly-marked deterministic stub; the
  * Spark-side plumbing — binary columns, typed Dataset, partitioned
  * `mapPartitions` batch decode, schema of the decoded output — is real
  * and oracle-checked.
  *
  *   - q55 media metadata — binary length / digest / base64 head, pure
  *     column ops (codegen'd)
  *   - q56 batch decode — `Dataset[MediaRecord].mapPartitions`: the shape
  *     a real codec UDF takes (per-partition batching so a decoder
  *     library would be initialized once per partition, not per row)
  */
object MultimodalOps {
  type Q = (SparkSession, String) => DataFrame

  /** An opaque media blob + metadata; `media` would be image/audio bytes. */
  case class MediaRecord(doc_id: Long, media: Array[Byte], kind: String)

  /** Decoded features. In production `n_frames`/`feat` come from the
    * codec; here they are a deterministic function of the byte length. */
  case class DecodedMedia(doc_id: Long, kind: String, n_bytes: Int, n_frames: Int, feat: Long)

  /** STUB DECODE — a real deployment plugs an image/audio codec in here
    * (no such library ships in this offline container). Deterministic
    * fake so tests and the DuckDB oracle can check the plumbing. */
  def decodeStub(r: MediaRecord): DecodedMedia = {
    val n = r.media.length
    DecodedMedia(r.doc_id, r.kind, n, (n + 1023) / 1024, (n.toLong * 2654435761L) % 1000003L)
  }

  /** documents.text re-typed as an opaque binary media column. */
  def mediaTable(s: SparkSession, dir: String): Dataset[MediaRecord] = {
    import s.implicits._
    Tables.documents(s, dir)
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("media"), lit("text").as("kind"))
      .as[MediaRecord]
  }

  /** Partition-batched decode: one iterator pass per partition — where a
    * real codec would amortize model/codec init across the batch. */
  def decodeAll(s: SparkSession, dir: String): Dataset[DecodedMedia] = {
    import s.implicits._
    mediaTable(s, dir).mapPartitions(_.map(decodeStub))
  }

  val queries: Map[String, Q] = Map(
    "q55_multimodal_meta" -> ((s, dir) => {
      Tables.documents(s, dir)
        .select(col("doc_id"), encode(col("text"), "UTF-8").as("media"))
        .select(col("doc_id"),
          length(col("media")).as("n_bytes"),
          md5(col("media")).as("md5hex"),
          substring(base64(col("media")), 1, 8).as("b64_head"))
        .orderBy("doc_id")
    }),

    "q56_media_decode" -> ((s, dir) => {
      decodeAll(s, dir).toDF()
        .select("doc_id", "kind", "n_bytes", "n_frames", "feat")
        .orderBy("doc_id")
    }))

  val oracle: Map[String, String] = Map(
    "q55_multimodal_meta" ->
      """SELECT doc_id,
        |  CAST(octet_length(encode(text)) AS INTEGER) AS n_bytes,
        |  md5(text) AS md5hex,
        |  substring(base64(encode(text)), 1, 8) AS b64_head
        |FROM documents ORDER BY doc_id""".stripMargin,

    "q56_media_decode" ->
      """SELECT doc_id, 'text' AS kind,
        |  CAST(octet_length(encode(text)) AS INTEGER) AS n_bytes,
        |  CAST((octet_length(encode(text)) + 1023) // 1024 AS INTEGER) AS n_frames,
        |  (CAST(octet_length(encode(text)) AS BIGINT) * 2654435761) % 1000003 AS feat
        |FROM documents ORDER BY doc_id""".stripMargin)
}
