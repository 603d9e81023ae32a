package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
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
    }),

    // Resize: downscale each media payload to a target budget — the
    // Spark-side shape of image resize (STUB: "resizing" truncates bytes
    // and recomputes metadata; a real codec would rescale pixels). The
    // typed mapPartitions boundary is identical to the real thing.
    "q68_media_resize" -> ((s, dir) => {
      import s.implicits._
      val target = 128
      mediaTable(s, dir)
        .mapPartitions(_.map { r =>
          val resized = r.media.take(target)
          DecodedMedia(r.doc_id, r.kind, resized.length,
            (resized.length + 1023) / 1024,
            (resized.length.toLong * 2654435761L) % 1000003L)
        })
        .toDF()
        .select(col("doc_id"), col("n_bytes").as("resized_bytes"),
          col("n_frames"), col("feat"))
        .orderBy("doc_id")
    }),

    // Frame sampling: split each media payload into fixed 64-byte frames
    // and fingerprint each — the Spark-side shape of video frame-sample /
    // audio chunking (STUB: frames are substrings of the text payload, a
    // real codec would emit decoded frame tensors). explode keeps it
    // columnar and distributed; no driver-side loop.
    "q57_frame_sample" -> ((s, dir) => {
      val frameLen = 64
      Tables.documents(s, dir)
        .select(col("doc_id"), col("text"), length(col("text")).as("n_chars2"))
        .withColumn("frame_idx",
          explode(sequence(lit(0), ((col("n_chars2") - 1) / frameLen).cast("int"))))
        .select(col("doc_id"), col("frame_idx"),
          md5(substring_index_col(col("text"), col("frame_idx"), frameLen)).as("frame_md5"))
        .orderBy("doc_id", "frame_idx")
    }))

  /** substring(text, idx*len+1, len) with a column start — helper because
    * functions.substring takes Int literals only. */
  private def substring_index_col(text: Column, idx: Column, len: Int): Column =
    text.substr(idx * lit(len) + lit(1), lit(len))

  val oracle: Map[String, String] = Map(
    "q55_multimodal_meta" ->
      """SELECT doc_id,
        |  CAST(octet_length(encode(text)) AS INTEGER) AS n_bytes,
        |  md5(text) AS md5hex,
        |  substring(base64(encode(text)), 1, 8) AS b64_head
        |FROM documents ORDER BY doc_id""".stripMargin,

    "q68_media_resize" ->
      """SELECT doc_id,
        |  CAST(least(octet_length(encode(text)), 128) AS INTEGER) AS resized_bytes,
        |  CAST((least(octet_length(encode(text)), 128) + 1023) // 1024 AS INTEGER) AS n_frames,
        |  (CAST(least(octet_length(encode(text)), 128) AS BIGINT) * 2654435761) % 1000003 AS feat
        |FROM documents ORDER BY doc_id""".stripMargin,

    "q57_frame_sample" ->
      """WITH f AS (SELECT doc_id, text,
        |    unnest(generate_series(0, CAST((length(text)-1)//64 AS BIGINT))) AS frame_idx
        |  FROM documents)
        |SELECT doc_id, CAST(frame_idx AS INTEGER) AS frame_idx,
        |  md5(substring(text, CAST(frame_idx*64+1 AS INTEGER), 64)) AS frame_md5
        |FROM f ORDER BY doc_id, frame_idx""".stripMargin,

    "q56_media_decode" ->
      """SELECT doc_id, 'text' AS kind,
        |  CAST(octet_length(encode(text)) AS INTEGER) AS n_bytes,
        |  CAST((octet_length(encode(text)) + 1023) // 1024 AS INTEGER) AS n_frames,
        |  (CAST(octet_length(encode(text)) AS BIGINT) * 2654435761) % 1000003 AS feat
        |FROM documents ORDER BY doc_id""".stripMargin)
}
