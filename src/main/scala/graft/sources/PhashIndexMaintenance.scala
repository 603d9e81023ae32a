package graft.sources

import java.nio.file.{Path, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.connector.catalog.TableChange
import org.apache.spark.sql.functions._

import graft.operators.MultimodalOps

/** Incremental maintenance of the PERCEPTUAL-HASH media near-dup index
  * AT REST — media joins the index family (MinHash q208/q209, set-sim
  * q199/q201, postings, ANN, line table): the aHash bands of every
  * stored media grid live as two manifest tables maintained through the
  * media source's change feed:
  *
  *   - `hash`  (doc_id, bands): the 4 × 16-bit aHash bands per doc —
  *     the Hamming-verification arm, doc_id-sorted so candidate
  *     fetches prune by id range;
  *   - `bands` (band, doc_id): one row per (band index, band value),
  *     folded to ONE string key `j ':' value` (the q208 banding shape),
  *     sort-clustered + bloomed on `band` — the LSH candidate arm.
  *
  * Like the MinHash index (and unlike set-sim's frozen-df prefixes)
  * there is NO corpus statistic: a doc's hash and band rows depend on
  * its own pixels alone, so appends are pure insertion, deletes are
  * equality deletes keyed by doc_id, and a rebuilt index is
  * bit-identical to a maintained one. EXACTLY-ONCE via the
  * [[PendingWindow]] pivot on the bands table with the q208 scrub rule
  * (recovery equality-deletes the window's insert keys from both
  * tables, then re-applies). Key lists stream through
  * [[MinHashIndexMaintenance.chunkedEqDelete]].
  *
  * Scale shape: refresh I/O is delta-only; the index is 4 longs + 4
  * short strings per doc — orders of magnitude smaller than the media
  * it indexes; probes are band-key equi-joins against bloomed,
  * sort-clustered files. */
object PhashIndexMaintenance {
  private val SourceVersionProp = "ph.source-version"
  private val CdcPendingProp = "ph.pending-cdc"

  private def warehouse(s: SparkSession, catalog: String): Path =
    Paths.get(s.conf.get(s"spark.sql.catalog.$catalog.warehouse"))
  private def tableRoot(s: SparkSession, catalog: String, ident: String): Path =
    ident.split('.').foldLeft(warehouse(s, catalog))(_.resolve(_))

  def lastSourceVersion(s: SparkSession, catalog: String, bandIdent: String): Long =
    ManifestSink.readHeader(tableRoot(s, catalog, bandIdent))
      .props.getOrElse(SourceVersionProp, "0").toLong

  /** (doc_id, px) → one hash row per doc. */
  private[graft] def hashRows(media: DataFrame): DataFrame =
    MultimodalOps.bandsFromPx(media)

  /** (doc_id, px) → LSH band rows, one string key per (index, value). */
  private[graft] def bandRows(media: DataFrame): DataFrame =
    hashRows(media)
      .select(col("doc_id"), posexplode(col("bands")).as(Seq("j", "bv")))
      .select(concat(col("j").cast("string"), lit(":"),
        col("bv").cast("string")).as("band"), col("doc_id"))

  /** Build both index tables on the media source's CURRENT snapshot,
    * record the consumed version. Returns it. */
  def createIndex(s: SparkSession, catalog: String, srcIdent: String,
      hashIdent: String, bandIdent: String): Long = {
    val v0 = ManifestSink.currentVersion(tableRoot(s, catalog, srcIdent))
    s.sql(s"CREATE TABLE $catalog.$hashIdent (doc_id BIGINT, bands ARRAY<BIGINT>) " +
      "TBLPROPERTIES ('write.sort-by' = 'doc_id')")
    s.sql(s"CREATE TABLE $catalog.$bandIdent (band STRING, doc_id BIGINT) " +
      "TBLPROPERTIES ('write.sort-by' = 'band', 'bloom.columns' = 'band')")
    val snap = s.table(s"$catalog.$srcIdent")
      .select(col("doc_id"), col("px")).localCheckpoint()
    hashRows(snap).writeTo(s"$catalog.$hashIdent").append()
    bandRows(snap).writeTo(s"$catalog.$bandIdent").append()
    ManifestSink.alterSchema(tableRoot(s, catalog, bandIdent),
      Seq(TableChange.setProperty(SourceVersionProp, v0.toString)))
    v0
  }

  private def windowChanges(s: SparkSession, srcRoot: Path,
      from: Long, to: Long): DataFrame =
    s.read.format("graft.sources.ManifestSink")
      .option("path", srcRoot.toString)
      .option("changesFromVersion", from.toString)
      .option("changesToVersion", to.toString)
      .option("changeFeedMode", "cdc")
      .load()
      .select(col("doc_id"), col("px"), col("_change_type"))

  /** Apply one window (the q208 protocol: scrub erases the window's
    * partial inserts on recovery, appends land the inserts, equality
    * deletes retire the deletes from both arms — zero base-file
    * reads). A key both inserted and deleted in one window is refused. */
  private[sources] def applyWindowCdc(s: SparkSession, catalog: String,
      srcRoot: Path, hashIdent: String, bandIdent: String,
      from: Long, to: Long, scrub: Boolean = false): Unit = {
    val hashRoot = tableRoot(s, catalog, hashIdent)
    val bandRoot = tableRoot(s, catalog, bandIdent)
    val ch = windowChanges(s, srcRoot, from, to).localCheckpoint()
    val dels = ch.filter(col("_change_type") === "delete").select("doc_id")
    val ins = ch.filter(col("_change_type") === "insert")
      .select(col("doc_id"), col("px")).localCheckpoint()
    val insDel = ins.join(dels, Seq("doc_id"), "left_semi").limit(1).collect()
    require(insDel.isEmpty,
      s"refresh window ($from, $to] both inserts and deletes doc_id " +
        s"${insDel.headOption.map(_.getLong(0)).getOrElse(-1L)} — the change " +
        "feed carries no intra-window ordering; refresh with a narrower window")
    if (scrub) {
      MinHashIndexMaintenance.chunkedEqDelete(ins.select("doc_id"),
        "doc_id", Seq(hashRoot, bandRoot))
    }
    if (!ins.isEmpty) {
      hashRows(ins).writeTo(s"$catalog.$hashIdent").append()
      bandRows(ins).writeTo(s"$catalog.$bandIdent").append()
    }
    MinHashIndexMaintenance.chunkedEqDelete(dels, "doc_id",
      Seq(hashRoot, bandRoot))
  }

  private def finalizeWindow(bandRoot: Path, to: Long): Unit =
    ManifestSink.alterSchema(bandRoot, Seq(
      TableChange.setProperty(SourceVersionProp, to.toString),
      TableChange.removeProperty(CdcPendingProp)))

  private[sources] def recoverPendingCdc(s: SparkSession, catalog: String,
      srcIdent: String, hashIdent: String, bandIdent: String): Boolean = {
    val bandRoot = tableRoot(s, catalog, bandIdent)
    ManifestSink.readHeader(bandRoot).props.get(CdcPendingProp) match {
      case None => false
      case Some(p) =>
        val (pf, pt, vA) = PendingWindow.parse(p)
        PendingWindow.verifyPivot(bandRoot, CdcPendingProp, p, vA)
        applyWindowCdc(s, catalog, tableRoot(s, catalog, srcIdent),
          hashIdent, bandIdent, pf, pt, scrub = true)
        finalizeWindow(bandRoot, pt)
        true
    }
  }

  /** Refresh both tables from the rows changed since the last refresh.
    * Returns the source version the index now reflects. */
  def refreshCdc(s: SparkSession, catalog: String, srcIdent: String,
      hashIdent: String, bandIdent: String): Long = {
    val srcRoot = tableRoot(s, catalog, srcIdent)
    val bandRoot = tableRoot(s, catalog, bandIdent)
    recoverPendingCdc(s, catalog, srcIdent, hashIdent, bandIdent)
    val from = lastSourceVersion(s, catalog, bandIdent)
    val to = ManifestSink.currentVersion(srcRoot)
    if (to <= from) return from
    PendingWindow.stage(bandRoot, CdcPendingProp, from, to)
    applyWindowCdc(s, catalog, srcRoot, hashIdent, bandIdent, from, to)
    finalizeWindow(bandRoot, to)
    to
  }
}
