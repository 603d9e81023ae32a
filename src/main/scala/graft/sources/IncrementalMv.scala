package graft.sources

import java.nio.file.{Path, Paths}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Incrementally-maintained materialized views over manifest tables,
  * composed entirely from the engine's own public surfaces:
  *
  *   - the CHANGE FEED (`changesFromVersion`/`changesToVersion` read
  *     options) yields exactly the rows appended between two versions,
  *     with pure-append enforcement and `#rewrite` (OPTIMIZE) versions
  *     contributing nothing — see [[ManifestSink.addedEntries]];
  *   - MERGE INTO folds the delta aggregate into the view (count and
  *     per-column sums are the classic self-maintainable aggregates:
  *     new_state = old_state + delta, no access to history needed);
  *   - the free-form TBLPROPERTIES bag records the view's last-consumed
  *     source version (`mv.source-version`), so refresh is a pure
  *     function of durable table state — any job, any session, any
  *     machine can run the next refresh.
  *
  * Scale shape: a refresh reads ONLY the delta files (the spec proves it
  * physically by deleting the already-consumed files first) and touches
  * MV rows only for keys present in the delta (MERGE's runtime group
  * filter rewrites only matched files). At 100 TB with daily appends of
  * 0.1%, refresh cost is proportional to the DAY, not the decade.
  *
  * Delivery semantics: the MERGE commit and the property commit are two
  * CAS publishes, so a crash BETWEEN them leaves the pointer one window
  * behind and the next refresh re-applies that window — at-least-once,
  * the honest default for a two-table protocol without cross-table
  * transactions. Deployments needing exactly-once make the delta
  * aggregate idempotent (keyed by window id) or fence refreshers; a
  * cross-table commit is future work the format's CAS could support.
  *
  * Retractions: the refresh consumes the ROW change feed
  * (`changeFeedMode=cdc`), so MERGE-ON-READ deletes in the source fold
  * into the view as sign −1 row images and a key whose live count hits
  * zero leaves the view. Copy-on-write rewrites in the window still
  * fail LOUDLY inside the feed — their row diff is not reconstructible,
  * and silently skipping it would corrupt every downstream fold. */
object IncrementalMv {
  private val SourceVersionProp = "mv.source-version"

  private def warehouse(s: SparkSession, catalog: String): Path =
    Paths.get(s.conf.get(s"spark.sql.catalog.$catalog.warehouse"))

  private def tableRoot(s: SparkSession, catalog: String, ident: String): Path =
    ident.split('.').foldLeft(warehouse(s, catalog))(_.resolve(_))

  /** The view's last-consumed source version (0 = never refreshed). */
  def lastSourceVersion(s: SparkSession, catalog: String, mvIdent: String): Long =
    ManifestSink.readHeader(tableRoot(s, catalog, mvIdent))
      .props.getOrElse(SourceVersionProp, "0").toLong

  /** Refresh `mvIdent` (schema: keyCols, n BIGINT, sum_<c> per sumCol)
    * from the rows `srcIdent` appended since the last refresh. Returns
    * the source version the view now reflects; a no-op (source
    * unchanged) returns it without committing anything. */
  def refresh(s: SparkSession, catalog: String, srcIdent: String,
      mvIdent: String, keyCols: Seq[String], sumCols: Seq[String]): Long = {
    require(keyCols.nonEmpty, "an aggregate view needs at least one key column")
    val srcRoot = tableRoot(s, catalog, srcIdent)
    val from = lastSourceVersion(s, catalog, mvIdent)
    val to = ManifestSink.currentVersion(srcRoot)
    if (to <= from) return from

    // the delta: the ROW change feed for (from, to] — inserted rows
    // fold in with sign +1, merge-on-read DELETED row images with sign
    // -1 (count and sum are self-maintainable under retraction:
    // state' = state + Σ sign·x). Copy-on-write rewrites in the window
    // still fail loudly inside the feed — a silent skip would corrupt
    // the view. Only the delta files (and the delete positions' base
    // files) are ever read.
    val delta = s.read.format("graft.sources.ManifestSink")
      .option("path", srcRoot.toString)
      .option("changesFromVersion", from.toString)
      .option("changesToVersion", to.toString)
      .option("changeFeedMode", "cdc")
      .load()
      .withColumn("_sign",
        when(col("_change_type") === "delete", lit(-1L)).otherwise(lit(1L)))
    val aggs = sum(col("_sign")).as("n") +:
      sumCols.map(c => sum(col("_sign") * col(c)).as(s"sum_$c"))
    val view = s"mv_delta_${System.nanoTime()}"
    delta.groupBy(keyCols.map(col): _*).agg(aggs.head, aggs.tail: _*)
      .createOrReplaceTempView(view)

    val on = keyCols.map(k => s"t.$k = s.$k").mkString(" AND ")
    val updates = ("n = t.n + s.n" +:
      sumCols.map(c => s"sum_$c = t.sum_$c + s.sum_$c")).mkString(", ")
    // a key whose live count reaches zero leaves (or never enters) the
    // view — retractions must not strand n=0 tombstones, and a key
    // whose inserts and deletes fully cancel WITHIN one window must not
    // be inserted as one (the full recompute would not produce it)
    try s.sql(
      s"""MERGE INTO $catalog.$mvIdent t USING $view s ON $on
         |WHEN MATCHED AND t.n + s.n = 0 THEN DELETE
         |WHEN MATCHED THEN UPDATE SET $updates
         |WHEN NOT MATCHED AND s.n != 0 THEN INSERT *""".stripMargin)
    finally s.catalog.dropTempView(view)

    s.sql(s"ALTER TABLE $catalog.$mvIdent SET TBLPROPERTIES " +
      s"('$SourceVersionProp' = '$to')")
    to
  }
}
