package graft.sources

import java.nio.file.Path

import org.apache.spark.sql.connector.catalog.TableChange

/** The durable pending-window marker shared by every exactly-once
  * incremental refresher ([[IncrementalMv]], [[PostingsMaintenance]]):
  * one property whose value `from:to:v` records the source window being
  * folded AND the version the marker's own commit occupies — the pivot
  * crash recovery uses to decide whether the apply step landed (table
  * past v) or not (table still at v).
  *
  * Staking the marker must leave it recording its TRUE commit version.
  * `alterSchema` rebases on CAS conflicts, so a concurrent commit can
  * push the marker to a later version than predicted — a durable
  * marker with a stale version would make the next recovery misjudge
  * "apply landed" and silently skip the window. `stage` therefore
  * verifies the landing and RE-STAKES on a miss (the newer marker
  * overwrites the stale one); past the retry budget it best-effort
  * removes the marker and fails loudly — concurrent writers on a
  * refresher-owned table are a contract violation either way, and a
  * poisoned marker must not outlive the error. */
private[sources] object PendingWindow {

  def stage(root: Path, prop: String, from: Long, to: Long): Long = {
    var attempt = 0
    while (true) {
      attempt += 1
      val vNext = ManifestSink.currentVersion(root) + 1L
      ManifestSink.alterSchema(root,
        Seq(TableChange.setProperty(prop, s"$from:$to:$vNext")))
      val landed = ManifestSink.currentVersion(root)
      if (landed == vNext) return vNext
      if (attempt >= 5) {
        // do not leave a marker whose recorded version lies
        try ManifestSink.alterSchema(root,
          Seq(TableChange.removeProperty(prop)))
        catch { case _: Exception => () }
        throw new IllegalStateException(
          s"staging $prop on $root kept losing its version slot " +
            s"(predicted $vNext, landed $landed) — another writer is " +
            "committing to a refresher-owned table, which violates the " +
            "single-refresher contract exactly-once depends on")
      }
    }
    0L // unreachable
  }

  /** `from:to:v` of a durable marker. */
  def parse(value: String): (Long, Long, Long) = {
    val Array(f, t, v) = value.split(':').map(_.trim.toLong)
    (f, t, v)
  }

  /** Verify the marker really committed at its recorded version before
    * recovery trusts the pivot. `stage` predicts its slot and lands at
    * or after it, so a marker PRESENT at vA with this exact value
    * committed exactly there; ABSENT at a retained vA means a crash
    * landed it later with a stale recorded version — recovery would
    * misjudge "apply landed" and silently skip the window, so fail
    * LOUDLY for manual adjudication instead. Expired history verifies
    * vacuously (best effort). */
  def verifyPivot(root: Path, prop: String, value: String, vA: Long): Unit = {
    val atVA: Option[Option[String]] =
      try Some(ManifestSink.readHeader(root, Some(vA)).props.get(prop))
      catch {
        // ONLY expired history verifies vacuously — a transient read
        // failure must not slip past the stale-marker check (that would
        // re-open the silent-skip hole this method closes)
        case _: java.nio.file.NoSuchFileException => None
        case e: IllegalArgumentException
          if Option(e.getMessage).exists(_.contains("does not exist")) => None
      }
    atVA.foreach { got =>
      require(got.contains(value),
        s"pending marker $prop='$value' claims version $vA of $root, but " +
          s"that version records ${got.getOrElse("no marker")} — the marker " +
          "is STALE (crash mid-staging under concurrent commits, a " +
          "single-refresher contract violation). Decide manually whether " +
          "the window was applied, then clear or restore the marker.")
    }
  }
}
