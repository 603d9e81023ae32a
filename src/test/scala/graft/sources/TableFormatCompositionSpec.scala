package graft.sources

import java.nio.file.{Files, Path}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The table-format features COMPOSED on one table: partitioned +
  * bloom columns + merge-on-read deletes + ALTER + OPTIMIZE + rollback
  * + history, with the logical row set checked after every step. Each
  * feature's own spec proves it in isolation; this one proves the
  * interactions — a DV surviving an ALTER, blooms surviving a rename,
  * OPTIMIZE purging vectors inside partitions, rollback across all of
  * it, and a stream applying the final state. */
class TableFormatCompositionSpec extends AnyFunSuite {
  import graft.TestSpark.spark
  import spark.implicits._

  private val wh: Path = {
    val p = Files.createTempDirectory("graft-compose")
    p.toFile.deleteOnExit()
    spark.conf.set("spark.sql.catalog.xcat", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.xcat.warehouse", p.toString)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS xcat.db")
    p
  }
  private def root: Path = wh.resolve("db").resolve("t")
  private def entries: Seq[ManifestSink.FileEntry] =
    ManifestSink.committedEntries(root, None)
  private def snapshot: Set[(Long, String, String, String)] =
    spark.table("xcat.db.t")
      .select($"id", $"grp", coalesce($"cat", lit("-")), coalesce($"note", lit("-")))
      .as[(Long, String, String, String)].collect().toSet

  // the model: what the table SHOULD hold, maintained alongside
  private var model = Map.empty[Long, (String, String, String)]
  private def expectModel(): Unit =
    assert(snapshot == model.map { case (id, (g, c, n)) => (id, g, c, n) }.toSet)

  test("one table, every feature, invariants at each step") {
    // partitioned + bloom + merge-on-read from the start (note is added
    // later by ALTER)
    spark.sql("CREATE TABLE xcat.db.t (id BIGINT, grp STRING, cat STRING) " +
      "PARTITIONED BY (grp) " +
      "TBLPROPERTIES ('delete.mode' = 'merge-on-read', 'bloom.columns' = 'cat')")

    // v2: seed 40 rows across 2 partitions × 2 categories
    spark.range(0, 40).select($"id",
        when($"id" % 2 === 0, "east").otherwise("west").as("grp"),
        when($"id" % 4 < 2, "red").otherwise("blue").as("cat"))
      .writeTo("xcat.db.t").append()
    model = (0L until 40L).map(i => i ->
      ((if (i % 2 == 0) "east" else "west",
        if (i % 4 < 2) "red" else "blue", "-"))).toMap
    spark.sql("ALTER TABLE xcat.db.t ADD COLUMN note STRING") // v3
    expectModel()

    // v4: MoR delete hits only blue files (bloom-pruned candidates)
    spark.sql("DELETE FROM xcat.db.t WHERE cat = 'blue' AND id < 10")
    model = model.filterNot { case (id, (_, c, _)) => c == "blue" && id < 10 }
    expectModel()
    assert(entries.exists(_.dvRows > 0L), "expected deletion vectors")
    assert(entries.forall(e => e.blooms.contains("cat")),
      "blooms must survive the ALTER")

    // v5: gen-2 rows carry the ALTERed column
    spark.range(100, 110).select($"id", lit("east").as("grp"),
        lit("green").as("cat"), concat(lit("n"), $"id").as("note"))
      .writeTo("xcat.db.t").append()
    model ++= (100L until 110L).map(i => i -> (("east", "green", s"n$i")))
    expectModel()

    // a stored VIEW joins the journey from here: lazy SQL re-resolved
    // against the CURRENT snapshot, so every maintenance step below
    // must be visible through it with zero view-side action
    spark.sql("CREATE VIEW xcat.db.vsum AS " +
      "SELECT grp, count(*) AS n, sum(id) AS sum_id FROM xcat.db.t GROUP BY grp")
    def viewModel(): Unit = {
      val got = spark.sql("SELECT * FROM xcat.db.vsum").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
      val want = model.toSeq.groupBy(_._2._1).map { case (g, rows) =>
        (g, rows.size.toLong, rows.map(_._1).sum) }.toSet
      assert(got == want, s"view drifted from the model: $got vs $want")
    }
    viewModel()

    // v6: UPDATE (CoW rewrite) — stats-pruned to the green file only
    // (ids 100+), so the seed files' deletion vectors SURVIVE the
    // rewrite and OPTIMIZE gets to purge them later
    spark.sql("UPDATE xcat.db.t SET note = 'u' WHERE id >= 100 AND id < 105")
    model = model.map { case (id, (g, c, n)) =>
      id -> ((g, c, if (id >= 100 && id < 105) "u" else n)) }
    expectModel()
    viewModel() // CoW UPDATE visible through the view
    assert(entries.exists(_.dvRows > 0L),
      "the pruned UPDATE must not have touched the DV'd seed files")

    // v7: RENAME the bloom/pruning column; everything keeps working
    spark.sql("ALTER TABLE xcat.db.t RENAME COLUMN cat TO category")
    assert(spark.table("xcat.db.t").filter($"category" === "green").count() == 10L)
    assert(ManifestSink.bloomColumns(root, None) == Seq("category"))
    viewModel() // the view's columns survived the rename untouched

    // v8: metadata-only partition retirement — no file opened
    spark.sql("DELETE FROM xcat.db.t WHERE grp = 'west'")
    model = model.filterNot { case (_, (g, _, _)) => g == "west" }
    assert(spark.table("xcat.db.t")
      .select($"id", $"grp", coalesce($"category", lit("-")), coalesce($"note", lit("-")))
      .as[(Long, String, String, String)].collect().toSet ==
      model.map { case (id, (g, c, n)) => (id, g, c, n) }.toSet)
    assert(entries.forall(_.parts.get("grp").contains("east")))
    viewModel() // metadata-only partition retirement visible lazily

    // v9: OPTIMIZE purges the remaining vectors, preserves live rows,
    // keeps files inside partitions, keeps blooms prunable
    val before = spark.table("xcat.db.t").count()
    val res = ManifestSink.compact(root.toString, targetRows = 1000L)
    assert(res.rewrittenFiles > 0)
    assert(entries.forall(_.dvName.isEmpty), "OPTIMIZE must purge DVs")
    assert(spark.table("xcat.db.t").count() == before)
    assert(entries.forall(_.parts.get("grp").contains("east")))
    viewModel() // the rewrite changed layout, never view-visible rows

    // history reflects the whole journey, live counts consistent
    val hist = spark.sql(
      "SELECT version, operation, live_rows FROM xcat.db.t.history ORDER BY version")
      .as[(Long, String, Long)].collect().toSeq
    assert(hist.map(_._2) == Seq("create", "append", "alter", "delete",
      "append", "replace", "alter", "delete", "optimize"), s"got $hist")
    assert(hist.last._3 == before)
    // optimize preserved live rows exactly (the rewrite-version check)
    assert(hist(8)._3 == hist(7)._3)

    // rollback to v5 (pre-UPDATE, pre-rename, both partitions alive)
    spark.sql("CALL xcat.system.rollback(table => 'db.t', version => 5)")
    val restored = spark.table("xcat.db.t")
      .select($"id", $"grp", coalesce($"cat", lit("-")), coalesce($"note", lit("-")))
      .as[(Long, String, String, String)].collect().toSet
    // v5's model: post-blue-delete seed rows (note '-') + green rows
    val v5Model = ((0L until 40L).filterNot(i => i % 4 >= 2 && i < 10).map(i =>
      (i, if (i % 2 == 0) "east" else "west",
        if (i % 4 < 2) "red" else "blue", "-")) ++
      (100L until 110L).map(i => (i, "east", "green", s"n$i"))).toSet
    assert(restored == v5Model)
    // v5's deletion vectors came back with it
    assert(entries.exists(_.dvRows > 0L), "rollback must restore DV refs")

    // and the restored table still takes writes + reads through streams
    spark.range(200, 203).select($"id", lit("east").as("grp"),
        lit("red").as("cat"), lit(null).cast("string").as("note"))
      .writeTo("xcat.db.t").append()
    val out = Files.createTempDirectory("graft-compose-stream")
    out.toFile.deleteOnExit()
    val q = spark.readStream.format("graft.sources.ManifestSink")
      .option("path", root.toString).load()
      .writeStream.format("parquet")
      .option("path", s"$out/data").option("checkpointLocation", s"$out/ckpt")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination(60000)
    assert(spark.read.parquet(s"$out/data").count() ==
      spark.table("xcat.db.t").count(),
      "snapshot-first stream must deliver the current live rows")

    // the view tracked rollback + the post-rollback append too: compare
    // against a direct recompute of the restored-and-extended table
    val viewNow = spark.sql("SELECT * FROM xcat.db.vsum").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val tableNow = spark.table("xcat.db.t").groupBy("grp")
      .agg(count(lit(1)).as("n"), sum($"id").as("sum_id")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(viewNow == tableNow, "view must reflect the rolled-back state")

    // partition pruning THROUGH a view, physically proven: delete every
    // west data file — a view read that opened them would throw
    spark.sql("CREATE VIEW xcat.db.veast AS " +
      "SELECT id FROM xcat.db.t WHERE grp = 'east'")
    val eastCount = spark.table("xcat.db.t").filter($"grp" === "east").count()
    entries.filterNot(_.parts.get("grp").contains("east"))
      .foreach(e => Files.delete(root.resolve(e.name)))
    assert(spark.sql("SELECT * FROM xcat.db.veast").count() == eastCount,
      "the view's stored predicate must prune the deleted partition's files")
  }
}
