package graft.sources

import java.nio.file.{Files, Path}

import org.scalatest.funsuite.AnyFunSuite

/** LIMIT pushdown plans a file-count PREFIX of the manifest: the proofs
  * delete every file past the prefix and show the limited read still
  * answers — and that the prefix arithmetic is exact at the boundary. */
class LimitPushdownSpec extends AnyFunSuite {
  import graft.TestSpark.spark
  import spark.implicits._

  private val wh: Path = {
    val p = Files.createTempDirectory("graft-lim")
    p.toFile.deleteOnExit()
    spark.conf.set("spark.sql.catalog.limc", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.limc.warehouse", p.toString)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS limc.db")
    p
  }
  private def root(t: String): Path = wh.resolve("db").resolve(t)

  test("LIMIT opens a row-covering file prefix, never the table") {
    spark.sql("CREATE TABLE limc.db.t (id BIGINT, v BIGINT)")
    (0 until 5).foreach { i => // five 10-row files, in commit order
      spark.range(i * 10, i * 10 + 10).select($"id", ($"id" * 2).as("v"))
        .coalesce(1).writeTo("limc.db.t").append()
    }
    val entries = ManifestSink.committedEntries(root("t"), None)
    assert(entries.size == 5 && entries.forall(_.rows == 10L))
    // physically destroy everything past the FIRST file
    entries.drop(1).foreach(e => Files.delete(root("t").resolve(e.name)))
    // limits the first file covers still answer...
    assert(spark.table("limc.db.t").limit(5).collect().length == 5)
    assert(spark.sql("SELECT * FROM limc.db.t LIMIT 10").collect().length == 10)
    // ...the boundary is exact: one row more needs the (deleted) second file
    intercept[Exception] {
      spark.sql("SELECT * FROM limc.db.t LIMIT 11").collect()
    }
    // and an unlimited read needs them all
    intercept[Exception] { spark.table("limc.db.t").collect() }
  }

  test("a filtered LIMIT never file-prunes by row count (unsound with filters)") {
    spark.sql("CREATE TABLE limc.db.f (id BIGINT, v BIGINT)")
    (0 until 3).foreach { i =>
      spark.range(i * 10, i * 10 + 10).select($"id", $"id".as("v"))
        .coalesce(1).writeTo("limc.db.f").append()
    }
    // the only v=25 row lives in the LAST file; a count-prefix push
    // under the filter would return nothing
    val got = spark.table("limc.db.f").filter($"v" === 25L).limit(1)
      .as[(Long, Long)].collect().toSeq
    assert(got == Seq((25L, 25L)))
  }

  test("ORDER BY + LIMIT prunes by the stats threshold — both directions, physically") {
    spark.sql("CREATE TABLE limc.db.ts (ts BIGINT NOT NULL, v BIGINT)")
    (0 until 5).foreach { i => // five files with disjoint ts ranges
      spark.range(i * 10, i * 10 + 10).select($"id".as("ts"), ($"id" * 7).as("v"))
        .coalesce(1).writeTo("limc.db.ts").append()
    }
    val entries = ManifestSink.committedEntries(root("ts"), None)
    assert(entries.size == 5)
    // ASC top-5 needs only the first range; destroy everything else
    entries.filter(_.mins("ts") >= 10L)
      .foreach(e => Files.delete(root("ts").resolve(e.name)))
    assert(spark.sql("SELECT ts FROM limc.db.ts ORDER BY ts LIMIT 5")
      .as[Long].collect().toSeq == (0L until 5L))
    // boundary: top-11 crosses into the (deleted) second file
    intercept[Exception] {
      spark.sql("SELECT ts FROM limc.db.ts ORDER BY ts LIMIT 11").collect()
    }

    // DESC mirror on a fresh table
    spark.sql("CREATE TABLE limc.db.tsd (ts BIGINT NOT NULL)")
    (0 until 5).foreach { i =>
      spark.range(i * 10, i * 10 + 10).select($"id".as("ts"))
        .coalesce(1).writeTo("limc.db.tsd").append()
    }
    ManifestSink.committedEntries(root("tsd"), None).filter(_.maxs("ts") < 40L)
      .foreach(e => Files.delete(root("tsd").resolve(e.name)))
    assert(spark.sql("SELECT ts FROM limc.db.tsd ORDER BY ts DESC LIMIT 5")
      .as[Long].collect().toSeq == (45L to 49L).reverse)
  }

  test("top-N refuses nullable sort keys and stays exact on overlapping ranges") {
    // nullable ts: NULLS sort first and stats cannot see them — the
    // push must refuse, and the null row must surface
    spark.sql("CREATE TABLE limc.db.tn (ts BIGINT, v BIGINT)")
    spark.range(0, 10).select($"id".as("ts"), $"id".as("v"))
      .coalesce(1).writeTo("limc.db.tn").append()
    spark.sql("INSERT INTO limc.db.tn VALUES (NULL, 99)")
    val first = spark.sql("SELECT v FROM limc.db.tn ORDER BY ts LIMIT 1")
      .as[Long].head()
    assert(first == 99L, "the NULL-ts row sorts first and must not be pruned away")

    // overlapping file ranges: threshold keeps every file that can
    // intersect the top-k — values must be exact
    spark.sql("CREATE TABLE limc.db.tov (ts BIGINT NOT NULL)")
    Seq((0L, 20L), (5L, 25L), (30L, 40L)).foreach { case (a, b) =>
      spark.range(a, b).select($"id".as("ts"))
        .coalesce(1).writeTo("limc.db.tov").append()
    }
    assert(spark.sql("SELECT ts FROM limc.db.tov ORDER BY ts LIMIT 8")
      .as[Long].collect().toSeq == Seq(0L, 1L, 2L, 3L, 4L, 5L, 5L, 6L))
  }

  test("top-N stays sound with a Long.MinValue sentinel in the sort key") {
    // regression: the old descending mirror negated mins, and
    // -Long.MinValue overflows back to itself — an unsound threshold
    // that pruned files holding true top rows
    spark.sql("CREATE TABLE limc.db.sen (ts BIGINT NOT NULL)")
    Seq(Seq(Long.MinValue, 5L), Seq(100L, 200L), Seq(300L, 400L)).foreach { vs =>
      vs.toDF("ts").coalesce(1).writeTo("limc.db.sen").append()
    }
    assert(spark.sql("SELECT ts FROM limc.db.sen ORDER BY ts DESC LIMIT 2")
      .as[Long].collect().toSeq == Seq(400L, 300L))
    assert(spark.sql("SELECT ts FROM limc.db.sen ORDER BY ts LIMIT 2")
      .as[Long].collect().toSeq == Seq(Long.MinValue, 5L))
  }

  test("limit pushdown respects deletion vectors (live rows, not physical)") {
    spark.sql("CREATE TABLE limc.db.d (id BIGINT) " +
      "TBLPROPERTIES ('delete.mode' = 'merge-on-read')")
    (0 until 2).foreach { i =>
      spark.range(i * 10, i * 10 + 10).select($"id")
        .coalesce(1).writeTo("limc.db.d").append()
    }
    // kill 5 of the first file's rows: LIMIT 10 must now span TWO files
    spark.sql("DELETE FROM limc.db.d WHERE id < 5")
    val rows = spark.sql("SELECT * FROM limc.db.d LIMIT 10").collect()
    assert(rows.length == 10)
    assert(rows.map(_.getLong(0)).toSet.subsetOf((5L until 20L).toSet))
  }
}
