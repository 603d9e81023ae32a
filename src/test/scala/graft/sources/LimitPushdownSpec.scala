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
