package graft.sources

import java.nio.file.{Files, Path}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** ALTER TABLE SET/UNSET TBLPROPERTIES on the live knobs — delete.mode,
  * bloom.columns, write.sort-by — plus SHOW TBLPROPERTIES visibility.
  * Switching delete.mode flips the strategy for FUTURE deletes only;
  * bloom.columns affects future files (older files stay conservative
  * may-match); a property-only ALTER must not bump the schema epoch. */
class TablePropertiesSpec extends AnyFunSuite {
  import graft.TestSpark.spark
  import spark.implicits._

  private val wh: Path = {
    val p = Files.createTempDirectory("graft-props")
    p.toFile.deleteOnExit()
    spark.conf.set("spark.sql.catalog.prcat", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.prcat.warehouse", p.toString)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS prcat.db")
    p
  }
  private def root(t: String): Path = wh.resolve("db").resolve(t)
  private def entries(t: String): Seq[ManifestSink.FileEntry] =
    ManifestSink.committedEntries(root(t), None)

  test("SET delete.mode switches strategy for future deletes; UNSET restores CoW") {
    spark.sql("CREATE TABLE prcat.db.dm (id BIGINT, v BIGINT)")
    spark.range(0, 10).select($"id", $"id".as("v"))
      .coalesce(1).writeTo("prcat.db.dm").append()
    spark.sql("DELETE FROM prcat.db.dm WHERE id = 0") // CoW: file rewritten
    assert(entries("dm").forall(_.dvName.isEmpty))
    spark.sql("ALTER TABLE prcat.db.dm SET TBLPROPERTIES ('delete.mode' = 'merge-on-read')")
    spark.sql("DELETE FROM prcat.db.dm WHERE id = 1") // MoR: DV sidecar
    assert(entries("dm").exists(_.dvRows == 1L))
    spark.sql("ALTER TABLE prcat.db.dm UNSET TBLPROPERTIES ('delete.mode')")
    spark.sql("DELETE FROM prcat.db.dm WHERE id = 2") // CoW again: DV purged by rewrite
    assert(entries("dm").forall(_.dvName.isEmpty))
    assert(spark.table("prcat.db.dm").count() == 7L)
  }

  test("SET bloom.columns starts collecting on future files only") {
    spark.sql("CREATE TABLE prcat.db.bl (id BIGINT, cat STRING)")
    spark.range(0, 5).select($"id", lit("old").as("cat"))
      .coalesce(1).writeTo("prcat.db.bl").append()
    spark.sql("ALTER TABLE prcat.db.bl SET TBLPROPERTIES ('bloom.columns' = 'cat')")
    spark.range(5, 10).select($"id", lit("new").as("cat"))
      .coalesce(1).writeTo("prcat.db.bl").append()
    val es = entries("bl")
    assert(es.count(_.blooms.contains("cat")) == 1, s"got $es")
    // pruning stays correct: the bloomless old file is excluded anyway
    // by its truncated string BOUNDS ([old, old] cannot hold "new"), so
    // only the new file is a candidate and the right rows are deleted
    import org.apache.spark.sql.sources.EqualTo
    val res = ManifestSink.deleteWhere(root("bl").toString, Seq(EqualTo("cat", "new")))
    assert(res.candidateFiles == 1 && res.deletedRows == 5L, s"got $res")
  }

  test("a property-only ALTER does not bump the schema epoch") {
    spark.sql("CREATE TABLE prcat.db.se (id BIGINT, v BIGINT)")
    spark.sql("ALTER TABLE prcat.db.se SET TBLPROPERTIES ('write.sort-by' = 'id')")
    assert(ManifestSink.schemaEpoch(root("se")) == 0L,
      "property changes must not force per-file footer probing")
    spark.sql("ALTER TABLE prcat.db.se ADD COLUMN w BIGINT")
    assert(ManifestSink.schemaEpoch(root("se")) == 1L)
  }

  test("SHOW TBLPROPERTIES reflects the live settings") {
    spark.sql("CREATE TABLE prcat.db.sp (id BIGINT, cat STRING) " +
      "TBLPROPERTIES ('delete.mode' = 'merge-on-read', 'bloom.columns' = 'cat')")
    val props = spark.sql("SHOW TBLPROPERTIES prcat.db.sp")
      .as[(String, String)].collect().toMap
    assert(props.get("delete.mode").contains("merge-on-read"))
    assert(props.get("bloom.columns").contains("cat"))
    spark.sql("ALTER TABLE prcat.db.sp UNSET TBLPROPERTIES ('bloom.columns')")
    val props2 = spark.sql("SHOW TBLPROPERTIES prcat.db.sp")
      .as[(String, String)].collect().toMap
    assert(!props2.contains("bloom.columns"))
  }

  test("bad values on the live knobs fail loudly") {
    spark.sql("CREATE TABLE prcat.db.bad (id BIGINT, v BIGINT)")
    intercept[Exception] {
      spark.sql("ALTER TABLE prcat.db.bad SET TBLPROPERTIES ('delete.mode' = 'sideways')")
    }
    intercept[Exception] { // v is BIGINT, blooms are string-only
      spark.sql("ALTER TABLE prcat.db.bad SET TBLPROPERTIES ('bloom.columns' = 'v')")
    }
  }

  test("free-form properties store, survive commits, show and unset") {
    spark.sql("CREATE TABLE prcat.db.fp (id BIGINT) " +
      "TBLPROPERTIES ('team' = 'data-eng', 'mv.source-version' = '0')")
    def props(): Map[String, String] =
      spark.sql("SHOW TBLPROPERTIES prcat.db.fp").collect()
        .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(props().get("team").contains("data-eng"))
    spark.sql("ALTER TABLE prcat.db.fp SET TBLPROPERTIES ('mv.source-version' = '7')")
    // an unrelated commit must carry the bag forward untouched
    spark.sql("INSERT INTO prcat.db.fp SELECT id FROM range(3)")
    assert(props().get("mv.source-version").contains("7"))
    assert(props().get("team").contains("data-eng"))
    spark.sql("ALTER TABLE prcat.db.fp UNSET TBLPROPERTIES ('team')")
    assert(!props().contains("team"))
    // property values publish atomically with the manifest: a pinned
    // (time-travel) read reports the pinned version's value
    val vNow = ManifestSink.currentVersion(root("fp"))
    spark.sql("ALTER TABLE prcat.db.fp SET TBLPROPERTIES ('mv.source-version' = '9')")
    assert(props().get("mv.source-version").contains("9"))
    val pinned = new ManifestTable(root("fp"),
      ManifestSink.readSchema(root("fp"), Some(vNow)), pinned = Some(vNow))
    assert(pinned.properties().get("mv.source-version") == "7")
  }
}
