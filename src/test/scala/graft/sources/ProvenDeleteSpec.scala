package graft.sources

import java.nio.file.{Files, Path}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Metadata-only partition deletes: when the partition tuple alone
  * proves every row of a file matches the DELETE predicate, the entry
  * drops without the file being OPENED — proven here by physically
  * removing the data file first, so any read attempt would throw. This
  * is the 100 TB partition-retirement path (`DELETE WHERE day = ...`
  * as a pure metadata commit). Mixed predicates that also reference
  * non-partition columns must fall back to the row path. */
class ProvenDeleteSpec extends AnyFunSuite {
  import graft.TestSpark.spark
  import spark.implicits._

  private val wh: Path = {
    val p = Files.createTempDirectory("graft-proven")
    p.toFile.deleteOnExit()
    spark.conf.set("spark.sql.catalog.pvcat", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.pvcat.warehouse", p.toString)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS pvcat.db")
    p
  }
  private def root(t: String): Path = wh.resolve("db").resolve(t)
  private def entries(t: String): Seq[ManifestSink.FileEntry] =
    ManifestSink.committedEntries(root(t), None)

  private def mkPartTable(t: String, props: String = ""): Unit = {
    spark.sql(s"CREATE TABLE pvcat.db.$t (id BIGINT, grp STRING) " +
      s"PARTITIONED BY (grp) $props")
    spark.sql(s"INSERT INTO pvcat.db.$t " +
      "SELECT id, CASE WHEN id % 2 = 0 THEN 'even' ELSE 'odd' END FROM range(20)")
  }
  private def rmPartitionFiles(t: String, grp: String): Unit =
    entries(t).filter(_.parts.get("grp").contains(grp))
      .foreach(e => Files.delete(root(t).resolve(e.name)))

  test("direct CoW API: partition delete is metadata-only (file already gone)") {
    mkPartTable("c1")
    rmPartitionFiles("c1", "even") // a read would now throw NoSuchFileException
    import org.apache.spark.sql.sources.EqualTo
    val res = ManifestSink.deleteWhere(root("c1").toString, Seq(EqualTo("grp", "even")))
    assert(res.provenFiles > 0 && res.deletedRows == 10L, s"got $res")
    assert(spark.table("pvcat.db.c1").select($"id").as[Long].collect().sorted.toSeq ==
      (0L until 20L).filter(_ % 2 == 1))
  }

  test("SQL DELETE (V2 path): partition equality is proven, no file opened") {
    mkPartTable("c2")
    rmPartitionFiles("c2", "odd")
    spark.sql("DELETE FROM pvcat.db.c2 WHERE grp = 'odd'")
    assert(spark.table("pvcat.db.c2").select($"id").as[Long].collect().sorted.toSeq ==
      (0L until 20L).filter(_ % 2 == 0))
    assert(entries("c2").forall(_.parts.get("grp").contains("even")))
  }

  test("SQL DELETE on a merge-on-read table: partition drop needs no DV") {
    mkPartTable("m1", "TBLPROPERTIES ('delete.mode' = 'merge-on-read')")
    rmPartitionFiles("m1", "even")
    spark.sql("DELETE FROM pvcat.db.m1 WHERE grp = 'even'")
    val es = entries("m1")
    assert(es.forall(e => e.dvName.isEmpty && e.parts.get("grp").contains("odd")),
      s"a proven partition drop must not write vectors: $es")
    assert(spark.table("pvcat.db.m1").count() == 10L)
  }

  test("mixed predicate falls back to the row path") {
    mkPartTable("c3")
    import org.apache.spark.sql.sources.{And, EqualTo, GreaterThanOrEqual}
    val res = ManifestSink.deleteWhere(root("c3").toString,
      Seq(And(EqualTo("grp", "even"), GreaterThanOrEqual("id", 10L))))
    assert(res.provenFiles == 0, s"id is not a partition column: $res")
    assert(res.deletedRows == 5L)
    assert(spark.table("pvcat.db.c3").count() == 15L)
  }

  test("DELETE without WHERE on an unpartitioned table drops all entries metadata-only") {
    spark.sql("CREATE TABLE pvcat.db.c4 (id BIGINT, v BIGINT)")
    spark.sql("INSERT INTO pvcat.db.c4 SELECT id, id FROM range(10)")
    entries("c4").foreach(e => Files.delete(root("c4").resolve(e.name)))
    import org.apache.spark.sql.sources.AlwaysTrue
    val res = ManifestSink.deleteWhere(root("c4").toString, Seq(AlwaysTrue()))
    assert(res.provenFiles > 0 && res.deletedRows == 10L, s"got $res")
    assert(spark.table("pvcat.db.c4").count() == 0L)
  }
}
