package graft.sources

import java.nio.file.{Files, Path}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** DDL + DML against manifest tables BY NAME through [[GraftCatalog]]:
  * the full life cycle a SQL user drives — namespaces, CREATE/DROP/
  * RENAME, INSERT INTO / INSERT OVERWRITE, time travel, and the
  * invariant that by-name and by-path access observe the SAME committed
  * snapshot (the catalog adds resolution, never a second write path). */
class CatalogSpec extends AnyFunSuite {
  import graft.TestSpark.spark
  import spark.implicits._

  private val fmt = "graft.sources.ManifestSink"

  private val wh: Path = {
    val p = Files.createTempDirectory("graft-catalog")
    p.toFile.deleteOnExit()
    spark.conf.set("spark.sql.catalog.gcat", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.gcat.warehouse", p.toString)
    p
  }

  test("namespace + table DDL: create, list, duplicate-create loses, drop") {
    spark.sql("CREATE NAMESPACE gcat.ddl")
    spark.sql("CREATE TABLE gcat.ddl.t (id BIGINT, s STRING)")
    val shown = spark.sql("SHOW TABLES IN gcat.ddl").select("tableName")
      .as[String].collect().toSet
    assert(shown == Set("t"))
    intercept[Exception] { spark.sql("CREATE TABLE gcat.ddl.t (id BIGINT)") }
    spark.sql("DROP TABLE gcat.ddl.t")
    assert(spark.sql("SHOW TABLES IN gcat.ddl").count() == 0)
    intercept[Exception] { spark.table("gcat.ddl.t").count() }
  }

  test("INSERT INTO appends through the CAS; INSERT OVERWRITE truncates") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gcat.dml")
    spark.sql("CREATE TABLE gcat.dml.t (id BIGINT, s STRING)")
    spark.sql("INSERT INTO gcat.dml.t SELECT id, concat('a', id) FROM range(10)")
    spark.sql("INSERT INTO gcat.dml.t SELECT id, concat('b', id) FROM range(10, 25)")
    assert(spark.table("gcat.dml.t").count() == 25)
    spark.sql("INSERT OVERWRITE gcat.dml.t SELECT id, concat('c', id) FROM range(5)")
    val rows = spark.table("gcat.dml.t").as[(Long, String)].collect().toSet
    assert(rows == (0L until 5L).map(i => (i, s"c$i")).toSet)
  }

  test("SQL time travel: VERSION AS OF pins the snapshot an earlier commit published") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gcat.tt")
    spark.sql("CREATE TABLE gcat.tt.t (id BIGINT)") // v1: empty
    spark.sql("INSERT INTO gcat.tt.t SELECT id FROM range(10)") // v2
    spark.sql("INSERT INTO gcat.tt.t SELECT id FROM range(10, 30)") // v3
    assert(spark.sql("SELECT * FROM gcat.tt.t VERSION AS OF 2").count() == 10)
    assert(spark.sql("SELECT * FROM gcat.tt.t VERSION AS OF 1").count() == 0)
    assert(spark.table("gcat.tt.t").count() == 30)
  }

  test("ALTER TABLE RENAME moves the table; data and history survive") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gcat.mv")
    spark.sql("CREATE TABLE gcat.mv.a (id BIGINT)")
    spark.sql("INSERT INTO gcat.mv.a SELECT id FROM range(7)")
    // the RENAME target resolves inside the source's catalog: `mv.b`,
    // not `gcat.mv.b` (which would name a `gcat.mv` namespace IN gcat)
    spark.sql("ALTER TABLE gcat.mv.a RENAME TO mv.b")
    assert(spark.table("gcat.mv.b").count() == 7)
    intercept[Exception] { spark.table("gcat.mv.a").count() }
  }

  test("by-name and by-path reads observe the same committed snapshot") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gcat.px")
    spark.sql("CREATE TABLE gcat.px.t (id BIGINT, s STRING)")
    spark.sql("INSERT INTO gcat.px.t SELECT id, concat('x', id) FROM range(42)")
    val byName = spark.table("gcat.px.t")
    val byPath = spark.read.format(fmt)
      .option("path", wh.resolve("px").resolve("t").toString).load()
    assert(byName.exceptAll(byPath).isEmpty && byPath.exceptAll(byName).isEmpty)
    // a path-side append is immediately visible by name: one commit
    // protocol, two resolvers
    spark.range(42, 50).select(col("id"), lit("y").as("s"))
      .write.format(fmt)
      .option("path", wh.resolve("px").resolve("t").toString)
      .mode("append").save()
    assert(spark.table("gcat.px.t").count() == 50)
  }

  test("identity partitioning is accepted at CREATE; unknown transforms are rejected") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gcat.pt")
    // identity PARTITIONED BY (d): supported — PartitionedTableSpec
    // covers the write/prune behavior end to end
    spark.sql("CREATE TABLE gcat.pt.t (id BIGINT, d STRING) PARTITIONED BY (d)")
    assert(ManifestSink.partitionColumns(wh.resolve("pt").resolve("t"), None) == Seq("d"))
    // derived transforms route through their own machinery now
    // (HiddenPartitionSpec, BucketPartitionSpec); an unknown transform
    // still fails at CREATE instead of every later INSERT
    val e = intercept[Exception] {
      spark.sql("CREATE TABLE gcat.pt.t2 (id BIGINT, d STRING) PARTITIONED BY (years(d))")
    }
    assert(e.getMessage.contains("BIGINT"))
    // and a partition column must exist in the schema
    val e2 = intercept[Exception] {
      spark.sql("CREATE TABLE gcat.pt.t3 (id BIGINT) PARTITIONED BY (nope)")
    }
    assert(e2.getMessage.toLowerCase.contains("not in the table schema") ||
      e2.getMessage.toLowerCase.contains("nope"))
  }

  test("CALL gcat.system.vacuum previews by default, deletes on dry_run => false") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gcat.vac")
    spark.sql("CREATE TABLE gcat.vac.t (id BIGINT)")                       // v1
    spark.sql("INSERT INTO gcat.vac.t SELECT id FROM range(10)")           // v2
    spark.sql("INSERT OVERWRITE gcat.vac.t SELECT id FROM range(5)")       // v3: orphans v2's files
    val preview = spark.sql(
      "CALL gcat.system.vacuum(table => 'vac.t', retain => 1, grace_ms => 0)")
    val prows = preview.collect()
    assert(prows.nonEmpty && prows.forall(!_.getBoolean(3)), "default must be a dry run")
    assert(prows.count(_.getString(0) == "manifest") == 2, "v1+v2 manifests expirable")
    assert(prows.exists(_.getString(0) == "data"), "v2's data files orphaned")
    // preview touched nothing: expired-window time travel still works
    assert(spark.sql("SELECT * FROM gcat.vac.t VERSION AS OF 2").count() == 10)
    val swept = spark.sql("CALL gcat.system.vacuum(" +
      "table => 'vac.t', retain => 1, dry_run => false, grace_ms => 0)").collect()
    assert(swept.map(_.getString(1)).toSet == prows.map(_.getString(1)).toSet,
      "real pass must delete exactly the previewed set")
    assert(swept.forall(_.getBoolean(3)))
    assert(spark.table("gcat.vac.t").count() == 5)
    intercept[Exception] { spark.sql("SELECT * FROM gcat.vac.t VERSION AS OF 2").count() }
    // the procedure is discoverable and rejects unknown names
    intercept[Exception] { spark.sql("CALL gcat.system.nope()") }
  }

  test("t.history survives vacuum: expired versions are marked, not thrown") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gcat.vh")
    spark.sql("CREATE TABLE gcat.vh.t (id BIGINT)")                        // v1
    spark.sql("INSERT INTO gcat.vh.t SELECT id FROM range(10)")            // v2
    spark.sql("INSERT OVERWRITE gcat.vh.t SELECT id FROM range(5)")        // v3
    spark.sql("CALL gcat.system.vacuum(" +
      "table => 'vh.t', retain => 1, dry_run => false, grace_ms => 0)").collect()
    val hist = spark.sql(
      "SELECT version, operation FROM gcat.vh.t.history ORDER BY version")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toSeq
    assert(hist.map(_._1) == Seq(1L, 2L, 3L), s"got $hist")
    assert(hist.take(2).forall(_._2 == "expired"), s"got $hist")
    assert(hist.last._2 != "expired", s"got $hist")
  }
}
