package graft.sources

import java.nio.file.{Files, Path}

import scala.jdk.CollectionConverters._

import org.scalatest.funsuite.AnyFunSuite

/** Persisted SQL views on the DSv2 catalog ([[GraftCatalog]] as a
  * `ViewCatalog`): CREATE/REPLACE/ALTER/RENAME/DROP VIEW through plain
  * SQL, view text stored as a flat file beside the table directories,
  * re-resolved against CURRENT table data at every query — the
  * warehouse's lazy-SQL surface. */
class ViewCatalogSpec extends AnyFunSuite {
  // view wiring lives in the session extensions (GraftExtensions), so
  // this spec owns a dedicated session — same JVM/SparkContext,
  // separate session state (the ExtensionsSpec pattern)
  private lazy val spark: org.apache.spark.sql.SparkSession = {
    graft.TestSpark.spark // ensure the shared context exists first
    org.apache.spark.sql.SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .withExtensions(new graft.plans.GraftExtensions)
      .create()
  }

  private lazy val wh: Path = {
    val p = Files.createTempDirectory("graft-views")
    p.toFile.deleteOnExit()
    spark.conf.set("spark.sql.catalog.vcat", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.vcat.warehouse", p.toString)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS vcat.db")
    spark.sql("CREATE TABLE vcat.db.base (id BIGINT, grp STRING, v BIGINT)")
    spark.sql("INSERT INTO vcat.db.base SELECT id, concat('g', id % 3), id * 10 " +
      "FROM range(30)")
    p
  }

  test("a view resolves through SQL and tracks the table's CURRENT data") {
    wh
    spark.sql("CREATE VIEW vcat.db.sums AS " +
      "SELECT grp, sum(v) AS total, count(*) AS n FROM vcat.db.base GROUP BY grp")
    val before = spark.sql("SELECT * FROM vcat.db.sums ORDER BY grp").collect()
    assert(before.length == 3 && before.map(_.getAs[Long]("n")).sum == 30)
    // views are lazy SQL: new rows must be visible without re-creating
    spark.sql("INSERT INTO vcat.db.base VALUES (100, 'g0', 1000)")
    val after = spark.sql("SELECT * FROM vcat.db.sums ORDER BY grp").collect()
    assert(after.map(_.getAs[Long]("n")).sum == 31)
    assert(after.find(_.getString(0) == "g0").get.getAs[Long]("total")
      == before.find(_.getString(0) == "g0").get.getAs[Long]("total") + 1000)
  }

  test("column aliases apply and SHOW VIEWS lists the view") {
    wh
    spark.sql("CREATE VIEW vcat.db.aliased (a, b) AS SELECT id, v FROM vcat.db.base")
    assert(spark.sql("SELECT a, b FROM vcat.db.aliased WHERE a = 5").collect()
      .head.getAs[Long]("b") == 50L)
    val views = spark.sql("SHOW VIEWS IN vcat.db").collect().map(_.getString(1))
    assert(views.contains("aliased"))
  }

  test("views nest: a view over a view resolves") {
    wh
    spark.sql("CREATE VIEW IF NOT EXISTS vcat.db.sums AS " +
      "SELECT grp, sum(v) AS total, count(*) AS n FROM vcat.db.base GROUP BY grp")
    spark.sql("CREATE VIEW vcat.db.big AS " +
      "SELECT grp FROM vcat.db.sums WHERE total > 0")
    assert(spark.sql("SELECT * FROM vcat.db.big").count() == 3)
  }

  test("CREATE OR REPLACE swaps the definition atomically; DROP removes it") {
    wh
    spark.sql("CREATE VIEW vcat.db.tmp AS SELECT id FROM vcat.db.base")
    spark.sql("CREATE OR REPLACE VIEW vcat.db.tmp AS " +
      "SELECT id FROM vcat.db.base WHERE id < 5")
    assert(spark.sql("SELECT * FROM vcat.db.tmp").count() == 5)
    spark.sql("DROP VIEW vcat.db.tmp")
    assert(!spark.catalog.tableExists("vcat.db.tmp"))
    intercept[Exception](spark.sql("SELECT * FROM vcat.db.tmp").collect())
  }

  test("ALTER VIEW SET/UNSET TBLPROPERTIES round-trips; RENAME moves the file") {
    wh
    spark.sql("CREATE VIEW vcat.db.p AS SELECT id FROM vcat.db.base")
    spark.sql("ALTER VIEW vcat.db.p SET TBLPROPERTIES ('owner.note' = 'curation')")
    val cat = spark.sessionState.catalogManager.catalog("vcat")
      .asInstanceOf[GraftCatalog]
    val ident = org.apache.spark.sql.connector.catalog.Identifier
      .of(Array("db"), "p")
    assert(cat.loadView(ident).properties().get("owner.note") == "curation")
    spark.sql("ALTER VIEW vcat.db.p UNSET TBLPROPERTIES ('owner.note')")
    assert(!cat.loadView(ident).properties().containsKey("owner.note"))
    spark.sql("ALTER VIEW vcat.db.p RENAME TO db.p2")
    assert(spark.sql("SELECT * FROM vcat.db.p2").count() == 31 ||
      spark.sql("SELECT * FROM vcat.db.p2").count() == 30)
    assert(!cat.viewExists(ident))
  }

  test("bare RENAME stays in the source namespace; unknown target namespace refuses") {
    wh
    spark.sql("CREATE VIEW vcat.db.rn AS SELECT id FROM vcat.db.base")
    spark.sql("ALTER VIEW vcat.db.rn RENAME TO rn2")
    assert(spark.sql("SELECT * FROM vcat.db.rn2").count() >= 30,
      "a bare target name must stay in db, not move to the warehouse root")
    val ex = intercept[Exception](
      spark.sql("ALTER VIEW vcat.db.rn2 RENAME TO nodb.rn3"))
    assert(ex.toString.toLowerCase.contains("namespace"), s"got $ex")
  }

  test("temp views win over stored views; session-catalog references are not hijacked") {
    wh
    spark.sql("USE vcat.db")
    try {
      spark.sql("CREATE VIEW IF NOT EXISTS vcat.db.tshadow AS " +
        "SELECT id FROM vcat.db.base")
      // a TEMP view with the same bare name must take precedence
      spark.range(3).createOrReplaceTempView("tshadow")
      assert(spark.sql("SELECT * FROM tshadow").count() == 3,
        "temp view must shadow the stored catalog view")
      spark.catalog.dropTempView("tshadow")
      assert(spark.sql("SELECT * FROM tshadow").count() >= 30,
        "with the temp view gone, the stored view resolves")
      // an explicit session-catalog reference must not be routed to vcat
      val ex = intercept[Exception](
        spark.sql("DROP VIEW spark_catalog.default.never_existed"))
      assert(!ex.toString.contains("graft"), s"misrouted to the view catalog: $ex")
    } finally spark.sql("USE spark_catalog.default")
  }

  test("views and tables cannot shadow each other") {
    wh
    intercept[Exception](
      spark.sql("CREATE VIEW vcat.db.base AS SELECT 1 AS x"))
    spark.sql("CREATE VIEW vcat.db.vname AS SELECT 1 AS x")
    intercept[Exception](
      spark.sql("CREATE TABLE vcat.db.vname (id BIGINT)"))
  }

  test("an empty view namespace is refused on create, replace and rename") {
    wh
    // CREATE VIEW vcat.v: the head is consumed as the catalog, leaving
    // the namespace EMPTY — accepting it would land the .view file at
    // the warehouse ROOT (the namespace-exists check passes vacuously
    // because the root directory exists) where per-namespace SHOW VIEWS
    // can never list it
    val e = intercept[Exception](
      spark.sql("CREATE VIEW vcat.rootless AS SELECT 1 AS x"))
    assert(Iterator.iterate(e: Throwable)(_.getCause).takeWhile(_ != null).take(5)
      .exists(t => Option(t.getMessage).exists(_.contains("needs a namespace"))),
      s"unexpected failure: $e")
    intercept[Exception](
      spark.sql("CREATE OR REPLACE VIEW vcat.rootless AS SELECT 1 AS x"))
    val rootFiles = Files.list(wh)
    try assert(rootFiles.iterator().asScala
      .forall(p => !p.getFileName.toString.contains("rootless")),
      "no root-level view file may be created")
    finally rootFiles.close()
    // rename to a root-level target is the same hole through a side
    // door — SQL can't reach it (the bare-name rule keeps RENAME in the
    // source namespace) but the catalog API can
    spark.sql("CREATE VIEW vcat.db.mv AS SELECT 1 AS x")
    val cat = spark.sessionState.catalogManager.catalog("vcat")
      .asInstanceOf[org.apache.spark.sql.connector.catalog.ViewCatalog]
    import org.apache.spark.sql.connector.catalog.Identifier
    intercept[IllegalArgumentException](cat.renameView(
      Identifier.of(Array("db"), "mv"), Identifier.of(Array.empty, "rootless")))
    spark.sql("DROP VIEW vcat.db.mv")
  }
}
