package graft.sources

import java.nio.file.{Files, Path}

import org.scalatest.funsuite.AnyFunSuite

/** CHECK constraints (the Delta shape, through Spark 4's connector
  * constraint API): `ALTER TABLE ... ADD CONSTRAINT c CHECK (...)`
  * validates EXISTING rows with a scan before persisting; afterwards
  * the table reports the constraint as enforced and Spark injects a
  * CheckInvariant into every write — a violating INSERT/UPDATE fails
  * row-exactly, a valid one commits. The constraint rides a reserved
  * table property, so it survives commits, compaction and time travel
  * like any table structure. */
class ConstraintSpec extends AnyFunSuite {
  import graft.TestSpark.spark

  private val wh: Path = {
    val p = Files.createTempDirectory("graft-constraint")
    p.toFile.deleteOnExit()
    spark.conf.set("spark.sql.catalog.conscat", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.conscat.warehouse", p.toString)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS conscat.db")
    p
  }

  test("violating INSERTs fail row-exactly; valid ones commit; DROP re-opens the gate") {
    spark.sql("CREATE TABLE conscat.db.c1 (id BIGINT, v BIGINT)")
    spark.sql("INSERT INTO conscat.db.c1 VALUES (1, 10)")
    spark.sql("ALTER TABLE conscat.db.c1 ADD CONSTRAINT positive CHECK (v > 0)")
    intercept[Exception] {
      spark.sql("INSERT INTO conscat.db.c1 VALUES (2, -5)")
    }
    // the failed insert left nothing behind
    assert(spark.sql("SELECT count(*) FROM conscat.db.c1").collect().head.getLong(0) == 1L)
    spark.sql("INSERT INTO conscat.db.c1 VALUES (3, 30)")
    assert(spark.sql("SELECT sum(v) FROM conscat.db.c1").collect().head.getLong(0) == 40L)
    spark.sql("ALTER TABLE conscat.db.c1 DROP CONSTRAINT positive")
    spark.sql("INSERT INTO conscat.db.c1 VALUES (4, -1)") // legal again
    assert(spark.sql("SELECT count(*) FROM conscat.db.c1").collect().head.getLong(0) == 3L)
  }

  test("ADD CONSTRAINT scans existing rows and refuses when they violate") {
    spark.sql("CREATE TABLE conscat.db.c2 (id BIGINT, v BIGINT)")
    spark.sql("INSERT INTO conscat.db.c2 VALUES (1, -7)")
    val e = intercept[Exception] {
      spark.sql("ALTER TABLE conscat.db.c2 ADD CONSTRAINT positive CHECK (v > 0)")
    }
    // the constraint must NOT have been persisted
    assert(ManifestSink.constraintsOf(
      ManifestSink.readHeader(wh.resolve("db").resolve("c2")).props).isEmpty,
      s"constraint persisted despite violating rows: $e")
    spark.sql("INSERT INTO conscat.db.c2 VALUES (2, -8)") // still unconstrained
  }

  test("constraints survive commits and UPDATEs enforce them") {
    spark.sql("CREATE TABLE conscat.db.c3 (id BIGINT, v BIGINT)")
    spark.sql("INSERT INTO conscat.db.c3 VALUES (1, 10), (2, 20)")
    spark.sql("ALTER TABLE conscat.db.c3 ADD CONSTRAINT cap CHECK (v <= 100)")
    spark.sql("INSERT INTO conscat.db.c3 VALUES (3, 99)") // another commit after
    intercept[Exception] {
      spark.sql("UPDATE conscat.db.c3 SET v = 500 WHERE id = 1")
    }
    spark.sql("UPDATE conscat.db.c3 SET v = 100 WHERE id = 1")
    assert(spark.sql("SELECT sum(v) FROM conscat.db.c3").collect().head.getLong(0)
      == 100L + 20L + 99L)
    // duplicate names rejected; non-CHECK kinds rejected loudly
    intercept[Exception] {
      spark.sql("ALTER TABLE conscat.db.c3 ADD CONSTRAINT cap CHECK (v >= 0)")
    }
    intercept[Exception] {
      spark.sql("ALTER TABLE conscat.db.c3 ADD CONSTRAINT pk PRIMARY KEY (id)")
    }
  }

  test("CREATE TABLE with an inline CHECK constraint enforces from the first write") {
    // the TableInfo createTable overload must receive the constraint —
    // the default TableCatalog bridge DISCARDS TableInfo.constraints,
    // which would create this table unconstrained without a word
    spark.sql("CREATE TABLE conscat.db.c4 (id BIGINT, v BIGINT, " +
      "CONSTRAINT positive CHECK (v > 0))")
    intercept[Exception] {
      spark.sql("INSERT INTO conscat.db.c4 VALUES (1, -5)")
    }
    assert(spark.sql("SELECT count(*) FROM conscat.db.c4").collect().head.getLong(0) == 0L)
    spark.sql("INSERT INTO conscat.db.c4 VALUES (1, 5)")
    assert(spark.sql("SELECT count(*) FROM conscat.db.c4").collect().head.getLong(0) == 1L)
    // and it is visible as a real constraint on the loaded table
    val t = spark.sessionState.catalogManager.catalog("conscat")
      .asInstanceOf[GraftCatalog].loadTable(
        org.apache.spark.sql.connector.catalog.Identifier.of(Array("db"), "c4"))
    assert(t.constraints().map(_.name).toSeq == Seq("positive"))
  }

  test("TBLPROPERTIES cannot forge, delete, or brick constraints") {
    spark.sql("CREATE TABLE conscat.db.c5 (id BIGINT, v BIGINT)")
    spark.sql("ALTER TABLE conscat.db.c5 ADD CONSTRAINT positive CHECK (v > 0)")
    // forging an unvalidated constraint through SET is refused
    intercept[Exception] {
      spark.sql("ALTER TABLE conscat.db.c5 SET TBLPROPERTIES " +
        "('graft.constraint.forged' = 'v < 0')")
    }
    // silently deleting a real one through UNSET is refused
    intercept[Exception] {
      spark.sql("ALTER TABLE conscat.db.c5 UNSET TBLPROPERTIES " +
        "('graft.constraint.positive')")
    }
    // CREATE TABLE with a forged constraint property is refused
    intercept[Exception] {
      spark.sql("CREATE TABLE conscat.db.c5f (id BIGINT) TBLPROPERTIES " +
        "('graft.constraint.forged' = 'id > 0')")
    }
    // the real constraint still enforces, and SHOW TBLPROPERTIES does
    // not leak the internal encoding
    intercept[Exception] {
      spark.sql("INSERT INTO conscat.db.c5 VALUES (1, -1)")
    }
    val shown = spark.sql("SHOW TBLPROPERTIES conscat.db.c5").collect()
      .map(_.getString(0)).toSet
    assert(!shown.exists(_.startsWith("graft.constraint.")), s"leaked: $shown")
  }

  test("DROP/RENAME COLUMN refuse while a constraint references the column") {
    spark.sql("CREATE TABLE conscat.db.c6 (id BIGINT, v BIGINT, w BIGINT)")
    spark.sql("ALTER TABLE conscat.db.c6 ADD CONSTRAINT positive CHECK (v > 0)")
    val e1 = intercept[Exception] {
      spark.sql("ALTER TABLE conscat.db.c6 DROP COLUMN v")
    }
    assert(e1.getMessage.contains("positive"), e1.getMessage)
    val e2 = intercept[Exception] {
      spark.sql("ALTER TABLE conscat.db.c6 RENAME COLUMN v TO vv")
    }
    assert(e2.getMessage.contains("positive"), e2.getMessage)
    // unreferenced columns still drop/rename freely
    spark.sql("ALTER TABLE conscat.db.c6 DROP COLUMN w")
    spark.sql("ALTER TABLE conscat.db.c6 RENAME COLUMN id TO id2")
    // after DROP CONSTRAINT the column is free again
    spark.sql("ALTER TABLE conscat.db.c6 DROP CONSTRAINT positive")
    spark.sql("ALTER TABLE conscat.db.c6 RENAME COLUMN v TO vv")
  }

  test("constraint names resolve case-insensitively; NOT ENFORCED is refused loudly") {
    spark.sql("CREATE TABLE conscat.db.c7 (id BIGINT, v BIGINT)")
    spark.sql("ALTER TABLE conscat.db.c7 ADD CONSTRAINT Positive CHECK (v > 0)")
    // differing-case duplicate is a duplicate
    intercept[Exception] {
      spark.sql("ALTER TABLE conscat.db.c7 ADD CONSTRAINT POSITIVE CHECK (v >= 0)")
    }
    // differing-case DROP finds it
    spark.sql("ALTER TABLE conscat.db.c7 DROP CONSTRAINT positive")
    spark.sql("INSERT INTO conscat.db.c7 VALUES (1, -1)") // gate open again
    val e = intercept[Exception] {
      spark.sql("ALTER TABLE conscat.db.c7 ADD CONSTRAINT soft CHECK (v > 0) NOT ENFORCED")
    }
    assert(e.getMessage.contains("ENFORCED"), e.getMessage)
  }

  test("RELY survives the catalog round-trip") {
    spark.sql("CREATE TABLE conscat.db.c8 (id BIGINT, v BIGINT)")
    spark.sql("ALTER TABLE conscat.db.c8 ADD CONSTRAINT positive CHECK (v > 0) RELY")
    spark.sql("ALTER TABLE conscat.db.c8 ADD CONSTRAINT cap CHECK (v < 100)")
    val t = spark.sessionState.catalogManager.catalog("conscat")
      .asInstanceOf[GraftCatalog].loadTable(
        org.apache.spark.sql.connector.catalog.Identifier.of(Array("db"), "c8"))
    val byName = t.constraints().map(c => c.name -> c).toMap
    assert(byName("positive").rely(), "RELY was dropped on round-trip")
    assert(!byName("cap").rely(), "RELY fabricated for a non-RELY constraint")
    assert(byName.values.forall(_.enforced()))
  }

  test("ADD CONSTRAINT refuses when the table advanced past the validation scan") {
    import org.apache.spark.sql.connector.catalog.TableChange
    import org.apache.spark.sql.connector.catalog.constraints.Constraint
    spark.sql("CREATE TABLE conscat.db.c9 (id BIGINT, v BIGINT)")
    spark.sql("INSERT INTO conscat.db.c9 VALUES (1, 10)")
    val root = wh.resolve("db").resolve("c9")
    val validatedAt = ManifestSink.currentVersion(root)
    // a concurrent commit lands AFTER the (hypothetical) validation scan
    spark.sql("INSERT INTO conscat.db.c9 VALUES (2, -5)")
    val ck = Constraint.check("positive").predicateSql("v > 0")
      .enforced(true).build()
    val e = intercept[Exception] {
      ManifestSink.alterSchema(root,
        Seq(TableChange.addConstraint(ck, validatedAt.toString)))
    }
    assert(e.getMessage.contains("advanced"), e.getMessage)
    // nothing was persisted: the violating row stays legal
    assert(ManifestSink.constraintsOf(ManifestSink.readHeader(root).props).isEmpty)
    // and the SQL path passes the version through Table.version(), so
    // the normal flow (no concurrent writer) still works
    spark.sql("DELETE FROM conscat.db.c9 WHERE v < 0")
    spark.sql("ALTER TABLE conscat.db.c9 ADD CONSTRAINT positive CHECK (v > 0)")
    intercept[Exception] {
      spark.sql("INSERT INTO conscat.db.c9 VALUES (3, -1)")
    }
  }

  test("streaming writes enforce CHECK constraints row-exactly") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    spark.sql("CREATE TABLE conscat.db.c10 (id BIGINT, v BIGINT, " +
      "CONSTRAINT positive CHECK (v > 0))")
    val ok = MemoryStream[(Long, Long)]
    val q = ok.toDS().toDF("id", "v").writeStream
      .option("checkpointLocation",
        Files.createTempDirectory("graft-constraint-ck").toString)
      .toTable("conscat.db.c10")
    try {
      ok.addData((1L, 10L), (2L, 20L))
      q.processAllAvailable()
      assert(spark.sql("SELECT count(*) FROM conscat.db.c10")
        .collect().head.getLong(0) == 2L)
      // a violating row fails the micro-batch; nothing from it commits
      ok.addData((3L, 30L), (4L, -4L))
      val e = intercept[Exception] { q.processAllAvailable() }
      assert(e.getMessage != null)
    } finally q.stop()
    assert(spark.sql("SELECT count(*) FROM conscat.db.c10")
      .collect().head.getLong(0) == 2L,
      "the failed epoch must not have committed any of its rows")
    assert(spark.sql("SELECT sum(v) FROM conscat.db.c10")
      .collect().head.getLong(0) == 30L)
  }
}
