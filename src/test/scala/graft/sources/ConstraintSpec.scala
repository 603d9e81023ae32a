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
    spark.conf.set("spark.sql.catalog.ccat", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.ccat.warehouse", p.toString)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS ccat.db")
    p
  }

  test("violating INSERTs fail row-exactly; valid ones commit; DROP re-opens the gate") {
    spark.sql("CREATE TABLE ccat.db.c1 (id BIGINT, v BIGINT)")
    spark.sql("INSERT INTO ccat.db.c1 VALUES (1, 10)")
    spark.sql("ALTER TABLE ccat.db.c1 ADD CONSTRAINT positive CHECK (v > 0)")
    intercept[Exception] {
      spark.sql("INSERT INTO ccat.db.c1 VALUES (2, -5)")
    }
    // the failed insert left nothing behind
    assert(spark.sql("SELECT count(*) FROM ccat.db.c1").collect().head.getLong(0) == 1L)
    spark.sql("INSERT INTO ccat.db.c1 VALUES (3, 30)")
    assert(spark.sql("SELECT sum(v) FROM ccat.db.c1").collect().head.getLong(0) == 40L)
    spark.sql("ALTER TABLE ccat.db.c1 DROP CONSTRAINT positive")
    spark.sql("INSERT INTO ccat.db.c1 VALUES (4, -1)") // legal again
    assert(spark.sql("SELECT count(*) FROM ccat.db.c1").collect().head.getLong(0) == 3L)
  }

  test("ADD CONSTRAINT scans existing rows and refuses when they violate") {
    spark.sql("CREATE TABLE ccat.db.c2 (id BIGINT, v BIGINT)")
    spark.sql("INSERT INTO ccat.db.c2 VALUES (1, -7)")
    val e = intercept[Exception] {
      spark.sql("ALTER TABLE ccat.db.c2 ADD CONSTRAINT positive CHECK (v > 0)")
    }
    // the constraint must NOT have been persisted
    assert(ManifestSink.constraintsOf(
      ManifestSink.readHeader(wh.resolve("db").resolve("c2")).props).isEmpty,
      s"constraint persisted despite violating rows: $e")
    spark.sql("INSERT INTO ccat.db.c2 VALUES (2, -8)") // still unconstrained
  }

  test("constraints survive commits and UPDATEs enforce them") {
    spark.sql("CREATE TABLE ccat.db.c3 (id BIGINT, v BIGINT)")
    spark.sql("INSERT INTO ccat.db.c3 VALUES (1, 10), (2, 20)")
    spark.sql("ALTER TABLE ccat.db.c3 ADD CONSTRAINT cap CHECK (v <= 100)")
    spark.sql("INSERT INTO ccat.db.c3 VALUES (3, 99)") // another commit after
    intercept[Exception] {
      spark.sql("UPDATE ccat.db.c3 SET v = 500 WHERE id = 1")
    }
    spark.sql("UPDATE ccat.db.c3 SET v = 100 WHERE id = 1")
    assert(spark.sql("SELECT sum(v) FROM ccat.db.c3").collect().head.getLong(0)
      == 100L + 20L + 99L)
    // duplicate names rejected; non-CHECK kinds rejected loudly
    intercept[Exception] {
      spark.sql("ALTER TABLE ccat.db.c3 ADD CONSTRAINT cap CHECK (v >= 0)")
    }
    intercept[Exception] {
      spark.sql("ALTER TABLE ccat.db.c3 ADD CONSTRAINT pk PRIMARY KEY (id)")
    }
  }
}
