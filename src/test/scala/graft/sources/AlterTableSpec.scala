package graft.sources

import java.nio.file.{Files, Path}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** ALTER TABLE on manifest tables: ADD / RENAME / DROP COLUMN as
  * metadata-only commits. The invariants proved here:
  *  - no data file is rewritten by any ALTER (entry names stay);
  *  - files predating an ADD read the new column as null (row and
  *    columnar paths);
  *  - RENAME moves stats/partition metadata so pruning keeps working,
  *    and time travel still shows the old name at old versions;
  *  - a DROPped column's bytes can never resurrect through a later ADD
  *    of the same name (epoch-unique physical names);
  *  - row-level DML (DELETE/UPDATE) still works across mixed-schema
  *    files. */
class AlterTableSpec extends AnyFunSuite {
  import graft.TestSpark.spark
  import spark.implicits._

  private val wh: Path = {
    val p = Files.createTempDirectory("graft-alter")
    p.toFile.deleteOnExit()
    spark.conf.set("spark.sql.catalog.acat", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.acat.warehouse", p.toString)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS acat.db")
    p
  }
  private def root(t: String): Path = wh.resolve("db").resolve(t)
  private def fileNames(t: String): Set[String] =
    ManifestSink.committedEntries(root(t), None).map(_.name).toSet

  test("ADD COLUMN: old files null-fill, new files carry values, nothing rewritten") {
    spark.sql("CREATE TABLE acat.db.add (id BIGINT, v BIGINT)")
    spark.sql("INSERT INTO acat.db.add SELECT id, id * 2 FROM range(10)")
    val gen1 = fileNames("add")
    spark.sql("ALTER TABLE acat.db.add ADD COLUMN note STRING")
    assert(fileNames("add") == gen1, "ALTER must not rewrite data files")
    spark.sql("INSERT INTO acat.db.add SELECT id, id * 2, concat('n', id) FROM range(10, 15)")
    val rows = spark.table("acat.db.add")
      .select($"id", $"v", coalesce($"note", lit("-")))
      .as[(Long, Long, String)].collect().toSet
    val expect = (0L until 10L).map(i => (i, i * 2, "-")).toSet ++
      (10L until 15L).map(i => (i, i * 2, s"n$i")).toSet
    assert(rows == expect)
    // filtering on the added column prunes old rows via null semantics
    assert(spark.table("acat.db.add").filter($"note".isNotNull).count() == 5)
    assert(spark.table("acat.db.add").filter($"note".isNull).count() == 10)
  }

  test("RENAME COLUMN: reads resolve, stats pruning survives, history keeps the old name") {
    spark.sql("CREATE TABLE acat.db.rn (id BIGINT, amount BIGINT)")
    spark.sql("INSERT INTO acat.db.rn SELECT id, id * 10 FROM range(100)") // v2
    val gen1 = fileNames("rn")
    spark.sql("ALTER TABLE acat.db.rn RENAME COLUMN amount TO total") // v3
    assert(fileNames("rn") == gen1)
    // new name everywhere: reads, writes, and the stats keys
    spark.sql("INSERT INTO acat.db.rn SELECT id, id * 10 FROM range(100, 120)")
    assert(spark.table("acat.db.rn").agg(sum($"total")).as[Long].head() ==
      (0L until 120L).map(_ * 10).sum)
    val es = ManifestSink.committedEntries(root("rn"), None)
    assert(es.forall(e => e.mins.contains("total") && !e.mins.contains("amount")),
      s"stats keys must follow the rename: ${es.map(_.mins.keySet)}")
    // time travel to before the rename shows the OLD schema
    val old = spark.sql("SELECT * FROM acat.db.rn VERSION AS OF 2")
    assert(old.schema.fieldNames.toSeq == Seq("id", "amount"))
    assert(old.agg(sum($"amount")).as[Long].head() == (0L until 100L).map(_ * 10).sum)
  }

  test("DROP then re-ADD the same name never resurrects dropped bytes") {
    spark.sql("CREATE TABLE acat.db.dr (id BIGINT, secret STRING)")
    spark.sql("INSERT INTO acat.db.dr SELECT id, concat('s', id) FROM range(5)")
    spark.sql("ALTER TABLE acat.db.dr DROP COLUMN secret")
    assert(spark.table("acat.db.dr").schema.fieldNames.toSeq == Seq("id"))
    spark.sql("ALTER TABLE acat.db.dr ADD COLUMN secret STRING")
    // the old files still physically CONTAIN a 'secret' column — but the
    // re-added logical column maps to a fresh physical name, so it must
    // read as null, not as the dropped values
    val vals = spark.table("acat.db.dr").select($"secret").as[String].collect()
    assert(vals.forall(_ == null), s"dropped bytes resurfaced: ${vals.mkString(",")}")
  }

  test("RENAME of a partition column keeps pruning and the fan-out writer working") {
    spark.sql("CREATE TABLE acat.db.pr (id BIGINT, grp STRING) PARTITIONED BY (grp)")
    spark.sql("INSERT INTO acat.db.pr SELECT id, CASE WHEN id % 2 = 0 THEN 'e' ELSE 'o' END FROM range(20)")
    spark.sql("ALTER TABLE acat.db.pr RENAME COLUMN grp TO bucket")
    assert(ManifestSink.partitionColumns(root("pr"), None) == Seq("bucket"))
    spark.sql("INSERT INTO acat.db.pr SELECT id, 'x' FROM range(100, 103)")
    val es = ManifestSink.committedEntries(root("pr"), None)
    assert(es.forall(_.parts.keySet == Set("bucket")))
    // physical pruning proof under the NEW name: delete the other
    // partitions' files; the filtered read still answers
    es.filter(e => e.parts("bucket") != "e")
      .foreach(e => Files.delete(root("pr").resolve(e.name)))
    assert(spark.table("acat.db.pr").filter($"bucket" === "e").count() == 10)
  }

  test("DELETE and UPDATE work across mixed-schema files") {
    spark.sql("CREATE TABLE acat.db.dml (id BIGINT, v BIGINT)")
    spark.sql("INSERT INTO acat.db.dml SELECT id, id FROM range(10)")
    spark.sql("ALTER TABLE acat.db.dml ADD COLUMN tag STRING")
    spark.sql("INSERT INTO acat.db.dml SELECT id, id, 't' FROM range(10, 20)")
    spark.sql("DELETE FROM acat.db.dml WHERE id % 5 = 0") // hits both generations
    spark.sql("UPDATE acat.db.dml SET tag = 'u' WHERE id < 12 AND id % 5 != 0")
    val rows = spark.table("acat.db.dml")
      .select($"id", coalesce($"tag", lit("-"))).as[(Long, String)].collect().toSet
    val expect = (0L until 20L).filter(_ % 5 != 0).map { i =>
      (i, if (i < 12) "u" else "t")
    }.toSet
    assert(rows == expect)
  }

  test("OPTIMIZE compacts within schema generations, never across") {
    spark.sql("CREATE TABLE acat.db.oc (id BIGINT, v BIGINT)")
    (0 until 2).foreach(i =>
      spark.sql(s"INSERT INTO acat.db.oc SELECT id + ${i * 10}, id FROM range(10)"))
    spark.sql("ALTER TABLE acat.db.oc ADD COLUMN w BIGINT")
    (0 until 2).foreach(i =>
      spark.sql(s"INSERT INTO acat.db.oc SELECT id + ${100 + i * 10}, id, id FROM range(10)"))
    val res = ManifestSink.compact(root("oc").toString, targetRows = 1000L)
    assert(res.rewrittenFiles > 0)
    assert(spark.table("acat.db.oc").count() == 40)
    assert(spark.table("acat.db.oc").filter($"w".isNotNull).count() == 20)
  }

  test("ALTER COLUMN TYPE widens int->long metadata-only; mixed files read correctly") {
    spark.sql("CREATE TABLE acat.db.wid (id BIGINT, n INT)")
    spark.sql("INSERT INTO acat.db.wid SELECT id, CAST(id AS INT) FROM range(5)")
    val gen1 = fileNames("wid")
    spark.sql("ALTER TABLE acat.db.wid ALTER COLUMN n TYPE BIGINT")
    assert(fileNames("wid") == gen1, "widening must not rewrite data files")
    assert(spark.table("acat.db.wid").schema("n").dataType.typeName == "long")
    // old INT32 files decode through the widening reader; new files are
    // written INT64 — both answer as BIGINT
    spark.sql("INSERT INTO acat.db.wid SELECT id, id FROM range(100, 105)")
    val got = spark.table("acat.db.wid").select($"n").as[Long].collect().sorted
    assert(got.toSeq == (0L until 5L) ++ (100L until 105L), got.mkString(","))
    // aggregates and filters over the widened column stay exact
    assert(spark.table("acat.db.wid").filter($"n" >= 100L).count() == 5L)
    assert(spark.table("acat.db.wid").agg(sum($"n")).as[Long].head() ==
      (0L until 5L).sum + (100L until 105L).sum)
    // stats carried losslessly: min/max pruning still works on old files
    val e = ManifestSink.committedEntries(root("wid"), None)
    assert(e.forall(x => x.mins.contains("n") && x.maxs.contains("n")))
  }

  test("row-level DML and OPTIMIZE work on pre-widening files") {
    // the rewrite paths (CoW DELETE, MoR position finding, DV purge)
    // decode rows with TABLE-typed accessors — old INT32 files must go
    // through the widening reader there too, not just in scans
    spark.sql("CREATE TABLE acat.db.wdml (id BIGINT, n INT)")
    spark.sql("INSERT INTO acat.db.wdml SELECT id, CAST(id AS INT) FROM range(10)")
    spark.sql("ALTER TABLE acat.db.wdml ALTER COLUMN n TYPE BIGINT")
    // CoW delete evaluates n (now BIGINT) against rows of the narrow file
    spark.sql("DELETE FROM acat.db.wdml WHERE n = 3")
    assert(spark.table("acat.db.wdml").count() == 9L)
    spark.sql("UPDATE acat.db.wdml SET n = n + 100 WHERE n = 4")
    assert(spark.table("acat.db.wdml").filter($"n" === 104L).count() == 1L)
    // MoR variant + OPTIMIZE purge across the widened generation
    spark.sql("CREATE TABLE acat.db.wmor (id BIGINT, n INT) " +
      "TBLPROPERTIES ('delete.mode' = 'merge-on-read')")
    spark.sql("INSERT INTO acat.db.wmor SELECT id, CAST(id AS INT) FROM range(8)")
    spark.sql("ALTER TABLE acat.db.wmor ALTER COLUMN n TYPE BIGINT")
    spark.sql("DELETE FROM acat.db.wmor WHERE n = 5") // DV via narrow file read
    assert(spark.table("acat.db.wmor").count() == 7L)
    ManifestSink.compact(root("wmor").toString, targetRows = 1000L) // DV purge rewrite
    assert(spark.table("acat.db.wmor").select($"n").as[Long].collect().sorted.toSeq
      == Seq(0L, 1L, 2L, 3L, 4L, 6L, 7L))
  }

  test("ALTER COLUMN TYPE widens float->double; compaction stays generation-safe") {
    spark.sql("CREATE TABLE acat.db.widf (id BIGINT, x FLOAT)")
    spark.sql("INSERT INTO acat.db.widf SELECT id, CAST(id AS FLOAT) / 4 FROM range(8)")
    spark.sql("ALTER TABLE acat.db.widf ALTER COLUMN x TYPE DOUBLE")
    spark.sql("INSERT INTO acat.db.widf SELECT id, CAST(id AS DOUBLE) / 4 FROM range(8, 16)")
    val got = spark.table("acat.db.widf").select($"x").as[Double].collect().sorted
    assert(got.toSeq == (0 until 16).map(_ / 4.0), got.mkString(","))
    // OPTIMIZE bins by physical parquet schema: FLOAT and DOUBLE files
    // never merge raw — each generation compacts within itself
    ManifestSink.compact(root("widf").toString, targetRows = 1000L)
    assert(spark.table("acat.db.widf").select($"x").as[Double].collect().sorted.toSeq
      == (0 until 16).map(_ / 4.0))
  }

  test("unsupported ALTER shapes fail loudly") {
    spark.sql("CREATE TABLE acat.db.bad (id BIGINT, v BIGINT)")
    intercept[Exception] {
      spark.sql("ALTER TABLE acat.db.bad ALTER COLUMN v TYPE STRING")
    }
    intercept[Exception] { // non-nullable add without a DEFAULT is
      // impossible for existing rows (with one it is fine — see below)
      spark.sql("ALTER TABLE acat.db.bad ADD COLUMN must BIGINT NOT NULL")
    }
    assert(spark.table("acat.db.bad").schema.fieldNames.toSeq == Seq("id", "v"))
  }

  test("ADD COLUMN DEFAULT: old files read the frozen default, new inserts resolve it, nothing rewritten") {
    spark.sql("CREATE TABLE acat.db.dft (id BIGINT, v BIGINT)")
    spark.sql("INSERT INTO acat.db.dft VALUES (1, 10), (2, 20)") // gen-1: no 'score'
    val gen1 = ManifestSink.committedEntries(wh.resolve("db").resolve("dft"), None)
      .map(_.name).toSet
    spark.sql("ALTER TABLE acat.db.dft ADD COLUMN score BIGINT DEFAULT 42")
    spark.sql("ALTER TABLE acat.db.dft ADD COLUMN tag STRING DEFAULT 'none'")
    // INSERT omitting the new columns → CURRENT_DEFAULT resolves
    spark.sql("INSERT INTO acat.db.dft (id, v) VALUES (3, 30)")
    // INSERT with explicit values
    spark.sql("INSERT INTO acat.db.dft VALUES (4, 40, 7, 'real')")
    val got = spark.sql(
      "SELECT id, score, tag FROM acat.db.dft ORDER BY id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSeq
    // gen-1 rows read the FROZEN existence default — no rewrite happened
    assert(got == Seq((1L, 42L, "none"), (2L, 42L, "none"),
      (3L, 42L, "none"), (4L, 7L, "real")), s"got $got")
    assert(ManifestSink.committedEntries(wh.resolve("db").resolve("dft"), None)
      .map(_.name).toSet.intersect(gen1) == gen1,
      "ADD COLUMN DEFAULT must be metadata-only: gen-1 files untouched")
    // the default also participates in filters and aggregates
    assert(spark.sql("SELECT sum(score) FROM acat.db.dft WHERE tag = 'none'")
      .collect().head.getLong(0) == 42L * 3)
    // and a NOT NULL add WITH a default is legal
    spark.sql("ALTER TABLE acat.db.dft ADD COLUMN must BIGINT NOT NULL DEFAULT 0")
    assert(spark.sql("SELECT count(*) FROM acat.db.dft WHERE must = 0")
      .collect().head.getLong(0) == 4L)
  }

  test("DECIMAL/DATE/TIMESTAMP defaults serve on BOTH read paths (columnar and row rewrite)") {
    spark.sql("CREATE TABLE acat.db.dtt (id BIGINT)")
    spark.sql("INSERT INTO acat.db.dtt VALUES (1), (2), (3)")
    spark.sql("ALTER TABLE acat.db.dtt ADD COLUMN price DECIMAL(10,2) DEFAULT 1.50")
    spark.sql("ALTER TABLE acat.db.dtt ADD COLUMN d DATE DEFAULT DATE'2024-02-29'")
    spark.sql("ALTER TABLE acat.db.dtt " +
      "ADD COLUMN ts TIMESTAMP DEFAULT TIMESTAMP'2024-01-01 00:00:00'")
    // columnar scan of pre-ADD files fills typed constant vectors
    val r = spark.sql(
      "SELECT id, CAST(price AS STRING), CAST(d AS STRING), CAST(ts AS STRING) " +
        "FROM acat.db.dtt WHERE id = 2").collect().head
    assert((r.getLong(0), r.getString(1), r.getString(2)) ==
      ((2L, "1.50", "2024-02-29")), s"got $r")
    assert(r.getString(3).startsWith("2024-01-01"))
    // row-wise rewrite path (CoW DELETE reads old rows through the
    // default-aware mapped view) must materialize the frozen defaults
    spark.sql("DELETE FROM acat.db.dtt WHERE id = 1")
    val sums = spark.sql(
      "SELECT count(*), CAST(sum(price) AS STRING) FROM acat.db.dtt " +
        "WHERE d = DATE'2024-02-29'").collect().head
    assert((sums.getLong(0), sums.getString(1)) == ((2L, "3.00")), s"got $sums")
  }

  test("append accepts nullability-narrower NESTED types; stored schema stays nullable") {
    // an aggregate-produced ARRAY<BIGINT NOT NULL> must append into an
    // ARRAY<BIGINT> column: the flag lives inside the DataType, so the
    // compatibility check strips nullability recursively and the stored
    // schema keeps (ORs) its nullable shape
    spark.sql("CREATE TABLE acat.db.nn (k BIGINT, vs ARRAY<BIGINT>)")
    spark.range(0, 12)
      .groupBy((org.apache.spark.sql.functions.col("id") % 3).as("k"))
      .agg(org.apache.spark.sql.functions.collect_list("id").as("vs"))
      .writeTo("acat.db.nn").append()
    assert(spark.sql("SELECT sum(size(vs)) FROM acat.db.nn").collect()
      .head.getLong(0) == 12L)
    val stored = spark.table("acat.db.nn").schema("vs").dataType
    assert(stored == org.apache.spark.sql.types.ArrayType(
      org.apache.spark.sql.types.LongType, containsNull = true),
      s"stored element nullability must not narrow: $stored")
  }
}
