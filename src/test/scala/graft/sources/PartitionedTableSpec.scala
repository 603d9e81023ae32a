package graft.sources

import java.nio.file.{Files, Path}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Partitioned manifest tables: identity PARTITIONED BY through
  * [[GraftCatalog]], per-partition data files (fan-out writer),
  * partition-FIRST file pruning (exact, before min/max stats), dynamic
  * and static INSERT OVERWRITE, and partition integrity across UPDATE
  * and OPTIMIZE. The pruning proofs are physical: the spec DELETES the
  * data files partition pruning must skip and shows the filtered scan
  * still answers — a file that would have been opened fails the read. */
class PartitionedTableSpec extends AnyFunSuite {
  import graft.TestSpark.spark
  import spark.implicits._

  private val wh: Path = {
    val p = Files.createTempDirectory("graft-part")
    p.toFile.deleteOnExit()
    spark.conf.set("spark.sql.catalog.pcat", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.pcat.warehouse", p.toString)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS pcat.db")
    p
  }

  private def root(t: String): Path = wh.resolve("db").resolve(t)
  private def entries(t: String): Seq[ManifestSink.FileEntry] =
    ManifestSink.committedEntries(root(t), None)

  test("CREATE TABLE PARTITIONED BY records the spec; writes fan out per partition") {
    spark.sql("CREATE TABLE pcat.db.t (id BIGINT, grp STRING, v BIGINT) PARTITIONED BY (grp)")
    assert(ManifestSink.partitionColumns(root("t"), None) == Seq("grp"))
    spark.sql("INSERT INTO pcat.db.t " +
      "SELECT id, CASE WHEN id % 3 = 0 THEN 'a' WHEN id % 3 = 1 THEN 'b' ELSE 'c' END, id * 10 " +
      "FROM range(30)")
    val es = entries("t")
    assert(es.nonEmpty && es.forall(_.parts.keySet == Set("grp")))
    assert(es.map(_.parts("grp")).toSet == Set("a", "b", "c"))
    // clustered distribution: one file per partition for this insert
    assert(es.size == 3, s"expected 3 per-partition files, got ${es.map(_.name)}")
    assert(spark.table("pcat.db.t").count() == 30)
  }

  test("partition pruning is exact and physical: pruned partitions' files are never opened") {
    spark.sql("CREATE TABLE pcat.db.pr (id BIGINT, grp STRING, v BIGINT) PARTITIONED BY (grp)")
    spark.sql("INSERT INTO pcat.db.pr " +
      "SELECT id, CASE WHEN id % 2 = 0 THEN 'keep' ELSE 'drop' END, id FROM range(40)")
    // physically destroy the 'drop' partition's data files — only
    // partition-first pruning can still answer a grp='keep' query
    entries("pr").filter(_.parts("grp") == "drop")
      .foreach(e => Files.delete(root("pr").resolve(e.name)))
    val kept = spark.table("pcat.db.pr").filter($"grp" === "keep")
      .select("id").as[Long].collect().toSet
    assert(kept == (0L until 40L by 2).toSet)
    // IN-set shape prunes too
    assert(spark.table("pcat.db.pr").filter($"grp".isin("keep")).count() == 20)
    // an unfiltered COUNT still answers — from manifest metadata alone
    // (aggregate pushdown), which is its own zero-I/O proof
    assert(spark.table("pcat.db.pr").count() == 40)
    // but an unfiltered DATA read must fail (proves the deletion bit,
    // i.e. the filtered reads above really skipped those files)
    intercept[Exception] { spark.table("pcat.db.pr").select("id").collect() }
  }

  test("dynamic INSERT OVERWRITE replaces exactly the partitions receiving data") {
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try {
      spark.sql("CREATE TABLE pcat.db.dyn (id BIGINT, grp STRING) PARTITIONED BY (grp)")
      spark.sql("INSERT INTO pcat.db.dyn SELECT id, 'a' FROM range(10)")
      spark.sql("INSERT INTO pcat.db.dyn SELECT id, 'b' FROM range(10)")
      val bFiles = entries("dyn").filter(_.parts("grp") == "b").map(_.name).toSet
      // overwrite lands only in 'a' → 'b' must be carried BY REFERENCE
      spark.sql("INSERT OVERWRITE pcat.db.dyn SELECT id, 'a' FROM range(100, 103)")
      val es = entries("dyn")
      assert(es.filter(_.parts("grp") == "b").map(_.name).toSet == bFiles,
        "untouched partition files must survive by reference")
      val rows = spark.table("pcat.db.dyn").as[(Long, String)].collect().toSet
      assert(rows == ((100L until 103L).map((_, "a")) ++ (0L until 10L).map((_, "b"))).toSet)
    } finally spark.conf.set("spark.sql.sources.partitionOverwriteMode", "static")
  }

  test("static INSERT OVERWRITE PARTITION (p) replaces only the named partition") {
    spark.sql("CREATE TABLE pcat.db.st (id BIGINT, grp STRING) PARTITIONED BY (grp)")
    spark.sql("INSERT INTO pcat.db.st SELECT id, 'x' FROM range(5)")
    spark.sql("INSERT INTO pcat.db.st SELECT id, 'y' FROM range(5)")
    spark.sql("INSERT OVERWRITE pcat.db.st PARTITION (grp = 'x') SELECT id FROM range(7, 9)")
    val rows = spark.table("pcat.db.st").as[(Long, String)].collect().toSet
    assert(rows == ((7L until 9L).map((_, "x")) ++ (0L until 5L).map((_, "y"))).toSet)
  }

  test("full INSERT OVERWRITE of a partitioned table truncates but keeps the partition spec") {
    spark.sql("CREATE TABLE pcat.db.tr (id BIGINT, grp STRING) PARTITIONED BY (grp)")
    spark.sql("INSERT INTO pcat.db.tr SELECT id, 'a' FROM range(5)")
    spark.sql("INSERT OVERWRITE pcat.db.tr SELECT id, 'z' FROM range(3)")
    assert(ManifestSink.partitionColumns(root("tr"), None) == Seq("grp"))
    assert(spark.table("pcat.db.tr").as[(Long, String)].collect().toSet ==
      (0L until 3L).map((_, "z")).toSet)
    assert(entries("tr").forall(_.parts("grp") == "z"))
  }

  test("UPDATE moving a partition-column value migrates rows to their new partition") {
    spark.sql("CREATE TABLE pcat.db.mv (id BIGINT, grp STRING) PARTITIONED BY (grp)")
    spark.sql("INSERT INTO pcat.db.mv SELECT id, CASE WHEN id < 5 THEN 'cold' ELSE 'hot' END FROM range(10)")
    spark.sql("UPDATE pcat.db.mv SET grp = 'hot' WHERE id = 2")
    val es = entries("mv")
    val hotRows = es.filter(_.parts("grp") == "hot").map(_.rows).sum
    assert(hotRows == 6, s"row 2 must live in partition 'hot' now: $es")
    assert(spark.table("pcat.db.mv").filter($"grp" === "hot").count() == 6)
  }

  test("OPTIMIZE never merges across partitions") {
    spark.sql("CREATE TABLE pcat.db.op (id BIGINT, grp STRING) PARTITIONED BY (grp)")
    // 4 small appends → 4 files per partition
    (0 until 4).foreach(i =>
      spark.sql(s"INSERT INTO pcat.db.op SELECT id + ${i * 10}, " +
        "CASE WHEN id % 2 = 0 THEN 'l' ELSE 'r' END FROM range(10)"))
    val res = ManifestSink.compact(root("op").toString, targetRows = 100L)
    assert(res.rewrittenFiles > 0)
    val es = entries("op")
    assert(es.forall(e => Set("l", "r").contains(e.parts("grp"))),
      s"compacted files must keep one partition tuple: $es")
    assert(es.size == 2, s"each partition should compact to one file: ${es.map(_.name)}")
    assert(spark.table("pcat.db.op").count() == 40)
  }

  test("partition values survive nulls and URL-hostile strings") {
    spark.sql("CREATE TABLE pcat.db.esc (id BIGINT, grp STRING) PARTITIONED BY (grp)")
    Seq((1L, "a,b=c\td"), (2L, null.asInstanceOf[String]), (3L, "plain"))
      .toDF("id", "grp").writeTo("pcat.db.esc").append()
    val es = entries("esc")
    assert(es.map(_.parts("grp")).toSet ==
      Set("a,b=c\td", ManifestSink.NullPartValue, "plain"))
    assert(spark.table("pcat.db.esc").filter($"grp".isNull).select("id")
      .as[Long].collect().toSeq == Seq(2L))
    assert(spark.table("pcat.db.esc").filter($"grp" === "a,b=c\td").select("id")
      .as[Long].collect().toSeq == Seq(1L))
  }
}
