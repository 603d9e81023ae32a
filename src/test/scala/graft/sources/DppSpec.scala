package graft.sources

import java.nio.file.{Files, Path}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Runtime (DPP-style) file pruning on STRING join keys: the scan
  * advertises string and partition columns as runtime-filter
  * attributes, a selective dim side arrives as an IN-set at execution,
  * and whole files drop — exactly for partition tuples, conservatively
  * via blooms + truncated bounds for data columns. Proofs are
  * physical: the non-matching files are deleted and the join still
  * answers. */
class DppSpec extends AnyFunSuite {
  import graft.TestSpark.spark
  import spark.implicits._

  private val wh: Path = {
    val p = Files.createTempDirectory("graft-dpp")
    p.toFile.deleteOnExit()
    spark.conf.set("spark.sql.catalog.dpp", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.dpp.warehouse", p.toString)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS dpp.db")
    p
  }
  private def root(t: String): Path = wh.resolve("db").resolve(t)

  test("a string-partitioned fact prunes partitions from a filtered dim at runtime") {
    spark.sql("CREATE TABLE dpp.db.fact (id BIGINT, cat STRING, v BIGINT) " +
      "PARTITIONED BY (cat)")
    spark.sql("INSERT INTO dpp.db.fact SELECT id, " +
      "CASE WHEN id % 3 = 0 THEN 'alpha' WHEN id % 3 = 1 THEN 'beta' ELSE 'gamma' END, " +
      "id * 10 FROM range(30)")
    // physically destroy beta and gamma: only runtime pruning driven by
    // the dim's surviving key can still answer
    ManifestSink.committedEntries(root("fact"), None)
      .filter(e => e.parts("cat") != "alpha")
      .foreach(e => Files.delete(root("fact").resolve(e.name)))
    // dim must be a real source: a constant-folded LocalRelation loses
    // its Filter node and Spark's DPP selectivity check never fires
    spark.sql("CREATE TABLE dpp.db.dim (cat STRING, w BIGINT)")
    spark.sql("INSERT INTO dpp.db.dim VALUES ('alpha', 1), ('beta', 2), ('gamma', 3)")
    val dim = spark.table("dpp.db.dim").filter($"w" === 1L)
    val joined = spark.table("dpp.db.fact").join(dim, "cat")
      .agg(count(lit(1)).as("n"), sum($"v").as("s"))
    val (n, sv) = joined.as[(Long, Long)].head()
    assert(n == 10L)
    assert(sv == (0L until 30L).filter(_ % 3 == 0).map(_ * 10).sum)
  }

  test("a bloom'd + sort-clustered string column prunes data files at runtime") {
    spark.sql("CREATE TABLE dpp.db.bf (id BIGINT, cat STRING) " +
      "TBLPROPERTIES ('bloom.columns' = 'cat', 'write.sort-by' = 'cat')")
    Seq("aa", "mm", "zz").foreach { c =>
      spark.range(0, 10).select($"id", lit(c).as("cat"))
        .coalesce(1).writeTo("dpp.db.bf").append()
    }
    ManifestSink.committedEntries(root("bf"), None)
      .filter(e => e.slows.get("cat").exists(_ != "mm"))
      .foreach(e => Files.delete(root("bf").resolve(e.name)))
    spark.sql("CREATE TABLE dpp.db.dim2 (cat STRING, w BIGINT)")
    spark.sql("INSERT INTO dpp.db.dim2 VALUES ('mm', 1), ('zz', 2)")
    val dim = spark.table("dpp.db.dim2").filter($"w" === 1L)
    val joined = spark.table("dpp.db.bf").join(dim, "cat")
      .agg(count(lit(1)).as("n"))
    assert(joined.as[Long].head() == 10L)
  }

  test("a BUCKETED fact prunes whole buckets from a filtered dim at runtime") {
    // the star-join probe on a hash-bucketed layout: the dim's surviving
    // keys arrive as an IN-set, each key hashes to its bucket, and every
    // bucket holding none of them drops before any read — bucket-level
    // DPP, the point-lookup economics of q159 driven by a join instead
    // of a literal list
    spark.sql("CREATE TABLE dpp.db.bkf (k BIGINT, v BIGINT) " +
      "PARTITIONED BY (bucket(16, k))")
    spark.sql("INSERT INTO dpp.db.bkf SELECT id, id * 10 FROM range(160)")
    spark.sql("CREATE TABLE dpp.db.bkd (k BIGINT, w BIGINT)")
    spark.sql("INSERT INTO dpp.db.bkd SELECT id, id % 2 FROM range(0, 10)")
    // survivors of the dim filter: odd keys 1,3,5,7,9 → their buckets
    val keep = (1L to 9L by 2).map(k => ManifestSink.bucketOfLong(k, 16).toString).toSet
    ManifestSink.committedEntries(root("bkf"), None)
      .filterNot(e => keep(e.parts("k")))
      .foreach(e => Files.delete(root("bkf").resolve(e.name)))
    val dim = spark.table("dpp.db.bkd").filter($"w" === 1L)
    val joined = spark.table("dpp.db.bkf").join(dim, "k")
      .agg(count(lit(1)).as("n"), sum($"v").as("s"))
    val (n, sv) = joined.as[(Long, Long)].head()
    assert(n == 5L)
    assert(sv == (1L to 9L by 2).map(_ * 10).sum)
  }
}
