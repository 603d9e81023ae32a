package graft.sources

import java.nio.file.{Files, Path}

import org.scalatest.funsuite.AnyFunSuite

/** `bucket(N, col)` hash partitioning (the Iceberg v2 transform shape),
  * admitted PRUNE-ONLY: equality/IN filters on the raw column skip every
  * bucket the literal cannot live in (physical proofs delete the other
  * buckets' files first), while ranges and whole-file-match proofs are
  * undecidable by construction and must fall back to the always-correct
  * read/rewrite paths. INT columns hash as 64-bit little-endian, so an
  * INT->BIGINT widening never re-routes rows — the public Iceberg
  * widening-stability rule. */
class BucketPartitionSpec extends AnyFunSuite {
  import graft.TestSpark.spark

  private val wh: Path = {
    val p = Files.createTempDirectory("graft-bucket")
    p.toFile.deleteOnExit()
    spark.conf.set("spark.sql.catalog.bkcat", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.bkcat.warehouse", p.toString)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS bkcat.db")
    p
  }
  private def root(t: String): Path = wh.resolve("db").resolve(t)
  private def entries(t: String): Seq[ManifestSink.FileEntry] =
    ManifestSink.committedEntries(root(t), None)

  test("rows route by murmur3 bucket; every key's file carries its computed bucket") {
    spark.sql("CREATE TABLE bkcat.db.rt (k BIGINT, v BIGINT) PARTITIONED BY (bucket(8, k))")
    spark.sql("INSERT INTO bkcat.db.rt SELECT id, id * 10 FROM range(0, 64, 1, 1)")
    val es = entries("rt")
    assert(es.nonEmpty)
    assert(es.forall(e => e.parts("k").toLong >= 0L && e.parts("k").toLong < 8L),
      s"bucket values out of range: ${es.map(_.parts)}")
    // spot-check the routing function itself: key 7 must sit in the file
    // whose partition value is bucketOfLong(7, 8)
    val b7 = ManifestSink.bucketOfLong(7L, 8).toString
    es.filterNot(_.parts("k") == b7)
      .foreach(e => Files.delete(root("rt").resolve(e.name)))
    assert(spark.sql("SELECT v FROM bkcat.db.rt WHERE k = 7")
      .collect().map(_.getLong(0)).toSeq == Seq(70L))
  }

  test("IN-list pruning opens only the literals' buckets (physical proof)") {
    spark.sql("CREATE TABLE bkcat.db.inl (k BIGINT, v BIGINT) PARTITIONED BY (bucket(16, k))")
    spark.sql("INSERT INTO bkcat.db.inl SELECT id, id FROM range(0, 200, 1, 1)")
    val keep = Set(3L, 77L).map(k => ManifestSink.bucketOfLong(k, 16).toString)
    entries("inl").filterNot(e => keep(e.parts("k")))
      .foreach(e => Files.delete(root("inl").resolve(e.name)))
    assert(spark.sql("SELECT sum(v) FROM bkcat.db.inl WHERE k IN (3, 77)")
      .collect().head.getLong(0) == 80L)
  }

  test("string buckets prune equality over UTF-8 murmur3") {
    spark.sql("CREATE TABLE bkcat.db.sb (s STRING, v BIGINT) PARTITIONED BY (bucket(8, s))")
    spark.sql("INSERT INTO bkcat.db.sb VALUES ('alpha', 1), ('beta', 2), " +
      "('gamma', 3), ('delta', 4), ('epsilon', 5), (NULL, 6)")
    val want = ManifestSink.bucketOfStr("gamma", 8).toString
    assert(entries("sb").exists(_.parts("s") == want))
    entries("sb").filterNot(_.parts("s") == want)
      .foreach(e => Files.delete(root("sb").resolve(e.name)))
    assert(spark.sql("SELECT v FROM bkcat.db.sb WHERE s = 'gamma'")
      .collect().map(_.getLong(0)).toSeq == Seq(3L))
  }

  test("NULL keys land in the null partition; IS NULL and equality both prune it exactly") {
    spark.sql("CREATE TABLE bkcat.db.nl (k BIGINT, v BIGINT) PARTITIONED BY (bucket(4, k))")
    spark.sql("INSERT INTO bkcat.db.nl VALUES (NULL, 1), (NULL, 2), (9, 3)")
    // IS NULL: only the null partition survives the file massacre
    entries("nl").filterNot(_.parts("k") == ManifestSink.NullPartValue)
      .foreach(e => Files.delete(root("nl").resolve(e.name)))
    assert(spark.sql("SELECT count(*) FROM bkcat.db.nl WHERE k IS NULL")
      .collect().head.getLong(0) == 2L)
    // equality over the null tuple decides FALSE at positive polarity,
    // and the (deleted) data file's bucket mismatches the probe key, so
    // the whole answer comes from metadata — exact 0, zero reads
    val off = (1L to 64L).find(x =>
      ManifestSink.bucketOfLong(x, 4) != ManifestSink.bucketOfLong(9L, 4)).get
    assert(spark.sql(s"SELECT count(*) FROM bkcat.db.nl WHERE k = $off")
      .collect().head.getLong(0) == 0L)
  }

  test("ranges never prune and never prove: range DELETE takes the rewrite path, stays exact") {
    spark.sql("CREATE TABLE bkcat.db.rg (k BIGINT, v BIGINT) PARTITIONED BY (bucket(4, k))")
    spark.sql("INSERT INTO bkcat.db.rg SELECT id, id FROM range(0, 40, 1, 1)")
    // a range filter is UNDECIDED on every bucket
    import org.apache.spark.sql.sources._
    val tf: Map[String, ManifestSink.PartTransform] =
      Map("k" -> ManifestSink.PBucketInt("k", 4))
    (0 until 4).foreach { b =>
      assert(ManifestSink.evalPartFilter(
        LessThan("k", 20L), Map("k" -> b.toString), tf).isEmpty)
      // equality: decided FALSE off-bucket, undecided on-bucket (never TRUE)
      val eq = ManifestSink.evalPartFilter(
        EqualTo("k", 5L), Map("k" -> b.toString), tf)
      if (b == ManifestSink.bucketOfLong(5L, 4)) assert(eq.isEmpty)
      else assert(eq.contains(false))
    }
    // end-to-end: the rewrite path keeps the other keys in the same bucket
    spark.sql("DELETE FROM bkcat.db.rg WHERE k < 20")
    assert(spark.sql("SELECT count(*), min(k) FROM bkcat.db.rg")
      .collect().map(r => (r.getLong(0), r.getLong(1))).head == ((20L, 20L)))
  }

  test("static overwrite on a bucketed key fails loudly (victim set undecidable)") {
    import spark.implicits._
    import org.apache.spark.sql.functions.lit
    spark.sql("CREATE TABLE bkcat.db.ov (k BIGINT, v BIGINT) PARTITIONED BY (bucket(4, k))")
    spark.sql("INSERT INTO bkcat.db.ov VALUES (1, 10), (2, 20)")
    // the SQL PARTITION clause is already rejected by Spark's analyzer
    // (bucket(k) is not an identity partition); the DataFrame overwrite
    // condition reaches the engine's victim selection, where the
    // bucket-matching file is undecidable and must fail, not append
    val e = intercept[Exception] {
      spark.range(1).select(lit(1L).as("k"), lit(99L).as("v"))
        .writeTo("bkcat.db.ov").overwrite($"k" === 1L)
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ msgs(x.getCause))
    assert(msgs(e).exists(_.contains("not decidable")),
      s"expected the loud undecidable-victim failure, got: $e")
    // nothing was silently appended or replaced
    assert(spark.sql("SELECT sum(v) FROM bkcat.db.ov").collect().head.getLong(0) == 30L)
  }

  test("INT->BIGINT widening never re-routes: integers hash as 64-bit") {
    spark.sql("CREATE TABLE bkcat.db.wd (k INT, v BIGINT) PARTITIONED BY (bucket(8, k))")
    spark.sql("INSERT INTO bkcat.db.wd VALUES (42, 1), (7, 2)")
    val before = entries("wd").map(e => e.parts("k")).sorted
    spark.sql("ALTER TABLE bkcat.db.wd ALTER COLUMN k TYPE BIGINT")
    spark.sql("INSERT INTO bkcat.db.wd VALUES (CAST(42 AS BIGINT), 3)")
    val after42 = entries("wd").filter(_.parts("k") ==
      ManifestSink.bucketOfLong(42L, 8).toString)
    assert(after42.size == 2, "pre- and post-widening 42s must share a bucket")
    assert(before.contains(ManifestSink.bucketOfLong(7L, 8).toString))
    // pruning still exact across the widened files
    entries("wd").filterNot(_.parts("k") == ManifestSink.bucketOfLong(42L, 8).toString)
      .foreach(e => Files.delete(root("wd").resolve(e.name)))
    assert(spark.sql("SELECT sum(v) FROM bkcat.db.wd WHERE k = 42")
      .collect().head.getLong(0) == 4L)
  }

  test("the spec token round-trips and survives RENAME COLUMN") {
    spark.sql("CREATE TABLE bkcat.db.tok (k BIGINT, s STRING) " +
      "PARTITIONED BY (bucket(8, k), bucket(4, s))")
    assert(ManifestSink.partitionSpec(root("tok")) ==
      Seq(ManifestSink.PBucketInt("k", 8), ManifestSink.PBucketStr("s", 4)))
    spark.sql("ALTER TABLE bkcat.db.tok RENAME COLUMN k TO kk")
    assert(ManifestSink.partitionSpec(root("tok")) ==
      Seq(ManifestSink.PBucketInt("kk", 8), ManifestSink.PBucketStr("s", 4)))
  }

  test("murmur3 reference vectors (the on-disk routing is pinned forever)") {
    // standard murmur3_x86_32 seed-0 vectors — if these ever move, old
    // tables' bucket routing silently breaks, so they are pinned here
    assert(ManifestSink.murmur3Bytes(Array.empty[Byte]) == 0)
    assert(ManifestSink.murmur3Bytes("hello".getBytes("UTF-8")) == 0x248bfa47)
    assert(ManifestSink.murmur3Bytes("The quick brown fox jumps over the lazy dog"
      .getBytes("UTF-8")) == 0x2e4ff723)
    // Iceberg-spec shape: bucket = (hash & Int.MaxValue) % N, longs hash
    // little-endian — stable across JVMs by construction
    assert(ManifestSink.bucketOfLong(0L, 8) ==
      ((ManifestSink.murmur3Bytes(new Array[Byte](8)) & Int.MaxValue) % 8))
  }
}
