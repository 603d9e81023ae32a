package graft.sources

import java.nio.file.{Files, Path}

import org.scalatest.funsuite.AnyFunSuite

/** Mergeable bottom-k value samples ([[QuantileSketch]]): the
  * distribution statistic that survives bin-merge compaction EXACTLY.
  * Because every distinct value draws a deterministic md5 priority, the
  * bottom-k of a union is computable from the operands' bottom-k's, so
  * the table-level sample — and the quartiles `db.t.stats` serves from
  * it — is identical at any file split, before or after OPTIMIZE. */
class QuantileSketchSpec extends AnyFunSuite {
  import graft.TestSpark.spark

  // ---- pure sketch properties (no Spark) ----------------------------------

  test("merge equals the sketch of the union at any split, order, overlap") {
    def sketchOf(vs: Seq[Long]): Seq[(Long, Long)] = {
      val c = new QuantileSketch.Collector
      vs.foreach(c.add)
      c.entries
    }
    val all = (0L until 500L).map(_ * 17 % 1009)
    val whole = sketchOf(all)
    for (cut <- Seq(1, 100, 250, 499)) {
      val (a, b) = all.splitAt(cut)
      // overlap b's head back into a: duplicate values must be no-ops
      val merged = QuantileSketch.merge(sketchOf(a ++ b.take(10)), sketchOf(b.reverse))
      assert(merged == whole, s"split at $cut diverged")
    }
    assert(whole.size == QuantileSketch.K)
  }

  test("small domains are sampled exactly and quantiles hit exact ranks") {
    val c = new QuantileSketch.Collector
    // 40 distinct values < K: the sketch IS the distinct set
    (0 until 200).foreach(i => c.add((i % 40).toLong * 5))
    assert(c.entries.size == 40)
    val vs = c.entries.map(_._2).sorted
    assert(QuantileSketch.quantile(c.entries, 2, 4).contains(vs(20)))
    assert(QuantileSketch.quantile(c.entries, 1, 4).contains(vs(10)))
    assert(QuantileSketch.quantile(Seq.empty, 1, 2).isEmpty)
  }

  test("quantile estimates track the true distribution within sampling error") {
    val c = new QuantileSketch.Collector
    val n = 20000
    (0 until n).foreach(i => c.add(i.toLong))
    // median of 0..n-1 is ~n/2; bottom-64 sampling has ~1/√64 rank error
    val q50 = QuantileSketch.quantile(c.entries, 2, 4).get
    assert(math.abs(q50 - n / 2) < n / 4, s"median estimate $q50 for uniform 0..$n")
    val q25 = QuantileSketch.quantile(c.entries, 1, 4).get
    val q75 = QuantileSketch.quantile(c.entries, 3, 4).get
    assert(q25 < q50 && q50 < q75, "quartiles must be monotone")
  }

  test("codec roundtrips and the priority matches md5Code60 semantics") {
    val c = new QuantileSketch.Collector
    (0 until 300).foreach(i => c.add(i.toLong * 7 - 500))
    assert(QuantileSketch.decode(QuantileSketch.encode(c.entries)) == c.entries)
    assert(QuantileSketch.encode(Seq.empty) == "")
    // the JVM-side priority is exactly conv(substring(md5('qk:'||v),1,15),16,10)
    val v = 12345L
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s"qk:$v".getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(QuantileSketch.priority(v) ==
      java.lang.Long.parseLong(hex.substring(0, 15), 16))
  }

  // ---- end-to-end: the statistic survives compaction ----------------------

  private val wh: Path = {
    val p = Files.createTempDirectory("graft-qsk")
    p.toFile.deleteOnExit()
    spark.conf.set("spark.sql.catalog.qsk", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.qsk.warehouse", p.toString)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS qsk.db")
    p
  }

  private def quartiles(t: String, col: String): (Option[Long], Option[Long], Option[Long]) = {
    val r = spark.sql(s"SELECT q25, q50, q75 FROM qsk.db.$t.stats " +
      s"WHERE column = '$col'").collect().head
    def g(i: Int) = if (r.isNullAt(i)) None else Some(r.getLong(i))
    (g(0), g(1), g(2))
  }

  test("quartiles are identical before and after compaction — the merge is exact") {
    wh
    spark.sql("CREATE TABLE qsk.db.c (v BIGINT) " +
      "TBLPROPERTIES ('quantile.columns' = 'v')")
    for (i <- 0 until 6)
      spark.sql(s"INSERT INTO qsk.db.c SELECT id * 13 + ${i * 700} FROM range(100)")
    val pre = quartiles("c", "v")
    assert(pre._1.isDefined && pre._2.isDefined && pre._3.isDefined)
    assert(pre._1.get < pre._2.get && pre._2.get < pre._3.get)
    val root = wh.resolve("db").resolve("c").toString
    val res = ManifestSink.compact(root, targetRows = 1000L)
    assert(res.filesAfter < res.filesBefore, s"compaction merged bins: $res")
    val st = ManifestSink.readState(java.nio.file.Paths.get(root))
    assert(st.entries.forall(_.qsk.contains("v")), "samples survive the merge")
    assert(quartiles("c", "v") == pre,
      "quartiles must be bit-identical through compaction")
  }

  test("columns not opted in (or partially covered) report NULL, never a guess") {
    wh
    spark.sql("CREATE TABLE qsk.db.n (v BIGINT, w BIGINT) " +
      "TBLPROPERTIES ('quantile.columns' = 'v')")
    spark.sql("INSERT INTO qsk.db.n SELECT id, id FROM range(100)")
    assert(quartiles("n", "w") == ((None, None, None)), "w never opted in")
    // opt w in AFTER the first file: old files lack the sample, so the
    // table-level answer must stay NULL (partial cover would be biased)
    spark.sql("ALTER TABLE qsk.db.n SET TBLPROPERTIES ('quantile.columns' = 'v,w')")
    spark.sql("INSERT INTO qsk.db.n SELECT id, id FROM range(100)")
    assert(quartiles("n", "w") == ((None, None, None)),
      "a partially covered column must not answer")
    assert(quartiles("n", "v")._2.isDefined, "v stays covered")
  }

  test("streaming writes collect the sample too — the ingest loop keeps stats") {
    wh
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.Trigger
    spark.sql("CREATE TABLE qsk.db.s (v BIGINT) " +
      "TBLPROPERTIES ('quantile.columns' = 'v')")
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val in = MemoryStream[Long]
    in.addData(0L until 500L: _*)
    val q = in.toDF().toDF("v").writeStream
      .format("graft.sources.ManifestSink")
      .option("path", wh.resolve("db").resolve("s").toString)
      .option("checkpointLocation",
        Files.createTempDirectory("qsk-ckpt").toString)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(60000L)
    val (q25, q50, q75) = quartiles("s", "v")
    assert(q25.isDefined && q50.isDefined && q75.isDefined,
      "a streamed file must carry the value sample")
    assert(q25.get < q50.get && q50.get < q75.get)
  }

  test("the knob validates, follows renames, and drops with the column") {
    wh
    intercept[IllegalArgumentException] {
      spark.sql("CREATE TABLE qsk.db.bad (s STRING) " +
        "TBLPROPERTIES ('quantile.columns' = 's')")
    }
    spark.sql("CREATE TABLE qsk.db.r (a BIGINT, b BIGINT) " +
      "TBLPROPERTIES ('quantile.columns' = 'a,b')")
    spark.sql("INSERT INTO qsk.db.r SELECT id, id % 10 FROM range(100)")
    spark.sql("ALTER TABLE qsk.db.r RENAME COLUMN a TO a2")
    val root = java.nio.file.Paths.get(wh.resolve("db").resolve("r").toString)
    val st0 = ManifestSink.readState(root)
    assert(st0.entries.head.qsk.contains("a2") && !st0.entries.head.qsk.contains("a"))
    assert(ManifestSink.quantColsOf(st0.props) == Seq("a2", "b"))
    assert(quartiles("r", "a2")._2.isDefined, "renamed column keeps answering")
    spark.sql("ALTER TABLE qsk.db.r DROP COLUMN b")
    val st1 = ManifestSink.readState(root)
    assert(!st1.entries.head.qsk.contains("b"))
    assert(ManifestSink.quantColsOf(st1.props) == Seq("a2"))
    // Spark wraps ALTER-path failures in SparkException — assert on the
    // validation message wherever it surfaces
    val ex = intercept[Exception] {
      spark.sql("ALTER TABLE qsk.db.r SET TBLPROPERTIES ('quantile.columns' = 'nope')")
    }
    assert(Iterator.iterate(ex: Throwable)(_.getCause).takeWhile(_ != null).take(5)
      .exists(t => Option(t.getMessage).exists(_.contains("quantile.columns"))),
      s"unexpected failure: $ex")
  }

  test("format gate: qsk entries stamp #minreader 2; a higher demand is refused") {
    wh
    spark.sql("CREATE TABLE qsk.db.fmt (v BIGINT) " +
      "TBLPROPERTIES ('quantile.columns' = 'v')")
    spark.sql("INSERT INTO qsk.db.fmt SELECT id FROM range(50)")
    val root = java.nio.file.Paths.get(wh.resolve("db").resolve("fmt").toString)
    val v = ManifestSink.currentVersion(root)
    val content = Files.readString(ManifestSink.manifestAt(root, v))
    assert(content.linesIterator.contains(
      s"#minreader\t${ManifestSink.ReaderFormatVersion}"),
      "a version whose entries carry quantile sketches must declare format 2")
    // a sketch-free table emits NO marker — generation-1 readers keep
    // reading it (the per-feature gate, not a blanket bump)
    spark.sql("CREATE TABLE qsk.db.plain (v BIGINT)")
    spark.sql("INSERT INTO qsk.db.plain SELECT id FROM range(10)")
    val proot = java.nio.file.Paths.get(wh.resolve("db").resolve("plain").toString)
    assert(!Files.readString(ManifestSink.manifestAt(proot,
      ManifestSink.currentVersion(proot))).contains("#minreader"))
    // plant a future-generation demand as a FRESH version (version files
    // are immutable and header parses are cached per (root, version), so
    // the probe must be a version this session has never read): the
    // reader must refuse with the upgrade error, not mis-split slots
    val lines = content.linesIterator.toSeq
    Files.writeString(ManifestSink.manifestAt(root, v + 1),
      (lines.head +: ("#minreader\t99" +: lines.tail)).mkString("\n"))
    val e = intercept[Exception] {
      spark.sql("SELECT * FROM qsk.db.fmt").collect()
    }
    assert(Iterator.iterate(e: Throwable)(_.getCause).takeWhile(_ != null).take(8)
      .exists(t => Option(t.getMessage).exists(_.contains("upgrade the reader"))),
      s"unexpected failure: $e")
  }
}
