package graft.sources

import java.nio.file.{Files, Path}

import org.scalatest.funsuite.AnyFunSuite

/** Mergeable NDV sketches ([[NdvSketch]]): the distinct-count statistic
  * that SURVIVES bin-merge compaction. The exact per-file counts cannot
  * merge, so compaction used to drop them — on a compacted table the
  * stats view went silent and CBO lost its cardinalities exactly when
  * the table reached the state production tables live in. The sketch's
  * register-max merge is lossless at any split, so the estimate is the
  * same whether the data arrived in one file or fifty. */
class NdvSketchSpec extends AnyFunSuite {
  import graft.TestSpark.spark

  // ---- pure sketch properties (no Spark) ----------------------------------

  test("estimates are within the HLL error band across magnitudes") {
    for ((n, tolPct) <- Seq(50 -> 10, 1000 -> 10, 100000 -> 10)) {
      val regs = NdvSketch.empty()
      (0 until n).foreach(i => NdvSketch.add(regs, i.toLong * 31 + 7))
      val e = NdvSketch.estimate(regs)
      assert(math.abs(e - n) <= n.toLong * tolPct / 100,
        s"n=$n estimated $e")
    }
  }

  test("duplicates never move the estimate; order never matters") {
    val a = NdvSketch.empty()
    (0 until 1000).foreach(i => NdvSketch.add(a, i.toLong))
    val before = NdvSketch.estimate(a)
    (0 until 1000).foreach(i => NdvSketch.add(a, i.toLong)) // same again
    assert(NdvSketch.estimate(a) == before)
    val b = NdvSketch.empty()
    (999 to 0 by -1).foreach(i => NdvSketch.add(b, i.toLong))
    assert(NdvSketch.encode(b) == NdvSketch.encode(a))
  }

  test("merge is exactly the sketch of the union (bit-for-bit)") {
    val left = NdvSketch.empty()
    val right = NdvSketch.empty()
    val union = NdvSketch.empty()
    (0 until 600).foreach { i => NdvSketch.add(left, i.toLong); NdvSketch.add(union, i.toLong) }
    (300 until 900).foreach { i => NdvSketch.add(right, i.toLong); NdvSketch.add(union, i.toLong) }
    val merged = NdvSketch.merge(left, right)
    assert(merged.toSeq == union.toSeq)
  }

  test("codec roundtrips both sparse and dense register sets") {
    val sparse = NdvSketch.empty()
    (0 until 20).foreach(i => NdvSketch.add(sparse, i.toLong))
    val se = NdvSketch.encode(sparse)
    assert(se.startsWith("s"), s"20 values should encode sparse: $se")
    assert(NdvSketch.decode(se).toSeq == sparse.toSeq)
    val dense = NdvSketch.empty()
    (0 until 5000).foreach(i => NdvSketch.add(dense, i.toLong))
    val de = NdvSketch.encode(dense)
    assert(de.startsWith("d"), "5000 values should fill past half the registers")
    assert(NdvSketch.decode(de).toSeq == dense.toSeq)
  }

  // ---- end-to-end: the statistic survives compaction ----------------------

  private val wh: Path = {
    val p = Files.createTempDirectory("graft-ndvsk")
    p.toFile.deleteOnExit()
    spark.conf.set("spark.sql.catalog.ndvsk", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.ndvsk.warehouse", p.toString)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS ndvsk.db")
    p
  }

  private def tableNdv(t: String, col: String): (Option[Long], Boolean) = {
    val r = spark.sql(s"SELECT ndv, exact_ndv FROM ndvsk.db.$t.stats " +
      s"WHERE column = '$col'").collect().head
    (if (r.isNullAt(0)) None else Some(r.getLong(0)), r.getBoolean(1))
  }

  test("bin-merge compaction preserves the distinct count it used to drop") {
    wh
    spark.sql("CREATE TABLE ndvsk.db.c (v BIGINT)")
    // six overlapping appends: files carry 100 rows each, true distinct
    // over the union is 350 (each append overlaps half the previous) —
    // the exact per-file sum would claim 600
    for (i <- 0 until 6)
      spark.sql(s"INSERT INTO ndvsk.db.c SELECT id + ${i * 50} FROM range(100)")
    val (pre, preExact) = tableNdv("c", "v")
    assert(!preExact && pre.exists(e => math.abs(e - 350L) <= 35L),
      s"pre-compaction merged-sketch estimate: $pre (true 350; exact-sum would say 600)")
    val root = wh.resolve("db").resolve("c").toString
    val res = ManifestSink.compact(root, targetRows = 1000L)
    assert(res.filesAfter < res.filesBefore, s"compaction merged bins: $res")
    // exact counts are gone (non-mergeable), but the sketch survived the
    // merge with the SAME estimate — register-max is split-invariant
    val st = ManifestSink.readState(java.nio.file.Paths.get(root))
    assert(st.entries.forall(_.ndvs.isEmpty), "exact counts don't merge")
    assert(st.entries.forall(_.ndvSk.contains("v")), "sketches survive the merge")
    val (post, postExact) = tableNdv("c", "v")
    assert(!postExact && post == pre,
      s"estimate unchanged through compaction: $pre -> $post")
  }

  test("string columns get a distinct count — the only NDV signal they have") {
    wh
    spark.sql("CREATE TABLE ndvsk.db.s (k BIGINT, s STRING)")
    // two overlapping appends: 120 distinct strings total, 80 per file
    spark.sql("INSERT INTO ndvsk.db.s SELECT id, concat('u', id % 80) FROM range(160)")
    spark.sql("INSERT INTO ndvsk.db.s SELECT id, concat('u', 40 + id % 80) FROM range(160)")
    val (ndv, exact) = tableNdv("s", "s")
    assert(!exact && ndv.exists(e => math.abs(e - 120L) <= 12L),
      s"string NDV from merged sketches: $ndv (true 120)")
  }

  test("sketches ride renames and drops like the other column stats") {
    wh
    spark.sql("CREATE TABLE ndvsk.db.r (a BIGINT, b BIGINT)")
    spark.sql("INSERT INTO ndvsk.db.r SELECT id, id % 10 FROM range(100)")
    spark.sql("ALTER TABLE ndvsk.db.r RENAME COLUMN a TO a2")
    val root = java.nio.file.Paths.get(wh.resolve("db").resolve("r").toString)
    val e0 = ManifestSink.readState(root).entries.head
    assert(e0.ndvSk.contains("a2") && !e0.ndvSk.contains("a"))
    spark.sql("ALTER TABLE ndvsk.db.r DROP COLUMN b")
    val e1 = ManifestSink.readState(root).entries.head
    assert(!e1.ndvSk.contains("b") && e1.ndvSk.contains("a2"))
  }
}
