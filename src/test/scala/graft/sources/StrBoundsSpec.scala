package graft.sources

import java.nio.file.{Files, Path}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Truncated string min/max bounds for file skipping on string RANGE
  * predicates — the gap blooms (equality-only) left open. Invariants:
  *  - writers collect a <=16-code-point lower/upper bound per string
  *    column; the lower is a prefix of the min (always <= it), the
  *    upper is the truncated max incremented past every value;
  *  - `WHERE url >= 'b' AND url < 'c'` and `LIKE 'b%'` open ONLY files
  *    whose bound range intersects — proved by physically deleting the
  *    out-of-range files first;
  *  - ordering is UTF-8 BINARY (Spark semantics): a supplementary-plane
  *    value never gets a file wrongly pruned by UTF-16 comparison;
  *  - compaction and CoW rewrites keep bounds correct (merge /
  *    recompute);
  *  - bounds are pruning-only metadata — they never feed the MIN/MAX
  *    aggregate pushdown (a truncated bound is not the value). */
class StrBoundsSpec extends AnyFunSuite {
  import graft.TestSpark.spark
  import spark.implicits._

  private val wh: Path = {
    val p = Files.createTempDirectory("graft-strbounds")
    p.toFile.deleteOnExit()
    spark.conf.set("spark.sql.catalog.sbcat", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.sbcat.warehouse", p.toString)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS sbcat.db")
    p
  }
  private def root(t: String): Path = wh.resolve("db").resolve(t)
  private def entries(t: String): Seq[ManifestSink.FileEntry] =
    ManifestSink.committedEntries(root(t), None)
  private def insertVals(t: String, col: String, vals: Seq[String]): Unit =
    vals.zipWithIndex.map { case (u, i) => (i.toLong, u) }.toDF("id", col)
      .coalesce(1).writeTo(s"sbcat.db.$t").append()

  // ---- unit-level: truncation / increment / bound validity --------------

  test("truncCp keeps whole code points and incrementCp bounds every extension") {
    assert(ManifestSink.truncCp("abcdef", 3) == "abc")
    assert(ManifestSink.truncCp("ab", 5) == "ab")
    // a surrogate pair never splits
    val supp = "ab" + new String(Character.toChars(0x1F600)) + "cd"
    assert(ManifestSink.truncCp(supp, 3) == "ab" + new String(Character.toChars(0x1F600)))
    // increment skips the surrogate gap: U+D7FF + 1 -> U+E000
    assert(ManifestSink.incrementCp("a" + "\ud7ff").contains("a" + "\ue000"))
    // all-U+10FFFF has no upper bound
    val top = new String(Character.toChars(0x10FFFF)) * 3
    assert(ManifestSink.incrementCp(top).isEmpty)
    // a non-max tail still increments by dropping the exhausted suffix
    val mixed = "z" + new String(Character.toChars(0x10FFFF))
    assert(ManifestSink.incrementCp(mixed).contains("{")) // 'z'+1
  }

  test("derived bounds bracket the value in UTF-8 order (property)") {
    val rnd = new scala.util.Random(7)
    def randomString(): String = {
      val sb = new StringBuilder
      (0 until rnd.nextInt(40)).foreach { _ =>
        val cp = rnd.nextInt(4) match {
          case 0 => 'a' + rnd.nextInt(26)
          case 1 => rnd.nextInt(0x80)
          case 2 => 0x100 + rnd.nextInt(0xD700) // BMP
          case _ => 0x10000 + rnd.nextInt(0xFFFF) // supplementary
        }
        sb.appendAll(Character.toChars(cp))
      }
      sb.toString
    }
    (0 until 500).foreach { _ =>
      val x = randomString()
      val t = ManifestSink.truncCp(x, ManifestSink.strBoundLen + 1)
      val lo = ManifestSink.strLowerBound(t)
      assert(ManifestSink.utf8Compare(lo, x) <= 0, s"lower bound above value: $lo > $x")
      ManifestSink.strUpperBound(t).foreach { hi =>
        assert(ManifestSink.utf8Compare(x, hi) <= 0, s"upper bound below value: $x > $hi")
      }
    }
  }

  test("group-level merge is min-of-lowers / max-of-uppers with absence poisoning") {
    val a = Map("c" -> "apple")
    val b = Map("c" -> "banana")
    assert(ManifestSink.mergeStrLowers(Seq(a, b)) == Map("c" -> "apple"))
    assert(ManifestSink.mergeStrUppers(Seq(a, b)) == Map("c" -> "banana"))
    // a member missing the column drops it from the merge entirely
    assert(ManifestSink.mergeStrLowers(Seq(a, Map.empty)) == Map.empty)
    assert(ManifestSink.mergeStrUppers(Seq(Map.empty, b)) == Map.empty)
  }

  // ---- physical proofs --------------------------------------------------

  test("writers collect bounds; a string range scan opens only in-range files") {
    spark.sql("CREATE TABLE sbcat.db.r (id BIGINT, url STRING)")
    insertVals("r", "url", Seq("https://a.example/1", "https://a.example/2"))
    insertVals("r", "url", Seq("https://b.example/1", "https://b.example/2"))
    insertVals("r", "url", Seq("https://c.example/1", "https://c.example/2"))
    val es = entries("r")
    assert(es.size == 3 && es.forall(e =>
      e.slows.contains("url") && e.sups.contains("url")),
      s"every file should carry url bounds: $es")
    // bounds are truncated to <= strBoundLen(+increment) code points
    assert(es.forall(_.slows("url").length <= ManifestSink.strBoundLen))
    // physical proof: delete the a/c files — an in-range scan that
    // opened them would throw
    es.filter(e => e.slows("url").startsWith("https://a") ||
        e.slows("url").startsWith("https://c"))
      .foreach(e => Files.delete(root("r").resolve(e.name)))
    val got = spark.table("sbcat.db.r")
      .filter($"url" >= "https://b" && $"url" < "https://c")
      .select($"url").as[String].collect().sorted.toSeq
    assert(got == Seq("https://b.example/1", "https://b.example/2"))
  }

  test("LIKE 'prefix%' prunes by bounds alone") {
    spark.sql("CREATE TABLE sbcat.db.l (id BIGINT, url STRING)")
    insertVals("l", "url", Seq("alpha-1", "alpha-2"))
    insertVals("l", "url", Seq("beta-1", "beta-2"))
    entries("l").filterNot(_.slows("url").startsWith("alpha"))
      .foreach(e => Files.delete(root("l").resolve(e.name)))
    assert(spark.table("sbcat.db.l").filter($"url".like("alpha%")).count() == 2L)
  }

  test("long values truncate but still prune correctly at the boundary") {
    spark.sql("CREATE TABLE sbcat.db.t (id BIGINT, doc STRING)")
    // two files of long documents sharing a 16-char prefix up to the
    // 17th char — truncation must keep them distinguishable via the
    // incremented upper bound, conservatively
    insertVals("t", "doc", Seq("a" * 16 + "m" + "x" * 100))
    insertVals("t", "doc", Seq("z" * 16 + "m" + "x" * 100))
    val es = entries("t")
    assert(es.forall(_.sups.contains("doc")))
    // the z-file is out of range for a query below 'b': delete it
    es.filter(_.slows("doc").startsWith("z"))
      .foreach(e => Files.delete(root("t").resolve(e.name)))
    assert(spark.table("sbcat.db.t").filter($"doc" < "b").count() == 1L)
    // and equality on the full (untruncated) long value still finds it
    assert(spark.table("sbcat.db.t")
      .filter($"doc" === "a" * 16 + "m" + "x" * 100).count() == 1L)
  }

  test("supplementary-plane values are never pruned by UTF-16 order") {
    spark.sql("CREATE TABLE sbcat.db.u (id BIGINT, s STRING)")
    // U+10000 encodes as a surrogate pair: java String.compareTo puts it
    // BELOW U+FFFD, UTF-8 binary order puts it ABOVE. A bound compared
    // with compareTo would prune this file for s >= U+FFFD.
    val supp = new String(Character.toChars(0x10000))
    insertVals("u", "s", Seq(supp))
    assert(spark.table("sbcat.db.u").filter($"s" >= "\ufffd").count() == 1L)
  }

  test("compaction merges bounds; CoW delete recomputes them") {
    spark.sql("CREATE TABLE sbcat.db.c (id BIGINT, url STRING)")
    insertVals("c", "url", Seq("aaa"))
    insertVals("c", "url", Seq("mmm"))
    insertVals("c", "url", Seq("zzz"))
    ManifestSink.compact(root("c").toString, targetRows = 10L)
    val merged = entries("c")
    assert(merged.size == 1)
    assert(merged.head.slows("url") == "aaa" && merged.head.sups("url") == "zzz")
    // CoW delete of the top value must SHRINK the upper bound
    import org.apache.spark.sql.sources.EqualTo
    ManifestSink.deleteWhere(root("c").toString, Seq(EqualTo("url", "zzz")))
    val after = entries("c")
    assert(after.size == 1 && after.head.sups("url") == "mmm",
      s"rewrite should recompute bounds: ${after.head}")
  }

  test("a range with no matching file returns empty without failing") {
    spark.sql("CREATE TABLE sbcat.db.e (id BIGINT, url STRING)")
    insertVals("e", "url", Seq("alpha"))
    assert(spark.table("sbcat.db.e").filter($"url" > "zzz").count() == 0L)
  }
}
