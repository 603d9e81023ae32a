package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.MultimodalOps

/** Perceptual-hash media near-dup (q211): the 64-bit aHash over the
  * grid-structured synthetic media recovers planted noised AND resized
  * twins, negative controls stay clean, the resized twin carries REAL
  * resampling error (the round-13 negative result's bar: no baked-equal
  * roundtrip), and Hamming-band LSH is pigeonhole-lossless below the
  * band count. */
class MediaPhashSpec extends AnyFunSuite {
  import TestSpark.{spark, sfDir}
  import spark.implicits._

  private def bandsOf(ids: Seq[Long]): Map[Long, Seq[Long]] =
    MultimodalOps.phashBandsOf(ids.toDF("doc_id"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toSeq).toMap

  private def hamming(a: Seq[Long], b: Seq[Long]): Int =
    a.zip(b).map { case (x, y) => java.lang.Long.bitCount(x ^ y) }.sum

  test("fixture run: exactly the planted triples, all three edges each, nothing else") {
    val rows = MultimodalOps.queries("q211_phash_neardup")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    val pairs = rows.map(r => (r._1, r._2)).toSet
    val nDocs = graft.engine.Tables.documents(spark, sfDir).count()
    val decades = (0L until nDocs / 10)
    val planted = decades.flatMap(k =>
      Seq((10 * k, 10 * k + 1), (10 * k, 10 * k + 2), (10 * k + 1, 10 * k + 2))).toSet
    assert(pairs == planted,
      s"output must be exactly the planted triples: extra=${pairs.diff(planted)} missing=${planted.diff(pairs)}")
    assert(rows.forall(_._3 <= MultimodalOps.PhashMaxHam))
  }

  test("resized twin carries REAL resampling error — recovered, not baked equal") {
    val h = bandsOf((0L until 500L).toSeq)
    val resizedDists = (0L until 50L).map(k => hamming(h(10 * k), h(10 * k + 2)))
    assert(resizedDists.max > 0,
      "every resized twin hashing bit-identical means the roundtrip is vacuous — " +
        "the sawtooth term must produce genuine resampling error somewhere")
    assert(resizedDists.forall(_ <= MultimodalOps.PhashMaxHam))
    // noised twins likewise within threshold
    assert((0L until 50L).forall(k =>
      hamming(h(10 * k), h(10 * k + 1)) <= MultimodalOps.PhashMaxHam))
  }

  test("negative controls: distinct scenes sit far beyond the verify threshold") {
    val h = bandsOf((0L until 500L).toSeq)
    // variants 3..9 are unique scenes: their distance to EVERY other doc
    // must exceed the threshold (the clean-negative-controls bar)
    val uniques = (0L until 500L).filter(_ % 10 >= 3)
    val others = (0L until 500L)
    val minCross = (for (u <- uniques; o <- others if o != u)
      yield hamming(h(u), h(o))).min
    assert(minCross > MultimodalOps.PhashMaxHam,
      s"a negative-control doc matched something at distance $minCross")
  }

  test("Hamming-band LSH is pigeonhole-lossless below the band count") {
    // a pair at distance d < 4 differs in at most 3 bands, so at least
    // one of the 4 bands is shared — banding CANNOT lose such a pair.
    // Drive the real fixture hashes: every pair within the verify
    // threshold AND within the pigeonhole bound must appear in the
    // query output (which is band-candidate-generated).
    val h = bandsOf((0L until 500L).toSeq)
    val out = MultimodalOps.queries("q211_phash_neardup")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val ids = (0L until 500L)
    val shouldHave = for {
      a <- ids; b <- ids if a < b
      d = hamming(h(a), h(b)) if d < MultimodalOps.PhashBands
    } yield (a, b)
    assert(shouldHave.nonEmpty && shouldHave.forall(out.contains),
      "a pair below the pigeonhole bound escaped the banded candidates")
  }

  test("q214 at-rest index verdict equals q211's inline verdict") {
    val inline = MultimodalOps.queries("q211_phash_neardup")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val atRest = MultimodalOps.queries("q214_phash_index")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(atRest == inline,
      s"at-rest verdict diverged: extra=${atRest.diff(inline)} missing=${inline.diff(atRest)}")
  }

  test("q215 maintained index: the CDC delete of doc 10 retires exactly its pairs") {
    val inline = MultimodalOps.queries("q211_phash_neardup")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val maintained = MultimodalOps.queries("q215_phash_maintained")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(maintained == inline.filterNot(r => r._1 == 10L || r._2 == 10L),
      "the maintained verdict must be q211's minus every pair touching doc 10")
    assert(maintained.exists(r => r._1 == 11L && r._2 == 12L),
      "the surviving twin pair (11, 12) must remain")
  }
}
