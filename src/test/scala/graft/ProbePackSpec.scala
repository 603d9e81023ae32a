package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{BpeOps, CurationOps, PipelineOps}

/** q168/q169 (distilled quality probe) and q170 (BPE sequence packing)
  * checked against plain-Scala references, independent of both the
  * Spark expressions and the DuckDB oracle:
  *
  *   - the probe's integer-GD loop is replayed in-memory from the raw
  *     document texts (own tokenizer, own Math.floorDiv loop) — any
  *     divergence in the distributed gradient (ordering, overflow,
  *     wrong floor semantics) shows up as a weight mismatch;
  *   - the packing manifest is checked for conservation (every token
  *     lands in exactly one sequence), fill (every non-tail sequence
  *     holds exactly PackSeqLen tokens), and contiguity, with the
  *     per-doc token counts recomputed by a reference BPE applier.
  */
class ProbePackSpec extends AnyFunSuite {
  import TestSpark.{spark, sfDir}

  private def docs: Seq[(Long, String, String)] = {
    import spark.implicits._
    spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "lang", "text")
      .as[(Long, String, String)].collect().toSeq.sortBy(_._1)
  }

  // --- probe reference (plain Scala) ---------------------------------------

  private val Stop = Set("the", "a", "of", "and", "to")

  private def refFeatures(text: String): (Long, Long, Long) = {
    val toks = text.split(" ", -1) // split(text,' ') keeps empty tokens
    val nTok = toks.length.toLong
    val nUniq = toks.distinct.length.toLong
    val stopCnt = toks.count(Stop.contains).toLong
    val x1 = if (nTok <= CurationOps.ProbeT1) 1L else 0L
    val x2 = if (nTok <= CurationOps.ProbeT2) 1L else 0L
    val y = if (nUniq * 10 >= nTok * 7 && stopCnt * 10 <= nTok * 3) 1000L else 0L
    (x1, x2, y)
  }

  test("q168: distributed integer GD replays the in-memory reference exactly") {
    val feats = docs.map { case (_, _, t) => refFeatures(t) }
    val n = feats.length.toLong
    var (w0, w1, w2) = (0L, 0L, 0L)
    val ref = (1 to CurationOps.ProbeRounds).map { r =>
      var (g0, g1, g2) = (0L, 0L, 0L)
      feats.foreach { case (x1, x2, y) =>
        val resid = w0 + w1 * x1 + w2 * x2 - y
        g0 += resid; g1 += resid * x1; g2 += resid * x2
      }
      w0 -= Math.floorDiv(g0, CurationOps.ProbeLrDen * n)
      w1 -= Math.floorDiv(g1, CurationOps.ProbeLrDen * n)
      w2 -= Math.floorDiv(g2, CurationOps.ProbeLrDen * n)
      (r, w0, w1, w2)
    }
    assert(CurationOps.probeWeights(spark, sfDir) === ref)
  }

  test("q169: confusion matrix is complete and consistent with the reference") {
    val rows = CurationOps.queries("q169_probe_distill")(spark, sfDir).collect()
    assert(rows.map(_.getLong(2)).sum === docs.length.toLong)
    val feats = docs.map { case (_, _, t) => refFeatures(t) }
    val (_, w0, w1, w2) = CurationOps.probeWeights(spark, sfDir).last
    val expected = feats.groupBy { case (x1, x2, y) =>
      (if (y == 1000L) 1 else 0,
        if (w0 + w1 * x1 + w2 * x2 >= CurationOps.ProbeThreshold) 1 else 0)
    }.view.mapValues(_.length.toLong).toMap
    val got = rows.map(r => ((r.getInt(0), r.getInt(1)), r.getLong(2))).toMap
    assert(got === expected)
  }

  // --- packing reference ----------------------------------------------------

  /** Reference BPE applier: chars → tokens, each merge applied in order,
    * left-to-right non-overlapping (the BpeApplyExpr contract). */
  private def refBpe(word: String, merges: Seq[(String, String)]): Seq[String] = {
    var toks: Vector[String] = word.map(_.toString).toVector
    merges.foreach { case (l, r) =>
      val out = Vector.newBuilder[String]
      var i = 0
      while (i < toks.length) {
        if (i + 1 < toks.length && toks(i) == l && toks(i + 1) == r) {
          out += (l + r); i += 2
        } else { out += toks(i); i += 1 }
      }
      toks = out.result()
    }
    toks
  }

  test("q170: packing conserves tokens, fills sequences, stays contiguous") {
    val merges = BpeOps.trainedMerges(spark, sfDir).map(m => (m._2, m._3))
    val seqLen = PipelineOps.PackSeqLen
    // reference per-(lang) token totals from the reference BPE applier
    val perLangTokens: Map[String, Long] = docs
      .flatMap { case (_, lang, t) =>
        t.split(" ", -1).filter(_.nonEmpty)
          .map(w => lang -> refBpe(w, merges).length.toLong)
      }
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap

    val rows = PipelineOps.queries("q170_sequence_pack")(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    val byLang = rows.groupBy(_._1)
    assert(byLang.keySet === perLangTokens.keySet)
    byLang.foreach { case (lang, rs) =>
      val sorted = rs.sortBy(_._2)
      // contiguous seq ids from 0
      assert(sorted.map(_._2).toSeq === (0L until sorted.length.toLong))
      // conservation: every token lands in exactly one sequence
      assert(sorted.map(_._4).sum === perLangTokens(lang), s"lang=$lang")
      // fill: all but the tail hold exactly seqLen tokens; the tail ≤ seqLen
      sorted.dropRight(1).foreach(r => assert(r._4 === seqLen, s"lang=$lang seq=${r._2}"))
      assert(sorted.last._4 <= seqLen && sorted.last._4 >= 1)
      // doc ranges are sane and monotone across sequences (adjacent
      // sequences may share the doc that spans their boundary)
      sorted.foreach(r => assert(r._5 <= r._6 && r._3 >= 1))
      sorted.sliding(2).foreach {
        // next sequence starts at or after the previous one's last doc
        // (equal exactly when a doc spans the boundary); doc ids inside a
        // stratum are NOT contiguous (other languages interleave), so no
        // tighter adjacency bound holds
        case Array(a, b) => assert(a._5 <= b._5 && a._6 <= b._6 && b._5 >= a._6)
        case _ =>
      }
    }
  }

  test("q171: curriculum ranks are per-stratum permutations ordered by quality") {
    val pack = PipelineOps.queries("q170_sequence_pack")(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1))).groupBy(_._1).view
      .mapValues(_.map(_._2).toSet).toMap
    val rows = PipelineOps.queries("q171_curriculum")(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getInt(4)))
    rows.groupBy(_._1).foreach { case (lang, rs) =>
      // every packed sequence is priced and ranked exactly once
      assert(rs.map(_._2).toSet === pack(lang), s"lang=$lang")
      assert(rs.map(_._5).sorted.toSeq === (1 to rs.length), s"lang=$lang")
      // rank order IS quality order (ties broken by seq_id ascending)
      val byRank = rs.sortBy(_._5)
      byRank.sliding(2).foreach {
        case Array(a, b) =>
          assert(a._4 > b._4 || (a._4 == b._4 && a._2 < b._2),
            s"lang=$lang rank ${a._5} -> ${b._5}")
        case _ =>
      }
      // token-weighted mean stays inside the probe's score range
      val (_, w0, w1, w2) = CurationOps.probeWeights(spark, sfDir).last
      val lo = math.min(w0, math.min(w0 + w1, math.min(w0 + w2, w0 + w1 + w2)))
      val hi = math.max(w0, math.max(w0 + w1, math.max(w0 + w2, w0 + w1 + w2)))
      rs.foreach(r => assert(r._4 >= lo - 1 && r._4 <= hi, s"lang=$lang q=${r._4}"))
    }
  }
}
