package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.engine.Tables
import graft.operators.{CurationOps, Relational}

/** Semantic assertions for the curation operators (q102–q108) beyond the
  * determinism + oracle checks OperatorSpec applies to every query. */
class CurationSpec extends AnyFunSuite {
  import TestSpark.{spark, sfDir}

  test("q102: every planted email and phone is found and scrubbed") {
    val r = CurationOps.queries("q102_pii_redact")(spark, sfDir)
    val bad = r.filter(col("n_emails") =!= 1 || col("n_phones") =!= 1
      || !col("tail40").contains("<EMAIL>") && !col("tail40").contains("<PHONE>"))
    assert(bad.count() == 0)
    val nDocs = Tables.documents(spark, sfDir).count()
    assert(r.count() == nDocs)
  }

  test("q103: chunks tile every document — strides cover all tokens, sizes add up") {
    val r = CurationOps.queries("q103_chunk_overlap")(spark, sfDir)
    // per doc: chunk 0 starts at 1; consecutive starts differ by the
    // stride; the last chunk reaches the document's final token
    val perDoc = r.groupBy("doc_id").agg(
      min(col("start")).as("first_start"),
      max(col("start") + col("chunk_tok") - 1).as("last_covered"),
      count(lit(1)).as("n_chunks"),
      max(col("chunk_idx")).as("max_idx"))
    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id"), size(split(col("text"), " ")).cast("long").as("n_tok"))
    val joined = perDoc.join(docs, "doc_id")
    assert(joined.filter(col("first_start") =!= 1).count() == 0)
    assert(joined.filter(col("last_covered") =!= col("n_tok")).count() == 0)
    assert(joined.filter(col("max_idx") =!= col("n_chunks") - 1).count() == 0)
  }

  test("q104: contamination is symmetric ground truth — flagged docs share a 5-gram with the eval stratum") {
    val r = CurationOps.queries("q104_decontaminate")(spark, sfDir).collect()
    // every emitted row has at least one hit and sane ratios
    assert(r.forall(row => row.getAs[Long]("n_hits") >= 1))
    assert(r.forall { row =>
      val bp = row.getAs[Long]("contam_bp")
      bp >= 0 && bp <= 10000 &&
        (row.getAs[Int]("quarantine") == 1) == (bp >= 5000)
    })
    // no eval doc leaks into the output
    assert(r.forall(row => row.getAs[Long]("doc_id") % 97 != 0))
  }

  test("q105: shuffle-shard is a permutation — every doc exactly once, positions dense per shard") {
    val r = CurationOps.queries("q105_shuffle_order")(spark, sfDir)
    val nDocs = Tables.documents(spark, sfDir).count()
    assert(r.count() == nDocs)
    assert(r.select("doc_id").distinct().count() == nDocs)
    val dense = r.groupBy("shard").agg(max("pos").as("mx"), count(lit(1)).as("n"))
      .filter(col("mx") =!= col("n"))
    assert(dense.count() == 0)
  }

  test("q106: trained-codebook assignment partitions the corpus into labeled clusters") {
    // with the TRAINED codebook (q139 via codebookTable) cluster ids are
    // Lloyd labels, not vector ids — the old "cluster c contains vec c"
    // invariant was an artifact of the first-k stand-in. What must hold:
    // every vector lands in exactly one cluster, labels stay in [0, k),
    // and cohesion is a sane cosine (<= 1.0 in basis points).
    val rows = graft.operators.SimilarityOps.queries("q106_kmeans_assign")(spark, sfDir).collect()
    val total = Tables.embeddings(spark, sfDir).count()
    assert(rows.map(_.getAs[Long]("n")).sum == total)
    assert(rows.forall(row => row.getAs[Long]("cluster") >= 0 &&
      row.getAs[Long]("cluster") < graft.operators.SimilarityOps.NumCentroids))
    assert(rows.forall(row => row.getAs[Long]("n") >= 1))
    assert(rows.forall(row => row.getAs[Long]("avg_sim_bp") <= 10000L))
  }

  test("q107: pagerank conserves mass approximately and favors high-degree parts") {
    val rows = CurationOps.queries("q107_pagerank")(spark, sfDir).collect()
    assert(rows.length == 50)
    // ranks sorted desc, all >= the damping floor
    val ranks = rows.map(_.getAs[Long]("rank_ppm"))
    assert(ranks.sameElements(ranks.sorted.reverse))
    assert(ranks.forall(_ >= 150000L))
  }

  test("q107: rank join is size-gated — shuffle plan past the broadcast threshold, identical ranks") {
    import spark.implicits._
    val raw = Seq((2L, 3L), (4L, 3L), (6L, 5L), (4L, 5L), (8L, 3L), (2L, 5L))
      .toDF("src", "dst")
    val edges = raw.union(raw.select(col("dst").as("src"), col("src").as("dst")))
    // threshold above the vertex count => broadcast path; 0 => shuffle path
    val viaBroadcast = CurationOps.pageRankRanks(edges, 3, broadcastMaxVertices = Long.MaxValue)
      .collect().map(_.toString).sorted
    val viaShuffle = CurationOps.pageRankRanks(edges, 3, broadcastMaxVertices = 0L)
      .collect().map(_.toString).sorted
    assert(viaBroadcast.sameElements(viaShuffle),
      "both join strategies must produce bit-identical ranks")
    // plan shape of one un-checkpointed iteration under each strategy
    // (edgesDeg built per-strategy exactly as pageRankRanks builds it, so
    // the shuffle-mode plan is broadcast-free end to end)
    val deg = edges.groupBy("src").agg(count(lit(1)).as("deg"))
    val nodes = deg.select(col("src").as("node"))
    val ranks0 = nodes.withColumn("rank_ppm", lit(1000000L))
    val bPlan = CurationOps.prIteration(
      edges.join(broadcast(deg), "src"), nodes, ranks0, useBroadcast = true)
      .queryExecution.executedPlan.toString
    val sPlan = CurationOps.prIteration(
      edges.repartition(col("src")).join(deg.hint("merge"), "src"),
      nodes, ranks0, useBroadcast = false)
      .queryExecution.executedPlan.toString
    assert(bPlan.contains("BroadcastHashJoin"),
      s"broadcast mode must broadcast the rank side:\n$bPlan")
    assert(!sPlan.contains("BroadcastExchange") && sPlan.contains("SortMergeJoin"),
      s"shuffle mode must not broadcast the rank side:\n$sPlan")
  }

  test("pagerank keeps sink vertices: a node with no outgoing edge still receives rank") {
    import spark.implicits._
    // genuinely directed: 1 -> 2, 3 -> 2; node 2 is a pure sink
    val ranks = CurationOps.pageRankRanks(
      Seq((1L, 2L), (3L, 2L)).toDF("src", "dst"), iters = 2)
      .collect().map(r => r.getAs[Long]("node") -> r.getAs[Long]("rank_ppm")).toMap
    assert(ranks.keySet == Set(1L, 2L, 3L), s"sink vertex dropped: $ranks")
    // the sink received both sources' full contribution on top of the floor
    assert(ranks(2L) > ranks(1L) && ranks(1L) == 150000L)
  }

  test("q187: priority sampling — exhausted groups estimate exactly, others stay k-bounded") {
    val k = CurationOps.PrioSampleK
    val r = CurationOps.queries("q187_priority_sample")(spark, sfDir)
    // never more than k sampled, never more than the group holds
    assert(r.filter(col("n_sampled") > k || col("n_sampled") > col("n_docs"))
      .count() == 0)
    // a group with ≤ k docs is fully sampled with τ = 0, so the
    // Horvitz–Thompson estimate degenerates to the exact sum — the
    // estimator's anchor case
    val small = r.filter(col("n_docs") <= k)
    assert(small.filter(col("ht_est_w") =!= col("exact_sum_w")).count() == 0)
    // sampled groups estimate positive weight
    assert(r.filter(col("ht_est_w") <= 0).count() == 0)
  }

  test("q188: doremi weights start uniform, renormalize each round, favor the worst domain") {
    val r = CurationOps.queries("q188_doremi_weights")(spark, sfDir).collect()
      .map(x => (x.getInt(0), x.getString(1), x.getLong(2)))
    val byRound = r.groupBy(_._1).view.mapValues(_.sortBy(_._2)).toMap
    val d = byRound(0).size
    assert(byRound(0).map(_._3).distinct.size == 1, "round 0 must be uniform")
    for (round <- 0 to CurationOps.DoremiRounds) {
      val tot = byRound(round).map(_._3).sum
      // integer renormalization loses < 1 ppm per domain
      assert(tot <= 1000000L && tot > 1000000L - d, s"round $round sums to $tot")
      assert(byRound(round).forall(_._3 > 0), s"round $round has a zero weight")
    }
    // the final round's max-weight domain must be a max-excess domain:
    // multiplicative updates are monotone in excess loss
    val finalW = byRound(CurationOps.DoremiRounds)
    val w1 = byRound(1)
    val maxExcessDomains = w1.filter(_._3 == w1.map(_._3).max).map(_._2).toSet
    val maxFinal = finalW.filter(_._3 == finalW.map(_._3).max).map(_._2).toSet
    assert(maxFinal.subsetOf(maxExcessDomains),
      s"final winners $maxFinal not among round-1 winners $maxExcessDomains")
  }

  test("q191: rho selection takes exactly the top-K reducible-loss docs") {
    val sel = CurationOps.queries("q191_rho_selection")(spark, sfDir).collect()
    assert(sel.length == CurationOps.RhoK)
    // the published score must be the difference of the published losses,
    // and rows must arrive in (rho desc, doc_id) order
    sel.foreach(r => assert(
      r.getAs[Long]("rho") == r.getAs[Long]("l_cur") - r.getAs[Long]("l_ho")))
    val rhos = sel.map(_.getAs[Long]("rho"))
    assert(rhos.zip(rhos.tail).forall { case (a, b) => a >= b })
    // no unselected doc may outscore a selected one: recompute every
    // doc's rho under the same two trained models
    val (_, w0, w1, w2) = CurationOps.probeWeights(spark, sfDir).last
    val (h0, h1, h2) = CurationOps.holdoutProbeWeights(spark, sfDir)
    val rc = lit(w0) + lit(w1) * col("x1") + lit(w2) * col("x2") - col("y")
    val rh = lit(h0) + lit(h1) * col("x1") + lit(h2) * col("x2") - col("y")
    val all = CurationOps.probeFeatures(spark, sfDir)
      .select(col("doc_id"), (rc * rc - rh * rh).as("rho")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    val selectedIds = sel.map(_.getAs[Long]("doc_id")).toSet
    val minSel = sel.map(_.getAs[Long]("rho")).min
    val maxUnsel = all.collect { case (id, rho) if !selectedIds(id) => rho }.max
    assert(maxUnsel <= minSel,
      s"an unselected doc scores $maxUnsel > selected minimum $minSel")
  }

  test("q192: span corruption conserves tokens and hits the schedule's corruption band") {
    val r = CurationOps.queries("q192_span_corruption")(spark, sfDir).collect()
    val nDocs = Tables.documents(spark, sfDir).count()
    assert(r.length == nDocs, "every document must yield an example")
    r.foreach { row =>
      val (nTok, nMask, nSpans) = (row.getAs[Long]("n_tok"),
        row.getAs[Long]("n_masked"), row.getAs[Long]("n_spans"))
      // sentinel algebra: inputs keep unmasked tokens + one sentinel per
      // span; targets carry each span's sentinel + its tokens — together
      // they hold every original token plus two sentinels per span
      assert(row.getAs[Long]("inputs_len") + row.getAs[Long]("targets_len")
        == nTok + 2 * nSpans)
      assert(nSpans <= nMask && nMask <= nTok)
      // a block contributes at most one span
      assert(nSpans <= nTok / CurationOps.SpanBlock + 1)
    }
    // corpus-wide corruption rate: the schedule targets ~20%
    val tot = r.map(_.getAs[Long]("n_tok")).sum
    val masked = r.map(_.getAs[Long]("n_masked")).sum
    assert(masked * 100 > tot * 10 && masked * 100 < tot * 30,
      s"corruption rate ${masked * 100 / tot}% outside the 10-30% band")
  }

  test("q200: repetition rules fire on planted spam, pass diverse text, replay exactly") {
    import spark.implicits._
    val diverse = (1 to 40).map(i => f"w$i%02d").mkString(" ")
    val spam2 = (("ham spam " * 30).trim + " end")
    val block = (1 to 10).map(i => f"b$i%02d").mkString(" ")
    val dup10 = s"$block $block " + (1 to 20).map(i => f"f$i%02d").mkString(" ")
    val rows = graft.operators.TextOps.repetitionRules(
      Seq((1L, diverse), (2L, spam2), (3L, dup10)).toDF("doc_id", "text"))
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    // diverse: every gram unique -> top coverage is one gram's chars
    assert(rows(1L).getAs[Boolean]("keep"),
      s"diverse text must pass: ${rows(1L)}")
    // the 2-gram spam doc: 'spam ham' (or 'ham spam') dominates
    assert(rows(2L).getAs[Long]("top2_bp") > 2000 &&
      !rows(2L).getAs[Boolean]("keep"),
      s"2-gram spam must trip top2: ${rows(2L)}")
    // the duplicated 10-word block: its 10-gram occurs twice
    assert(rows(3L).getAs[Long]("dup10_bp") > 1000 &&
      !rows(3L).getAs[Boolean]("keep"),
      s"block repetition must trip dup10: ${rows(3L)}")
    // exact replay of one hand case: doc 3's duplicated 10-gram is the
    // block itself (2 occurrences x 49 chars) over the doc's characters
    val nChars = dup10.length.toLong
    assert(rows(3L).getAs[Long]("dup10_bp") == 2L * block.length * 10000 / nChars)
  }

  test("q195: drift gate is zero on identical slices, fires on a planted shift") {
    import spark.implicits._
    // identical distributions: duplicate every row into both slices —
    // every bucket's cross-term cancels exactly
    val base = (0 until 200).map(i => (i.toLong, (i % 7).toLong * 100))
    val sym = (base.map { case (id, n) => (id * 2, n) } ++
      base.map { case (id, n) => (id * 2 + 1, n) }).toDF("doc_id", "n_chars")
    val zero = CurationOps.driftChi2(sym, col("doc_id") % 2 === 0,
      expr("n_chars div 100")).collect()
    assert(zero.nonEmpty && zero.forall(_.getAs[Long]("contrib") == 0L))
    // planted shift: slice B moves a third of its mass two buckets up —
    // the moved buckets light up, untouched buckets stay near zero
    val shifted = (base.map { case (id, n) => (id * 2, n) } ++
      base.map { case (id, n) =>
        (id * 2 + 1, if (id % 3 == 0) n + 200 else n) }).toDF("doc_id", "n_chars")
    val hot = CurationOps.driftChi2(shifted, col("doc_id") % 2 === 0,
      expr("n_chars div 100")).collect()
    assert(hot.map(_.getAs[Long]("contrib")).max > 0L,
      "a planted shift must produce a positive contribution")
    // the fixture query itself: parity split over a shared generator is
    // drift-free relative to the worst case. In ppm space a FULL
    // separation totals ≈2·10⁶ (each slice's ppm mass lands in buckets
    // the other slice misses, contributing ~its own ppm); parity slices
    // must sit far below that.
    val r = CurationOps.queries("q195_drift_chi2")(spark, sfDir).collect()
    val na = r.map(_.getAs[Long]("a_cnt")).sum
    val nb = r.map(_.getAs[Long]("b_cnt")).sum
    val total = r.map(_.getAs[Long]("contrib")).sum
    assert(total < 2000000L / 10,
      s"parity slices should not read as drifted: $total")
    // exact replay of the ppm algebra — the overflow fix's contract:
    // every engine contribution equals the integer ppm formula, whose
    // terms are ≤10⁶ so the square is ≤10¹² (int64-safe at ANY na/nb,
    // unlike the raw cross-term (a·N_b − b·N_a)² this replaced)
    r.foreach { row =>
      val aPpm = row.getAs[Long]("a_cnt") * 1000000L / na
      val bPpm = row.getAs[Long]("b_cnt") * 1000000L / nb
      val want = if (aPpm + bPpm > 0) (aPpm - bPpm) * (aPpm - bPpm) / (aPpm + bPpm)
        else 0L
      assert(row.getAs[Long]("contrib") == want)
    }
  }

  test("q108: band decomposition equals the nested-loop join on the bounded probe set") {
    // q08 (BNLJ, s_suppkey < 100) must agree with q108 restricted the
    // same way — at sf0.001 ALL suppliers have s_suppkey < 100, so the
    // two full results must match row for row
    val nSup = Tables.supplier(spark, sfDir)
      .filter(col("s_suppkey") >= 100).count()
    assume(nSup == 0, "fixture grew past the bounded probe set")
    val a = Relational.queries("q08_theta_join")(spark, sfDir)
      .collect().map(_.toString).sorted
    val b = Relational.queries("q108_theta_band")(spark, sfDir)
      .collect().map(_.toString).sorted
    assert(a.sameElements(b))
  }
}
