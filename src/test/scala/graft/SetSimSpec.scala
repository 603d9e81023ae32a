package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.DedupOps

/** The exact set-similarity join (q190, SSJoin/PPJoin prefix filtering)
  * against brute-force ground truth: adversarial micro-corpora AND the
  * full fixture — prefix filtering must lose nothing, which is exactly
  * the guarantee the probabilistic LSH path (q41) cannot give. */
class SetSimSpec extends AnyFunSuite {
  import TestSpark.{spark, sfDir}

  private def bruteForce(docs: org.apache.spark.sql.DataFrame,
      tBp: Long): Set[(Long, Long)] = {
    // mirror the operator's exact-dup canonicalization
    val canon = docs.groupBy(col("text")).agg(min(col("doc_id")).as("doc_id"))
    val tk = canon.select(col("doc_id"),
      explode(graft.plans.ShinglesExpr.shinglesNative(col("text"), DedupOps.SetSimShingleN))
        .as("token"))
    val sz = tk.groupBy("doc_id").agg(count(lit(1)).as("m"))
    tk.as("a").join(tk.as("b"),
        col("a.token") === col("b.token") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("inter"))
      .join(sz.select(col("doc_id").as("doc_a"), col("m").as("ma")), "doc_a")
      .join(sz.select(col("doc_id").as("doc_b"), col("m").as("mb")), "doc_b")
      .filter(col("inter") * 10000 >= (col("ma") + col("mb") - col("inter")) * tBp)
      .select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
  }

  test("prefix filtering equals brute force on an adversarial micro-corpus") {
    import spark.implicits._
    // crafted shapes: near-identical pair (one token appended), an
    // identical pair, a prefix-sharing pair BELOW threshold (shares its
    // rarest shingles but diverges after), disjoint docs, and a doc too
    // short to shingle — candidates that must verify-fail, pairs that
    // must be found, and noise that must not pair
    val docs = Seq(
      1L -> "alpha beta gamma delta epsilon zeta eta theta",
      2L -> "alpha beta gamma delta epsilon zeta eta theta iota",
      3L -> "alpha beta gamma delta epsilon zeta eta theta",
      4L -> "alpha beta gamma nine ten eleven twelve thirteen fourteen fifteen",
      5L -> "one two three four five six seven eight",
      6L -> "tiny doc"
    ).toDF("doc_id", "text")
    val got = DedupOps.setSimJoin(docs)
      .select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val want = bruteForce(docs, DedupOps.SetSimTBp)
    assert(got == want, s"exact join diverged: got $got want $want")
    assert(want.contains((1L, 2L)),
      "the planted near-dup must be present for the test to mean anything")
    assert(!got.exists(p => p._1 == 3L || p._2 == 3L),
      "byte-identical clones collapse to their canonical before the join")
    assert(!want.exists(p => p._1 == 4L || p._2 == 4L),
      "the prefix-sharing below-threshold doc must verify-fail")
  }

  test("the exact join equals brute force on the fixture (completeness, not sampling)") {
    // the full-corpus ground truth: every canonical pair sharing >= 1
    // five-shingle, exact Jaccard, threshold — the exact join must
    // reproduce it completely (this is the guarantee LSH cannot give;
    // the DuckDB oracle re-proves it at every gate scale)
    val exact = DedupOps.queries("q190_setsim_join")(spark, sfDir)
      .select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val want = bruteForce(graft.engine.Tables.documents(spark, sfDir),
      DedupOps.SetSimTBp)
    assert(exact == want, s"diverged: missing ${want.diff(exact)}, " +
      s"extra ${exact.diff(want)}")
  }

  test("jaccard output is threshold-consistent and symmetric-free") {
    val r = DedupOps.queries("q190_setsim_join")(spark, sfDir).collect()
    r.foreach { row =>
      val (a, b) = (row.getAs[Long]("doc_a"), row.getAs[Long]("doc_b"))
      assert(a < b, "pairs must be canonical (doc_a < doc_b)")
      assert(row.getAs[Long]("jacc_bp") >= DedupOps.SetSimTBp)
      val inter = row.getAs[Long]("inter")
      assert(inter <= math.min(row.getAs[Long]("size_a"), row.getAs[Long]("size_b")))
    }
  }

  // ---- q196: positional filtering at the moderate threshold ---------------

  test("q196 at t=0.5 equals brute force on a mid-similarity micro-corpus") {
    import spark.implicits._
    // A/B share 12 of 16+16 shingles → J = 0.6: IN at t=0.5, OUT at
    // t=0.8 — the regime q196 exists for. A/C → J = 10/22 ≈ 0.45: just
    // below threshold, must verify-fail. D clones A (canonicalization),
    // E is noise.
    def words(p: String, n: Int) = (1 to n).map(i => f"$p$i%02d").mkString(" ")
    val a = words("a", 20)
    val docs = Seq(
      1L -> a,
      2L -> (words("a", 16) + " " + words("x", 4)),
      3L -> (words("a", 14) + " " + words("y", 6)),
      4L -> a,
      5L -> words("e", 10)
    ).toDF("doc_id", "text")
    val got = DedupOps.setSimJoinPos(docs, DedupOps.SetSimPpTBp)
      .select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val want = bruteForce(docs, DedupOps.SetSimPpTBp)
    assert(got == want, s"positional join diverged: got $got want $want")
    assert(want == Set((1L, 2L)),
      "exactly the J=0.6 pair qualifies at t=0.5 on this corpus")
    // the same corpus at q190's t=0.8 finds nothing — the two operating
    // points genuinely differ
    assert(DedupOps.setSimJoin(docs).collect().isEmpty)
  }

  test("q196 equals brute force on the fixture at t=0.5") {
    val got = DedupOps.queries("q196_setsim_ppjoin")(spark, sfDir)
      .select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val want = bruteForce(graft.engine.Tables.documents(spark, sfDir),
      DedupOps.SetSimPpTBp)
    assert(got == want, s"diverged: missing ${want.diff(got)}, " +
      s"extra ${got.diff(want)}")
  }

  test("the positional filter prunes rank-incompatible candidates the prefix filter admits") {
    import spark.implicits._
    // Engineered token frame (tokens fed directly — shingle plumbing is
    // covered by the parity tests): docs P and Q, 16 tokens each, share
    // EXACTLY one token w. Global dfs put w at rank 9 of P (eight
    // df=1 uniques sort before it) and rank 2 of Q (one unique, then w,
    // then fourteen df=3 boilerplate tokens) — both inside the t=0.5
    // prefixes (length 16−8+1 = 9), so prefix filtering ADMITS (P,Q).
    // The positional bound 1 + min(8,1) + min(16−9,16−2) = 9 is below
    // α = ⌈0.5·32/1.5⌉ = 11, so the positional filter kills it without
    // a verification join. The true overlap is 1 (J = 1/31): pruning is
    // CORRECT here, and the parity tests prove it never over-prunes.
    val P = 1L; val Q = 2L
    val bg = (1 to 2).map(i => 100L + i) // boilerplate carriers: df=3
    val pTokens = (1 to 8).map(i => f"p_uniq$i%02d") ++ Seq("w_shared") ++
      (1 to 7).map(i => f"z_boil$i%02d")
    val qTokens = Seq("q_uniq01", "w_shared") ++
      (1 to 14).map(i => f"z_boil$i%02d")
    require(pTokens.size == 16 && qTokens.size == 16)
    val rows =
      pTokens.map(P -> _) ++ qTokens.map(Q -> _) ++
        bg.flatMap(d => (1 to 14).map(i => d -> f"z_boil$i%02d"))
    val tk = rows.toDF("doc_id", "token")
    val dfreq = tk.groupBy("token").agg(count(lit(1)).as("df"))
    // sanity: w is genuinely inside both prefixes — drop it from the
    // bound check and the pair appears in PREFIX-ONLY candidates
    val prefixOnly = {
      val pre = DedupOps.prefixTokens(tk.join(dfreq, "token"),
        DedupOps.SetSimPpTBp)
      pre.as("a").join(pre.as("b"),
          col("a.token") === col("b.token") && col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id"), col("b.doc_id")).distinct().collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    }
    assert(prefixOnly.contains((P, Q)),
      "the fixture must put w in both prefixes or the test is vacuous")
    val positional = DedupOps.ppjoinCandidates(tk, dfreq, DedupOps.SetSimPpTBp)
      .select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(!positional.contains((P, Q)),
      "rank arithmetic must kill the (rank 9, rank 2) single-token collision")
  }

  test("randomized parity: both exact joins equal brute force across corpora and thresholds") {
    import spark.implicits._
    // deterministic pseudo-random corpora over a TINY vocabulary — the
    // worst case for prefix filtering (few distinct shingles, rich
    // mid-band similarity structure) — swept across thresholds from
    // well below to well above the two operating points. Every (corpus,
    // t) must reproduce brute force EXACTLY for both the prefix-only
    // and the positional engine; this is the property the per-corpus
    // oracle hash-match proves at gate scales, here probed across 8
    // adversarial corpora instead of one fixture.
    val vocab = Vector("ape", "bee", "cat", "dog", "eel", "fox", "gnu", "hen")
    val rnd = new scala.util.Random(0x5EED12L)
    for (trial <- 0 until 4) {
      val nDocs = 8 + rnd.nextInt(10)
      val texts = (0 until nDocs).map { i =>
        val n = 3 + rnd.nextInt(22) // includes docs too short to shingle
        (0 until n).map(_ => vocab(rnd.nextInt(vocab.size))).mkString(" ")
      }
      // a planted byte-clone exercises canonicalization every trial
      val docs = (texts :+ texts.head).zipWithIndex
        .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
      for (t <- Seq(3000L, 5000L, 8000L)) {
        val want = bruteForce(docs, t)
        def pairs(df: org.apache.spark.sql.DataFrame) =
          df.select("doc_a", "doc_b").collect()
            .map(r => (r.getLong(0), r.getLong(1))).toSet
        val prefixOnly = pairs(DedupOps.setSimJoin(docs, t))
        val positional = pairs(DedupOps.setSimJoinPos(docs, t))
        assert(prefixOnly == want,
          s"trial $trial t=$t prefix join diverged: " +
            s"missing ${want.diff(prefixOnly)}, extra ${prefixOnly.diff(want)}")
        assert(positional == want,
          s"trial $trial t=$t positional join diverged: " +
            s"missing ${want.diff(positional)}, extra ${positional.diff(want)}")
      }
    }
  }

  // ---- q198: incremental batch-vs-corpus ----------------------------------

  test("q198 incremental equals from-scratch on a two-batch split") {
    import spark.implicits._
    def words(p: String, n: Int) = (1 to n).map(i => f"$p$i%02d").mkString(" ")
    val base = words("c", 20)
    val corpus0 = Seq(
      1L -> base,
      2L -> words("d", 20),
      3L -> words("e", 12)
    ).toDF("doc_id", "text")
    // batch 1: a near-dup of corpus doc 1 (J = 14/18 ≈ 0.78 < 0.8 — no;
    // use one word changed at the END: shares 15 of 16 windows → J =
    // 15/17 ≈ 0.88) and an unrelated doc
    val batch1 = Seq(
      11L -> (words("c", 19) + " zz99"),
      12L -> words("f", 15)
    ).toDF("doc_id", "text")
    // batch 2: a byte-identical clone of corpus doc 2 (must surface as
    // a J=10000 pair) and a near-dup of BATCH-1 doc 12 — visible only
    // because the corpus grows between batches
    val batch2 = Seq(
      21L -> words("d", 20),
      22L -> (words("f", 14) + " gg01")
    ).toDF("doc_id", "text")
    def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.select("doc_a", "doc_b").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val p1 = pairs(DedupOps.setSimIncremental(corpus0, batch1))
    val p2 = pairs(DedupOps.setSimIncremental(corpus0.union(batch1), batch2))
    // from-scratch ground truth: the full-corpus brute force restricted
    // to cross-boundary pairs (batch-internal dups are q190's job).
    // One deliberate asymmetry: whole-corpus canonicalization FOLDS the
    // byte-clone 21→2 before pairing (q190's clone-quadratic guard),
    // while the incremental form canonicalizes per side and so REPORTS
    // the cross-boundary clone as a J=10000 match — exactly what the
    // ingest loop needs to hear; add it to the expectation explicitly
    val all = bruteForce(corpus0.union(batch1).union(batch2),
      DedupOps.SetSimTBp)
    val cross = all.collect {
      case (a, b) if b >= 21L && a < 21L => (b, a) // batch2 × earlier
      case (a, b) if b >= 11L && b < 21L && a < 11L => (b, a) // batch1 × corpus
    } + ((21L, 2L))
    assert(p1.union(p2) == cross,
      s"incremental ${p1.union(p2)} != from-scratch cross pairs $cross")
    assert(p1 == Set((11L, 1L)), "batch 1 finds its corpus near-dup")
    assert(p2 == Set((21L, 2L), (22L, 12L)),
      "batch 2 finds the corpus clone AND the batch-1 near-dup")
    // the clone surfaces at exact similarity
    val clone = DedupOps.setSimIncremental(corpus0.union(batch1), batch2)
      .filter(col("doc_a") === 21L).collect().head
    assert(clone.getAs[Long]("jacc_bp") == 10000L)
  }

  // ---- q199: the index at rest ---------------------------------------------

  test("q199 equals q198 on the fixture — the at-rest path loses nothing") {
    def rows(n: String) = DedupOps.queries(n)(spark, sfDir).collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"),
        r.getAs[Long]("inter"), r.getAs[Long]("jacc_bp"))).toSet
    assert(rows("q199_setsim_index") == rows("q198_setsim_incremental"))
  }

  test("at-rest index: build, probe, append, probe again == the inline incremental join") {
    import spark.implicits._
    val wh = java.nio.file.Files.createTempDirectory("graft-ssim-inc")
    wh.toFile.deleteOnExit()
    spark.conf.set("spark.sql.catalog.sscat", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.sscat.warehouse", wh.toString)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS sscat.db")
    spark.sql("CREATE TABLE sscat.db.sdf (token STRING, df BIGINT)")
    spark.sql("CREATE TABLE sscat.db.spre (token STRING, doc_id BIGINT, m BIGINT) " +
      "TBLPROPERTIES ('write.sort-by' = 'token', 'bloom.columns' = 'token')")
    def words(p: String, n: Int) = (1 to n).map(i => f"$p$i%02d").mkString(" ")
    val corpus0 = Seq(
      1L -> words("c", 20), 2L -> words("d", 20), 3L -> words("e", 12)
    ).toDF("doc_id", "text")
    val batch1 = Seq(
      11L -> (words("c", 19) + " zz99"), 12L -> words("f", 15)
    ).toDF("doc_id", "text")
    val batch2 = Seq(
      21L -> words("d", 20), 22L -> (words("f", 14) + " gg01")
    ).toDF("doc_id", "text")
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.select("doc_a", "doc_b").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    DedupOps.ssimBuildIndex(corpus0, "sscat.db.sdf", "sscat.db.spre")
    val p1 = pairs(DedupOps.ssimProbe(spark, batch1, corpus0,
      "sscat.db.sdf", "sscat.db.spre"))
    assert(p1 == pairs(DedupOps.setSimIncremental(corpus0, batch1)),
      "probe against the stored index must equal the inline join")
    // maintenance: batch 1's prefixes append under the FROZEN order;
    // the next probe sees them with no rebuild. The inline twin
    // computes df from the CURRENT corpus — candidate orders differ,
    // exact outputs must not
    DedupOps.ssimAppend(spark, batch1, "sscat.db.sdf", "sscat.db.spre")
    val p2 = pairs(DedupOps.ssimProbe(spark, batch2, corpus0.union(batch1),
      "sscat.db.sdf", "sscat.db.spre"))
    assert(p2 == pairs(DedupOps.setSimIncremental(corpus0.union(batch1), batch2)),
      "post-append probe must equal the inline join over the grown corpus")
    assert(p2 == Set((21L, 2L), (22L, 12L)),
      "the corpus clone AND the batch-1 near-dup are both found at rest")
  }

  // ---- skew hardening ------------------------------------------------------

  test("boilerplate shingles never become candidate join keys — structural skew immunity") {
    import spark.implicits._
    // 2000 docs share one boilerplate phrase (its shingle's df = 2000,
    // the Zipf head) plus one genuine near-dup pair. The rarity-prefix
    // EXCLUDES high-df shingles from the candidate join's key space, so
    // the quadratic-risk join never even sees the heavy key — q190's
    // first line of skew defense is structural, not adaptive. (The
    // residual df-ATTACH join does stream the heavy key through one
    // task, but against a 1-row build side that is linear scan work,
    // not join blowup.)
    def words(p: String, n: Int) = (1 to n).map(i => f"$p$i%02d").mkString(" ")
    val docs = ((0 until 2000).map { i =>
      i.toLong -> s"common one two three four u${i}a u${i}b u${i}c u${i}d u${i}e"
    } ++ Seq(9001L -> words("k", 20),
      9002L -> (words("k", 19) + " kzz"))).toDF("doc_id", "text")
    val got = DedupOps.setSimJoin(docs).collect()
    assert(got.map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b")))
      .toSet == Set((9001L, 9002L)),
      "exactly the planted pair qualifies under the Zipf head")
    val (tk, dfreq) = DedupOps.setSimTokens(docs)
    val prefixKeys = DedupOps.prefixTokens(tk.join(dfreq, "token"),
      DedupOps.SetSimTBp).select("token").distinct()
      .collect().map(_.getString(0)).toSet
    assert(!prefixKeys.contains("common one two three four"),
      "the df=2000 boilerplate shingle must never be a prefix join key")
  }

  test("a LOW-ENTROPY hot prefix key is salted by row count — AQE's blind spot") {
    import spark.implicits._
    // AQE's skew split weighs COMPRESSED partition bytes, so a hot key
    // whose rows are near-identical strings (low entropy — 10× the rows
    // at ~1.2× the bytes, PERF.md's measurement) can escape splitting.
    // The engine's guard is df-driven instead: df IS the per-key row
    // count, known before the join. Corpus: 100 docs all sharing three
    // hot tokens (df=100, maximally compressible — the same bytes over
    // and over) plus one unique token each; at t=0.5 every prefix is
    // {unique, hot1, hot2}, so EVERY candidate collision rides a hot
    // key and the salted branch produces the entire answer. Parity
    // against the unsalted path proves the salt is lossless; the
    // all-pairs expectation proves it is complete.
    val n = 100
    val rows = (0 until n).flatMap { i =>
      Seq("hot1", "hot2", "hot3", f"uniq$i%03d").map(tok => (i.toLong, tok))
    }
    val tk = rows.toDF("doc_id", "token")
    val dfreq = tk.groupBy("token").agg(count(lit(1)).as("df"))
    assert(dfreq.filter(col("df") > 4).count() == 3,
      "the three hot tokens must exceed the test's salt bound")
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.select("doc_a", "doc_b").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val salted = DedupOps.setSimJoinTk(tk, dfreq, 5000L, hotDf = 4L, salts = 8)
    val unsalted = DedupOps.setSimJoinTk(tk, dfreq, 5000L,
      hotDf = Long.MaxValue)
    val all = (for (a <- 0 until n; b <- a + 1 until n)
      yield (a.toLong, b.toLong)).toSet
    assert(pairs(salted) == all,
      "the salted hot branch must produce every qualifying pair")
    assert(pairs(unsalted) == all, "parity baseline")
    // every pair scores J = 3/5 exactly
    salted.collect().foreach(r => assert(r.getAs[Long]("jacc_bp") == 6000L))
  }

  test("a heavy PREFIX key triggers the AQE skew split in the candidate self-join") {
    // When rarity CANNOT save the prefix join — every doc's rarest
    // token is the SAME token (the saturated-alphabet corner that burnt
    // sf3 in round 11) — the self-join's heavy partition is quadratic
    // work and the engine's fallback is AQE's skew split. The join is
    // built so both children are bare shuffle reads (the shape
    // OptimizeSkewedJoin requires; an aggregate-topped child can never
    // be split because the sibling partition can't be duplicated).
    // Token frame: 500 docs, identical 6-token sets, dfs all tie at 500
    // so "aaaa" sorts first by name and is a prefix key for every doc.
    // Confs live in a DERIVED session (same context, own SQLConf):
    // mutating the shared session's conf races with concurrently-running
    // suites whose plans are shape-sensitive — the TablePropertiesSpec
    // flake this isolation fixed.
    val ss = spark.newSession()
    Seq(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      // fixture-scaled thresholds; production keeps the 256MB default —
      // the MECHANISM is what's pinned (shuffle bytes are
      // post-compression, and 500 copies of one token compress hard)
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "1",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "1KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "1KB",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1"
    ).foreach { case (k, v) => ss.conf.set(k, v) }
    val rows = (0 until 500).flatMap { i =>
      ("aaaa" +: (1 to 5).map(j => s"zz$j")).map(tok => (i.toLong, tok))
    }
    val tk = ss.createDataFrame(rows).toDF("doc_id", "token")
    val dfreq = tk.groupBy("token").agg(count(lit(1)).as("df"))
    val cand = DedupOps.ppjoinCandidates(tk, dfreq, DedupOps.SetSimPpTBp)
    // identical sets: every pair survives every filter — the exact
    // count proves the split changed the schedule, not the answer
    assert(cand.collect().length == 500 * 499 / 2)
    val finalPlan = cand.queryExecution.executedPlan.toString
    assert(finalPlan.contains("skew=true"),
      s"AQE did not split the heavy prefix partition:\n${finalPlan.take(4000)}")
  }
}
