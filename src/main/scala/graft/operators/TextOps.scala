package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.engine.Tables
import graft.functions.GraftFunctions._

/** Text analysis over `documents` (SURVEY.md §2.2 LLM-pipeline rows):
  *
  *   - q50 token statistics per language
  *   - q51 language identification — corpus-derived top-token vocabulary
  *     per language, docs classified by vocabulary overlap (an n-gram
  *     heuristic with no external model; the vocabulary is itself a
  *     windowed top-k aggregation, so the whole classifier is one DAG)
  *   - q52 quality scoring — length / distinct-ratio / stopword-ratio
  *     buckets, all integer arithmetic (no float thresholds to drift)
  *   - q53 rolling-hash document fingerprinting (fixed-width, content
  *     defined), with collision counts
  *   - q54 regex tokenization counts (BPE-ish piece extraction)
  *   - q121 exact heavy hitters via the two-pass Misra–Gries shape:
  *     bounded-state candidate sketch, then an exact recount over the
  *     ≤K candidates — the final output is exact (and oracle-checkable)
  *     even though the candidate set depends on partial-merge order
  *
  * Scale: everything is explode → groupBy → window (shuffle-bounded);
  * the vocabulary join (q51) broadcasts (5 langs × 20 tokens). q121's
  * first pass carries at most K counters per partial aggregate — the
  * full-vocabulary shuffle that `groupBy(token)` would pay on a
  * billion-key corpus never happens; the second pass filters to ≤K
  * tokens map-side via a broadcast semi-join before its (tiny) shuffle.
  */
object TextOps {
  type Q = (SparkSession, String) => DataFrame

  val VocabTopN = 20
  val Stopwords = Seq("the", "a", "of", "and", "to")

  /** MG sketch capacity: exact-output threshold is count > N/(K+1). */
  val HeavyHitterK = 31

  /** q205 collision-probability ceiling in basis points: the fixture's
    * Zipf-free baseline sits near 1/|vocab| ≈ 320 bp with a p99 of ~550;
    * 800 flags only the genuinely repetition-heavy tail. */
  val DiversityMaxBp = 800L

  /** q186's published stopword list — an ENGLISH prior: the rule wants
    * evidence of connective prose, and these are English's connectives. */
  val GopherStopwords: Seq[String] =
    Seq("the", "be", "to", "of", "and", "that", "have", "with")

  /** The q186 Gopher rule pack over an arbitrary (doc_id, text) frame —
    * factored from the query entry so the composed pipeline (q117) can
    * gate its line-cleaned survivors with the identical algebra. See
    * the q186 entry for the design commentary. */
  private[graft] def gopherRules(docs: DataFrame): DataFrame =
    gopherRulesWith(docs, GopherStopwords)

  /** [[gopherRules]] under an arbitrary stopword list. The list is a
    * LANGUAGE PRIOR, not part of the rule algebra: on a non-English
    * corpus a pipeline localizes it (CCNet trains per-language; the
    * composed q117 derives it from the corpus's own top tokens — the
    * language-agnostic reading of "contains common connectives"). */
  private[graft] def gopherRulesWith(docs: DataFrame,
      stops: Seq[String]): DataFrame =
    docs
      // all nine statistics in ONE fused byte pass (GopherStatsExpr; the
      // HOF twin — per-token interpreted lambdas, two regexp passes,
      // three line filters — stays as the spec/oracle algebra, pinned
      // equal by GopherStatsSpec). OPTIMIZATION_r16.md O10.
      .select(col("doc_id"),
        graft.plans.GopherStatsExpr.gopherStats(col("text"), stops).as("g"))
      .select(col("doc_id"),
        col("g.n_words").as("n_words"),
        col("g.sum_len").as("sum_len"),
        col("g.n_hash").as("n_hash"),
        col("g.n_ellipsis").as("n_ellipsis"),
        col("g.bullet_lines").as("bullet_lines"),
        col("g.n_lines").as("n_lines"),
        col("g.ellipsis_lines").as("ellipsis_lines"),
        col("g.alpha_words").as("alpha_words"),
        col("g.stop_hits").as("stop_hits"))
      .withColumn("ok_words",
        col("n_words") >= 50 && col("n_words") <= 100000)
      .withColumn("ok_wordlen",
        col("sum_len") >= col("n_words") * 3 &&
          col("sum_len") <= col("n_words") * 10)
      .withColumn("ok_symbols",
        (col("n_hash") + col("n_ellipsis")) * 10 <= col("n_words"))
      .withColumn("ok_lines",
        col("bullet_lines") * 10 <= col("n_lines") * 9 &&
          col("ellipsis_lines") * 10 <= col("n_lines") * 3)
      .withColumn("ok_alpha", col("alpha_words") * 5 >= col("n_words") * 4)
      .withColumn("ok_stop", col("stop_hits") >= 2)
      .withColumn("keep",
        col("ok_words") && col("ok_wordlen") && col("ok_symbols") &&
          col("ok_lines") && col("ok_alpha") && col("ok_stop"))

  /** Oracle fragment: CTEs prefixed `$pre` ending in `$out(doc_id)` —
    * the docs of `$src` passing the full q186 Gopher pack against the
    * stopword set held by CTE `$stopsCte(token)` (the localized-list
    * contract of [[gopherRulesWith]]). */
  private[operators] def gopherKeepCteSql(src: String, pre: String,
      out: String, stopsCte: String): String =
    s"""${pre}base AS MATERIALIZED (SELECT doc_id,
       |    list_filter(string_split(text, ' '), t -> t != '') AS toks, text
       |  FROM $src),
       |${pre}hit AS MATERIALIZED (
       |  SELECT doc_id, count(DISTINCT t) AS stop_hits
       |  FROM (SELECT doc_id, unnest(list_distinct(toks)) AS t FROM ${pre}base) x
       |  JOIN $stopsCte st ON x.t = st.token GROUP BY doc_id),
       |$out AS MATERIALIZED (
       |  SELECT doc_id FROM (
       |    SELECT b.doc_id,
       |      CAST(len(toks) AS BIGINT) AS n_words,
       |      CAST(coalesce(list_sum(list_transform(toks, w -> strlen(w))), 0)
       |        AS BIGINT) AS sum_len,
       |      CAST(strlen(text) - strlen(replace(text, '#', '')) AS BIGINT) AS n_hash,
       |      CAST((strlen(text) - strlen(replace(text, '...', ''))) // 3
       |        AS BIGINT) AS n_ellipsis,
       |      CAST(len(list_filter(string_split(text, chr(10)),
       |        l -> l LIKE '- %' OR l LIKE '* %')) AS BIGINT) AS bullet_lines,
       |      CAST(len(string_split(text, chr(10))) AS BIGINT) AS n_lines,
       |      CAST(len(list_filter(string_split(text, chr(10)),
       |        l -> l LIKE '%...')) AS BIGINT) AS ellipsis_lines,
       |      CAST(len(list_filter(toks, w -> regexp_matches(w, '[A-Za-z]')))
       |        AS BIGINT) AS alpha_words,
       |      CAST(coalesce(h.stop_hits, 0) AS BIGINT) AS stop_hits
       |    FROM ${pre}base b LEFT JOIN ${pre}hit h USING (doc_id))
       |  WHERE n_words >= 50 AND n_words <= 100000
       |    AND sum_len >= n_words * 3 AND sum_len <= n_words * 10
       |    AND (n_hash + n_ellipsis) * 10 <= n_words
       |    AND bullet_lines * 10 <= n_lines * 9
       |    AND ellipsis_lines * 10 <= n_lines * 3
       |    AND alpha_words * 5 >= n_words * 4
       |    AND stop_hits >= 2)""".stripMargin

  /** Oracle fragment: CTEs prefixed `$pre` ending in `$out(doc_id)` —
    * the docs of `$src` passing the q200 repetition thresholds. */
  private[operators] def repetitionKeepCteSql(src: String, pre: String,
      out: String): String = {
    def gramSql(n: Int): String = {
      val parts = (0 until n).map(j => s"w[i+$j]").mkString(" || ' ' || ")
      s"""SELECT doc_id, unnest(list_transform(
         |    generate_series(1, len(w) - ${n - 1}), i -> $parts)) AS gram
         |  FROM ${pre}t""".stripMargin
    }
    def topSql(n: Int): String =
      s"""${pre}top$n AS MATERIALIZED (
         |  SELECT doc_id, cnt * length(gram) AS chars
         |  FROM (SELECT doc_id, gram, count(*) AS cnt,
         |          row_number() OVER (PARTITION BY doc_id
         |            ORDER BY count(*) DESC, gram) AS rn
         |        FROM (${gramSql(n)}) GROUP BY doc_id, gram)
         |  WHERE rn = 1)""".stripMargin
    s"""${pre}t AS MATERIALIZED (SELECT doc_id, text, string_split(text, ' ') AS w
       |           FROM $src),
       |${topSql(2)},
       |${topSql(3)},
       |${topSql(4)},
       |${pre}dup10 AS MATERIALIZED (
       |  SELECT doc_id, sum(cnt * length(gram)) AS chars
       |  FROM (SELECT doc_id, gram, count(*) AS cnt
       |        FROM (${gramSql(10)}) GROUP BY doc_id, gram)
       |  WHERE cnt >= 2 GROUP BY doc_id),
       |$out AS MATERIALIZED (
       |  SELECT b.doc_id FROM
       |    (SELECT doc_id, CAST(length(text) AS BIGINT) AS n_chars FROM ${pre}t) b
       |  LEFT JOIN ${pre}top2 v2 USING (doc_id)
       |  LEFT JOIN ${pre}top3 v3 USING (doc_id)
       |  LEFT JOIN ${pre}top4 v4 USING (doc_id)
       |  LEFT JOIN ${pre}dup10 vd USING (doc_id)
       |  WHERE (CASE WHEN n_chars > 0
       |      THEN coalesce(v2.chars, 0) * 10000 // n_chars ELSE 0 END) <= 2000
       |    AND (CASE WHEN n_chars > 0
       |      THEN coalesce(v3.chars, 0) * 10000 // n_chars ELSE 0 END) <= 1800
       |    AND (CASE WHEN n_chars > 0
       |      THEN coalesce(v4.chars, 0) * 10000 // n_chars ELSE 0 END) <= 1600
       |    AND (CASE WHEN n_chars > 0
       |      THEN coalesce(vd.chars, 0) * 10000 // n_chars ELSE 0 END) <= 1000)""".stripMargin
  }

  /** The q200 engine over an arbitrary (doc_id, text) frame, so specs
    * can drive planted spam/diverse/block-repetition corpora through
    * the exact algebra. See the q200 entry for the design commentary. */
  private[graft] def repetitionRules(docs: DataFrame): DataFrame = {
    // top{2,3,4} cover and dup10 are PER-DOCUMENT aggregates — the fused
    // RepStatsExpr computes all four inside the row, so the gate is a
    // map-only projection. The relational form exploded every gram with
    // multiplicity through FOUR corpus-wide exchanges (groupBy(doc_id,
    // gram) × {2,3,4,10}) plus three per-doc window sorts and four left
    // joins, purely to compute row-local statistics (guide §2.4;
    // OPTIMIZATION_r16.md O8). RepStatsSpec pins fused == relational.
    def bp(src: String, out: String): Column =
      expr(s"CASE WHEN n_chars > 0 " +
        s"THEN coalesce($src, 0L) * 10000 div n_chars ELSE 0L END").as(out)
    docs
      .select(col("doc_id"),
        length(col("text")).cast("long").as("n_chars"),
        graft.plans.RepStatsExpr.repStats(col("text")).as("st"))
      .select(col("doc_id"), col("n_chars"),
        bp("st.top2_chars", "top2_bp"),
        bp("st.top3_chars", "top3_bp"),
        bp("st.top4_chars", "top4_bp"),
        bp("st.dup10_chars", "dup10_bp"))
      .withColumn("keep",
        col("top2_bp") <= 2000 && col("top3_bp") <= 1800 &&
          col("top4_bp") <= 1600 && col("dup10_bp") <= 1000)
      .orderBy("doc_id")
  }

  /** q205's engine over an arbitrary (doc_id, text) frame — see the
    * q205 entry for the design commentary. The fold computes Σc(c−1)
    * incrementally over the SORTED token array: appending a token whose
    * run length was k adds (k+1)k − k(k−1) = 2k. */
  private[graft] def diversityGate(docs: DataFrame): DataFrame = {
    val ws = array_sort(tokens(col("text")))
    // prev seeds to "" — an actual empty first token compares equal to
    // the seed, which is still coll-correct (its run starts at 0, so the
    // first occurrence adds 2·0), but would leak one type out of a
    // fold-computed uniq; the type count therefore uses array_distinct.
    val acc0 = struct(lit("").as("prev"), lit(0L).as("run"), lit(0L).as("coll"))
    val fold = aggregate(ws, acc0, (a, w) => struct(
      w.as("prev"),
      when(w === a("prev"), a("run") + 1).otherwise(lit(1L)).as("run"),
      (a("coll") + when(w === a("prev"), a("run") * 2).otherwise(lit(0L))).as("coll")))
    docs
      // null-text docs are DROPPED, not emitted as null rows — the
      // oracle's unnest over NULL yields no rows, and the sibling
      // line-dedup engines (q202/q206) drop such docs the same way;
      // the fixture has no null text, but the engine must not depend
      // on that invariant (ADVICE r13).
      .filter(col("text").isNotNull)
      .select(col("doc_id"), size(ws).cast("long").as("n_tok"),
        size(array_distinct(ws)).cast("long").as("n_uniq"), fold.as("f"))
      .select(col("doc_id"), col("n_tok"), col("n_uniq"),
        col("f.coll").as("coll"))
      .withColumn("coll_bp", expr(
        "CASE WHEN n_tok > 1 THEN coll * 10000 div (n_tok * (n_tok - 1)) ELSE 0L END"))
      .withColumn("keep", col("coll_bp") <= DiversityMaxBp)
      .select("doc_id", "n_tok", "n_uniq", "coll_bp", "keep")
  }

  // ---- space-free scripts (q216/q217) ------------------------------------
  //
  // Real pretraining corpora carry CJK/Thai text with NO spaces; every
  // word-split gate (tokens = split(text, ' ')) silently sees one giant
  // token there. The script-aware path: detect space-free scripts by
  // codepoint range, tokenize them as codepoint n-grams (CharNgramsExpr,
  // the CCNet/SentencePiece fallback), words otherwise. The fixture has
  // no CJK bytes, so the stratum is DERIVED deterministically in-query
  // (the q211 pattern — both engines share the derivation bit-for-bit):
  // every doc_id % 3 == 0 doc transliterates its 36-char lowercase+digit
  // alphabet into 36 contiguous CJK codepoints and drops spaces.
  // ScaleGen is deliberately NOT extended: the driver's correctness gate
  // runs on ITS OWN sf0.01 fixture, which no ScaleGen stratum can reach —
  // the in-query derivation is the only form the gate can grade, and it
  // scales with the corpus at every sweep sf automatically.

  /** The 36-codepoint CJK alphabet (U+4E00..U+4E23) + the transliterate
    * source alphabet; space sits LAST in `from` with no counterpart, so
    * translate() drops it in both engines. */
  private[graft] val CjkAlphabet = "一丁丂七丄丅丆万丈三上下丌不与丏丐丑丒专且丕世丗丘丙业丛东丝丞丟丠両丢丣"
  private val TranslitFrom = "abcdefghijklmnopqrstuvwxyz0123456789 "

  /** The mixed-script corpus: doc_id % 3 == 0 → space-free CJK
    * transliteration, others keep their Latin text. `lang` rides along
    * for the stratified consumers (the script pipeline packs per
    * stratum); single-column consumers project it away. */
  private[graft] def scriptMixed(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), col("lang"),
      when(col("doc_id") % 3 === 0,
        translate(col("text"), TranslitFrom, CjkAlphabet))
        .otherwise(col("text")).as("text"))

  /** Space-free-script detection by codepoint range: a doc is `cjk` when
    * more than half its codepoints sit in the CJK alphabet — counted by
    * length-difference after translate-removal, no regex dialect risk. */
  private[graft] def scriptOf(text: Column): Column =
    when((length(text) - length(translate(text, CjkAlphabet, ""))) * 2
      > length(text), lit("cjk")).otherwise(lit("latin"))

  /** Script-aware tokens: codepoint BIGRAMS for space-free scripts (the
    * standard CJK unit), whitespace words otherwise. */
  private[graft] def scriptTokens(text: Column, script: Column): Column =
    when(script === "cjk",
      graft.plans.CharNgramsExpr.charNgrams(text, 2))
      .otherwise(split(text, " "))

  val queries: Map[String, Q] = Map(
    // Script-aware tokenization over the mixed-script corpus: per doc,
    // the detected script, codepoint count, token count under the
    // script's tokenizer, distinct-token count, and an order-sensitive
    // digest of the token stream — the oracle recomputes all of it with
    // DuckDB's codepoint algebra (substring/length count CODEPOINTS in
    // both engines; translate drops unmatched chars in both).
    "q216_script_tokenize" -> ((s, dir) => {
      val mixed = scriptMixed(Tables.documents(s, dir))
        .withColumn("script", scriptOf(col("text")))
      mixed
        .withColumn("toks", scriptTokens(col("text"), col("script")))
        .select(col("doc_id"), col("script"),
          length(col("text")).as("n_cp"),
          size(col("toks")).as("n_tokens"),
          size(array_distinct(col("toks"))).as("n_distinct"),
          md5(array_join(col("toks"), "|")).as("tok_md5"))
        .orderBy("doc_id")
    }),

    // q80's repetition rule RE-RUN on the space-free stratum with
    // script-aware tokens: the duplicate-token ratio gate that word
    // tokens compute for Latin docs now computes over codepoint bigrams
    // for the CJK docs — on the OLD path every CJK doc was one token
    // (ratio 0, trivially kept), so the gate was blind to the stratum.
    "q217_script_repetition" -> ((s, dir) => {
      // the raw-column null gate gives the scan a PUSHABLE IsNotNull
      // (the prefixDups pattern) — the real gate below is on a computed
      // column and can never push
      val mixed = scriptMixed(Tables.documents(s, dir)
          .filter(col("text").isNotNull))
        .withColumn("script", scriptOf(col("text")))
      mixed
        .withColumn("toks", scriptTokens(col("text"), col("script")))
        .filter(size(col("toks")) > 0)
        .select(col("doc_id"), col("script"),
          size(col("toks")).as("n_tokens"),
          size(array_distinct(col("toks"))).as("n_distinct"))
        .withColumn("dup_bp",
          expr("(n_tokens - n_distinct) * 10000L div n_tokens"))
        .withColumn("keep", col("dup_bp") <= 6000L)
        .orderBy("doc_id")
    }),

    "q50_token_stats" -> ((s, dir) => {
      Tables.documents(s, dir)
        .select(col("lang"), tokens(col("text")).as("toks"))
        .select(col("lang"), size(col("toks")).as("n_tok"),
          size(array_distinct(col("toks"))).as("n_uniq"))
        .groupBy("lang")
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_tok")).as("sum_tokens"),
          sum(col("n_uniq")).as("sum_uniq"),
          max(col("n_tok")).as("max_tokens"))
        .orderBy("lang")
    }),

    "q51_lang_id" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      val tokCounts = docs.select(col("lang"), explode(tokens(col("text"))).as("token"))
        .groupBy("lang", "token").agg(count(lit(1)).as("cnt"))
      val wv = Window.partitionBy("lang").orderBy(col("cnt").desc, col("token"))
      val vocab = tokCounts.withColumn("rn", row_number().over(wv))
        .filter(col("rn") <= VocabTopN)
        .select(col("lang").as("vlang"), col("token"))
      val docToks = docs.select(col("doc_id"), explode(array_distinct(tokens(col("text")))).as("token"))
      val scores = docToks.join(broadcast(vocab), "token")
        .groupBy("doc_id", "vlang").agg(count(lit(1)).as("matches"))
      val wp = Window.partitionBy("doc_id").orderBy(col("matches").desc, col("vlang"))
      val pred = scores.withColumn("rn", row_number().over(wp))
        .filter(col("rn") === 1)
        .select(col("doc_id"), col("vlang"), col("matches"))
      val predicted = coalesce(col("vlang"), lit("xx"))
      docs.select(col("doc_id"), col("lang"))
        .join(pred, Seq("doc_id"), "left")
        .select(col("doc_id"),
          predicted.as("predicted"),
          coalesce(col("matches"), lit(0L)).as("matches"),
          col("lang").as("actual"),
          when(predicted === col("lang"), 1).otherwise(0).as("correct"))
        .orderBy("doc_id")
    }),

    // RÉNYI-2 / SIMPSON DIVERSITY GATE: the collision probability of the
    // doc's unigram distribution — Σ c_w(c_w−1) / (N(N−1)) in exact basis
    // points. This is exp(−H₂) (second-order entropy) WITHOUT logarithms:
    // an entropy-in-floats gate would drift between engines in the last
    // ulp of ln(); the collision form is pure integer arithmetic, so it
    // replays bit-for-bit. It is the 2nd-order complement of q52's
    // distinct-ratio (1st order: how many types) — collision probability
    // weights the HEAD of the distribution, catching "one word repeated,
    // padded with variety" spam that a type-token ratio forgives. Scale
    // shape: ZERO exchanges — one fold over the sorted token array per
    // row computes Σc(c−1) incrementally (appending a token whose run was
    // k adds 2k), so the gate rides any scan at any corpus size.
    "q205_diversity_gate" -> ((s, dir) =>
      diversityGate(Tables.documents(s, dir)).orderBy("doc_id")),

    "q52_quality_score" -> ((s, dir) => {
      Tables.documents(s, dir)
        .select(col("doc_id"), col("n_chars"), tokens(col("text")).as("toks"))
        .select(col("doc_id"), col("n_chars"),
          size(col("toks")).as("n_tok"),
          size(array_distinct(col("toks"))).as("n_uniq"),
          aggregate(col("toks"), lit(0L), (acc, t) => acc + length(t)).as("sum_len"),
          size(filter(col("toks"), t => t.isin(Stopwords: _*))).as("stop_cnt"))
        .withColumn("avg_len_x100", expr("sum_len * 100 div n_tok"))
        .withColumn("bucket",
          when(col("n_uniq") * 10 >= col("n_tok") * 7 && col("stop_cnt") * 10 <= col("n_tok") * 3, "high")
            .when(col("n_uniq") * 10 >= col("n_tok") * 4, "mid")
            .otherwise("low"))
        .select("doc_id", "n_chars", "n_tok", "n_uniq", "avg_len_x100", "stop_cnt", "bucket")
        .orderBy("doc_id")
    }),

    // GOPHER QUALITY RULE PACK (Rae et al. 2022, Appendix A — the
    // published per-document heuristics production web pipelines apply
    // verbatim): word-count bounds, mean-word-length band, symbol-to-
    // word ratio (# and ellipsis), bullet/ellipsis line fractions,
    // alphabetic-word share, and the >=2-distinct-stopwords requirement.
    // Every rule is integer-exact (ratios compare as cross-multiplied
    // integers, never floats), so the verdict — and each per-rule flag,
    // which is what a curation pipeline logs for drift dashboards —
    // replays bit-for-bit in any engine. One scan, one projection: the
    // rule pack is embarrassingly parallel at any corpus size.
    "q186_gopher_rules" -> ((s, dir) =>
      gopherRules(Tables.documents(s, dir)).orderBy("doc_id")),

    // GOPHER REPETITION RULES (Rae et al. 2021, Table A1 — the half of
    // the Gopher filter q186 doesn't cover): documents dominated by
    // REPEATED n-grams are boilerplate/spam regardless of their other
    // quality stats. Signals, all exact integer basis points of the
    // doc's characters:
    //   - top{2,3,4}_bp — characters occupied by ALL occurrences of the
    //     doc's single most frequent word n-gram (ties broken by gram
    //     text; removal thresholds 0.20/0.18/0.16);
    //   - dup10_bp — characters of every occurrence of 10-grams seen
    //     more than once (the published convention counts overlapping
    //     occurrences independently, so the figure can exceed 10000 on
    //     pathological repetition — consumers clip; threshold 0.10).
    // Gram chars include the joining spaces (both engines build grams
    // identically, so the statistic replays bit-for-bit). Scale shape:
    // one multiplicity-preserving shingle explode per n (the codegen'd
    // ShinglesExpr kernel), per-(doc, gram) counts partial-aggregate
    // map-side, the top pick is a per-doc window over the doc's OWN
    // grams — never a relation-wide sort.
    "q200_repetition_rules" -> ((s, dir) =>
      repetitionRules(Tables.documents(s, dir))),

    "q53_fingerprint" -> ((s, dir) => {
      Tables.documents(s, dir)
        .select(col("doc_id"), rollingFingerprint(col("text")).as("fp"))
        .withColumn("fp_count", count(lit(1)).over(Window.partitionBy("fp")))
        .orderBy("doc_id")
    }),

    // n-gram frequency ranking: top-10 bigrams per language — explode ->
    // count -> WindowGroupLimit (Spark pushes the rank filter into the
    // shuffle, so only ~k rows per group survive the exchange).
    // Shingling uses the codegen'd single-pass ShinglesExpr in its
    // multiplicity-preserving mode (frequency counting needs duplicate
    // bigrams): the HOF twin re-evaluates split(text) for each of its ~5
    // subexpression uses inside Generate (no CSE there), measured ~1.7x
    // slower here; the two are equality-pinned by ExtensionsSpec so the
    // oracle is unmoved.
    "q58_ngram_topk" -> ((s, dir) => {
      val w = Window.partitionBy("lang").orderBy(col("cnt").desc, col("bigram"))
      Tables.documents(s, dir)
        .select(col("lang"),
          explode(graft.plans.ShinglesExpr.shinglesAllNative(col("text"), 2)).as("bigram"))
        .groupBy("lang", "bigram").agg(count(lit(1)).as("cnt"))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 10)
        .select("lang", "rn", "bigram", "cnt")
        .orderBy("lang", "rn")
    }),

    // Two-pass exact heavy hitters. Pass 1 never shuffles the vocabulary:
    // each partial aggregate is a <=K-counter Misra-Gries sketch, merged
    // associatively; any token with true frequency > N/(K+1) is guaranteed
    // among the <=K candidates. Pass 2 recounts ONLY the candidates
    // (broadcast semi-join prunes map-side) and applies the exact
    // threshold, which removes the sketch's order-dependent false
    // positives — so the result is exact and deterministic.
    "q121_heavy_hitters" -> ((s, dir) => {
      val toks = Tables.documents(s, dir)
        .select(explode(tokens(col("text"))).as("token"))
      // one scan: sketch + N together (a second scan just for count(*)
      // would double the pass-1 I/O)
      val cands = toks
        .agg(graft.functions.Sketches.mgCandidates(HeavyHitterK)(col("token")).as("cands"),
          count(lit(1)).as("n_total"))
        .select(explode(col("cands")).as("token"), col("n_total"))
      toks.join(broadcast(cands), Seq("token"))
        .groupBy("token", "n_total").agg(count(lit(1)).as("cnt"))
        .filter(col("cnt") * (HeavyHitterK + 1) > col("n_total"))
        .select(col("token"), col("cnt"), col("n_total"))
        .orderBy("token")
    }),

    "q54_regex_tokens" -> ((s, dir) => {
      Tables.documents(s, dir)
        .select(col("doc_id"), col("text"), tokens(col("text")).as("toks"))
        .select(col("doc_id"),
          size(filter(col("toks"), t => t.rlike("^[a-z]+$"))).as("n_alpha"),
          size(filter(col("toks"), t => t.rlike("^[0-9]+$"))).as("n_num"),
          size(filter(col("toks"), t => length(t) >= 6)).as("n_long"),
          size(regexp_extract_all(col("text"), lit("[a-z]+"), lit(0))).as("n_pieces"))
        .orderBy("doc_id")
    }),

    // Bigram-LM corpus-fit scoring — the CCNet/Gopher perplexity-filter
    // shape (score each document under a language model, gate on the
    // score), self-trained here and formulated in EXACT integer
    // arithmetic so any engine replays it bit-identically: instead of
    // average log-probability (libm log differs across engines), the
    // score is the average CONDITIONAL PROBABILITY of each bigram in
    // micro-units — p_u(w1 w2) = c(w1 w2) · 10⁶ div c(w1 ·), per-doc
    // score = Σ p_u div n_bigrams. Low scores mark documents whose word
    // transitions the corpus finds improbable (lorem-garbage, OCR
    // shred, wrong-language shards); the keep verdict gates on a
    // calibration constant. Scale: training IS the two aggregates
    // (bigram counts, prefix totals), scoring is one equi-join per
    // bigram occurrence — all key-bounded shuffles, no corpus
    // all-pairs. At 100 TB the bigram table itself is the big shuffle;
    // the hashed-feature variant (q142) bounds that table at a fixed
    // width when the full vocabulary is too wide.
    "q141_lm_quality" -> ((s, dir) => {
      val toks = Tables.documents(s, dir)
        .select(col("doc_id"), tokens(col("text")).as("t"))
      val bg = toks.select(col("doc_id"), explode(expr(
          "transform(slice(t, 1, size(t) - 1), (x, i) -> struct(x AS w1, t[i + 1] AS w2))"))
          .as("b"))
        .select(col("doc_id"), col("b.w1").as("w1"), col("b.w2").as("w2"))
      val bgCounts = bg.groupBy("w1", "w2").agg(count(lit(1)).as("c_bg"))
      val prefCounts = bgCounts.groupBy("w1").agg(sum(col("c_bg")).as("c_pref"))
      bg.join(bgCounts, Seq("w1", "w2"))
        .join(prefCounts, Seq("w1"))
        .withColumn("p_u", expr("c_bg * 1000000 div c_pref"))
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_bigrams"),
          expr("sum(p_u) div count(1)").as("score_u"))
        .withColumn("keep", col("score_u") >= LmKeepU)
        .orderBy("doc_id")
    }))

  /** q141 keep threshold in micro-units: documents whose average bigram
    * conditional probability falls below this read as corpus-misfit. A
    * calibration constant (deployments tune it on a scored sample), so
    * both engines share one value. */
  val LmKeepU = 34000L

  // ---- DuckDB oracle ------------------------------------------------------

  private val toksSql = "string_split(text,' ')"

  private val scriptMixedSql =
    s"""m AS (SELECT doc_id,
       |    CASE WHEN doc_id % 3 = 0
       |      THEN translate(text, 'abcdefghijklmnopqrstuvwxyz0123456789 ', '$CjkAlphabet')
       |      ELSE text END AS text
       |  FROM documents),
       |sc AS (SELECT doc_id, text,
       |    CASE WHEN (length(text) - length(translate(text, '$CjkAlphabet', ''))) * 2
       |      > length(text) THEN 'cjk' ELSE 'latin' END AS script
       |  FROM m),
       |tk AS (SELECT doc_id, script,
       |    CAST(length(text) AS INTEGER) AS n_cp,
       |    CASE WHEN script = 'cjk'
       |      THEN list_transform(generate_series(1, length(text) - 1),
       |        i -> substring(text, CAST(i AS INTEGER), 2))
       |      ELSE string_split(text, ' ') END AS toks
       |  FROM sc)""".stripMargin.replace("\n", " ")

  val oracle: Map[String, String] = Map(
    "q216_script_tokenize" ->
      s"""WITH $scriptMixedSql
         |SELECT doc_id, script, n_cp,
         |  CAST(len(toks) AS INTEGER) AS n_tokens,
         |  CAST(len(list_distinct(toks)) AS INTEGER) AS n_distinct,
         |  md5(array_to_string(toks, '|')) AS tok_md5
         |FROM tk ORDER BY doc_id""".stripMargin,

    "q217_script_repetition" ->
      s"""WITH $scriptMixedSql
         |SELECT doc_id, script,
         |  CAST(len(toks) AS INTEGER) AS n_tokens,
         |  CAST(len(list_distinct(toks)) AS INTEGER) AS n_distinct,
         |  CAST((len(toks) - len(list_distinct(toks))) * 10000 // len(toks) AS BIGINT) AS dup_bp,
         |  ((len(toks) - len(list_distinct(toks))) * 10000 // len(toks)) <= 6000 AS keep
         |FROM tk WHERE len(toks) > 0 ORDER BY doc_id""".stripMargin,

    "q186_gopher_rules" ->
      """WITH base AS (
        |  SELECT doc_id,
        |    list_filter(string_split(text, ' '), t -> t != '') AS toks,
        |    text
        |  FROM documents),
        |m AS (
        |  SELECT doc_id,
        |    CAST(len(toks) AS BIGINT) AS n_words,
        |    CAST(coalesce(list_sum(list_transform(toks, w -> strlen(w))), 0)
        |      AS BIGINT) AS sum_len,
        |    CAST(strlen(text) - strlen(replace(text, '#', '')) AS BIGINT) AS n_hash,
        |    CAST((strlen(text) - strlen(replace(text, '...', ''))) // 3
        |      AS BIGINT) AS n_ellipsis,
        |    CAST(len(list_filter(string_split(text, chr(10)),
        |      l -> l LIKE '- %' OR l LIKE '* %')) AS BIGINT) AS bullet_lines,
        |    CAST(len(string_split(text, chr(10))) AS BIGINT) AS n_lines,
        |    CAST(len(list_filter(string_split(text, chr(10)),
        |      l -> l LIKE '%...')) AS BIGINT) AS ellipsis_lines,
        |    CAST(len(list_filter(toks, w -> regexp_matches(w, '[A-Za-z]')))
        |      AS BIGINT) AS alpha_words,
        |    CAST(len(list_intersect(list_distinct(toks),
        |      ['the','be','to','of','and','that','have','with']))
        |      AS BIGINT) AS stop_hits
        |  FROM base)
        |SELECT *,
        |  (ok_words AND ok_wordlen AND ok_symbols AND ok_lines
        |   AND ok_alpha AND ok_stop) AS keep
        |FROM (
        |  SELECT *,
        |    (n_words >= 50 AND n_words <= 100000) AS ok_words,
        |    (sum_len >= n_words * 3 AND sum_len <= n_words * 10) AS ok_wordlen,
        |    ((n_hash + n_ellipsis) * 10 <= n_words) AS ok_symbols,
        |    (bullet_lines * 10 <= n_lines * 9
        |     AND ellipsis_lines * 10 <= n_lines * 3) AS ok_lines,
        |    (alpha_words * 5 >= n_words * 4) AS ok_alpha,
        |    (stop_hits >= 2) AS ok_stop
        |  FROM m) ORDER BY doc_id""".stripMargin,
    "q200_repetition_rules" -> {
      def gramSql(n: Int): String = {
        val parts = (0 until n).map(j => s"w[i+$j]").mkString(" || ' ' || ")
        s"""SELECT doc_id, unnest(list_transform(
           |    generate_series(1, len(w) - ${n - 1}), i -> $parts)) AS gram
           |  FROM t""".stripMargin
      }
      def topSql(n: Int): String =
        s"""top$n AS (
           |  SELECT doc_id, cnt * length(gram) AS top${n}_chars
           |  FROM (SELECT doc_id, gram, count(*) AS cnt,
           |          row_number() OVER (PARTITION BY doc_id
           |            ORDER BY count(*) DESC, gram) AS rn
           |        FROM (${gramSql(n)}) GROUP BY doc_id, gram)
           |  WHERE rn = 1)""".stripMargin
      s"""WITH t AS (SELECT doc_id, text, string_split(text, ' ') AS w
         |           FROM documents),
         |${topSql(2)},
         |${topSql(3)},
         |${topSql(4)},
         |dup10 AS (
         |  SELECT doc_id, sum(cnt * length(gram)) AS dup10_chars
         |  FROM (SELECT doc_id, gram, count(*) AS cnt
         |        FROM (${gramSql(10)}) GROUP BY doc_id, gram)
         |  WHERE cnt >= 2 GROUP BY doc_id),
         |b AS (SELECT doc_id, CAST(length(text) AS BIGINT) AS n_chars FROM t)
         |SELECT doc_id, n_chars, top2_bp, top3_bp, top4_bp, dup10_bp,
         |  (top2_bp <= 2000 AND top3_bp <= 1800
         |   AND top4_bp <= 1600 AND dup10_bp <= 1000) AS keep
         |FROM (
         |  SELECT doc_id, n_chars,
         |    CAST(CASE WHEN n_chars > 0
         |      THEN coalesce(top2_chars, 0) * 10000 // n_chars ELSE 0 END
         |      AS BIGINT) AS top2_bp,
         |    CAST(CASE WHEN n_chars > 0
         |      THEN coalesce(top3_chars, 0) * 10000 // n_chars ELSE 0 END
         |      AS BIGINT) AS top3_bp,
         |    CAST(CASE WHEN n_chars > 0
         |      THEN coalesce(top4_chars, 0) * 10000 // n_chars ELSE 0 END
         |      AS BIGINT) AS top4_bp,
         |    CAST(CASE WHEN n_chars > 0
         |      THEN coalesce(dup10_chars, 0) * 10000 // n_chars ELSE 0 END
         |      AS BIGINT) AS dup10_bp
         |  FROM b
         |  LEFT JOIN top2 USING (doc_id) LEFT JOIN top3 USING (doc_id)
         |  LEFT JOIN top4 USING (doc_id) LEFT JOIN dup10 USING (doc_id))
         |ORDER BY doc_id""".stripMargin
    },

    "q50_token_stats" ->
      s"""SELECT lang, count(*) AS n_docs,
         |  CAST(sum(len($toksSql)) AS BIGINT) AS sum_tokens,
         |  CAST(sum(len(list_distinct($toksSql))) AS BIGINT) AS sum_uniq,
         |  CAST(max(len($toksSql)) AS INTEGER) AS max_tokens
         |FROM documents GROUP BY lang ORDER BY lang""".stripMargin,

    "q51_lang_id" ->
      s"""WITH tc AS (
         |  SELECT lang, unnest($toksSql) AS token FROM documents),
         |counts AS (SELECT lang, token, count(*) AS cnt FROM tc GROUP BY 1, 2),
         |vocab AS (SELECT lang AS vlang, token FROM (
         |  SELECT lang, token, row_number() OVER
         |    (PARTITION BY lang ORDER BY cnt DESC, token) AS rn FROM counts)
         |  WHERE rn <= $VocabTopN),
         |dt AS (SELECT doc_id, unnest(list_distinct($toksSql)) AS token FROM documents),
         |scores AS (SELECT doc_id, vlang, count(*) AS matches
         |  FROM dt JOIN vocab USING (token) GROUP BY 1, 2),
         |pred AS (SELECT doc_id, vlang, matches FROM (
         |  SELECT doc_id, vlang, matches, row_number() OVER
         |    (PARTITION BY doc_id ORDER BY matches DESC, vlang) AS rn FROM scores)
         |  WHERE rn = 1)
         |SELECT d.doc_id,
         |  coalesce(p.vlang, 'xx') AS predicted,
         |  coalesce(p.matches, 0) AS matches,
         |  d.lang AS actual,
         |  CASE WHEN coalesce(p.vlang, 'xx') = d.lang THEN 1 ELSE 0 END AS correct
         |FROM documents d LEFT JOIN pred p ON d.doc_id = p.doc_id
         |ORDER BY d.doc_id""".stripMargin,

    // the oracle states the SEMANTICS (per-token counts via group-by);
    // the engine's single-fold incremental form must agree exactly
    "q205_diversity_gate" ->
      s"""WITH t AS (SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents),
         |c AS (SELECT doc_id, w, count(*) AS c FROM t GROUP BY 1, 2)
         |SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_tok,
         |  count(*) AS n_uniq,
         |  CAST(CASE WHEN sum(c) > 1
         |    THEN sum(c*(c-1)) * 10000 // (sum(c) * (sum(c)-1))
         |    ELSE 0 END AS BIGINT) AS coll_bp,
         |  (CASE WHEN sum(c) > 1
         |    THEN sum(c*(c-1)) * 10000 // (sum(c) * (sum(c)-1))
         |    ELSE 0 END) <= $DiversityMaxBp AS keep
         |FROM c GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    "q52_quality_score" ->
      s"""SELECT doc_id, n_chars, n_tok, n_uniq,
         |  sum_len * 100 // n_tok AS avg_len_x100, stop_cnt,
         |  CASE WHEN n_uniq*10 >= n_tok*7 AND stop_cnt*10 <= n_tok*3 THEN 'high'
         |       WHEN n_uniq*10 >= n_tok*4 THEN 'mid' ELSE 'low' END AS bucket
         |FROM (
         |  SELECT doc_id, n_chars,
         |    CAST(len($toksSql) AS INTEGER) AS n_tok,
         |    CAST(len(list_distinct($toksSql)) AS INTEGER) AS n_uniq,
         |    list_reduce(list_transform($toksSql, t -> CAST(length(t) AS BIGINT)),
         |      (acc, v) -> acc + v) AS sum_len,
         |    CAST(len(list_filter($toksSql,
         |      t -> t IN (${Stopwords.map("'" + _ + "'").mkString(", ")}))) AS INTEGER) AS stop_cnt
         |  FROM documents)
         |ORDER BY doc_id""".stripMargin,

    "q53_fingerprint" ->
      s"""SELECT doc_id, fp, count(*) OVER (PARTITION BY fp) AS fp_count FROM (
         |  SELECT doc_id, list_reduce(
         |    list_transform($toksSql, t -> CAST(length(t)*256 + ascii(t) AS BIGINT)),
         |    (acc, c) -> (acc*31 + c) % 1000000007) AS fp
         |  FROM documents)
         |ORDER BY doc_id""".stripMargin,

    "q58_ngram_topk" ->
      s"""WITH bg AS (
         |  SELECT lang, unnest(list_transform(
         |    generate_series(1, len($toksSql) - 1),
         |    i -> ($toksSql)[i] || ' ' || ($toksSql)[i+1])) AS bigram
         |  FROM documents WHERE len($toksSql) >= 2),
         |c AS (SELECT lang, bigram, count(*) AS cnt FROM bg GROUP BY 1, 2)
         |SELECT lang, rn, bigram, cnt FROM (
         |  SELECT lang, bigram, cnt,
         |    row_number() OVER (PARTITION BY lang ORDER BY cnt DESC, bigram) AS rn
         |  FROM c)
         |WHERE rn <= 10 ORDER BY lang, rn""".stripMargin,

    "q121_heavy_hitters" ->
      s"""WITH toks AS (SELECT unnest($toksSql) AS token FROM documents),
         |tot AS (SELECT count(*) AS n_total FROM toks)
         |SELECT token, count(*) AS cnt, n_total
         |FROM toks, tot GROUP BY token, n_total
         |HAVING count(*) * ${HeavyHitterK + 1} > n_total
         |ORDER BY token""".stripMargin,

    "q54_regex_tokens" ->
      s"""SELECT doc_id,
         |  CAST(len(list_filter($toksSql, t -> regexp_full_match(t, '[a-z]+'))) AS INTEGER) AS n_alpha,
         |  CAST(len(list_filter($toksSql, t -> regexp_full_match(t, '[0-9]+'))) AS INTEGER) AS n_num,
         |  CAST(len(list_filter($toksSql, t -> length(t) >= 6)) AS INTEGER) AS n_long,
         |  CAST(len(regexp_extract_all(text, '[a-z]+')) AS INTEGER) AS n_pieces
         |FROM documents ORDER BY doc_id""".stripMargin,

    // DuckDB lists are 1-based: i in [1, len-1] pairs t[i] with t[i+1],
    // exactly Spark's 0-based transform over slice(t, 1, n-1); two
    // aligned unnests zip positionally
    "q141_lm_quality" ->
      s"""WITH toks AS (SELECT doc_id, $toksSql AS t FROM documents),
         |bg AS (SELECT doc_id,
         |    unnest(list_transform(generate_series(1, greatest(len(t) - 1, 0)), i -> t[i])) AS w1,
         |    unnest(list_transform(generate_series(1, greatest(len(t) - 1, 0)), i -> t[i+1])) AS w2
         |  FROM toks),
         |bc AS (SELECT w1, w2, count(*) AS c_bg FROM bg GROUP BY 1, 2),
         |pc AS (SELECT w1, CAST(sum(c_bg) AS BIGINT) AS c_pref FROM bc GROUP BY 1),
         |scored AS (
         |  SELECT doc_id, count(*) AS n_bigrams,
         |    CAST(sum((c_bg * 1000000) // c_pref) // count(*) AS BIGINT) AS score_u
         |  FROM bg JOIN bc USING (w1, w2) JOIN pc USING (w1)
         |  GROUP BY doc_id)
         |SELECT doc_id, n_bigrams, score_u, score_u >= $LmKeepU AS keep
         |FROM scored ORDER BY doc_id""".stripMargin)
}
