package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.engine.Tables
import graft.plans.BpeApplyExpr

/** BPE tokenizer TRAINING (Sennrich et al. 2016) — the missing piece of
  * the tokenizer story (q54 extracts BPE-ish pieces with a fixed regex;
  * this LEARNS the merge table from the corpus):
  *
  *   - q165 round-0 merge candidates: adjacent character-pair counts
  *     over the word-frequency table, top-20
  *   - q166 the trained merge table itself — [[BpeRounds]] rounds of
  *     (count pairs → argmax → merge), the exact greedy loop of the
  *     original paper and of every production trainer
  *   - q167 corpus encoded under the trained merges: per-document BPE
  *     token counts (the compression the tokenizer buys)
  *
  * Scale design — the word-frequency formulation every real trainer
  * (sentencepiece, HF tokenizers) uses: the corpus is read ONCE into a
  * `(word, count)` table, and all training rounds iterate over that
  * table, whose size is the corpus VOCABULARY (Heaps' law: millions of
  * rows at 100 TB, not trillions). Each round is one narrow projection
  * (re-tokenize from the raw word under the merges-so-far — a
  * per-expression constant, so no lineage growth and no checkpoint
  * churn) + one pair-keyed aggregate (map-side combine; key space =
  * observed token pairs) + an ordered LIMIT 1 (TakeOrdered — one
  * driver row per round, the same driver footprint as q139's Lloyd
  * codebook). Encoding (q167) is embarrassingly parallel: the merge
  * list rides inside [[BpeApplyExpr]] like a broadcast codebook.
  *
  * Determinism contract (both engines, exact): counts are integer word
  * frequencies; argmax tie-breaks on (count DESC, left token ASC,
  * right token ASC) over the REAL token strings; merging is
  * left-to-right non-overlapping (see [[BpeApplyExpr]] for the proof
  * that SQL `replace` on the oracle's placeholder encoding picks the
  * same positions). The DuckDB oracle replays training with one CTE
  * round per merge — placeholder characters from the Unicode private
  * use area stand in for merged tokens so each token stays one
  * character, and a vocabulary CTE maps placeholders back to real
  * token strings for tie-breaking and output (the same unrolled-replay
  * pattern as q139's Lloyd oracle).
  */
object BpeOps {
  type Q = (SparkSession, String) => DataFrame

  /** Fixed training rounds — like q139's KmIters, fixed (not
    * convergence-tested) so the oracle replays identical rounds. */
  val BpeRounds = 6

  /** Top-k for the round-0 candidate listing (q165). */
  val PairTopK = 20

  /** One corpus pass: the word-frequency table (space tokenization —
    * the corpus-wide convention shared with q50–q54's oracles). */
  private def wordFreq(docs: DataFrame): DataFrame =
    docs.select(explode(split(col("text"), " ")).as("word"))
      .filter(length(col("word")) >= 1)
      .groupBy("word").agg(count(lit(1)).as("wc"))

  /** Adjacent token pairs of `toks` as `struct(l, r)` — empty when the
    * word is a single token (Spark's `sequence(1, 0)` would count DOWN,
    * so the guard is load-bearing). */
  private def pairCol(toks: Column): Column =
    when(size(toks) >= 2,
      transform(sequence(lit(0), size(toks) - 2),
        i => struct(get(toks, i).as("l"), get(toks, i + 1).as("r"))))
      .otherwise(array().cast("array<struct<l:string,r:string>>"))

  /** The greedy training loop: returns (round, left, right, count) per
    * merge, memoized per (sfDir, rounds) so q166 and q167 share one
    * training run per session. */
  private val mergeMemo =
    scala.collection.concurrent.TrieMap[(String, Int), Seq[(Int, String, String, Long)]]()

  private[graft] def trainedMerges(s: SparkSession, dir: String,
      rounds: Int = BpeRounds): Seq[(Int, String, String, Long)] =
    // synchronized: TrieMap.getOrElseUpdate may evaluate the op twice
    // under contention — duplicate TRAINING runs, not corruption; the
    // lock makes a concurrent sweep pay training once
    mergeMemo.synchronized { mergeMemo.getOrElseUpdate((dir, rounds), {
      // the word table is every round's input: pin it (small — the
      // vocabulary) so rounds don't re-read and re-aggregate the corpus
      val words = wordFreq(Tables.documents(s, dir)).localCheckpoint()
      var merges = Vector.empty[(String, String)]
      val out = Vector.newBuilder[(Int, String, String, Long)]
      for (r <- 1 to rounds) {
        val toks = BpeApplyExpr.bpeApply(col("word"), merges)
        val top = words
          .select(col("wc"), explode(pairCol(toks)).as("p"))
          .groupBy(col("p.l").as("l"), col("p.r").as("r"))
          .agg(sum(col("wc")).as("cnt"))
          .orderBy(col("cnt").desc, col("l"), col("r"))
          .limit(1).collect()
        require(top.nonEmpty,
          s"BPE training round $r found no adjacent pairs — corpus too " +
            "small for the configured rounds")
        val row = top.head
        val (l, rr, c) = (row.getString(0), row.getString(1), row.getLong(2))
        merges :+= ((l, rr))
        out += ((r, l, rr, c))
      }
      out.result()
    }) }

  val queries: Map[String, Q] = Map(
    // round-0 merge candidates: the character-bigram frequency table
    // every BPE run starts from
    "q165_bpe_pairs" -> ((s, dir) => {
      val chars = BpeApplyExpr.bpeApply(col("word"), Seq.empty)
      wordFreq(Tables.documents(s, dir))
        .select(col("wc"), explode(pairCol(chars)).as("p"))
        .groupBy(col("p.l").as("l"), col("p.r").as("r"))
        .agg(sum(col("wc")).as("cnt"))
        .orderBy(col("cnt").desc, col("l"), col("r"))
        .limit(PairTopK)
    }),

    // the trained merge table (the tokenizer artifact a real pipeline
    // ships): one row per greedy round
    "q166_bpe_train" -> ((s, dir) => {
      import s.implicits._
      trainedMerges(s, dir).toDF("round", "left_tok", "right_tok", "cnt")
    }),

    // the corpus under the trained tokenizer: per-document token counts
    // — the compression-ratio statistic that decides whether a merge
    // table is worth shipping
    "q167_bpe_encode" -> ((s, dir) => {
      val merges = trainedMerges(s, dir).map(m => (m._2, m._3))
      Tables.documents(s, dir)
        .select(col("doc_id"), explode(split(col("text"), " ")).as("word"))
        .filter(length(col("word")) >= 1)
        .select(col("doc_id"),
          size(BpeApplyExpr.bpeApply(col("word"), merges)).as("ntok"),
          length(col("word")).as("nch"))
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_words"),
          sum(col("ntok")).as("n_bpe_tokens"),
          sum(col("nch")).as("n_chars"))
        .orderBy("doc_id")
    }),

    // BPE DECODE / round-trip gate: detok(encode(word)) == word for
    // every word of every document — the inversion check q167 lacked.
    // The engine decodes by concatenating bpe_apply's token strings;
    // the oracle decodes by UNWINDING its placeholder encoding (see the
    // oracle entry) — two different inversions whose hash match proves
    // the tokenizer is lossless corpus-wide. Scale shape: one narrow
    // projection per word (the q167 plan) plus a per-doc aggregate.
    "q212_bpe_roundtrip" -> ((s, dir) => {
      val merges = trainedMerges(s, dir).map(m => (m._2, m._3))
      Tables.documents(s, dir)
        .select(col("doc_id"), explode(split(col("text"), " ")).as("word"))
        .filter(length(col("word")) >= 1)
        // bpe_apply projected ONCE (whole-stage codegen does not CSE a
        // custom expression — a second call would run the query's most
        // expensive kernel twice); ntok and ok derive from the column.
        .select(col("doc_id"), col("word"),
          BpeApplyExpr.bpeApply(col("word"), merges).as("toks"))
        .select(col("doc_id"),
          size(col("toks")).as("ntok"),
          (array_join(col("toks"), "") === col("word")).as("ok"))
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_words"),
          sum(col("ntok")).as("n_bpe_tokens"),
          sum(when(col("ok"), 1L).otherwise(0L)).as("n_roundtrip"))
        .withColumn("lossless", col("n_roundtrip") === col("n_words"))
        .orderBy("doc_id")
    })
  )

  // ---- DuckDB oracle ------------------------------------------------------

  // Every CTE is AS MATERIALIZED: DuckDB INLINES plain CTEs, and the
  // unrolled training rounds reference each round's tables 3–5 times —
  // inlining makes the expansion (and the number of times
  // documents.parquet is re-opened) EXPONENTIAL in the round count.
  // Materialization pins each round to one evaluation (DuckDB ≥0.9).
  private val wordsSql =
    """words AS MATERIALIZED (
      |  SELECT word, CAST(count(*) AS BIGINT) AS wc
      |  FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents)
      |  WHERE length(word) >= 1 GROUP BY word)""".stripMargin

  /** The training replay, unrolled to `rounds` CTE rounds (the q139
    * pattern). Placeholder char for round k is U+E000+k−1; `v$k` maps
    * every live token CHARACTER to its real token STRING (identity for
    * raw characters, concatenation for merges), so tie-breaking and
    * output read real tokens while the merge itself stays a one-char
    * `replace`. Ends with `w$rounds(word, word_t, wc)` (the encoded
    * vocabulary) and `o1..o$rounds` (one merge row each). */
  private[operators] def bpeCtesSql(rounds: Int): String = {
    def pu(k: Int): Int = 0xE000 + k - 1
    def round(k: Int): String = {
      val prev = k - 1
      s"""pos$k AS (
         |  SELECT word_t, wc, unnest(generate_series(1, length(word_t) - 1)) AS i
         |  FROM w$prev),
         |p$k AS MATERIALIZED (
         |  SELECT substr(word_t, i, 1) AS lc, substr(word_t, i + 1, 1) AS rc,
         |    CAST(sum(wc) AS BIGINT) AS cnt
         |  FROM pos$k GROUP BY 1, 2),
         |t$k AS MATERIALIZED (
         |  SELECT lc, rc, cnt FROM (
         |    SELECT p.lc, p.rc, p.cnt,
         |      row_number() OVER (ORDER BY p.cnt DESC, vl.tok, vr.tok) AS rn
         |    FROM p$k p
         |    JOIN v$prev vl ON vl.ch = p.lc
         |    JOIN v$prev vr ON vr.ch = p.rc) WHERE rn = 1),
         |o$k AS MATERIALIZED (
         |  SELECT $k AS round, vl.tok AS left_tok, vr.tok AS right_tok, t.cnt AS cnt
         |  FROM t$k t
         |  JOIN v$prev vl ON vl.ch = t.lc
         |  JOIN v$prev vr ON vr.ch = t.rc),
         |v$k AS MATERIALIZED (
         |  SELECT ch, tok FROM v$prev
         |  UNION ALL
         |  SELECT chr(${pu(k)}) AS ch, vl.tok || vr.tok AS tok
         |  FROM t$k t
         |  JOIN v$prev vl ON vl.ch = t.lc
         |  JOIN v$prev vr ON vr.ch = t.rc),
         |w$k AS MATERIALIZED (
         |  SELECT w.word, replace(w.word_t, t.lc || t.rc, chr(${pu(k)})) AS word_t, w.wc
         |  FROM w$prev w, t$k t)""".stripMargin
    }
    s"""$wordsSql,
       |w0 AS MATERIALIZED (SELECT word, word AS word_t, wc FROM words),
       |allpos AS MATERIALIZED (
       |  SELECT word, unnest(generate_series(1, length(word))) AS i FROM words),
       |v0 AS MATERIALIZED (
       |  SELECT DISTINCT substr(word, i, 1) AS ch, substr(word, i, 1) AS tok
       |  FROM allpos),
       |${(1 to rounds).map(round).mkString(",\n")}""".stripMargin
  }

  val oracle: Map[String, String] = Map(
    "q165_bpe_pairs" ->
      s"""WITH $wordsSql,
         |pos AS MATERIALIZED (
         |  SELECT word, wc, unnest(generate_series(1, length(word) - 1)) AS i
         |  FROM words),
         |p AS MATERIALIZED (
         |  SELECT substr(word, i, 1) AS l, substr(word, i + 1, 1) AS r,
         |    CAST(sum(wc) AS BIGINT) AS cnt
         |  FROM pos GROUP BY 1, 2)
         |SELECT l, r, cnt FROM p ORDER BY cnt DESC, l, r LIMIT $PairTopK""".stripMargin,

    "q166_bpe_train" ->
      s"""WITH ${bpeCtesSql(BpeRounds)}
         |SELECT round, left_tok, right_tok, cnt
         |FROM (${(1 to BpeRounds).map(k => s"SELECT * FROM o$k").mkString(" UNION ALL ")})
         |ORDER BY round""".stripMargin,

    "q167_bpe_encode" ->
      s"""WITH ${bpeCtesSql(BpeRounds)},
         |docw AS MATERIALIZED (
         |  SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents),
         |enc AS MATERIALIZED (
         |  SELECT d.doc_id, length(w.word_t) AS ntok, length(d.word) AS nch
         |  FROM docw d JOIN w$BpeRounds w USING (word)
         |  WHERE length(d.word) >= 1)
         |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_words,
         |  CAST(sum(ntok) AS BIGINT) AS n_bpe_tokens,
         |  CAST(sum(nch) AS BIGINT) AS n_chars
         |FROM enc GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    // The two decode paths are structurally DIFFERENT inversions: the
    // engine concatenates bpe_apply's real token strings; the oracle
    // unwinds the placeholder ENCODING (each word_t character maps back
    // through v$rounds to its real token, re-joined in position order).
    // A hash match therefore proves the placeholder machinery — the
    // private-use alphabet, the leftmost-nonoverlapping replaces, the
    // v-table union chain — is losslessly invertible on the whole
    // corpus, not just that concatenation is concatenation.
    "q212_bpe_roundtrip" ->
      s"""WITH ${bpeCtesSql(BpeRounds)},
         |dch AS MATERIALIZED (
         |  SELECT word, i, substr(word_t, i, 1) AS ch
         |  FROM w$BpeRounds, unnest(generate_series(1, length(word_t))) t(i)),
         |ddec AS MATERIALIZED (
         |  SELECT d.word, length(string_agg(v.tok, '' ORDER BY d.i)) > 0
         |      AND string_agg(v.tok, '' ORDER BY d.i) = d.word AS ok,
         |    count(*) AS ntok
         |  FROM dch d JOIN v$BpeRounds v USING (ch)
         |  GROUP BY d.word),
         |docw AS MATERIALIZED (
         |  SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents)
         |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_words,
         |  CAST(sum(ntok) AS BIGINT) AS n_bpe_tokens,
         |  CAST(sum(CASE WHEN ok THEN 1 ELSE 0 END) AS BIGINT) AS n_roundtrip,
         |  (sum(CASE WHEN ok THEN 1 ELSE 0 END) = count(*)) AS lossless
         |FROM docw JOIN ddec USING (word)
         |WHERE length(word) >= 1
         |GROUP BY doc_id ORDER BY doc_id""".stripMargin
  )
}
