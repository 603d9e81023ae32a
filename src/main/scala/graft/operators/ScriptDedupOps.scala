package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.engine.Tables
import graft.functions.HashFunctions._

/** SCRIPT-AWARE deduplication — the dedup family's space-free-script
  * wiring (SURVEY.md §2.2 LLM rows; round-15 verdict item 1).
  *
  * q217 proved the failure mode: word-split tokenization sees a whole
  * CJK/Thai document as ONE token, so on a space-free stratum the
  * word-shingled dedup operators are structurally blind — a CJK doc has
  * no word 3-shingles (no MinHash signature, no near-dup pairs), its
  * set-sim shingle set is empty, and line segmentation produces one
  * giant "line". This module re-states the three dedup granularities
  * (near-dup MinHash/LSH, exact set-similarity, line dedup) with
  * per-document script dispatch: detect the script by codepoint range
  * (TextOps.scriptOf — the q216 rule), shingle space-free docs as
  * CODEPOINT n-grams (CharNgramsExpr, the CCNet/SentencePiece
  * character fallback) and spaced docs as word n-grams, then run the
  * UNCHANGED downstream engine (same hash family, same LSH bands, same
  * prefix filter, same verification algebra). Cross-script shingle
  * sets are disjoint by construction (CJK codepoints never occur in
  * Latin text), so a cross-script band collision dies in verification
  * with intersection 0 — no special casing.
  *
  * The mixed-script corpus is DERIVED deterministically in-query (the
  * q216 derivation, shared bit-for-bit with the DuckDB oracle): every
  * doc_id % 3 == 0 doc transliterates its 36-char alphabet into 36
  * contiguous CJK codepoints and drops spaces. The near-dup structure
  * of the fixture survives the transliteration — a pair of near-dup
  * docs that both land in the CJK stratum becomes a planted CJK
  * near-dup pair, which the old space-tokenized path PROVABLY misses
  * (no signature at all — ScriptDedupSpec pins it) and this path finds.
  *
  * Scale shape: identical to the monoscript operators — signature
  * building stays a map-only projection (the fused ScriptMinHashExpr),
  * candidate generation stays band-/prefix-bounded, verification stays
  * candidate-only. Script dispatch adds one decode pass per document,
  * no exchange.
  */
object ScriptDedupOps {
  type Q = (SparkSession, String) => DataFrame

  /** Codepoint shingle width for space-free near-dup MinHash — sized
    * for TEXT-SPAN parity with the word path: DedupOps.ShingleN = 3
    * words ≈ 13-14 codepoints of space-dropped fixture text, so a
    * 12-codepoint gram covers the same span of content and one word
    * edit destroys a comparable FRACTION of either script's shingle
    * set (the property that makes one Jaccard threshold meaningful
    * across scripts). Diversity check on the fixture (measured): 12-
    * grams have median df 1, max df 115 at sf0.1 — a healthy Zipf tail
    * for the band join. */
  val CjkShingleN = 12

  /** Codepoint shingle width for space-free exact set-similarity — 18,
    * WIDER than near-dup's 12 for the same reason SetSimShingleN (5) is
    * wider than ShingleN (3): the prefix filter needs RARE join keys,
    * and codepoint-gram rarity falls out of how many word boundaries
    * fit under the width (measured on the fixture: 18-grams max df 10
    * at sf0.1 vs 1,313 for 6-grams). The declared trade: per-edit
    * Jaccard decay is steeper than the word path's, so at t = 0.8 the
    * operator catches clones and ≤2-word-edit revisions — the
    * operating point where exact set-sim earns its cost anyway. */
  val CjkSetSimN = 18

  /** Codepoint "line" width for space-free line dedup — the script-
    * aware restatement of DedupOps.LineWords (10 words): the average
    * CJK word is ~2 characters (public segmentation statistics), so a
    * 10-word line ≈ 20 codepoints. */
  val CjkLineCp = 20

  /** Script-aware DISTINCT shingle set for near-dup verification:
    * codepoint [[CjkShingleN]]-grams for space-free docs, word
    * [[DedupOps.ShingleN]]-shingles otherwise — the relational twin of
    * the fused signature kernel's branch. */
  private def scriptShingles(text: Column): Column =
    when(TextOps.scriptOf(text) === "cjk",
      graft.plans.CharNgramsExpr.charNgramsDistinct(text, CjkShingleN))
      .otherwise(graft.plans.ShinglesExpr.shinglesNative(text, DedupOps.ShingleN))

  /** Script-aware set-sim tokens: exact-dup canonicalization first (the
    * clone-quadratic guard, same as DedupOps.setSimTokens), then
    * per-script shingles at the set-sim widths. */
  private def scriptSetSimTokens(docs: DataFrame): (DataFrame, DataFrame) = {
    val canon = docs.groupBy(col("text"))
      .agg(min(col("doc_id")).as("doc_id"))
    val tk = canon.select(col("doc_id"),
      explode(when(TextOps.scriptOf(col("text")) === "cjk",
          graft.plans.CharNgramsExpr.charNgramsDistinct(col("text"), CjkSetSimN))
        .otherwise(graft.plans.ShinglesExpr.shinglesNative(col("text"),
          DedupOps.SetSimShingleN))).as("token"))
    val dfreq = tk.groupBy("token").agg(count(lit(1)).as("df"))
    (tk, dfreq)
  }

  /** Space-free line segmentation: fixed [[CjkLineCp]]-codepoint chunks
    * from position 0, last chunk keeps its partial tail — the codepoint
    * twin of DedupOps.lineChunks. Only evaluated on detected-cjk docs,
    * whose codepoint count is ≥ 1 by the detection rule. */
  private def cjkLineChunks(text: Column): Column =
    transform(
      sequence(lit(0), floor((length(text) - 1) / lit(CjkLineCp)).cast("int")),
      j => text.substr(j * lit(CjkLineCp) + lit(1), lit(CjkLineCp)))

  val queries: Map[String, Q] = Map(
    // Script-aware MinHash/LSH near-dup over the mixed-script corpus.
    // Signatures come off the text scan in ONE fused pass
    // (ScriptMinHashExpr: detect script → codepoint- or word-shingle →
    // MinHash, no exchange); bands/candidates/verification are q41's
    // engine unchanged. The CJK stratum's planted near-dup pairs are
    // FOUND here — the word-tokenized q41 path gives those docs no
    // signature at all (ScriptDedupSpec pins both directions).
    "q218_script_neardup" -> ((s, dir) => {
      val mixed = TextOps.scriptMixed(Tables.documents(s, dir))
      val sigs = mixed.select(col("doc_id"),
        graft.plans.ScriptMinHashExpr.sigScriptAware(col("text"),
          TextOps.CjkAlphabet, DedupOps.ShingleN, CjkShingleN,
          DedupOps.NumHashes).as("sig"))
        .filter(col("sig").isNotNull)
      val b = graft.engine.Staging.trackCp(DedupOps.bands(sigs))
      val cand = graft.engine.Staging.trackCp(
        b.as("a").join(b.as("b"),
            col("a.j") === col("b.j") && col("a.bkey") === col("b.bkey") &&
              col("a.doc_id") < col("b.doc_id"))
          .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
          .distinct())
      val candDocs = graft.engine.Staging.trackCp(
        cand.select(col("doc_a").as("doc_id"))
          .union(cand.select(col("doc_b").as("doc_id"))).distinct())
      // shingle arrays only for candidate-pair members (the near-dup
      // fraction of the corpus) — the nearDupPairsOf contract
      val sets = graft.engine.Staging.trackCp(
        DedupOps.joinIds(mixed, candDocs, "doc_id")
          .select(col("doc_id"), TextOps.scriptOf(col("text")).as("script"),
            scriptShingles(col("text")).as("shingles")))
      val sa = sets.select(col("doc_id").as("doc_a"), col("script"),
        col("shingles").as("sh_a"))
      val sb = sets.select(col("doc_id").as("doc_b"), col("shingles").as("sh_b"))
      val inter = size(array_intersect(col("sh_a"), col("sh_b")))
      cand.join(sa, "doc_a").join(sb, "doc_b")
        .withColumn("inter", inter)
        .withColumn("uni", size(col("sh_a")) + size(col("sh_b")) - inter)
        .filter(col("inter") * 2 >= col("uni"))
        .withColumn("jac_bp", expr("inter * 10000L div uni"))
        .select("doc_a", "doc_b", "script", "inter", "uni", "jac_bp")
        .orderBy("doc_a", "doc_b")
    }),

    // Script-aware LINE dedup over the mixed corpus — q202's engine
    // with per-script segmentation: 10-word chunks for spaced docs,
    // 20-codepoint chunks for space-free docs (on the OLD path a CJK
    // doc is one giant "line", so cross-doc boilerplate inside the CJK
    // stratum is invisible unless whole docs match). Line keys never
    // collide across scripts (disjoint character sets).
    "q219_script_line_dedup" -> ((s, dir) => {
      val mixed = TextOps.scriptMixed(Tables.documents(s, dir))
        .withColumn("script", TextOps.scriptOf(col("text")))
      val lines = mixed.select(col("doc_id"),
        posexplode(when(col("script") === "cjk", cjkLineChunks(col("text")))
          .otherwise(DedupOps.lineChunksOf(col("text")))).as(Seq("pos", "line")))
      val dupLines = lines.groupBy("line")
        .agg(countDistinct(col("doc_id")).as("nd"))
        .filter(col("nd") >= DedupOps.LineDupMinDocs)
        .select(col("line"), lit(1).as("dup"))
      lines.join(dupLines, Seq("line"), "left")
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_lines"),
          count(col("dup")).as("n_dup_lines"),
          md5(array_join(transform(
            array_sort(collect_list(when(col("dup").isNull,
              struct(col("pos"), col("line"))))),
            x => x("line")), " ")).as("clean_md5"))
        .select("doc_id", "n_lines", "n_dup_lines", "clean_md5")
        .orderBy("doc_id")
    }),

    // Script-aware EXACT set-similarity, incremental form (q198's
    // batch-vs-corpus engine over script-aware tokens): the arriving
    // batch joins against the standing corpus statistic at t = 0.8
    // with the prefix filter ranking both sides by the CORPUS df —
    // unchanged machinery, script-dispatched shingles. On the old
    // path every CJK doc's shingle set was EMPTY (no 5-word shingles),
    // so batch CJK clones of corpus docs surfaced nowhere.
    "q220_script_setsim" -> ((s, dir) => {
      val mixed = TextOps.scriptMixed(Tables.documents(s, dir))
      val (ctk0, dfreq0) = scriptSetSimTokens(mixed.filter(col("doc_id") % 10 =!= 7))
      val ctk = graft.engine.Staging.trackCp(ctk0)
      val dfreq = graft.engine.Staging.trackCp(dfreq0)
      val btk = graft.engine.Staging.trackCp(
        scriptSetSimTokens(mixed.filter(col("doc_id") % 10 === 7))._1)
      DedupOps.setSimIncrementalTk(ctk, dfreq, btk)
        .orderBy("doc_a", "doc_b")
    }))

  // ---- DuckDB oracle ------------------------------------------------------

  /** The q216 mixed-corpus + script-detection CTE pair (m, sc) — kept
    * textually in lockstep with TextOps' scriptMixedSql. */
  private val mixedScCte =
    s"""m AS (SELECT doc_id,
       |    CASE WHEN doc_id % 3 = 0
       |      THEN translate(text, 'abcdefghijklmnopqrstuvwxyz0123456789 ', '${TextOps.CjkAlphabet}')
       |      ELSE text END AS text
       |  FROM documents),
       |sc AS (SELECT doc_id, text,
       |    CASE WHEN (length(text) - length(translate(text, '${TextOps.CjkAlphabet}', ''))) * 2
       |      > length(text) THEN 'cjk' ELSE 'latin' END AS script
       |  FROM m)""".stripMargin.replace("\n", " ")

  /** Word n-gram expression over `string_split(text,' ')` — the
    * setsCteFrom form at width `n`. */
  private def wordGramSql(n: Int): String =
    (0 until n).map {
      case 0 => "(string_split(text,' '))[i]"
      case k => s"(string_split(text,' '))[i+$k]"
    }.mkString(" || ' ' || ")

  /** Script-aware distinct-shingle CTE `s(doc_id, script, shingles)`
    * over `sc`; consumers filter len(shingles) > 0 (the sig-null /
    * empty-set gate both engines share). */
  private def scriptShinglesCte(charN: Int, wordN: Int): String =
    s"""s AS (SELECT doc_id, script,
       |  CASE WHEN script = 'cjk'
       |    THEN list_distinct(list_transform(generate_series(1, length(text) - ${charN - 1}),
       |      i -> substring(text, CAST(i AS INTEGER), $charN)))
       |    ELSE list_distinct(list_transform(generate_series(1, len(string_split(text,' ')) - ${wordN - 1}),
       |      i -> ${wordGramSql(wordN)})) END AS shingles
       |  FROM sc)""".stripMargin.replace("\n", " ")

  /** Per-stratum canon + script-aware shingle CTEs for the set-sim
    * oracle: `${p}tk` (unnested tokens) and `${p}sz` (set sizes) over
    * `sc` rows passing `where`. */
  private def scriptSetSimCtes(p: String, where: String): String =
    s"""${p}canon AS (SELECT min(doc_id) AS doc_id, text, script FROM sc
       |  $where GROUP BY text, script),
       |${p}s AS (SELECT doc_id,
       |  CASE WHEN script = 'cjk'
       |    THEN list_distinct(list_transform(generate_series(1, length(text) - ${CjkSetSimN - 1}),
       |      i -> substring(text, CAST(i AS INTEGER), $CjkSetSimN)))
       |    ELSE list_distinct(list_transform(generate_series(1, len(string_split(text,' ')) - ${DedupOps.SetSimShingleN - 1}),
       |      i -> ${wordGramSql(DedupOps.SetSimShingleN)})) END AS shingles
       |  FROM ${p}canon),
       |${p}tk AS (SELECT doc_id, unnest(shingles) AS token FROM ${p}s),
       |${p}sz AS (SELECT doc_id, count(*) AS m FROM ${p}tk GROUP BY doc_id)""".stripMargin
      .replace("\n", " ")

  val oracle: Map[String, String] = Map(
    "q218_script_neardup" -> {
      val code = md5Code60Sql("sh")
      val affine = affineHashSql("i", "x")
      s"""WITH $mixedScCte,
         |${scriptShinglesCte(CjkShingleN, DedupOps.ShingleN)},
         |c AS (SELECT doc_id, list_transform(shingles, sh -> $code) AS codes
         |  FROM s WHERE len(shingles) > 0),
         |sg AS (SELECT doc_id, list_transform(generate_series(1, ${DedupOps.NumHashes}),
         |        i -> list_min(list_transform(codes, x -> $affine))) AS sig FROM c),
         |bands AS (SELECT doc_id, j,
         |  array_to_string(sig[j*${DedupOps.RowsPerBand}+1 : j*${DedupOps.RowsPerBand}+${DedupOps.RowsPerBand}], '_') AS bkey
         |  FROM sg, generate_series(0, ${DedupOps.Bands - 1}) t(j)),
         |cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
         |  FROM bands a JOIN bands b
         |  ON a.j = b.j AND a.bkey = b.bkey AND a.doc_id < b.doc_id)
         |SELECT doc_a, doc_b, script, inter, uni,
         |  CAST(inter * 10000 // uni AS BIGINT) AS jac_bp FROM (
         |  SELECT doc_a, doc_b, sa.script AS script,
         |    CAST(len(list_intersect(sa.shingles, sb.shingles)) AS INTEGER) AS inter,
         |    CAST(len(sa.shingles) + len(sb.shingles) - len(list_intersect(sa.shingles, sb.shingles)) AS INTEGER) AS uni
         |  FROM cand JOIN s sa ON sa.doc_id = doc_a JOIN s sb ON sb.doc_id = doc_b)
         |WHERE inter * 2 >= uni ORDER BY doc_a, doc_b""".stripMargin
    },

    "q219_script_line_dedup" ->
      s"""WITH $mixedScCte,
         |ch AS (SELECT doc_id,
         |  CASE WHEN script = 'cjk'
         |    THEN list_transform(generate_series(0, CAST((length(text) - 1) // $CjkLineCp AS BIGINT)),
         |      j -> substring(text, CAST(j * $CjkLineCp + 1 AS INTEGER), $CjkLineCp))
         |    ELSE list_transform(generate_series(0, CAST((len(string_split(text,' ')) - 1) // ${DedupOps.LineWords} AS BIGINT)),
         |      j -> array_to_string((string_split(text,' '))[j*${DedupOps.LineWords}+1 : j*${DedupOps.LineWords}+${DedupOps.LineWords}], ' ')) END AS chunks
         |  FROM sc),
         |l AS (SELECT doc_id, CAST(i - 1 AS INTEGER) AS pos, chunks[CAST(i AS INTEGER)] AS line
         |  FROM ch, unnest(generate_series(1, len(chunks))) t(i)),
         |d AS (SELECT line FROM l GROUP BY line
         |  HAVING count(DISTINCT doc_id) >= ${DedupOps.LineDupMinDocs})
         |SELECT l.doc_id, count(*) AS n_lines, count(d.line) AS n_dup_lines,
         |  md5(coalesce(string_agg(CASE WHEN d.line IS NULL THEN l.line END,
         |    ' ' ORDER BY l.pos), '')) AS clean_md5
         |FROM l LEFT JOIN d ON l.line = d.line
         |GROUP BY l.doc_id ORDER BY doc_id""".stripMargin,

    "q220_script_setsim" ->
      s"""WITH $mixedScCte,
         |${scriptSetSimCtes("c", "WHERE doc_id % 10 <> 7")},
         |${scriptSetSimCtes("b", "WHERE doc_id % 10 = 7")},
         |pairs AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS inter
         |  FROM btk a JOIN ctk b ON a.token = b.token
         |  GROUP BY a.doc_id, b.doc_id),
         |j AS (SELECT doc_a, doc_b, sa.m AS size_a, sb.m AS size_b, inter
         |  FROM pairs JOIN bsz sa ON sa.doc_id = doc_a
         |             JOIN csz sb ON sb.doc_id = doc_b)
         |SELECT doc_a, doc_b, size_a, size_b, inter,
         |  CAST(inter * 10000 // (size_a + size_b - inter) AS BIGINT) AS jacc_bp
         |FROM j
         |WHERE inter * 10000 >= ${DedupOps.SetSimTBp} * (size_a + size_b - inter)
         |ORDER BY doc_a, doc_b""".stripMargin)
}
