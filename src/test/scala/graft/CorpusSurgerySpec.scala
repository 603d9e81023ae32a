package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{DedupOps, SimilarityOps}

/** The round-13 corpus-surgery operators against planted micro-corpora:
  *
  *   - q202 line-level dedup (CCNet): cross-document boilerplate lines
  *     are removed from EVERY copy, within-document repeats are NOT
  *     (document frequency, not occurrence count, is the trigger), and
  *     survivors reassemble in original order.
  *   - q203 truncation-dup detection: word-aligned prefixes only, keep
  *     the longest container, both key paths (short dup entirely inside
  *     the prefix key vs long dup verified against the keeper text).
  *   - q204 semantic decontamination: planted eval near-dups are
  *     flagged with the right witness and hit count; dissimilar and
  *     opposite vectors are not.
  */
class CorpusSurgerySpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  private def words(prefix: String, n: Int): String =
    (1 to n).map(i => s"$prefix$i").mkString(" ")

  private def md5Of(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  test("q202: cross-doc boilerplate lines vanish from every copy, unique lines survive in order") {
    val boiler = words("nav", 10) // one full 10-word line
    val docs = Seq(
      1L -> s"$boiler ${words("a", 10)}",  // boiler at line 0
      2L -> s"${words("b", 10)} $boiler",  // boiler at line 1
      3L -> words("c", 15)                 // untouched, 2 lines
    ).toDF("doc_id", "text")
    val got = DedupOps.lineDedup(docs).orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    assert(got === Array(
      (1L, 2L, 1L, md5Of(words("a", 10))),
      (2L, 2L, 1L, md5Of(words("b", 10))),
      (3L, 2L, 0L, md5Of(words("c", 15)))))
  }

  test("q202: document frequency triggers removal, within-doc repetition does not; full removal yields the empty doc") {
    val rep = words("r", 10)
    val boiler = words("nav", 10)
    val docs = Seq(
      1L -> s"$rep $rep",          // same line TWICE in one doc: df = 1, kept
      2L -> boiler,                // every line shared with doc 3:
      3L -> boiler                 //   both collapse to the empty doc
    ).toDF("doc_id", "text")
    val got = DedupOps.lineDedup(docs).orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    assert(got === Array(
      (1L, 2L, 0L, md5Of(s"$rep $rep")),
      (2L, 1L, 1L, md5Of("")),
      (3L, 1L, 1L, md5Of(""))))
  }

  test("q203: word-aligned truncations pair with their LONGEST container; char-aligned fakes and post-key divergence do not") {
    val base = words("w", 30)
    val docs = Seq(
      // 12-word truncation of docs 2 and 3 -> keeper must be 3 (longer)
      1L -> (1 to 12).map(i => s"w$i").mkString(" "),
      2L -> words("w", 20),
      3L -> base,
      // char-level prefix of doc 3 that SPLITS a token ("w1 w" vs "w1 w2"):
      // never a truncation
      4L -> "w1 w",
      // shares doc 3's full 10-word key then diverges at word 11:
      // candidate forms, verification must reject
      5L -> ((1 to 10).map(i => s"w$i") ++ Seq("x11", "x12")).mkString(" "),
      // 3-word truncation: the short-dup path (key is the whole text)
      6L -> "w1 w2 w3"
    ).toDF("doc_id", "text")
    val got = DedupOps.prefixDups(docs).orderBy("dup_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got === Seq((1L, 3L), (2L, 3L), (6L, 3L)))
  }

  test("q206: batch lines drop on corpus membership only — batch-internal repeats survive, full coverage empties the doc") {
    val ref = words("ref", 10)
    val mine = words("mine", 10)
    val corpus = Seq(1L -> s"$ref ${words("c", 10)}").toDF("doc_id", "text")
    val batch = Seq(
      10L -> s"$ref $mine",            // ref drops (corpus), mine survives
      11L -> s"$mine $mine",           // batch-internal repeat: NOT corpus boilerplate, both survive
      12L -> ref                       // fully corpus-covered -> empty doc
    ).toDF("doc_id", "text")
    val got = DedupOps.lineDedupIncremental(corpus, batch).orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    assert(got === Array(
      (10L, 2L, 1L, md5Of(mine)),
      (11L, 2L, 0L, md5Of(s"$mine $mine")),
      (12L, 1L, 1L, md5Of(""))))
  }

  test("q205: collision-probability fold equals the hand-computed per-token-count form; spam trips, diversity passes") {
    val docs = Seq(
      // x:5, a..e:1 -> coll = 5*4 = 20, N = 10 -> 20*10000//90 = 2222
      1L -> "x x x x x a b c d e",
      // interleaved repeats: a:3, b:2 -> coll = 6+2 = 8, N = 5 -> 4000
      2L -> "a b a b a",
      // all distinct -> coll 0, keep
      3L -> words("d", 12),
      // single token: N = 1 -> guarded division, bp 0, keep
      4L -> "solo",
      // null text: DROPPED (oracle's unnest over NULL yields no rows)
      5L -> (null: String)
    ).toDF("doc_id", "text")
    val got = graft.operators.TextOps.queries("q205_diversity_gate")
      .apply(TestSpark.spark, TestSpark.sfDir) // fixture run only proves it executes
    assert(got.columns.toSeq ===
      Seq("doc_id", "n_tok", "n_uniq", "coll_bp", "keep"))
    val planted = graft.operators.TextOps.diversityGate(docs).orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getBoolean(4)))
    assert(planted === Array(
      (1L, 10L, 6L, 2222L, false),
      (2L, 5L, 2L, 4000L, false),
      (3L, 12L, 12L, 0L, true),
      (4L, 1L, 1L, 0L, true)))
  }

  test("q202: line segmentation is lossless — chunks rejoin to the exact original text") {
    // the reassembly contract everything else rests on: with no dup
    // lines, clean_md5 IS the original text's md5 for every length,
    // including non-multiples of LineWords and the 1-word doc
    val docs = Seq(
      1L -> words("a", 10),   // exactly one line
      2L -> words("b", 25),   // partial tail line
      3L -> words("c", 9),    // shorter than one line
      4L -> "solo"
    ).toDF("doc_id", "text")
    val got = DedupOps.lineDedup(docs).orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getString(3)))
    assert(got === Array(
      (1L, md5Of(words("a", 10))), (2L, md5Of(words("b", 25))),
      (3L, md5Of(words("c", 9))), (4L, md5Of("solo"))))
  }

  test("q202: a boilerplate line hot across hundreds of docs stays correct (linear join-back fan-out)") {
    val boiler = words("nav", 10)
    val docs = ((1L to 400L).map(i => i -> s"$boiler ${words(s"u$i", 10)}")
      :+ (500L -> words("clean", 20))).toDF("doc_id", "text")
    val got = DedupOps.lineDedup(docs)
    assert(got.filter(col("n_dup_lines") =!= 1L).count() === 1L) // only doc 500 untouched
    val d1 = got.filter(col("doc_id") === 1L).head()
    assert(d1.getLong(2) === 1L && d1.getString(3) === md5Of(words("u1", 10)))
  }

  test("q203: boilerplate-opening keys past the df cap drop (bounded fan-out), under-cap recall is untouched") {
    // 6 docs share the SAME 10-word opening then diverge — with cap 4
    // the k=10 key is dropped, so even a REAL truncation among them
    // (doc 100 is a word-aligned prefix of doc 101) is sacrificed: the
    // documented recall cost, confined to capped keys. The pair with a
    // distinct opening (200 -> 201) must survive unaffected.
    val opening = words("hot", 10)
    val docs = (Seq(
      100L -> s"$opening one two",
      101L -> s"$opening one two three four", // 100 is its word-prefix
      200L -> words("z", 12),
      201L -> s"${words("z", 12)} tail more"  // 200 is its word-prefix
    ) ++ (102L to 105L).map(i => i -> s"$opening ${words(s"v$i", 5)}"))
      .toDF("doc_id", "text")
    val capped = DedupOps.prefixDups(docs, dfCap = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(capped === Set((200L, 201L)),
      "hot-key pairs must be sacrificed at the cap; distinct-opening recall untouched")
    val uncapped = DedupOps.prefixDups(docs)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(uncapped === Set((100L, 101L), (200L, 201L)),
      "default cap far above the planted df: full recall")
  }

  test("q204 plan: the eval stratum broadcasts — the train side never shuffles for candidate generation") {
    val plan = graft.operators.SimilarityOps.queries("q204_semantic_decontaminate")
      .apply(TestSpark.spark, TestSpark.sfDir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"q204's bucket join must broadcast the eval side:\n${plan.take(2000)}")
  }

  test("q204: planted eval near-dups are flagged with witness and hit count; opposite/dissimilar vectors are not") {
    val e = Array.tabulate(64)(i => (math.sin(i + 1) * 0.5).toFloat)
    val far = Array.tabulate(64)(i => (math.cos(3 * i + 2) * 0.5).toFloat)
    val emb = Seq(
      10L -> e,                  // eval (vec_id % 10 == 0)
      20L -> e,                  // eval, identical -> second witness
      11L -> e,                  // train clone: 2 hits, witness eval 10
      12L -> e.map(-_),          // train opposite: cosine -1, never flagged
      13L -> far                 // train dissimilar
    ).toDF("vec_id", "embedding")
    val got = SimilarityOps.semanticContam(spark, emb,
        col("vec_id") % 10 === 0, SimilarityOps.SemContamBp)
      .orderBy("train_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got === Array((11L, 10L, 10000L, 2L)))
  }
}
