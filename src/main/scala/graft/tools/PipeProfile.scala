package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.engine.Tables
import graft.functions.GraftFunctions.tokens
import graft.operators._

/** Dev-only stage profiler for q221 (mirrors its stage boundaries with a
  * count per stage) — not part of the driver contract. */
object PipeProfile {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.coalescePartitions.initialPartitionNum",
        (cpus.toInt * 8).toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"STAGE $label ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    graft.engine.Staging.beginTransient()
    val s = spark
    val docs = Tables.documents(s, dir)
    if (args.lift(1).contains("clones")) {
      val cleaned = graft.engine.Staging.trackCp(DedupOps.cleanedDocs(docs))
      println("cleaned total=" + cleaned.count() +
        " distinct=" + cleaned.select("text").distinct().count())
      cleaned.groupBy("text").count().groupBy("count")
        .agg(count(lit(1)).as("n")).orderBy(col("count").desc).show(10)
      val pairs = DedupOps.nearDupPairsOf(cleaned, transient = true)._1
      println("verified pairs=" + pairs.count())
      graft.engine.Staging.releaseTransient()
      spark.stop()
      return
    }
    if (args.lift(1).contains("lsh")) {
      // nearDupPairsOf internals over q117's gated survivors shape
      val cleaned = graft.engine.Staging.trackCp(DedupOps.cleanedDocs(docs))
      cleaned.count()
      val sigs = cleaned.select(col("doc_id"),
        graft.plans.MinHashFromTextExpr.sigFromText(col("text"),
          DedupOps.ShingleN, DedupOps.NumHashes).as("sig"))
        .filter(col("sig").isNotNull)
      val b = t("lsh.bands") { val x = graft.engine.Staging.trackCp(
        DedupOps.bands(sigs)); x.count(); x }
      val cand = t("lsh.cand") { val x = graft.engine.Staging.trackCp(
        b.as("a").join(b.as("b"),
          col("a.j") === col("b.j") && col("a.bkey") === col("b.bkey")
            && col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
        .distinct()); x.count(); x }
      val candDocs = t("lsh.candDocs") { val x = graft.engine.Staging.trackCp(
        cand.select(col("doc_a").as("doc_id"))
          .union(cand.select(col("doc_b").as("doc_id"))).distinct())
        println(s"  candDocs=${x.count()} cand=${cand.count()}"); x }
      val sets = t("lsh.sets") { val x = DedupOps.joinIds(cleaned, candDocs, "doc_id")
        .select(col("doc_id"),
          graft.plans.ShinglesExpr.shinglesNative(col("text"),
            DedupOps.ShingleN).as("shingles"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        x.count(); x }
      val sa = sets.select(col("doc_id").as("doc_a"), col("shingles").as("sh_a"))
      val sb = sets.select(col("doc_id").as("doc_b"), col("shingles").as("sh_b"))
      t("lsh.verify") {
        cand.join(sa, "doc_a").join(sb, "doc_b")
          .withColumn("inter", size(array_intersect(col("sh_a"), col("sh_b"))))
          .filter(col("inter") * 2 >= size(col("sh_a")) + size(col("sh_b")) - col("inter"))
          .count()
      }
      sets.unpersist()
      graft.engine.Staging.releaseTransient()
      spark.stop()
      return
    }
    if (args.lift(1).contains("q117")) {
      val cleaned = t("S1.clean") { val c = graft.engine.Staging.trackCp(
        DedupOps.cleanedDocs(docs)); c.count(); c }
      val stops = t("S2.stops") { docs
        .select(explode(tokens(col("text"))).as("t"))
        .filter(length(col("t")) >= 1)
        .groupBy("t").agg(count(lit(1)).as("c"))
        .orderBy(col("c").desc, col("t")).limit(8)
        .collect().map(_.getString(0)).toSeq }
      val gKeep = TextOps.gopherRulesWith(cleaned, stops)
        .filter(col("keep")).select("doc_id")
      val rKeep = TextOps.repetitionRules(cleaned)
        .filter(col("keep")).select("doc_id")
      val gated = t("S2.gates") { val g = graft.engine.Staging.trackCp(
        cleaned.join(gKeep, "doc_id").join(rKeep, "doc_id")); g.count(); g }
      val losers = t("S3.neardup") { val l = graft.engine.Staging.trackCp(
        DedupOps.nearDupPairsOf(gated, transient = true)._1
          .select(col("doc_b").as("doc_id")).distinct()); l.count(); l }
      val deduped = gated.join(losers, Seq("doc_id"), "left_anti")
      val train = graft.engine.Staging.trackCp(deduped.filter(col("doc_id") % 5 =!= 0))
      val evalC = cleaned.filter(col("doc_id") % 5 === 0)
      val vLeaks = t("S4.vLeaks") { val v = graft.engine.Staging.trackCp(
        DedupOps.verbatimLeakIds(train, evalC)); v.count(); v }
      val sLeaks = t("S4.sem") { val v = graft.engine.Staging.trackCp(
        SimilarityOps.semanticContam(s, Tables.embeddings(s, dir),
            col("vec_id") % 10 === 0, SimilarityOps.SemContamBp)
          .select(col("train_id").as("doc_id"))); v.count(); v }
      val surv = train.join(vLeaks, Seq("doc_id"), "left_anti")
        .join(sLeaks, Seq("doc_id"), "left_anti")
      val merges = t("S5.bpe") { BpeOps.trainedMerges(s, dir).map(m => (m._2, m._3)) }
      t("S5.pack") {
        PipelineOps.packedSpansOf(surv, merges)
          .groupBy("lang", "seq_id")
          .agg(count(lit(1)).as("n_docs"), sum(col("tok")).as("n_tokens"),
            min(col("doc_id")).as("first_doc"), max(col("doc_id")).as("last_doc"))
          .count()
      }
      graft.engine.Staging.releaseTransient()
      spark.stop()
      return
    }
    val mixed = t("mixed.cp") { graft.engine.Staging.trackCp(
      TextOps.scriptMixed(docs)
        .withColumn("script", TextOps.scriptOf(col("text")))) }
    val cleaned = t("S1.clean") { graft.engine.Staging.trackCp(
      ScriptDedupOps.scriptCleanedDocs(mixed)) }
    val lstops = t("S2.lstops") { mixed.filter(col("script") === "latin")
      .select(explode(tokens(col("text"))).as("t"))
      .filter(length(col("t")) >= 1)
      .groupBy("t").agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("t")).limit(8)
      .collect().map(_.getString(0)).toSeq }
    val cstops = t("S2.cstops") { mixed.filter(col("script") === "cjk")
      .select(explode(graft.plans.CharNgramsExpr.charNgrams(col("text"), 2))
        .as("t"))
      .groupBy("t").agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("t")).limit(8)
      .collect().map(_.getString(0)).toSeq }
    val lat = cleaned.filter(col("script") === "latin")
    val gKeep = TextOps.gopherRulesWith(lat, lstops)
      .filter(col("keep")).select("doc_id")
    val rKeep = TextOps.repetitionRules(lat)
      .filter(col("keep")).select("doc_id")
    val keepIds = gKeep.join(rKeep, "doc_id")
      .union(ScriptDedupOps.cjkGateIds(cleaned.filter(col("script") === "cjk"), cstops))
    val gated = t("S2.gates") { val g = graft.engine.Staging.trackCp(
      cleaned.join(keepIds, "doc_id")); g.count(); g }
    val losers = t("S3.neardup") { val l = graft.engine.Staging.trackCp(
      ScriptDedupOps.scriptNearDupPairs(gated.select("doc_id", "text"))
        .select(col("doc_b").as("doc_id")).distinct()); l.count(); l }
    val deduped = gated.join(losers, Seq("doc_id"), "left_anti")
    val train = graft.engine.Staging.trackCp(deduped.filter(col("doc_id") % 5 =!= 0))
    val evalC = cleaned.filter(col("doc_id") % 5 === 0)
    val vLat = t("S4.vLat") { val v = graft.engine.Staging.trackCp(
      DedupOps.verbatimLeakIds(
        train.filter(col("script") === "latin").select("doc_id", "text"),
        evalC.filter(col("script") === "latin").select("doc_id", "text")))
      v.count(); v }
    val vCjk = t("S4.vCjk") { val v = graft.engine.Staging.trackCp(
      ScriptDedupOps.cjkVerbatimLeakIds(
        train.filter(col("script") === "cjk").select("doc_id", "text"),
        evalC.filter(col("script") === "cjk").select("doc_id", "text")))
      v.count(); v }
    val vLeaks = vLat.union(vCjk).distinct()
    val sLeaks = t("S4.sem") { val v = graft.engine.Staging.trackCp(
      SimilarityOps.semanticContam(s, Tables.embeddings(s, dir),
          col("vec_id") % 10 === 0, SimilarityOps.SemContamBp)
        .select(col("train_id").as("doc_id"))); v.count(); v }
    val surv = train.join(vLeaks, Seq("doc_id"), "left_anti")
      .join(sLeaks, Seq("doc_id"), "left_anti")
    val merges = t("S5.bpe") { BpeOps.trainedMerges(s, dir).map(m => (m._2, m._3)) }
    t("S5.pack") {
      ScriptDedupOps.scriptPackedSpans(surv, merges)
        .groupBy("stratum", "seq_id")
        .agg(count(lit(1)).as("n_docs"),
          sum(col("tok")).as("n_tokens"),
          min(col("doc_id")).as("first_doc"),
          max(col("doc_id")).as("last_doc"))
        .orderBy("stratum", "seq_id").count()
    }
    graft.engine.Staging.releaseTransient()
    spark.stop()
  }
}
