package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{DedupOps, EnrichOps}

class OperatorSpec extends AnyFunSuite {
  import TestSpark.{spark, sfDir}
  import spark.implicits._

  test("t1 smoke: flagship entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every declared query runs and is deterministic at sf0.001") {
    val failures = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      try {
        val a = fn(spark, sfDir).collect().map(_.toString).toSeq
        val b = fn(spark, sfDir).collect().map(_.toString).toSeq
        if (a != b) Some(s"$name: nondeterministic across runs") else None
      } catch {
        case e: Throwable => Some(s"$name: ${e.getClass.getSimpleName} ${e.getMessage}")
      }
    }
    assert(failures.isEmpty, failures.mkString("\n"))
  }

  test("every query has an oracle entry") {
    val noOracle = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(noOracle.isEmpty, s"unexpected rows-only: $noOracle")
    val danglingOracle = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(danglingOracle.isEmpty, s"oracle without query: $danglingOracle")
  }

  test("every query's output schema is driver-hashable (the q101 bug class, Spark side)") {
    // The driver hashes (column name, serialized value) pairs from Spark
    // parquet and from DuckDB; types outside this set either can't be
    // written comparably (float32, decimal, binary) or have engine-
    // divergent serializations. The DuckDB half of this guard lives in
    // scripts/check_oracle.py (hash_class drift check on every verify).
    import org.apache.spark.sql.types._
    def safe(dt: DataType): Boolean = dt match {
      case LongType | IntegerType | DoubleType | StringType |
           BooleanType | DateType | TimestampType | TimestampNTZType => true
      case ArrayType(e, _) => safe(e)
      case _ => false
    }
    val nameRe = "[A-Za-z_][A-Za-z0-9_]*".r
    val violations = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      val schema = fn(spark, sfDir).schema
      val badTypes = schema.fields.filterNot(f => safe(f.dataType))
        .map(f => s"$name.${f.name}: unhashable type ${f.dataType.simpleString}")
      val badNames = schema.fieldNames.filterNot(nameRe.matches)
        .map(n => s"$name.`$n`: name won't survive the oracle round-trip")
      val dupes = schema.fieldNames.groupBy(identity).collect {
        case (n, hits) if hits.length > 1 => s"$name.$n: duplicate output column"
      }
      badTypes ++ badNames ++ dupes
    }
    assert(violations.isEmpty, violations.mkString("\n"))
  }

  test("exact dedup is idempotent") {
    val once = DedupOps.queries("q40_exact_dedup")(spark, sfDir)
    // dedup of the dedup keys changes nothing
    assert(once.count() == once.dropDuplicates("text_md5").count())
  }

  test("jaccard pairs are within [0, 10000] basis points and symmetric-free") {
    val rows = DedupOps.queries("q43_jaccard_pairs")(spark, sfDir)
      .select("doc_a", "doc_b", "jac_bp").collect()
    rows.foreach { r =>
      assert(r.getLong(0) < r.getLong(1), "each pair emitted once, a < b")
      assert(r.getLong(2) >= 0 && r.getLong(2) <= 10000)
    }
  }

  test("minhash candidates contain every exact near-duplicate pair (recall on identical docs)") {
    // identical texts share all shingles -> identical signatures -> same
    // bucket in every band, so LSH must surface them
    val dups = graft.engine.Tables.documents(spark, sfDir)
      .groupBy("text").agg(collect_list("doc_id").as("ids"), count(lit(1)).as("n"))
      .filter(col("n") >= 2)
      // anchor on the group MIN id (Spark [] is 0-based; ids[1] was the
      // second element — a group whose max landed there contributed no
      // expected pairs, making the recall assertion vacuous for it)
      .select(explode(expr("filter(transform(ids, x -> struct(array_min(ids) as a, x as b)), p -> p.a < p.b)")))
      .select(col("col.a").as("doc_a"), col("col.b").as("doc_b"))
      .as[(Long, Long)].collect().toSet
    val found = DedupOps.queries("q41_minhash_lsh")(spark, sfDir)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    val missed = dups -- found
    assert(missed.isEmpty, s"LSH missed identical-doc pairs: $missed")
  }

  test("enrichment stub is deterministic and distributed") {
    val r1 = EnrichOps.queries("q37_llm_enrich")(spark, sfDir).collect().map(_.toString)
    val r2 = EnrichOps.queries("q37_llm_enrich")(spark, sfDir).collect().map(_.toString)
    assert(r1.sameElements(r2))
    assert(r1.forall(_.contains("ADVICE[")))
  }
}
