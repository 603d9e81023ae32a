package graft.sources

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

/** OPTIMIZE vs concurrent commits: a compaction only replaces the files
  * it read, so losing the CAS to a PURE APPEND must rebase and publish
  * on top (nightly OPTIMIZE and streaming ingest interleave without an
  * operator-side retry loop), while losing to anything that touched its
  * inputs or the table's structure must still fail loudly and clean up.
  * The race is made deterministic through compact's test-only
  * beforePublish seam. */
class OptimizeRebaseSpec extends AnyFunSuite {
  import graft.TestSpark.spark

  private val fmt = "graft.sources.ManifestSink"

  private def freshTable(): java.nio.file.Path = {
    val root = Files.createTempDirectory("graft-rebase")
    root.toFile.deleteOnExit()
    import spark.implicits._
    (0 until 4).foreach { i =>
      (i * 100 until (i + 1) * 100).map(x => (x.toLong, x.toLong * 3))
        .toDF("id", "v").coalesce(1)
        .write.format(fmt).option("path", root.toString)
        .mode(if (i == 0) "overwrite" else "append").save()
    }
    root
  }

  test("losing the CAS to a concurrent append rebases: both commits land") {
    val root = freshTable()
    val vPre = ManifestSink.currentVersion(root)
    import spark.implicits._
    val res = ManifestSink.compact(root.toString, targetRows = 1000L, () => {
      // the "concurrent" committer: a pure append that publishes between
      // compact's read-point and its first CAS attempt
      Seq((9999L, 1L)).toDF("id", "v").coalesce(1)
        .write.format(fmt).option("path", root.toString).mode("append").save()
    })
    // compact lost v+1 to the append and republished at v+2
    assert(res.version == vPre + 2, s"expected a rebase publish, got $res")
    assert(res.rewrittenFiles == 4)
    val now = spark.read.format(fmt).option("path", root.toString).load()
    assert(now.count() == 401, "the concurrent append's row must survive")
    assert(now.filter("id = 9999").count() == 1)
    // the merged layout landed: 4 small files became 1, plus the
    // concurrently appended file
    val st = ManifestSink.readState(root)
    assert(st.entries.size == 2, s"entries: ${st.entries.map(_.name)}")
    // the appended entry was carried through the rebase byte-identically
    assert(st.entries.exists(_.rows == 1L))
  }

  test("losing the CAS to a DELETE still fails loudly and cleans up outputs") {
    val root = freshTable()
    val before = {
      val s = Files.list(root)
      try s.iterator().asScala.map(_.getFileName.toString).toSet finally s.close()
    }
    intercept[java.util.ConcurrentModificationException] {
      ManifestSink.compact(root.toString, targetRows = 1000L, () => {
        // rewrites one of compact's input files — the rebase must refuse
        ManifestSink.deleteWhere(root.toString,
          Seq(org.apache.spark.sql.sources.EqualTo("id", 5L)))
      })
    }
    // the failed compaction's merged outputs were deleted; the table
    // still answers correctly post-delete
    val now = spark.read.format(fmt).option("path", root.toString).load()
    assert(now.count() == 399)
    val after = {
      val s = Files.list(root)
      try s.iterator().asScala.map(_.getFileName.toString).toSet finally s.close()
    }
    assert(!after.exists(n => n.startsWith("data-compact-") && !before(n)),
      "aborted compaction must not leak merged files")
  }

  private implicit class IterAsScala[A](it: java.util.Iterator[A]) {
    def asScala: Iterator[A] = new Iterator[A] {
      def hasNext: Boolean = it.hasNext
      def next(): A = it.next()
    }
  }
}
