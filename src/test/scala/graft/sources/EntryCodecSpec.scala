package graft.sources

import org.scalatest.funsuite.AnyFunSuite

import ManifestSink.FileEntry

/** Round-trip property of the manifest entry line codec across every
  * combination of optional trailing fields (deletion vector, blooms) —
  * the dv slot must hold its position when blooms follow it, and legacy
  * 5-field lines must still parse. */
class EntryCodecSpec extends AnyFunSuite {

  private def rt(e: FileEntry): Unit =
    assert(ManifestSink.parseEntryLine(ManifestSink.entryLine(e)) == e,
      s"line: ${ManifestSink.entryLine(e)}")

  test("entry line round-trips every optional-field combination") {
    val base = FileEntry("data-x.parquet", 42L,
      Map("id" -> 1L, "v" -> -7L), Map("id" -> 9L, "v" -> 100L),
      Map("grp" -> "a b", "day" -> "2024-01-01"))
    val bloom = {
      val bits = new Array[Long](ManifestSink.MinBloomBits / 64)
      ManifestSink.bloomAdd(bits, "hello")
      ManifestSink.bloomEncode(bits) // base64 — may contain '=' padding
    }
    rt(base)
    rt(base.copy(dvName = Some("dv-123.txt"), dvRows = 5L))
    rt(base.copy(blooms = Map("cat" -> bloom, "s rc" -> bloom)))
    rt(base.copy(dvName = Some("dv-123.txt"), dvRows = 5L,
      blooms = Map("cat" -> bloom)))
    rt(FileEntry("f.tsv", 0L, Map.empty, Map.empty))
    // CBO count-stats slot: ndv-only, nulls-only, both, with and
    // without the seq/spec slots it trails (and an encoded column name)
    rt(base.copy(ndvs = Map("id" -> 9L)))
    rt(base.copy(nulls = Map("id" -> 0L, "v" -> 3L)))
    rt(base.copy(ndvs = Map("id" -> 9L, "a b" -> 2L),
      nulls = Map("id" -> 0L), seq = 7L, specId = 2L))
    rt(base.copy(dvName = Some("dv-1.txt"), dvRows = 1L,
      blooms = Map("cat" -> bloom), ndvs = Map("v" -> 4L),
      nulls = Map("v" -> 1L, "cat" -> 0L)))
    // attested-sort slot: alone, with earlier slots, encoded names
    rt(base.copy(sorted = Seq("id")))
    rt(base.copy(sorted = Seq("id", "a b"), seq = 3L))
    rt(base.copy(ndvs = Map("id" -> 9L), nulls = Map("id" -> 0L),
      sorted = Seq("v"), specId = 1L))
    // quantile-sample slot (position 14): alone — every earlier slot
    // must render (possibly empty) to hold its position — and stacked
    // with the NDV-sketch slot it trails; encoded column name; empty
    // sketch payload
    val qs = QuantileSketch.encode(Seq((3L, 40L), (9L, 7L)))
    rt(base.copy(qsk = Map("id" -> qs)))
    rt(base.copy(qsk = Map("a b" -> qs, "id" -> QuantileSketch.encode(Seq.empty))))
    rt(base.copy(ndvSk = Map("id" -> "sAAA"), qsk = Map("id" -> qs),
      sorted = Seq("id"), seq = 5L, specId = 1L))
  }

  test("legacy 5-field and 2-field lines still parse") {
    assert(ManifestSink.parseEntryLine("old.parquet\t10\tid:1\tid:9\t") ==
      FileEntry("old.parquet", 10L, Map("id" -> 1L), Map("id" -> 9L)))
    assert(ManifestSink.parseEntryLine("old.tsv\t3") ==
      FileEntry("old.tsv", 3L, Map.empty, Map.empty))
  }

  test("bloom membership survives the encode/decode round trip") {
    val bits = new Array[Long](ManifestSink.MinBloomBits / 64)
    Seq("alpha", "beta", "x=y,z").foreach(ManifestSink.bloomAdd(bits, _))
    val b64 = ManifestSink.bloomEncode(bits)
    val e = FileEntry("f.parquet", 1L, Map.empty, Map.empty,
      blooms = Map("c" -> b64))
    val back = ManifestSink.parseEntryLine(ManifestSink.entryLine(e))
    Seq("alpha", "beta", "x=y,z").foreach(v =>
      assert(ManifestSink.bloomMayContain(back.blooms("c"), v)))
    assert(!ManifestSink.bloomMayContain(back.blooms("c"), "absent-value"))
  }
}
