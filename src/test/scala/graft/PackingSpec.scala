package graft

import org.scalatest.funsuite.AnyFunSuite

/** q187 sequence-packing invariants beyond the DuckDB hash: the slab
  * width is a pure parallelism knob (identical manifest at widths 1,
  * 7, 1000 — the q145/q173 width-invariance convention), and the
  * manifest really describes ONE contiguous token stream (offsets
  * chain exactly; sequence spans follow from integer division).
  */
class PackingSpec extends AnyFunSuite {
  private lazy val s = TestSpark.spark
  private val sfDir = "/root/testdata/sf0.001"

  private def manifest(slab: Long) =
    graft.queries.Curation.packingManifest(s, sfDir, slab)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))

  test("slab width is a pure parallelism knob — manifests identical") {
    val base = manifest(1000L)
    assert(base.nonEmpty)
    Seq(1L, 7L).foreach { w =>
      assert(manifest(w).toSeq == base.toSeq,
        s"slab width $w changed the manifest")
    }
  }

  test("offsets chain contiguously and spans follow from the cap") {
    val cap = graft.queries.Curation.PACK_CAP
    val rows = manifest(1000L)
    assert(rows.head._3 == 0L, "stream must start at offset 0")
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(b._3 == a._3 + a._2,
        s"doc ${b._1}: offset ${b._3} != ${a._3} + ${a._2} (gap/overlap)")
    case _ => ()
    }
    rows.foreach { case (id, n, off, first, last, nseq) =>
      assert(n >= 1, s"doc $id: empty token list")
      assert(first == off / cap && last == (off + n - 1) / cap,
        s"doc $id: sequence span wrong")
      assert(nseq == last - first + 1 && nseq >= 1)
      // a doc spanning k sequences must cross exactly k-1 boundaries
      assert(nseq - 1 == (off + n - 1) / cap - off / cap)
    }
  }
}
