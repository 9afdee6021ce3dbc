package graft

import org.scalatest.funsuite.AnyFunSuite

/** q192 pins beyond the DuckDB hash: BPE merges only ever concatenate
  * adjacent symbols, so decode(encode(w)) == w for EVERY word and the
  * document round trip is lossless BY CONSTRUCTION — roundtrip_rate is
  * pinned to exactly 1.0 (a rate below 1.0 would still hash-match a
  * buggy oracle twin; this is the absolute contract), and the symbol
  * accounting must agree with q174's encode report, tying the decode
  * state to the encode state it inverts. */
class BpeDecodeSpec extends AnyFunSuite {
  private lazy val s = TestSpark.spark
  private val sfDir = "/root/testdata/sf0.001"

  test("corpus-wide losslessness: every document round-trips exactly") {
    val rows = SparkEntry.queries("q192_bpe_decode")(s, sfDir)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4)))
    assert(rows.nonEmpty)
    rows.foreach { case (lang, nDocs, _, nOk, rate) =>
      assert(nOk == nDocs, s"$lang: $nOk of $nDocs round-tripped")
      assert(rate == 1.0, s"$lang: roundtrip_rate $rate != 1.0")
    }
    assert(rows.map(_._2).sum == 500L, "every document must be graded")
  }

  test("decode symbol accounting equals q174's encode report") {
    val encSyms = SparkEntry.queries("q174_bpe_encode")(s, sfDir)
      .collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    val decSyms = SparkEntry.queries("q192_bpe_decode")(s, sfDir)
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(decSyms == encSyms,
      s"decode counts $decSyms != encode counts $encSyms — the two " +
        "sides no longer read the same symbol state")
  }
}
