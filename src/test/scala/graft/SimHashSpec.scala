package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.functions.SimHashAgg

/** Pins the SimHash Aggregator's bit semantics against hand-computed
  * sketches — a sign flip in the bit vote or a shift-direction mistake
  * would pass every row-count check but fail these.
  *
  * Reference semantics (Charikar): token hash bit b set → +1 vote on
  * position b, else −1; fingerprint bit b set iff net vote > 0.
  */
class SimHashSpec extends AnyFunSuite {

  test("single token: fingerprint equals the token hash") {
    // One token votes +1 exactly on its own set bits, −1 elsewhere.
    val h = 0xDEADBEEFCAFEL
    val fp = SimHashAgg.finish(SimHashAgg.reduce(SimHashAgg.zero, h))
    assert(fp === h)
  }

  test("two tokens: hand-computed vote per bit") {
    // hashes 0b0110 and 0b0101:
    //   bit0: -1+1 = 0 -> unset (strict > 0)
    //   bit1: +1-1 = 0 -> unset
    //   bit2: +1+1 = 2 -> set
    //   bits 3..63: -2 -> unset
    val buf = SimHashAgg.reduce(SimHashAgg.reduce(SimHashAgg.zero, 0x6L), 0x5L)
    assert(SimHashAgg.finish(buf) === 0x4L)
  }

  test("three tokens: majority wins per bit") {
    // hashes 0b11, 0b01, 0b00:
    //   bit0: +1+1-1 = 1 -> set; bit1: +1-1-1 = -1 -> unset
    val buf = Seq(0x3L, 0x1L, 0x0L)
      .foldLeft(SimHashAgg.zero)(SimHashAgg.reduce)
    assert(SimHashAgg.finish(buf) === 0x1L)
  }

  test("merge of partial buffers equals sequential reduce") {
    val hs = Seq(0x6L, 0x5L, -0x123456789L, Long.MaxValue, Long.MinValue)
    val (l, r) = hs.splitAt(2)
    val seq = hs.foldLeft(SimHashAgg.zero)(SimHashAgg.reduce)
    val merged = SimHashAgg.merge(
      l.foldLeft(SimHashAgg.zero)(SimHashAgg.reduce),
      r.foldLeft(SimHashAgg.zero)(SimHashAgg.reduce))
    assert(SimHashAgg.finish(merged) === SimHashAgg.finish(seq))
    assert(merged.toSeq === seq.toSeq)
  }

  test("negative hash (top bit set) votes on bit 63") {
    // unsigned shift >>> must be used for bit extraction: Long.MinValue
    // has ONLY bit 63 set.
    val fp = SimHashAgg.finish(
      SimHashAgg.reduce(SimHashAgg.zero, Long.MinValue))
    assert(fp === Long.MinValue)
  }
}
