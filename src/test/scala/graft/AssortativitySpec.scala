package graft

import org.scalatest.funsuite.AnyFunSuite

/** q161: Newman degree assortativity on graphs whose r is checkable on
  * paper — the star (the canonical r = −1 hub-and-spoke) and the
  * 4-path (r = −1/2), plus exact integer sums.
  */
class AssortativitySpec extends AnyFunSuite {
  private lazy val s = TestSpark.spark

  private def run(pairs: Seq[(Long, Long)]) = {
    import s.implicits._
    val r = queries.TextOps
      .degreeAssortativity(pairs.toDF("u", "v")).head()
    (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))
  }

  test("star K1,3 is perfectly disassortative (r = -1)") {
    // hub 0, leaves 1..3: per directed edge the endpoint degrees are
    // (3,1)×3 and (1,3)×3 → m=6, Σx=12, Σx²=30, Σxy=18,
    // r = (6·18−144)/(6·30−144) = −36/36
    val (m, sx, sxx, sxy, r) = run(Seq((0L, 1L), (0L, 2L), (0L, 3L)))
    assert((m, sx, sxx, sxy) === ((6L, 12L, 30L, 18L)))
    assert(r === -1.0)
  }

  test("path P4 has r = -1/2") {
    // degrees 1,2,2,1 → m=6, Σx=10, Σx²=18, Σxy=16,
    // r = (96−100)/(108−100) = −4/8
    val (m, sx, sxx, sxy, r) = run(Seq((1L, 2L), (2L, 3L), (3L, 4L)))
    assert((m, sx, sxx, sxy) === ((6L, 10L, 18L, 16L)))
    assert(r === -0.5)
  }
}
