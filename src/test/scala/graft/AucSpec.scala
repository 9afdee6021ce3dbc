package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.queries.TextOps

/** q168's exact midrank AUC on hand-computed cases — the boundary
  * values (perfect/inverted/indifferent) and a mixed tie case worked
  * out by hand, which the cross-engine hash check cannot distinguish
  * from a formula that is merely the SAME wrong one twice. */
class AucSpec extends AnyFunSuite {
  private val s = TestSpark.spark

  private def auc(rows: Seq[(String, Long, Long)]): Map[String, (Long, Long, Long, Double)] = {
    import s.implicits._
    TextOps.aucByGroup(rows.toDF("lang", "su", "pos"))
      .collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))))
      .toMap
  }

  test("perfect separation gives 1, inversion 0, all-tied 1/2") {
    val got = auc(Seq(
      // every positive above every negative → AUC = 1
      ("a", 10L, 1L), ("a", 9L, 1L), ("a", 2L, 0L), ("a", 1L, 0L),
      // every positive below every negative → AUC = 0
      ("b", 1L, 1L), ("b", 2L, 1L), ("b", 9L, 0L), ("b", 10L, 0L),
      // one score for everyone → midranks force exactly 1/2
      ("c", 5L, 1L), ("c", 5L, 1L), ("c", 5L, 0L), ("c", 5L, 0L)))
    assert(got("a") === ((2L, 2L, 8L, 1.0)))
    assert(got("b") === ((2L, 2L, 0L, 0.0)))
    assert(got("c") === ((2L, 2L, 4L, 0.5)))
  }

  test("mixed ties match the hand-computed midrank U") {
    // scores: 1(neg), 2(pos), 2(neg), 3(pos) — midranks 1, 2.5, 2.5, 4.
    // U = (2.5 + 4) − 2·3/2 = 3.5 of n₊·n₋ = 4 → AUC = 0.875;
    // in 2× units u2 = 2·6.5 − 2·3 = 7 over 2·4 = 8.
    val got = auc(Seq(
      ("m", 1L, 0L), ("m", 2L, 1L), ("m", 2L, 0L), ("m", 3L, 1L)))
    assert(got("m") === ((2L, 2L, 7L, 0.875)))
  }
}
