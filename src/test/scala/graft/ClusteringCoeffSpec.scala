package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.queries.TextOps

/** q167's local clustering coefficient on hand-computed graphs. */
class ClusteringCoeffSpec extends AnyFunSuite {
  private val s = TestSpark.spark

  private def run(edges: Seq[(Long, Long)]): Map[Long, (Long, Long, Double)] = {
    import s.implicits._
    TextOps.clusteringCoeff(edges.toDF("u", "v"))
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3))))
      .toMap
  }

  test("K4 is fully closed, a path is fully open, a pendant dilutes") {
    // K4 on {1,2,3,4}: deg 3, 3 triangles each, cc = 2·3/(3·2) = 1.
    // Path 5–6–7: node 6 deg 2, no triangle, cc = 0; endpoints deg 1
    // are excluded (cc undefined — the Watts–Strogatz convention).
    // Triangle {8,9,10} with pendant 8–11: node 8 deg 3 but only one
    // triangle, cc = 2·1/(3·2) = 1/3; 9 and 10 stay at cc = 1.
    val got = run(Seq(
      (1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L),
      (5L, 6L), (6L, 7L),
      (8L, 9L), (8L, 10L), (9L, 10L), (8L, 11L)))
    assert(got === Map(
      1L -> ((3L, 3L, 1.0)), 2L -> ((3L, 3L, 1.0)),
      3L -> ((3L, 3L, 1.0)), 4L -> ((3L, 3L, 1.0)),
      6L -> ((2L, 0L, 0.0)),
      8L -> ((3L, 1L, 1.0 / 3.0)),
      9L -> ((2L, 1L, 1.0)), 10L -> ((2L, 1L, 1.0))))
  }

  test("reversed duplicates and self-loops do not inflate the degree") {
    // The same triangle listed with a reversed duplicate edge and a
    // self-loop: degrees must stay 2 and cc exactly 1 — a deg of 3
    // from the (2,1) duplicate would report cc = 1/3 instead.
    val got = run(Seq((1L, 2L), (2L, 3L), (3L, 1L), (2L, 1L), (3L, 3L)))
    assert(got === Map(
      1L -> ((2L, 1L, 1.0)), 2L -> ((2L, 1L, 1.0)), 3L -> ((2L, 1L, 1.0))))
  }
}
