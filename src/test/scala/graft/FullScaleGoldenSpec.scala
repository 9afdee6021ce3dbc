package graft

import org.scalatest.funsuite.AnyFunSuite

/** Golden pin for q46 — the ONE catalog query without a DuckDB oracle
  * (the 400×400 full-scale twin of the oracle-checked q22/q23 64-grid).
  * Its 14-row output is deterministic by construction: integer mask
  * counts, shade sums rounded to 3 (summation noise ~1e-11 against a
  * 0.0005 boundary), tile masses folded in sorted tile order. The rows
  * below were captured from the passing r6 build; any PIP, shading,
  * normalization, tiling, or blur regression moves them.
  *
  * Second, the physics: the σ=6 kernel is sum-normalized and every
  * blob's R=18 halo stays inside the padded bbox (pad = 0.4·extent ≫
  * 18 cells), so convolution conserves mass EXACTLY — shadow_mass must
  * equal n_mask_cells at 3 dp. A mis-normalized kernel or a tile halo
  * bug breaks conservation before it breaks anything visible.
  */
class FullScaleGoldenSpec extends AnyFunSuite {
  private lazy val s = TestSpark.spark

  test("q46 matches the golden 14 rows and conserves blur mass") {
    val got = SparkEntry.queries("q46_poster_fullscale")(s, "unused")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4)))
      .sortBy(_._1)
    val want = Seq(
      (0L, 31455L, 23306.491, 12582.0, 31455.0),
      (1L, 32364L, 23973.893, 14439.323, 32364.0),
      (2L, 32132L, 23789.841, 15818.831, 32132.0),
      (3L, 29276L, 21816.479, 15764.0, 29276.0),
      (4L, 31177L, 23181.568, 18226.554, 31177.0),
      (5L, 29053L, 21624.521, 18325.738, 29053.0),
      (6L, 33180L, 24552.429, 22460.308, 33180.0),
      (7L, 27261L, 20353.928, 19711.8, 27261.0),
      (8L, 30416L, 22591.367, 23396.923, 30416.0),
      (9L, 31952L, 23727.259, 26053.169, 31952.0),
      (10L, 27738L, 20704.263, 23897.354, 27738.0),
      (11L, 30342L, 22561.573, 27541.2, 30342.0),
      (12L, 28730L, 21428.557, 27404.0, 28730.0),
      (13L, 30697L, 22803.162, 30697.0, 30697.0))
    assert(got.toSeq === want)
    // mass conservation, stated as the law rather than via the literals
    got.foreach { case (blob, n, _, _, mass) =>
      assert(mass === n.toDouble, s"blob $blob: blur mass $mass ≠ mask $n")
    }
  }
}
