package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.queries.Poster

/** The poster pipeline as a FUNCTION of the reference's sidebar parameters
  * (VERDICT r7 #2): the identical code path that renders the default
  * (seed=42, n_blobs=14, light=(-0.6,0.8), σ=2) point must also render the
  * Alt point (seed=7, n_blobs=9, light=(0.4,-0.7), blur=0.05 ⇒ σ=3.2)
  * against ITS numpy-frozen fixtures — nothing about 14 blobs, 37 taps, or
  * the default light direction may be baked into the dataflow. */
class PosterAltSpec extends AnyFunSuite {
  private lazy val s = TestSpark.spark

  test("kernel adapts to sigma: taps = 2*int(3σ+0.5)+1, sum 1, fixture match") {
    val rows = Poster.kernel(s, Poster.Alt.sigma)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // σ=3.2: radius = int(3*3.2+0.5) = 10 → 21 taps (vs 37 at σ=6).
    val radius = (3.0 * Poster.Alt.sigma + 0.5).toInt
    assert(radius === 10)
    assert(rows.size === 2 * radius + 1)
    assert(math.abs(rows.values.sum - 1.0) < 1e-9)
    (1 to radius).foreach(o => assert(rows(o.toLong) === rows(-o.toLong)))
    val fx = s.read.parquet(s"${Poster.Alt.fx}/kernel_sigma3p2.parquet")
      .collect().map(r => r.getInt(0).toLong -> r.getDouble(1)).toMap
    rows.foreach { case (o, w) => assert(math.abs(w - fx(o)) < 1e-11) }
  }

  test("alt per-cell pipeline equals alt golden_cells_64 exactly (9 blobs)") {
    val got = Poster.posterCells(s, Poster.Alt)
      .orderBy("blob_id", "y", "x")
      .collect()
    val want = s.read.parquet(s"${Poster.Alt.fx}/golden_cells_64.parquet")
      .selectExpr("blob_id", "CAST(y AS BIGINT) AS y", "CAST(x AS BIGINT) AS x",
        "mask", "shade", "r", "g", "b", "a")
      .orderBy("blob_id", "y", "x")
      .collect()
    // 9 blobs × 64×64 — the blob count flows from the fixture, not a const
    assert(got.length === 9 * 64 * 64)
    assert(got.length === want.length)
    got.zip(want).zipWithIndex.foreach { case ((g, w), i) =>
      assert(g === w, s"cell $i differs: got $g want $w")
    }
  }

  test("q138 composite is non-degenerate and distinct from q53's") {
    val alt = Poster.queries("q138_poster_alt")(s, "").collect()
    assert(alt.nonEmpty)
    // top blob ids must stay within the 9-blob space
    val tops = alt.flatMap(r => Option(r.get(2)).map(_.asInstanceOf[Long]))
    assert(tops.nonEmpty && tops.forall(b => b >= 0 && b <= 8))
    val dft = Poster.queries("q53_shadow_composite")(s, "").collect()
    assert(alt.map(_.toString).toSet != dft.map(_.toString).toSet)
  }
}
