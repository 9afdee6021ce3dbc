package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.queries.Poster

/** Golden-fixture determinism test (SURVEY §5.2): the full per-cell poster
  * pipeline must reproduce the numpy-generated golden table bit-for-bit —
  * the ported form of the reference's same-seed ⇒ same-poster guarantee. */
class GoldenPosterSpec extends AnyFunSuite {

  test("q22_poster_cells equals golden_cells_64 exactly (57,344 cells)") {
    val s = TestSpark.spark
    val got = Poster.queries("q22_poster_cells")(s, "")
      .orderBy("blob_id", "y", "x")
      .collect()
    val want = s.read.parquet(s"${Poster.FX}/golden_cells_64.parquet")
      .selectExpr("blob_id", "CAST(y AS BIGINT) AS y", "CAST(x AS BIGINT) AS x",
        "mask", "shade", "r", "g", "b", "a")
      .orderBy("blob_id", "y", "x")
      .collect()
    assert(got.length === want.length)
    got.zip(want).zipWithIndex.foreach { case ((g, w), i) =>
      assert(g === w, s"cell $i differs: got $g want $w")
    }
  }

  test("q14 palette hsv->rgb reproduces the frozen colorsys values") {
    val s = TestSpark.spark
    val conv = Poster.queries("q14_palette")(s, "")
      .collect().map(r => r.getLong(1) ->
        (r.getDouble(2), r.getDouble(3), r.getDouble(4))).toMap
    val frozen = s.read.parquet(s"${Poster.FX}/palette.parquet")
      .collect().map(r => r.getLong(0) ->
        (r.getDouble(4), r.getDouble(5), r.getDouble(6))).toMap
    assert(conv === frozen)
  }
}
