package graft

import org.scalatest.funsuite.AnyFunSuite

/** q186 (σ=0 composite) structural pins beyond the DuckDB hash: the
  * identity short-circuit must happen at PLAN-BUILD time (no kernel
  * fixture scan anywhere in the plan — the reference's app.py:23-24
  * guard returns before touching the kernel), and the shadow layer must
  * be EXACTLY the shifted raw mask (v2 ≡ 1.0), not a degenerate blur.
  */
class ZeroBlurSpec extends AnyFunSuite {
  private lazy val s = TestSpark.spark

  test("q186 plans no kernel scan and its shadow is the raw mask") {
    val df = SparkEntry.queries("q186_poster_zeroblur")(s, "unused")
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("kernel"),
      "σ=0 composite still scans a kernel fixture — identity guard lost")
    val rows = df.collect()
    assert(rows.nonEmpty)
    val shadowVals = rows.filter(!_.isNullAt(8)).map(_.getDouble(8))
    assert(shadowVals.nonEmpty, "no shadow cells at σ=0?")
    assert(shadowVals.forall(_ == 1.0),
      "identity blur must carry the mask weight 1.0 verbatim")
  }

  test("q186 shadow support equals the (+1,-1)-shifted cropped mask") {
    import s.implicits._
    // Independent recount on the COMMON canvas (q17's PIP runs on the
    // blob-local bbox raster — a different grid): q23's composite
    // support is exactly the union-of-blobs canvas mask, and a uniform
    // shift commutes with the per-cell collapse, so shifting q23's
    // support and cropping reproduces the σ=0 shadow support.
    val mask = SparkEntry.queries("q23_poster_composite")(s, "unused")
      .select(($"y" - 1).as("y"), ($"x" + 1).as("x"))
      .where($"y".between(0, 63) && $"x".between(0, 63))
      .distinct().count()
    val shadowCells = SparkEntry.queries("q186_poster_zeroblur")(s, "unused")
      .where($"sh_blob".isNotNull).count()
    assert(shadowCells == mask,
      s"shadow support $shadowCells != shifted mask support $mask")
  }
}
