package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkEntry

/** Pins the q50 → q70 scale swap: the approx_percentile form (constant
  * mergeable state — the 100 TB path) must track the exact sort-based
  * percentiles within 0.5 % relative error on the bench-scale data.
  * q70 itself is rows-only driver-side (quantile-summary values are
  * implementation-specific); THIS is its correctness contract.
  */
class ApproxPercentileSpec extends AnyFunSuite {
  private lazy val s = TestSpark.spark

  private val sfDir = {
    val bench = "/root/testdata/sf0.1"
    if (new java.io.File(bench).isDirectory) bench
    else "/root/testdata/sf0.01"
  }

  test("approx percentiles track the exact sort-based values") {
    val exact = SparkEntry.queries("q50_percentiles")(s, sfDir)
      .collect().map(r => r.getString(0) -> (r.getDouble(2), r.getDouble(3)))
      .toMap
    val approx = SparkEntry.queries("q70_percentiles_approx")(s, sfDir)
      .collect().map(r => r.getString(0) -> (r.getDouble(2), r.getDouble(3)))
      .toMap
    assert(exact.keySet === approx.keySet)
    assert(exact.nonEmpty)
    for ((flag, (med, p90)) <- exact) {
      val (amed, ap90) = approx(flag)
      assert(math.abs(amed - med) / med <= 0.005,
        s"$flag median: approx $amed vs exact $med")
      assert(math.abs(ap90 - p90) / p90 <= 0.005,
        s"$flag p90: approx $ap90 vs exact $p90")
    }
  }
}
