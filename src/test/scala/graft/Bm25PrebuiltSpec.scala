package graft

import org.scalatest.funsuite.AnyFunSuite

/** q178 prebuilt-BM25 serving shape — what the shared oracle cannot
  * express: the PROBE plan must read the persisted index artifact and
  * never the corpus (build-once/probe-many is a plan property), and the
  * probe must equal the build-every-time q120 row for row. */
class Bm25PrebuiltSpec extends AnyFunSuite {
  private lazy val s = TestSpark.spark
  private val sfDir = "/root/testdata/sf0.001"

  test("probe plan scans the index artifact, never documents.parquet") {
    val df = SparkEntry.queries("q178_bm25_prebuilt")(s, sfDir)
    val plan = df.queryExecution.sparkPlan.toString
    assert(plan.contains("graft_bm25_index"),
      "probe plan does not read the persisted index")
    assert(!plan.contains("documents.parquet"),
      "probe plan re-reads the corpus — the build leaked into the probe")
  }

  test("probe == build-every-time q120, row for row") {
    val a = SparkEntry.queries("q178_bm25_prebuilt")(s, sfDir)
      .collect().map(_.toString).toSeq
    val b = SparkEntry.queries("q120_bm25_retrieval")(s, sfDir)
      .collect().map(_.toString).toSeq
    assert(a.nonEmpty && a === b)
  }
}
