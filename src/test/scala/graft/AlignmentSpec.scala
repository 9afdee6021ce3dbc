package graft

import org.apache.spark.sql.execution.joins.{BroadcastNestedLoopJoinExec,
  CartesianProductExec}
import org.scalatest.funsuite.AnyFunSuite

/** q191 pins beyond the DuckDB hash: the filter actually discriminates
  * (neither a pass-everything nor a drop-everything gate), every doc
  * with an embedding is accounted for exactly once, and the plan joins
  * the two modalities on the shared key — never a cross-score. */
class AlignmentSpec extends AnyFunSuite {
  private lazy val s = TestSpark.spark
  private val sfDir = "/root/testdata/sf0.001"

  test("per-source retention discriminates and accounts for every pair") {
    val rows = SparkEntry.queries("q191_modality_alignment")(s, sfDir)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3)))
    assert(rows.nonEmpty)
    rows.foreach { case (src, n, kept, ret) =>
      assert(kept >= 0 && kept <= n, s"$src: kept $kept of $n")
      assert(ret >= 0.0 && ret <= 1.0)
    }
    // 500 docs ⋈ 500 embeddings on the shared id space, none degenerate
    assert(rows.map(_._2).sum == 500L,
      "every (doc, embedding) pair must be scored exactly once")
    val total = rows.map(_._3).sum
    assert(total > 0 && total < 500,
      s"the gate kept $total of 500 — a pass/drop-everything gate " +
        "filters nothing")
  }

  test("the plan joins modalities on the key (no cross-score)") {
    val plan = SparkEntry.queries("q191_modality_alignment")(s, sfDir)
      .queryExecution.sparkPlan
    val unkeyed = plan.collect {
      case j: CartesianProductExec => j
      case j: BroadcastNestedLoopJoinExec => j
    }
    assert(unkeyed.isEmpty, s"q191 plans an unkeyed modality join:\n$plan")
  }
}
