package graft

import org.scalatest.funsuite.AnyFunSuite

/** Catalog-wide physical-plan audit: every declared query must (a) pass
  * analysis against the real testdata schemas and (b) plan WITHOUT a
  * CartesianProduct — the non-broadcast all-pairs join that silently
  * turns a capped candidate join into |corpus|² work at scale. The
  * intentional cross joins in the catalog (grid constructors, kernel
  * neighbor joins, bounded query sets) are all broadcast nested-loop
  * joins against tiny sides, which this audit permits.
  */
class PlanAuditSpec extends AnyFunSuite {
  private lazy val s = TestSpark.spark
  private val sfDir = "/root/testdata/sf0.001"

  test("every catalog query plans without a CartesianProduct") {
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        // sparkPlan = the pre-AQE physical plan; building it exercises
        // analysis + optimization without executing anything.
        val plan = fn(s, sfDir).queryExecution.sparkPlan.toString
        if (plan.contains("CartesianProduct")) Some(name) else None
    }
    assert(offenders.isEmpty,
      s"queries planning a CartesianProduct: ${offenders.mkString(", ")}")
  }
}
