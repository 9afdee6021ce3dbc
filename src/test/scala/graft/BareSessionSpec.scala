package graft

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.scalatest.funsuite.AnyFunSuite

/** The driver contract hands SparkEntry an EXTERNALLY-built session:
  * no graft extensions conf, no nanosAsLong, nothing. This spec
  * recreates that hostile session state (fresh sessionState with the
  * native functions dropped, the legacy parquet conf unset, and the
  * optimizer rule cleared) and asserts the catalog still works — the
  * use-site conf re-assertion and idempotent function registration are
  * regression-pinned, not just claimed (r3 ADVICE). */
class BareSessionSpec extends AnyFunSuite {

  test("catalog queries run on a stripped session") {
    val bare = TestSpark.spark.newSession()
    // strip everything the builders normally provide
    bare.conf.set("spark.sql.legacy.parquet.nanosAsLong", "false")
    bare.experimental.extraOptimizations = Nil
    bare.experimental.extraStrategies = Nil
    Seq("point_in_polygon", "vec_dot").foreach { f =>
      bare.sessionState.functionRegistry.dropFunction(FunctionIdentifier(f))
    }
    val sf = "/root/testdata/sf0.001"
    // events path: requires the nanosAsLong re-assert in Tables.events
    assert(SparkEntry.queries("q39_tumbling_window")(bare, sf).count() > 0)
    // poster path: requires runtime point_in_polygon registration
    assert(SparkEntry.queries("q45_pip_expr")(bare, sf).count() > 0)
    // vector path: requires runtime vec_dot registration
    assert(SparkEntry.queries("q34_cosine_topk")(bare, sf).count() > 0)
    // custom-plan path: requires the as-of strategy (runtime
    // extraStrategies injection when the static extensions are absent)
    assert(SparkEntry.queries("q77_asof_native")(bare, sf).count() > 0)
    // flagship driver smoke
    assert(SparkEntry.entry(bare).count() > 0)
  }
}
