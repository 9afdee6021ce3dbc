package graft

import org.scalatest.funsuite.AnyFunSuite

/** The events-table timezone contract, scoped (VERDICT r7 #7): a host
  * session running a non-UTC zone keeps its zone after running catalog
  * queries, AND the results those queries later materialize are still the
  * UTC-semantics results — because the analyzer bakes the session zone
  * into every TimeZoneAwareExpression while the query is CONSTRUCTED
  * (inside Tables.withUtcSession), restoring the conf afterwards cannot
  * change them. Both halves are load-bearing: restore-without-baking
  * would corrupt results, baking-without-restore is the r7 spooky-action
  * complaint. */
class UtcScopeSpec extends AnyFunSuite {
  private val sf = "/root/testdata/sf0.001"

  test("non-UTC host session: zone restored, results still UTC-exact") {
    val host = TestSpark.spark.newSession()
    host.conf.set("spark.sql.session.timeZone", "America/New_York")
    host.conf.set("spark.sql.legacy.parquet.nanosAsLong", "false")

    // Zone-sensitive queries: tumbling window + date math both resolve
    // TimeZoneAwareExpressions during construction.
    val win = SparkEntry.queries("q39_tumbling_window")(host, sf)
    val dm = SparkEntry.queries("q42_date_math")(host, sf)

    // 1. The host got its zone back the moment the lambda returned.
    assert(host.conf.get("spark.sql.session.timeZone") === "America/New_York")

    // 2. Materializing AFTER the restore still yields the UTC results:
    // compare against a UTC session's reference run, row for row.
    val utc = TestSpark.spark.newSession()
    utc.conf.set("spark.sql.session.timeZone", "UTC")
    def canon(rows: Array[org.apache.spark.sql.Row]) =
      rows.map(_.toString).sorted.toSeq
    assert(canon(win.collect()) ===
      canon(SparkEntry.queries("q39_tumbling_window")(utc, sf).collect()))
    assert(canon(dm.collect()) ===
      canon(SparkEntry.queries("q42_date_math")(utc, sf).collect()))

    // 3. ...and the zone survived the executions too.
    assert(host.conf.get("spark.sql.session.timeZone") === "America/New_York")
  }

  test("withUtcSession restores an UNSET zone by unsetting it") {
    val s = TestSpark.spark.newSession()
    s.conf.unset("spark.sql.session.timeZone")
    val before = s.conf.getOption("spark.sql.session.timeZone")
    graft.model.Tables.withUtcSession(s) {
      assert(s.conf.get("spark.sql.session.timeZone") === "UTC")
    }
    assert(s.conf.getOption("spark.sql.session.timeZone") === before)
  }
}
