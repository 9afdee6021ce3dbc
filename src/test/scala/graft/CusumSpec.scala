package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.queries.EventOps

/** q177 CUSUM drift — pins the prefix-min identity implementation
  * against the textbook Page recursion S_k = max(0, S_{k-1} + d_k) on
  * hand series (flat, drifted, multi-type), plus the alarm rule and a
  * corpus sanity pass. */
class CusumSpec extends AnyFunSuite {
  private lazy val s = TestSpark.spark

  private def ts(dayOfMonth: Int) =
    java.sql.Timestamp.valueOf(f"2026-01-$dayOfMonth%02d 00:00:00")

  private def daily(rows: Seq[(String, Int, Long)]) = {
    import s.implicits._
    rows.map { case (t, d, c) => (t, ts(d), c) }
      .toDF("event_type", "day", "c")
  }

  /** Textbook recursion, exact scaled-integer deviations. */
  private def localCusum(cs: Seq[Long]): Seq[Long] = {
    val nd = cs.length
    val total = cs.sum
    cs.scanLeft(0L)((acc, c) => math.max(0L, acc + (c * nd - total))).tail
  }

  test("prefix-min identity == Page recursion on flat, drifted and multi-type series") {
    val flat = Seq.fill(6)(10L)
    val drift = Seq(10L, 10L, 10L, 10L, 50L, 50L, 50L, 50L)
    val saw = Seq(5L, 50L, 5L, 50L, 5L, 50L, 5L)
    val in = daily(
      flat.zipWithIndex.map { case (c, i) => ("flat", i + 1, c) } ++
      drift.zipWithIndex.map { case (c, i) => ("drift", i + 1, c) } ++
      saw.zipWithIndex.map { case (c, i) => ("saw", i + 1, c) })
    val got = EventOps.cusumOver(in).orderBy("event_type", "day")
      .select("event_type", "cusum_scaled", "drift_alarm").collect()
      .groupBy(_.getString(0))
      .map { case (k, rs) =>
        k -> rs.map(r => (r.getLong(1), r.getBoolean(2))).toSeq }
    for ((name, cs) <- Seq(("flat", flat), ("drift", drift), ("saw", saw))) {
      val total = cs.sum
      val want = localCusum(cs).map(sv => (sv, sv > 2 * total))
      assert(got(name) === want, s"series $name")
    }
    // the drifted series must actually alarm, the flat one must not
    assert(got("drift").exists(_._2), "drift series never alarmed")
    assert(!got("flat").exists(_._2), "flat series alarmed")
  }

  test("corpus sanity at sf0.001: bounds and determinism") {
    val out = SparkEntry.queries("q177_cusum_drift")(
      s, "/root/testdata/sf0.001").collect()
    assert(out.nonEmpty)
    assert(out.forall(_.getLong(3) >= 0), "CUSUM went negative")
    val out2 = SparkEntry.queries("q177_cusum_drift")(
      s, "/root/testdata/sf0.001").collect()
    assert(out.map(_.toString).toSeq === out2.map(_.toString).toSeq)
  }
}
