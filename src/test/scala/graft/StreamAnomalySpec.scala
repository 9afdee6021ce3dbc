package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.EventStreams

/** anomalyScreen — the streaming face of q157: hand-built baseline with
  * paper-checkable flags, watermark-gated window emission, and exact
  * count parity with the batch flag rule on a replay of the real table.
  */
class StreamAnomalySpec extends AnyFunSuite {
  private lazy val s = TestSpark.spark

  // epoch-hour h → a timestamp inside that hour (weekly cell = h % 168)
  private def at(h: Long, offMin: Int = 1): Timestamp =
    new Timestamp(h * 3600000L + offMin * 60000L)

  private def mkEvents(rows: Seq[(Long, Timestamp, String, Double)]) = {
    import s.implicits._
    rows.toDF("event_id", "ts", "event_type", "value")
  }

  test("flags against a static baseline; windows emit once, gated by " +
      "the watermark") {
    import s.implicits._
    implicit val sqlCtx = s.sqlContext

    // Baseline for (click, how=0) from the WarehouseSpec hand cell:
    // ten 100s + one 5000 → n=11, s=6000, q=25100000. Against it,
    // 5000 flags (z = 3.16σ) and 100 does not (z ≈ 0.32σ).
    val baseline = Seq(("click", 0L, 11L,
        BigDecimal(6000), BigDecimal(25100000L)))
      .toDF("event_type", "how", "n", "s", "q")
      .select(col("event_type"), col("how"), col("n"),
        col("s").cast("decimal(38,0)").as("s"),
        col("q").cast("decimal(38,0)").as("q"))

    val in = MemoryStream[(Long, Timestamp, String, Double)]
    val df = in.toDF().toDF("event_id", "ts", "event_type", "value")
    val q = EventStreams.anomalyScreen(df, baseline)
      .writeStream.format("memory").queryName("anomaly")
      .outputMode("append").start()

    // Day 0, cell (click, how=0): one normal, one outlier; an event in
    // a cell ABSENT from the baseline (view) drops at the join (the
    // "no profile yet" contract of an inner baseline join).
    in.addData((1L, at(0), "click", 1.00), (2L, at(0, 5), "click", 50.00),
      (3L, at(0, 9), "view", 1.00))
    q.processAllAvailable()
    assert(s.table("anomaly").count() === 0, "window must not emit early")

    // Day 2 pushes the watermark (1 h) past day 0's window end.
    in.addData((4L, at(49), "click", 1.00))
    q.processAllAvailable()
    val rows = s.table("anomaly").collect()
      .map(r => (r.getTimestamp(0), r.getString(1),
        r.getLong(2), r.getLong(3))).toSet
    q.stop()
    assert(rows === Set(
      (new Timestamp(0L), "click", 2L, 1L))) // 2 events, 1 flagged
  }

  test("streaming flags == batch flags on an ordered replay of the " +
      "real sf0.001 events") {
    import s.implicits._
    implicit val sqlCtx = s.sqlContext

    val events = graft.model.Tables(s, "/root/testdata/sf0.001").events
    val cells  = graft.queries.Warehouse.eventCells(events)
    val baseline = graft.queries.Warehouse.seasonalBaseline(cells)

    // Batch truth: per (day, type) flag counts under the same baseline.
    val want = cells
      .join(broadcast(baseline), Seq("event_type", "how"))
      .withColumn("fl", graft.queries.Warehouse.anomalyFlag)
      .groupBy(window(col("ts"), "1 day"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), sum("fl").as("n_anomalies"))
      .select(col("window.start"), col("event_type"),
        col("n_events"), col("n_anomalies"))
      .collect()
      .map(r => (r.getTimestamp(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3))).toMap

    val in = MemoryStream[(Long, Timestamp, String, Double)]
    val df = in.toDF().toDF("event_id", "ts", "event_type", "value")
    val q = EventStreams.anomalyScreen(df, baseline)
      .writeStream.format("memory").queryName("anomaly_replay")
      .outputMode("append").start()
    val replay = events.select("event_id", "ts", "event_type", "value")
      .orderBy("ts", "event_id").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getString(2),
        r.getDouble(3)))
    in.addData(replay.toSeq)
    q.processAllAvailable()
    // flush: an event far past the last day closes every window
    val lastTs = replay.map(_._2.getTime).max
    in.addData((-1L, new Timestamp(lastTs + 3L * 86400000L), "click", 1.0))
    q.processAllAvailable()
    val got = s.table("anomaly_replay").collect()
      .map(r => (r.getTimestamp(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3))).toMap
    q.stop()

    // the flush event lands in its own late window; ignore it
    val gotReal = got.filter { case ((day, _), _) =>
      day.getTime <= lastTs }
    assert(gotReal === want)
    assert(want.values.map(_._1).sum === events.count(),
      "replay must cover every event")
  }
}
