package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.EventStreams
import graft.streaming.EventStreams.Interaction

/** EventStreams.itemTransitions — the streaming q151 twin: gap gating,
  * cross-micro-batch chaining through the one-LastSeen-per-user state,
  * and exact parity with the batch q151 counts on an ordered replay of
  * the real events table. */
class StreamTransitionsSpec extends AnyFunSuite {
  private lazy val s = TestSpark.spark

  private def ts(min: Long): Timestamp =
    new Timestamp(Timestamp.valueOf("2024-01-01 00:00:00").getTime
      + min * 60000L)

  test("gap gating and cross-batch chaining: a step spanning two " +
      "micro-batches emits; one past the gap does not") {
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val in = MemoryStream[Interaction]
    val q = EventStreams.itemTransitions(in.toDS())
      .toDF("src", "dst")
      .writeStream.format("memory").queryName("transitions")
      .outputMode("append").start()
    // batch 1: u1 1->2 within 10 min; u2 parks item 7 at t=0
    in.addData(Interaction(1L, ts(0), 1L, 1L),
      Interaction(1L, ts(10), 2L, 2L),
      Interaction(2L, ts(0), 3L, 7L))
    q.processAllAvailable()
    // batch 2: u2 chains 7->8 ACROSS the batch boundary (25 min, inside
    // the gap, carried by state); u1's next step is 40 min after item 2
    // — gated out, but item 9 still becomes u1's new state
    in.addData(Interaction(2L, ts(25), 4L, 8L),
      Interaction(1L, ts(50), 5L, 9L))
    q.processAllAvailable()
    // batch 3: u1 9->4 within gap — proves the gated event REPLACED the
    // state rather than leaving the stale item 2 behind
    in.addData(Interaction(1L, ts(60), 6L, 4L))
    q.processAllAvailable()
    val got = s.table("transitions").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    q.stop()
    assert(got.sorted.toSeq === Seq((1L, 2L), (7L, 8L), (9L, 4L)))
  }

  test("ordered replay of the REAL events table matches the batch q151 " +
      "transition counts exactly") {
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val SF = "/root/testdata/sf0.001"
    // the same interaction extraction q151 starts from
    val inter = graft.model.Tables(s, SF).events
      .where(col("event_type").isin("view", "click"))
      .select(col("user_id"), col("ts"), col("event_id"),
        get_json_object(col("props"), "$.k").cast("long").as("item"))
      .where(col("item").isNotNull)
      .as[Interaction]
      .collect().sortBy(r => (r.ts.getTime, r.event_id))
    assert(inter.length > 100)
    // ordered replay in 3 chunks, split where ts CHANGES so same-ts ties
    // never straddle a micro-batch
    val cut1 = inter.indices.find(i => i > inter.length / 3 &&
      inter(i).ts != inter(i - 1).ts).get
    val cut2 = inter.indices.find(i => i > 2 * inter.length / 3 &&
      inter(i).ts != inter(i - 1).ts).get
    val in = MemoryStream[Interaction]
    val q = EventStreams.itemTransitions(in.toDS())
      .toDF("src", "dst")
      .writeStream.format("memory").queryName("transitions_real")
      .outputMode("append").start()
    Seq(inter.slice(0, cut1), inter.slice(cut1, cut2),
      inter.slice(cut2, inter.length)).foreach { chunk =>
      in.addData(chunk.toIndexedSeq)
      q.processAllAvailable()
    }
    val streamed = s.table("transitions_real").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(identity).map { case (k, l) => k -> l.size.toLong }
    q.stop()
    val want = SparkEntry.queries("q151_item_transitions")(s, SF)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2)))
      .toMap
    assert(want.nonEmpty)
    assert(streamed === want)
  }
}
