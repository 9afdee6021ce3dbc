package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.GroupStateTimeout

/** Structured Streaming slice (SURVEY §2.10): the batch event analytics
  * re-expressed as unbounded-stream transforms. Each function takes the
  * (possibly streaming) events frame and returns a streaming-safe plan —
  * the SAME plan shapes run in batch mode, which is how the batch oracle
  * queries (graft.queries.EventOps) pin their semantics.
  *
  * Scale stance: all state is keyed and bounded — watermarks close event-
  * time windows and expire dedup state; mapGroupsWithState holds one small
  * case class per user AND expires it via event-time timeout. No operator
  * accumulates unbounded driver or executor state.
  *
  * Driver-catalog presence: the streaming plans themselves run only under
  * the test harness (MemoryStream), but their batch twins are first-class
  * oracle-checked catalog entries — q55_dedup_batch (dedupe) and
  * q56_click_purchase_batch (clickToPurchase) in graft.queries.EventOps,
  * plus q39 (tumblingCounts' window()) — so the driver exercises the same
  * plan shapes every round.
  */
object EventStreams {

  /** Tumbling 1-day windowed counts with a 1-hour watermark: late rows
    * beyond the watermark are dropped, closed windows are emitted once
    * (Append mode). */
  def tumblingCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 day"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("day"), col("event_type"), col("n"))

  /** Exactly-once-style dedup on event_id, with state expired by the
    * watermark instead of growing forever. */
  def dedupe(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .dropDuplicatesWithinWatermark("event_id")

  /** Stream-stream interval join: purchases within 30 minutes AFTER a
    * click by the same user. Both sides carry watermarks so the join
    * state for expired event-time ranges is dropped — the bounded-state
    * form of a streaming equi+range join. */
  def clickToPurchase(clicks: DataFrame, purchases: DataFrame): DataFrame =
    clicks.withWatermark("ts", "1 hour").alias("c")
      .join(
        purchases.withWatermark("ts", "2 hours").alias("p"),
        expr("""c.user_id = p.user_id AND
                p.ts >= c.ts AND p.ts <= c.ts + INTERVAL 30 MINUTES"""))
      .select(col("c.user_id").as("user_id"), col("c.ts").as("click_ts"),
        col("p.ts").as("purchase_ts"))

  final case class UserEvent(user_id: Long, ts: java.sql.Timestamp, value: Double)
  final case class UserAgg(n: Long, total: Double)

  /** Custom keyed state via mapGroupsWithState: running per-user count and
    * value sum across micro-batches (Update mode).
    *
    * State is BOUNDED: event-time timeout expires a user's state one hour
    * (event time) past their last event once the watermark passes it —
    * on an unbounded key space the r3 NoTimeout form grew state forever.
    * A timed-out group emits its final totals once and drops the state;
    * a later event for the same user starts a fresh running total. */
  def runningUserTotals(events: Dataset[UserEvent]): Dataset[(Long, Long, Double)] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", "1 hour")
      .groupByKey(_.user_id)
      .mapGroupsWithState[UserAgg, (Long, Long, Double)](
        GroupStateTimeout.EventTimeTimeout) { (user, rows, state) =>
        if (state.hasTimedOut) {
          val last = state.get
          state.remove()
          (user, last.n, last.total)
        } else {
          val prev = state.getOption.getOrElse(UserAgg(0L, 0.0))
          var n = prev.n
          var total = prev.total
          var maxTs = Long.MinValue
          rows.foreach { r =>
            n += 1; total += r.value
            if (r.ts.getTime > maxTs) maxTs = r.ts.getTime
          }
          state.update(UserAgg(n, total))
          // expire 1 h (event time) after this user's latest event
          state.setTimeoutTimestamp(maxTs + 3600L * 1000L)
          (user, n, total)
        }
      }
  }
}
