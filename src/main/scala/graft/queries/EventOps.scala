package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.model.Tables

/** Event/time-series analytics over `events` (SURVEY §2.10 batch surface)
  * plus the date and JSON scalar families the driver data forces
  * (SURVEY §2.8 / P17).
  *
  * Scale stance: sessionization is a per-user window (partition key =
  * user_id — high cardinality in production, no global sort); tumbling
  * windows aggregate on (bucket, type) with map-side partials; the HLL
  * sketch replaces exact distinct exactly where a 100 TB pipeline must
  * (constant-size state per group vs a distinct shuffle of every user id).
  */
object EventOps {

  // Money-exactness boundary, shared with Relational: see Exact.
  private def dPrice(c: org.apache.spark.sql.Column) = Exact.dPrice(c)
  private def asD(c: org.apache.spark.sql.Column) = Exact.asD(c)

  /** The W4 inactivity gap (30 min) — single-sourced for every consumer
    * of the session definition (q38 here, q121 in Retrieval). */
  private[queries] val SESSION_GAP_US = 1800L * 1000000L

  /** The ≥-gap session contract in DuckDB SQL — shared verbatim by q62
    * (native session_window) and q145 (salted two-pass twin): two plan
    * forms, one oracle, divergence impossible by construction. */
  private val SESSION_ORACLE_SQL =
    """WITH flagged AS (
      | SELECT user_id, ts, event_id,
      |  CASE WHEN epoch_us(ts) - LAG(epoch_us(ts)) OVER w IS NULL
      |         OR epoch_us(ts) - LAG(epoch_us(ts)) OVER w >= 1800000000
      |       THEN 1 ELSE 0 END AS new_sess
      | FROM events
      | WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      |sess AS (
      | -- the cumulative sum orders on the SAME (ts, event_id) total
      | -- order as the LAG flag above: with duplicate (user_id, ts)
      | -- rows at a session boundary, a ts-only sort could split tied
      | -- rows across sessions nondeterministically
      | SELECT user_id, ts,
      |  SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |                      ROWS UNBOUNDED PRECEDING) AS sid
      | FROM flagged)
      |SELECT user_id, MIN(ts) AS first_ts, COUNT(*) AS n_events
      |FROM sess GROUP BY user_id, sid
      |ORDER BY user_id, first_ts""".stripMargin

  /** q145's salted two-pass sessionizer, factored out with the slab
    * width as a parameter so SaltingSpec can property-sweep it.
    *
    * Correctness requires ONLY `slabUs >= SESSION_GAP_US`: slab
    * boundaries are ≥-gap apart, so merges can only happen between
    * ADJACENT slabs' boundary sessions, which pass 2 stitches; any
    * width in [gap, ∞) yields the q62 answer (the ∞ limit degenerates
    * to the unsalted single-pass). The width is a pure parallelism/
    * state knob: smaller slabs spread a hot user over more tasks.
    * Default 1 day ≫ the 30-min gap. */
  private[graft] def saltedSessionize(events: DataFrame,
      slabUs: Long = 86400L * 1000000L): DataFrame = {
    require(slabUs >= SESSION_GAP_US,
      s"slab width $slabUs us < session gap $SESSION_GAP_US us breaks " +
        "the adjacent-slab-only merge argument")
    val e = events
      .select(col("user_id"), col("ts"), col("event_id"),
        floor(unix_micros(col("ts")) / slabUs).as("slab"))
    val wl = Window.partitionBy("user_id", "slab")
      .orderBy("ts", "event_id")
    val prevTs = lag(unix_micros(col("ts")), 1).over(wl)
    val local = e
      .withColumn("new_sess",
        (prevTs.isNull ||
          unix_micros(col("ts")) - prevTs >= SESSION_GAP_US).cast("long"))
      .withColumn("sid", sum("new_sess")
        .over(wl.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy("user_id", "slab", "sid")
      .agg(min("ts").as("first_ts"), max("ts").as("last_ts"),
        count(lit(1)).as("n_events"))
    val ws = Window.partitionBy("user_id", "slab")
    val tagged = local
      .withColumn("max_sid", max("sid").over(ws))
      .withColumn("boundary", col("sid") === 1 || col("sid") === col("max_sid"))
    val interior = tagged.where(!col("boundary"))
      .select(col("user_id"), col("first_ts"), col("n_events"))
    val wm = Window.partitionBy("user_id").orderBy("first_ts", "slab", "sid")
    val prevLast = lag(unix_micros(col("last_ts")), 1).over(wm)
    val chains = tagged.where(col("boundary"))
      .withColumn("new_chain",
        (prevLast.isNull ||
          unix_micros(col("first_ts")) - prevLast >= SESSION_GAP_US)
          .cast("long"))
      .withColumn("cid", sum("new_chain")
        .over(wm.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy("user_id", "cid")
      .agg(min("first_ts").as("first_ts"), sum("n_events").as("n_events"))
      .select(col("user_id"), col("first_ts"), col("n_events"))
    interior.unionByName(chains)
  }

  /** Per-(user, day) decimal value rollup — the daily-series core shared
    * by q127 (gap fill) and q128 (EWMA). Single-sourced on both engines:
    * this helper Spark-side, [[DAILY_SQL]] interpolated into both
    * oracles DuckDB-side. dsum narrows to DECIMAL(18,2) (ample for any
    * per-user-day sum here) so the q128 weight products stay inside
    * both engines' 38-digit decimal width. */
  /** The ONE per-day HLL frame shared by q136 (cumulative) and q137
    * (sliding) — lgK and the day boundary live here only, so the two
    * rollups can never desync (review r7b #3). `sk` is the mergeable
    * Datasketches binary; any window geometry is a union over this frame. */
  private def dailySketch(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir).events
      .select(col("user_id"), date_trunc("day", col("ts")).as("day"))
      .groupBy("day")
      .agg(hll_sketch_agg(col("user_id"), lit(14)).as("sk"))

  private def dailyValue(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir).events
      .groupBy(col("user_id"), date_trunc("day", col("ts")).as("day"))
      .agg(count(lit(1)).as("n_events"),
        sum(dPrice(col("value"))).cast("decimal(18,2)").as("dsum"))

  private val DAILY_SQL =
    """daily AS MATERIALIZED (
      | SELECT user_id, CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
      |  COUNT(*) AS n_events,
      |  CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DECIMAL(18,2)) AS dsum
      | FROM events GROUP BY 1, 2)""".stripMargin

  /** EWMA trailing-window depth and exact weights (α = 1/2, so α^k is an
    * exact binary fraction with a finite decimal form — both engines
    * parse the identical decimal literal; interpolated into the q128
    * oracle so the two sides can't drift). */
  private val EWMA_K = 8
  private def ewmaW(k: Int): String =
    java.math.BigDecimal.valueOf(0.5).pow(k).toPlainString
  /** 0.5^k has exactly k decimal digits, so the deepest lag (k = K−1)
    * fixes the weight scale — DERIVED, not hardcoded, so bumping EWMA_K
    * can never silently round the Spark-side weights while the oracle
    * interpolates the full literal. */
  private val EWMA_SCALE = EWMA_K - 1
  private val EWMA_WT_DEC = s"DECIMAL(${EWMA_SCALE + 2},$EWMA_SCALE)"
  /** dsum is DECIMAL(18,2); product scale = 2 + EWMA_SCALE. */
  private val EWMA_SUM_DEC = s"DECIMAL(28,${EWMA_SCALE + 2})"

  /** Sessionization core shared by q38/q121: lag-gap flag + running sum
    * under the (ts, event_id) total order. Adds `new_sess` and
    * `session_id` to the event rows; callers aggregate as they need. */
  private[queries] def sessionized(ev: DataFrame): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val gap = unix_micros(col("ts")) - lag(unix_micros(col("ts")), 1)
      .over(w)
    ev.withColumn("new_sess",
        when(gap.isNull || gap > SESSION_GAP_US, 1L).otherwise(0L))
      .withColumn("session_id", sum("new_sess").over(w))
  }

  /** The oracle-side twin of [[sessionized]]: CTE chain ending in
    * `sess(user_id, ts, session_id BIGINT)` — interpolated by the q38
    * and q121 oracles so the two session definitions can't drift. */
  private[queries] val SESSION_SQL =
    s"""flagged AS (
      | SELECT user_id, event_id, ts,
      |  CASE WHEN epoch_us(ts) - LAG(epoch_us(ts)) OVER w IS NULL
      |         OR epoch_us(ts) - LAG(epoch_us(ts)) OVER w
      |            > $SESSION_GAP_US
      |       THEN 1 ELSE 0 END AS new_sess
      | FROM events
      | WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      |sess AS (
      | SELECT user_id, ts,
      |  CAST(SUM(new_sess) OVER (PARTITION BY user_id
      |    ORDER BY ts, event_id) AS BIGINT) AS session_id
      | FROM flagged)""".stripMargin

  /** q177 alarm threshold: cumulative excess beyond CUSUM_H mean days
    * raises the drift flag. Interpolated into the oracle. */
  private[graft] val CUSUM_H = 2L

  /** q177 core over a (event_type, day, c) daily-count frame — factored
    * so CusumSpec can drive hand series and pin the prefix-min identity
    * against the textbook max(0, S+d) recursion. */
  private[graft] def cusumOver(daily: DataFrame): DataFrame = {
    val cal = daily.groupBy("event_type")
      .agg(count(lit(1)).as("nd"), sum("c").as("total"))
    val w = Window.partitionBy("event_type").orderBy("day")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    daily.join(broadcast(cal), "event_type")
      .withColumn("p", sum(col("c") * col("nd") - col("total")).over(w))
      .withColumn("cusum_scaled",
        col("p") - least(lit(0L), min("p").over(w)))
      .select(col("event_type"), col("day"), col("c"), col("cusum_scaled"),
        (col("cusum_scaled") > lit(CUSUM_H) * col("total"))
          .as("drift_alarm"))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // CUSUM changepoint detection (Page 1954, Biometrika) — SUSTAINED
    // drift, the complement of q157's per-cell 3σ POINT-anomaly screen
    // (a +20% shift that never clears one hour's 3σ band accumulates
    // here within days). Per event type, the daily count series against
    // its own calibration mean; alarm when cumulative excess exceeds
    // CUSUM_H mean days.
    //
    // The textbook recursion S_k = max(0, S_{k-1} + d_k) is not a window
    // aggregate — but its closed form IS: S_k = P_k − min(0, min_{j≤k}
    // P_j) with P the running sum of deviations (the prefix-min
    // identity; proven against the recursion in CusumSpec). Deviations
    // are kept EXACT by scaling: d_i = c_i·nd − total (both integers; μ
    // never materializes as a ratio), so every value the hash sees is a
    // long both engines compute bit-identically — no rounding, no ties.
    // Bound: |P| ≤ nd·max(c)·nd < 2⁶² for any feasible event table
    // (nd ≤ 10⁵ days needs max daily count < 2³²·10 — far above any
    // per-type day).
    //
    // Scale: ONE corpus-sized shuffle (the (etype, day) partial-agg
    // rollup); everything after runs on the days×types frame (~10³
    // rows at any SF). The per-type calibration is a broadcast rejoin
    // (J2); windows partition by etype over day-counted frames.
    "q177_cusum_drift" -> ((s, dir) =>
      cusumOver(Tables(s, dir).events
        .groupBy(col("event_type"),
          date_trunc("day", col("ts")).as("day"))
        .agg(count(lit(1)).as("c")))
        .orderBy("event_type", "day")),

    // W4 sessionization: lag-gap flag + running sum builds session ids;
    // 30-minute inactivity closes a session. Output is one row per
    // session (bounded by sessions, not events).
    "q38_sessionize" -> ((s, dir) => {
      sessionized(Tables(s, dir).events)
        .groupBy("user_id", "session_id")
        .agg(count(lit(1)).as("n_events"),
          min("ts").as("session_start"), max("ts").as("session_end"),
          (unix_micros(max("ts")) - unix_micros(min("ts"))).as("duration_us"))
        .orderBy("user_id", "session_id")
    }),

    // §2.10 batch window(): epoch-aligned tumbling day buckets.
    "q39_tumbling_window" -> ((s, dir) => {
      Tables(s, dir).events
        .groupBy(window(col("ts"), "1 day").as("win"), col("event_type"))
        .agg(count(lit(1)).as("n"),
          asD(sum(dPrice(col("value")))).as("sum_value"))
        .select(col("win.start").as("day"), col("event_type"), col("n"),
          col("sum_value"))
        .orderBy("day", "event_type")
    }),

    // A8 HLL: approx_count_distinct (constant-size sketch state) next to
    // the exact count it approximates. Raw sketch values are
    // implementation-specific, so the OUTPUT is the bounded-error
    // comparison (VERDICT r5 #3): within_bound = |approx − exact| ≤
    // ⌈5 %·exact⌉ (rsd 0.02 ⇒ 2.5σ). The DuckDB oracle computes the
    // exact side and asserts within_bound = 1, so the hash check pins
    // the sketch's error bound cross-engine instead of skipping it.
    "q40_hll_users" -> ((s, dir) => {
      Tables(s, dir).events
        .groupBy("event_type")
        .agg(countDistinct(col("user_id")).as("n_exact"),
          approx_count_distinct(col("user_id"), 0.02).as("n_approx"),
          count(lit(1)).as("n_events"))
        .select(col("event_type"), col("n_exact"), col("n_events"),
          (abs(col("n_approx") - col("n_exact")) <=
            ceil(lit(0.05) * col("n_exact"))).cast("long").as("within_bound"))
        .orderBy("event_type")
    }),

    // Audience overlap via HLL INCLUSION-EXCLUSION — the set operation
    // HLL famously lacks (sketches union, never intersect), recovered as
    // |A∩B| ≈ est(A) + est(B) − est(A∪B). At 100 TB this is the only
    // sane way to ask "how many users did BOTH X and Y" across many
    // segment pairs: one sketch per segment (one pass, mergeable binary
    // state), then pairwise unions on a |segments|-sized frame — no
    // second shuffle of raw ids per pair. Error compounds across the
    // three estimates and is RELATIVE TO THE UNION, so the estimate is
    // only trustworthy when the intersection isn't tiny against it —
    // the within_bound contract (5 % of exact, floor 5) states exactly
    // that, and the exact per-pair intersection rides along (distinct
    // (type,user) self-join — |types|² fan-out per user, bounded by the
    // 5-type domain). Output follows the q40 convention: exact values +
    // the asserted bound; the raw estimate never crosses engines.
    "q153_audience_overlap" -> ((s, dir) => {
      val ev = Tables(s, dir).events
        .select(col("event_type").as("t"), col("user_id"))
      val sk = ev.groupBy("t").agg(
        hll_sketch_agg(col("user_id"), lit(14)).as("sk"),
        countDistinct(col("user_id")).as("n"))
      val pairs = sk.select(col("t").as("ta"), col("sk").as("ska"),
          col("n").as("n_a"))
        .crossJoin(sk.select(col("t").as("tb"), col("sk").as("skb"),
          col("n").as("n_b")))
        .where(col("ta") < col("tb"))
      val du = ev.distinct()
      val inter = du.select(col("t").as("ta"), col("user_id"))
        .join(du.select(col("t").as("tb"), col("user_id")), "user_id")
        .where(col("ta") < col("tb"))
        .groupBy("ta", "tb").agg(countDistinct(col("user_id")).as("n_inter"))
      pairs.join(inter, Seq("ta", "tb"))
        .select(col("ta"), col("tb"), col("n_a"), col("n_b"), col("n_inter"),
          (abs(hll_sketch_estimate(col("ska"))
              + hll_sketch_estimate(col("skb"))
              - hll_sketch_estimate(hll_union(col("ska"), col("skb")))
              - col("n_inter"))
            <= greatest(lit(5), ceil(lit(0.05) * col("n_inter"))))
            .cast("long").as("within_bound"))
        .orderBy("ta", "tb")
    }),

    // The SKETCH-ONCE / MERGE-MANY rollup — the pattern that makes
    // distinct counts tractable at 100 TB: one pass builds a Datasketches
    // HLL per day (`hll_sketch_agg`, mergeable binary state), and every
    // cumulative to-date count comes from UNIONING stored sketches
    // (`hll_union_agg`) — the raw events are never rescanned per window.
    // The triangular day×day merge join is over ≤(days)² sketch rows, a
    // broadcast-sized frame at any corpus scale. The exact side exists to
    // make the estimate falsifiable (the q40 contract): cumulative exact
    // = running sum of FIRST-SEEN users per day (one extra shuffle, not
    // a per-window rescan either), and within_bound pins |est − exact| ≤
    // ⌈5%·exact⌉ cross-engine (lgK=14 ⇒ ~0.8 % typical error).
    "q136_hll_rollup" -> ((s, dir) => {
      val sk = dailySketch(s, dir)
      val merged = sk.select(col("day"))
        .join(sk.select(col("day").as("d2"), col("sk")),
          col("d2") <= col("day"))
        .groupBy("day")
        .agg(hll_sketch_estimate(hll_union_agg(col("sk"), lit(false)))
          .as("n_cum_est"))
      val ev = Tables(s, dir).events
        .select(col("user_id"), date_trunc("day", col("ts")).as("day"))
      val firsts = ev.groupBy("user_id").agg(min("day").as("day"))
        .groupBy("day").agg(count(lit(1)).as("n_new"))
      val exact = ev.groupBy("day")
        .agg(countDistinct(col("user_id")).as("n_day_exact"))
        .join(firsts, Seq("day"), "left")
        .withColumn("n_cum_exact",
          sum(coalesce(col("n_new"), lit(0L)))
            // global window SAFE: input is the per-DAY rollup — rows =
            // distinct days (~30 here, ~36 500 for a century), never
            // event count
            .over(Window.orderBy("day")))
      exact.join(merged, "day")
        .select(col("day"), col("n_day_exact"), col("n_cum_exact"),
          (abs(col("n_cum_est") - col("n_cum_exact")) <=
            ceil(lit(0.05) * col("n_cum_exact"))).cast("long")
            .as("within_bound"))
        .orderBy("day")
    }),

    // The SLIDING window over the same sketch algebra: trailing-7-day
    // distinct users per day from the q136 daily sketch frame — window
    // re-aggregation is a ≤7-row sketch union per output day, so ANY
    // window geometry (trailing week, month, calendar quarter) derives
    // from the one daily build without touching raw events again. The
    // exact side re-joins the day×day frame (days² rows, broadcast-sized
    // forever) — affordable ONLY because it is the verification; the
    // sketch path is the production one.
    "q137_hll_sliding" -> ((s, dir) => {
      val daily = dailySketch(s, dir)
      val ev = Tables(s, dir).events
        .select(col("user_id"), date_trunc("day", col("ts")).as("day"))
      val est = daily.select(col("day"))
        .join(daily.select(col("day").as("d2"), col("sk")),
          col("d2") <= col("day") &&
            col("d2") >= col("day") - expr("INTERVAL 6 DAYS"))
        .groupBy("day")
        .agg(hll_sketch_estimate(hll_union_agg(col("sk"), lit(false)))
          .as("n_est"))
      val exact = ev.select(col("day").as("d2"), col("user_id")).distinct()
        .join(daily.select(col("day")),
          col("d2") <= col("day") &&
            col("d2") >= col("day") - expr("INTERVAL 6 DAYS"))
        .groupBy("day")
        .agg(countDistinct(col("user_id")).as("n_exact_7d"))
      exact.join(est, "day")
        .select(col("day"), col("n_exact_7d"),
          (abs(col("n_est") - col("n_exact_7d")) <=
            ceil(lit(0.05) * col("n_exact_7d"))).cast("long")
            .as("within_bound"))
        .orderBy("day")
    }),

    // Skew remedy IN the catalog (VERDICT r5 #5): the same per-type
    // aggregate a plain groupBy("event_type") would compute, executed as
    // a SALTED two-phase plan — event_type has ~5 values, so at 100 TB a
    // direct shuffle hands each reducer ~n/5 of the corpus; the salt
    // splits every hot key across 16 reducers first, then the tiny
    // (type, salt) partials merge. Decimal partial sums make the result
    // bit-identical to the unsalted plan (summation-order-free), which is
    // precisely what the oracle asserts: DuckDB computes the PLAIN
    // groupBy — remedy changes the plan, not the answer.
    // SaltingSpec pins the plan shape (two aggregate exchanges, first
    // keyed on the salt).
    "q80_salted_agg" -> ((s, dir) => {
      val partial = Tables(s, dir).events
        .withColumn("salt", pmod(xxhash64(col("event_id")), lit(16)))
        .groupBy("event_type", "salt")
        .agg(count(lit(1)).as("pn"),
          sum(dPrice(col("value"))).as("psum"),
          min(dPrice(col("value"))).as("pmin"),
          max(dPrice(col("value"))).as("pmax"))
      partial.groupBy("event_type")
        .agg(sum("pn").as("n_events"),
          asD(sum("psum")).as("sum_value"),
          asD(min("pmin")).as("min_value"),
          asD(max("pmax")).as("max_value"))
        .orderBy("event_type")
    }),

    // JSON family: extract props.k, aggregate per event type. The null
    // count is taken on the PRE-cast extraction — the DuckDB oracle counts
    // json_extract_string IS NULL before any cast, and a non-numeric
    // props.k would otherwise be counted as null by Spark only.
    "q41_json_props" -> ((s, dir) => {
      Tables(s, dir).events
        .select(col("event_type"),
          get_json_object(col("props"), "$.k").as("ks"))
        .select(col("event_type"), col("ks"), col("ks").cast("long").as("k"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"), min("k").as("min_k"), max("k").as("max_k"),
          round(avg("k"), 6).as("avg_k"),
          count(when(col("ks").isNull, lit(1))).as("n_null_k"))
        .orderBy("event_type")
    }),

    // §2.10 sliding windows: 7-day windows sliding by 1 day — every
    // event lands in 7 overlapping epoch-aligned windows. The DuckDB
    // oracle reconstructs the same membership via time_bucket − k days,
    // k ∈ [0, 7). Output is bounded by |windows| × |types|.
    "q61_sliding_window" -> ((s, dir) => {
      Tables(s, dir).events
        .groupBy(window(col("ts"), "7 days", "1 day").as("win"),
          col("event_type"))
        .agg(count(lit(1)).as("n"))
        .select(col("win.start").as("win_start"), col("event_type"), col("n"))
        .orderBy("win_start", "event_type")
    }),

    // §2.10 native session_window (the built-in counterpart of q38's
    // manual lag-gap sessionization): sessions close when the gap to the
    // next event reaches 30 minutes. Note the boundary differs from q38
    // by design: session_window starts a NEW session at gap >= 30 min,
    // while q38's manual rule uses gap > 30 min — the oracle encodes the
    // >= rule, pinning the built-in's exact semantics.
    "q62_session_window" -> ((s, dir) => {
      Tables(s, dir).events
        .groupBy(col("user_id"),
          session_window(col("ts"), "30 minutes").as("w"))
        .agg(count(lit(1)).as("n_events"), min("ts").as("first_ts"))
        .select(col("user_id"), col("first_ts"), col("n_events"))
        .orderBy("user_id", "first_ts")
    }),

    // Salted sessionization twin of q62 (VERDICT r8 #5 — the shipped
    // remedy for the hot-user cliff SCALE.md #7 located): when ONE user's
    // event stream exceeds a task's envelope, a per-user window cannot be
    // split — but sessions CAN, because two events ≥ gap apart never
    // share a session. Pass 1 salts the shuffle key with a time slab
    // (1 day ≫ the 30-min gap, so only slab-adjacent events can ever
    // merge) and sessionizes *locally* per (user_id, slab) — the hot
    // user's stream now spreads over |slabs| tasks. Interior sessions
    // (neither first nor last in their slab) are provably final and are
    // emitted directly. Pass 2 re-sessionizes ONLY the ≤ 2 boundary
    // sessions per (user, slab) — rows ∝ users × days, independent of
    // event count — stitching cross-slab chains by the same ≥-gap rule
    // (consecutive boundary rows from the SAME slab are ≥ gap apart by
    // construction, so they never merge; adjacent-slab rows merge iff
    // the true stream would). Same output contract as q62, same oracle
    // SQL — the equivalence is hash-checked by the driver every round.
    "q145_salted_sessions" -> ((s, dir) =>
      saltedSessionize(Tables(s, dir).events)
        .orderBy("user_id", "first_ts")),

    // Batch twin of EventStreams.dedupe (§2.10): deterministic first-
    // occurrence dedup on event_id (earliest ts, ties on event_type),
    // summarized per event type. The streaming form bounds its state with
    // a watermark; this is the same semantics over a bounded table.
    "q55_dedup_batch" -> ((s, dir) => {
      val w = Window.partitionBy("event_id").orderBy("ts", "event_type")
      Tables(s, dir).events
        .select(col("event_id"), col("ts"), col("event_type"))
        .withColumn("rn", row_number().over(w))
        .where(col("rn") === 1)
        .groupBy("event_type")
        .agg(count(lit(1)).as("n_unique_events"))
        .orderBy("event_type")
    }),

    // Batch twin of EventStreams.clickToPurchase (§2.10): purchases
    // within 30 minutes AFTER a click by the same user — the equi+range
    // interval join, SLAB-BUCKETED on (user, ts div 30 min) like q154:
    // the bare user_id key evaluated the range over all of the sf1 hot
    // user's click × purchase pairs (measured 44.4 s); each purchase
    // explodes to its two covering slabs {slab(p), slab(p)−1}, exactly
    // one of which equals the matching click's slab (the window length
    // equals the slab width), so no dedup and a hash-identical answer —
    // 2.0 s at sf1 after the change (22×). The streaming form drops
    // expired join state via its two watermarks.
    "q56_click_purchase_batch" -> ((s, dir) => {
      val slabUs = 1800L * 1000000L
      val e = Tables(s, dir).events
      val c = e.where(col("event_type") === "click")
        .select(col("user_id"), col("ts").as("click_ts"))
        .withColumn("slab", expr(s"unix_micros(click_ts) div $slabUs"))
      val p = e.where(col("event_type") === "purchase")
        .select(col("user_id"), col("ts").as("purchase_ts"))
        .withColumn("slab", explode(array(
          expr(s"unix_micros(purchase_ts) div $slabUs"),
          expr(s"unix_micros(purchase_ts) div $slabUs - 1"))))
      c.join(p, Seq("user_id", "slab"))
        .where(col("purchase_ts") >= col("click_ts") &&
          unix_micros(col("purchase_ts"))
            <= unix_micros(col("click_ts")) + 1800L * 1000000L)
        .select("user_id", "click_ts", "purchase_ts")
        .orderBy("user_id", "click_ts", "purchase_ts")
    }),

    // The ANTI complement of q56 (round 10): clicks with NO purchase by
    // the same user in the following 30 minutes — the abandonment feed
    // a re-engagement pipeline consumes. LEFT ANTI with the same
    // equi+range condition, slab-bucketed like q56: any purchase inside
    // a click's window has an exploded copy in the click's own slab, so
    // the anti-join on (user, slab) excludes exactly the same clicks as
    // the bare-user form (anti semantics need no dedup at all), and the
    // sf1 hot user stops paying |history|² (5.4 → 1.35 s measured).
    // Output ≤ the click count. The streaming twin is
    // EventStreams.clickAbandonment (LEFT OUTER interval join whose
    // null-padded rows emit when the watermark closes the click's
    // 30-minute window); StreamingSpec pins stream ≡ this batch answer
    // on the real events table.
    "q147_click_abandonment" -> ((s, dir) => {
      val slabUs = 1800L * 1000000L
      val e = Tables(s, dir).events
      val c = e.where(col("event_type") === "click")
        .select(col("user_id"), col("ts").as("click_ts"))
        .withColumn("slab", expr(s"unix_micros(click_ts) div $slabUs"))
      val p = e.where(col("event_type") === "purchase")
        .select(col("user_id").as("p_user"), col("ts").as("purchase_ts"))
        .withColumn("p_slab", explode(array(
          expr(s"unix_micros(purchase_ts) div $slabUs"),
          expr(s"unix_micros(purchase_ts) div $slabUs - 1"))))
      c.join(p,
          col("user_id") === col("p_user") &&
            col("slab") === col("p_slab") &&
            col("purchase_ts") >= col("click_ts") &&
            unix_micros(col("purchase_ts"))
              <= unix_micros(col("click_ts")) + 1800L * 1000000L,
          "left_anti")
        .select("user_id", "click_ts")
        .orderBy("user_id", "click_ts")
    }),

    // U-shaped multi-touch attribution — the marketing-analytics
    // completion of the q56/q147 click-purchase family: every purchase
    // splits its value over the clicks that preceded it within the
    // 30-minute window, 40/20/40 position-weighted (first and last
    // touch carry intent; middles share the rest), credited to the
    // clicked item. All arithmetic is INTEGER (the q104 lesson —
    // rational weights like 0.2/(n−2) round differently per engine):
    // weights are basis points summing to exactly 10000 per purchase —
    // n=1 → 10000; n=2 → 5000/5000; n≥3 → 4000 ends, middles take
    // 2000 div (n−2) with the remainder going to the LAST middle —
    // and credit = bp × value-cents, summed in DECIMAL(38,0) (the
    // h48sum overflow lesson) and surfaced as micro-dollars through
    // the exact string boundary.
    //
    // Plan — the SLAB-BUCKETED interval join (q145's salt applied to a
    // join): a bare user_id equi-join evaluates the range predicate
    // over ALL of a user's click × purchase pairs, and the sf1 hot
    // user (~36k clicks × ~36k purchases ⇒ ~1.3 G candidate pairs on
    // one key) priced that cliff at 24.0 s — measured on this query
    // before this fix. Clicks key on (user, slab) with
    // slab = ts div 30 min; a purchase's window spans at most 2 slabs
    // (window length == slab width), so it probes slab(p) and
    // slab(p)−1 via a 2-row explode, and every (purchase, click) pair
    // meets in EXACTLY one slab — the click's — so no dedup is needed
    // and the answer is hash-identical to the naive join (the sf0.01/
    // sf0.1/sf1 oracle greens re-verified on this plan). Per-key
    // fan-out drops from |history|² to per-slab products; sf1 cost
    // dropped 24.0 s → 3.9 s measured (and sf0.1 0.88 → 0.60 s — the
    // slab key prunes even un-skewed pair candidates). Then two windows keyed by purchase id
    // (fan-in bounded by clicks-per-30-minutes, never user history)
    // and a |catalog|-sized aggregate. Purchases with no click in
    // window are unattributed and excluded (the operator credits
    // touches; coverage is q56's report).
    "q154_touch_attribution" -> ((s, dir) => {
      val slabUs = 1800L * 1000000L
      val e = Tables(s, dir).events
      val p = e.where(col("event_type") === "purchase")
        .select(col("user_id"), col("ts").as("p_ts"),
          col("event_id").as("p_id"),
          (dPrice(col("value")) * 100).cast("long").as("cents"))
        .withColumn("p_slab", explode(array(
          expr(s"unix_micros(p_ts) div $slabUs"),
          expr(s"unix_micros(p_ts) div $slabUs - 1"))))
      val c = e.where(col("event_type") === "click")
        .select(col("user_id").as("c_user"), col("ts").as("c_ts"),
          col("event_id").as("c_id"),
          get_json_object(col("props"), "$.k").cast("long").as("item"))
        .where(col("item").isNotNull)
        .withColumn("c_slab", expr(s"unix_micros(c_ts) div $slabUs"))
      val joined = p.join(c,
        col("user_id") === col("c_user") &&
          col("p_slab") === col("c_slab") &&
          col("c_ts") <= col("p_ts") &&
          unix_micros(col("c_ts"))
            >= unix_micros(col("p_ts")) - 1800L * 1000000L)
      val wr = Window.partitionBy("p_id").orderBy(col("c_ts"), col("c_id"))
      val wn = Window.partitionBy("p_id")
      joined
        .withColumn("r", row_number().over(wr).cast("long"))
        .withColumn("n", count(lit(1)).over(wn))
        .withColumn("bp",
          when(col("n") === 1, lit(10000L))
            .when(col("n") === 2, lit(5000L))
            .when(col("r") === 1 || col("r") === col("n"), lit(4000L))
            .otherwise(expr("2000 div (n - 2)") +
              when(col("r") === col("n") - 1, expr("2000 % (n - 2)"))
                .otherwise(lit(0L))))
        .groupBy("item")
        .agg(count(lit(1)).as("n_touches"),
          countDistinct(col("p_id")).as("n_purchases"),
          asD(sum((col("bp") * col("cents")).cast("decimal(38,0)"))
            .cast("decimal(38,6)")).as("credit_usd_micro"))
        .orderBy("item")
    }),

    // Date family over orders: month truncation, weekend detection
    // (Spark dayofweek is 1=Sunday; DuckDB dow is 0=Sunday — both sides
    // express "Saturday or Sunday" in their own numbering).
    "q42_date_math" -> ((s, dir) => {
      Tables(s, dir).orders
        .groupBy(date_trunc("month", col("o_orderdate")).as("month"))
        .agg(count(lit(1)).as("n_orders"),
          count(when(dayofweek(col("o_orderdate")).isin(1, 7), lit(1)))
            .as("n_weekend"),
          asD(sum(dPrice(col("o_totalprice")))).as("sum_price"))
        .orderBy("month")
    }),

    // Cohort retention — the product-analytics staple: users grouped by
    // first-active week, then the share of each cohort active k weeks
    // later. Plan shape at scale: one distinct over (user, week) — the
    // only corpus-sized shuffle — then a per-user min and a user-keyed
    // join (both ride the same user_id partitioning), collapsing to a
    // bounded (cohort × offset) frame; cohort_size is a window over that
    // bounded frame, never over events. Week truncation and day diffs
    // are calendar-exact in both engines (UTC sessions, Monday weeks).
    "q105_cohort_retention" -> ((s, dir) => {
      val wk = Tables(s, dir).events
        .select(col("user_id"), date_trunc("week", col("ts")).as("wk"))
        .distinct()
      val first = wk.groupBy("user_id").agg(min("wk").as("cohort"))
      val g = wk.join(first, "user_id")
        .select(col("cohort"),
          // exact multiple of 7 today (both engines Monday-truncate), but
          // FLOOR explicitly on BOTH sides: DuckDB's double→BIGINT cast
          // ROUNDS where Spark's truncates, so a bare cast only works by
          // the accident of the quotient being integral
          floor(datediff(col("wk"), col("cohort")) / lit(7)).cast("long")
            .as("week_offset"))
        .groupBy("cohort", "week_offset")
        .agg(count(lit(1)).as("n_users")) // (user, wk) already distinct
      val wc = Window.partitionBy("cohort")
      g.withColumn("cohort_size",
          max(when(col("week_offset") === 0, col("n_users"))).over(wc))
        .select(col("cohort").cast("date").as("cohort_week"),
          col("week_offset"), col("n_users"), col("cohort_size"),
          round(col("n_users").cast("double") / col("cohort_size"), 6)
            .as("retention"))
        .orderBy("cohort_week", "week_offset")
    }),

    // Ordered funnel conversion — the other product-analytics staple
    // next to q105: first view → first click AFTER that view → first
    // purchase AFTER that click, per user, with per-stage user counts
    // and conversion rates. Each stage is a per-user MIN over a
    // timestamp lower-bounded by the previous stage — three user-keyed
    // aggregates riding the same user_id partitioning (Catalyst reuses
    // the exchange), never a corpus-wide sort. Timestamps compare in
    // MICROSECONDS on both engines (unix_micros ≡ epoch_us — the ns
    // table truncates identically, so a same-µs tie can't split the
    // engines). Output is a bounded 3-row stage table.
    "q109_funnel" -> ((s, dir) => {
      val e = Tables(s, dir).events
        .select(col("user_id"), col("event_type"),
          unix_micros(col("ts")).as("us"))
      def firstAfter(tpe: String, prev: DataFrame, prevCol: String) =
        e.where(col("event_type") === tpe)
          .join(prev, "user_id")
          .where(col("us") >= col(prevCol))
          .groupBy("user_id")
          .agg(min("us").as(s"t_$tpe"))
      val v = e.where(col("event_type") === "view")
        .groupBy("user_id").agg(min("us").as("t_view"))
      val c = firstAfter("click", v, "t_view")
      val p = firstAfter("purchase", c, "t_click")
      def stage(rank: Int, name: String, df: DataFrame) =
        df.agg(count(lit(1)).as("n_users"))
          .select(lit(rank.toLong).as("stage"), lit(name).as("step"),
            col("n_users"))
      // global window SAFE: exactly 3 rows (one per funnel stage)
      val firstN = first("n_users").over(Window.orderBy("stage")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow))
      stage(1, "view", v)
        .unionByName(stage(2, "click_after_view", c))
        .unionByName(stage(3, "purchase_after_click", p))
        // zero-guard: a corpus with no stage-1 events would otherwise
        // divide 0/0 — NULL rate on both engines instead of divergence
        .withColumn("conv_from_first",
          when(firstN > 0,
            round(col("n_users").cast("double") / firstN, 6)))
        .orderBy("stage")
    }),

    // Trailing 1-hour moving aggregate via a RANGE window frame — the
    // time-based frame (rangeBetween on event-time micros) that rows-
    // based frames cannot express: every event sees the exact set of
    // same-user events in the CLOSED interval [t − 1 h, t] (an event
    // exactly one hour older is included). Sums run in DECIMAL so the
    // answer is independent of how ties order inside the frame; the
    // frame is per-user (high-cardinality key), so at 100 TB this is
    // one keyed shuffle + a per-partition sorted scan, no global sort.
    // Output is one row per event (the enriched-stream shape).
    "q112_trailing_window" -> ((s, dir) => {
      val w = Window.partitionBy("user_id").orderBy(col("us"))
        .rangeBetween(-3600L * 1000000L, 0)
      Tables(s, dir).events
        .select(col("user_id"), col("event_id"),
          unix_micros(col("ts")).as("us"), col("value"))
        .withColumn("n_1h", count(lit(1)).over(w))
        .withColumn("sum_1h", asD(sum(dPrice(col("value"))).over(w)))
        .select(col("user_id"), col("event_id"), col("us"),
          col("n_1h"), col("sum_1h"))
        .orderBy("user_id", "us", "event_id")
    }),

    // Robust outlier gate (data-quality tier): per-type exact median and
    // MAD via q50's sort-based ranked form — engine-definition-
    // independent by construction (rank FLOOR((n+1)/2) under a total
    // order; FLOOR on both sides because DuckDB's double→BIGINT cast
    // rounds where Spark's truncates) — then the standard robust z-score
    // gate |v − med| > 3·1.4826·MAD. Two ranked windows (each one keyed
    // shuffle), two broadcast rejoins of 5-row frames, one final
    // aggregate; the deviation frame feeds BOTH the MAD ranking and the
    // final gate, so it is lazily checkpointed once (the q104 reuse
    // discipline) instead of re-running the scan + median join per
    // consumer. The constant 4.4478 = 3 × 1.4826 is exact in decimal so
    // both engines parse the identical double.
    "q108_mad_outliers" -> ((s, dir) => {
      val ev = Tables(s, dir).events
        .select(col("event_type"), col("event_id"), col("value"))
      val wn = Window.partitionBy("event_type")
      def midRank(n: Column): Column =
        floor((n + lit(1)) / lit(2)).cast("long")
      val wv = Window.partitionBy("event_type").orderBy("value", "event_id")
      val med = ev.withColumn("rn", row_number().over(wv))
        .withColumn("n", count(lit(1)).over(wn))
        .where(col("rn") === midRank(col("n")))
        .select(col("event_type"), col("value").as("med"))
      val dev = ev.join(broadcast(med), "event_type")
        .withColumn("adev", abs(col("value") - col("med")))
        .localCheckpoint(false)
      val wd = Window.partitionBy("event_type").orderBy("adev", "event_id")
      val mad = dev.withColumn("rn", row_number().over(wd))
        .withColumn("n", count(lit(1)).over(wn))
        .where(col("rn") === midRank(col("n")))
        .select(col("event_type"), col("adev").as("mad"))
      dev.join(broadcast(mad), "event_type")
        .groupBy("event_type")
        .agg(count(lit(1)).as("n_events"),
          max("med").as("median_value"), max("mad").as("mad_value"),
          sum(when(col("adev") > lit(4.4478) * col("mad"), 1L)
            .otherwise(0L)).as("n_outliers"))
        .withColumn("outlier_rate",
          round(col("n_outliers").cast("double") / col("n_events"), 6))
        .orderBy("event_type")
    }),

    // Time-series gap fill + forward fill — the regularization step every
    // downstream model/report needs when the raw stream has silent days:
    // generate each user's COMPLETE daily grid between first and last
    // activity (sequence + explode — grid size is users × calendar span,
    // INDEPENDENT of event count), left-join the observed daily rollup,
    // then forward-fill the last observed value and the staleness age
    // with last(_, ignoreNulls) over the (user, day) total order (days
    // are unique per user, so the frame order is total and the fill
    // deterministic). Plan shape at scale: the daily rollup is the one
    // corpus-sized shuffle (map-side partials on (user, day)); span,
    // grid, join, and both fill windows all ride user-keyed partitions.
    "q127_gap_fill" -> ((s, dir) => {
      // the rollup feeds BOTH the span/grid subtree and the join probe —
      // checkpoint once (the q104/q108 reuse discipline) or the corpus
      // scan + (user, day) aggregation run twice
      val daily = dailyValue(s, dir).localCheckpoint(false)
      val span = daily.groupBy("user_id")
        .agg(min("day").as("d0"), max("day").as("d1"))
      val grid = span.select(col("user_id"),
        explode(expr("sequence(d0, d1, interval 1 day)")).as("day"))
      val w = Window.partitionBy("user_id").orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      grid.join(daily, Seq("user_id", "day"), "left")
        .withColumn("observed", col("n_events").isNotNull)
        .withColumn("value_ff",
          asD(last(col("dsum"), ignoreNulls = true).over(w)))
        .withColumn("last_obs",
          last(when(col("observed"), col("day")), ignoreNulls = true).over(w))
        .select(col("user_id"), col("day"), col("observed"),
          coalesce(col("n_events"), lit(0L)).as("n_events"),
          col("value_ff"),
          datediff(col("day"), col("last_obs")).cast("long").as("days_stale"))
        .orderBy("user_id", "day")
    }),

    // EWMA smoothing (adjusted form, α = 1/2) over each user's observed
    // daily values: ewma_t = Σ_k w_k·x_{t−k} / Σ_k w_k over the EWMA_K
    // most recent observations, w_k = α^k. The recursion is UNROLLED into
    // EWMA_K lag() calls over one user-keyed window — pure whole-stage-
    // codegen arithmetic, one shuffle beyond the daily rollup, and
    // cross-engine exact: α^k are exact binary fractions written as
    // decimal literals (single-sourced from ewmaW into BOTH engines), so
    // numerator/denominator are exact decimal sums; only the final
    // division runs in double, on bit-identical operands. The trailing
    // window means state is O(K) per key — the form a 100 TB stream
    // smoother takes (vs an unbounded recursive EWMA, which no engine
    // can shuffle-parallelize without a sequential scan per key).
    "q128_ewma" -> ((s, dir) => {
      val w = Window.partitionBy("user_id").orderBy("day")
      val lags = (0 until EWMA_K).map(k =>
        if (k == 0) col("dsum") else lag(col("dsum"), k).over(w))
      val wts = (0 until EWMA_K).map(k =>
        expr(s"CAST(${ewmaW(k)} AS $EWMA_WT_DEC)"))
      val zero = expr(s"CAST(0 AS $EWMA_SUM_DEC)")
      val zeroW = expr(s"CAST(0 AS $EWMA_WT_DEC)")
      val num = lags.zip(wts)
        .map { case (x, wt) => coalesce(x * wt, zero) }.reduce(_ + _)
      val den = lags.zip(wts)
        .map { case (x, wt) => when(x.isNotNull, wt).otherwise(zeroW) }
        .reduce(_ + _)
      val nObs = lags.map(x => when(x.isNotNull, 1L).otherwise(0L))
        .reduce(_ + _)
      dailyValue(s, dir)
        .select(col("user_id"), col("day"), asD(col("dsum")).as("day_value"),
          nObs.as("n_window"),
          round(num.cast("double") / den.cast("double"), 6).as("ewma"))
        .orderBy("user_id", "day")
    }),
  )

  def oracles: Map[String, String] = Map(
    // q177: same scaled-integer deviations (c·nd − total), same
    // prefix-min identity, CUSUM_H interpolated. Window sums of BIGINT
    // are HUGEINT in DuckDB — cast back so the hash sees int64 on both
    // sides (the q161 discipline).
    "q177_cusum_drift" ->
      s"""WITH daily AS (
         | SELECT event_type, CAST(date_trunc('day', ts) AS TIMESTAMP)
         |   AS day, COUNT(*) AS c
         | FROM events GROUP BY 1, 2),
         |cal AS (
         | SELECT event_type, COUNT(*) AS nd, SUM(c) AS total
         | FROM daily GROUP BY 1),
         |pp AS (
         | SELECT d.event_type, d.day, d.c, cal.total,
         |  CAST(SUM(d.c * cal.nd - cal.total) OVER (
         |    PARTITION BY d.event_type ORDER BY d.day
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         |   AS BIGINT) AS p
         | FROM daily d JOIN cal USING (event_type)),
         |s AS (
         | SELECT event_type, day, c, total,
         |  p - least(0, MIN(p) OVER (PARTITION BY event_type ORDER BY day
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
         |    AS cusum_scaled
         | FROM pp)
         |SELECT event_type, day, c, cusum_scaled,
         | cusum_scaled > $CUSUM_H * total AS drift_alarm
         |FROM s ORDER BY event_type, day""".stripMargin,

    "q38_sessionize" ->
      s"""WITH $SESSION_SQL
        |SELECT user_id, session_id,
        | COUNT(*) AS n_events,
        | MIN(ts) AS session_start, MAX(ts) AS session_end,
        | epoch_us(MAX(ts)) - epoch_us(MIN(ts)) AS duration_us
        |FROM sess GROUP BY user_id, session_id
        |ORDER BY user_id, session_id""".stripMargin,

    "q39_tumbling_window" ->
      """SELECT time_bucket(INTERVAL '1 day', ts) AS day, event_type,
        | COUNT(*) AS n,
        | CAST(CAST(CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DECIMAL(38,6)) AS VARCHAR) AS DOUBLE)
        |   AS sum_value
        |FROM events GROUP BY 1, 2 ORDER BY day, event_type""".stripMargin,

    // exact side in DuckDB + the asserted bound: hash-pins the HLL
    // error contract (any out-of-bound group flips within_bound to 0)
    "q40_hll_users" ->
      """SELECT event_type,
        | COUNT(DISTINCT user_id) AS n_exact,
        | COUNT(*) AS n_events,
        | CAST(1 AS BIGINT) AS within_bound
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    // identical integer bp allocation (// and % on positive ints are
    // engine-identical); credit summed as HUGEINT-safe decimal
    "q154_touch_attribution" ->
      """WITH p AS (
        | SELECT user_id, ts AS p_ts, event_id AS p_id,
        |  CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT) AS cents
        | FROM events WHERE event_type = 'purchase'),
        |c AS (
        | SELECT user_id AS c_user, ts AS c_ts, event_id AS c_id,
        |  CAST(json_extract_string(props, '$.k') AS BIGINT) AS item
        | FROM events WHERE event_type = 'click'
        |  AND json_extract_string(props, '$.k') IS NOT NULL),
        |j AS (
        | SELECT p.*, c.c_ts, c.c_id, c.item
        | FROM p JOIN c ON p.user_id = c.c_user
        |  AND c.c_ts <= p.p_ts
        |  AND c.c_ts >= p.p_ts - INTERVAL '30 minutes'),
        |rk AS (
        | SELECT *,
        |  ROW_NUMBER() OVER (PARTITION BY p_id ORDER BY c_ts, c_id) AS r,
        |  COUNT(*) OVER (PARTITION BY p_id) AS n
        | FROM j),
        |cr AS (
        | SELECT item, p_id,
        |  CASE WHEN n = 1 THEN 10000
        |       WHEN n = 2 THEN 5000
        |       WHEN r = 1 OR r = n THEN 4000
        |       ELSE 2000 // (n - 2)
        |            + CASE WHEN r = n - 1 THEN 2000 % (n - 2) ELSE 0 END
        |  END * cents AS credit
        | FROM rk)
        |SELECT item, COUNT(*) AS n_touches,
        | COUNT(DISTINCT p_id) AS n_purchases,
        | CAST(CAST(CAST(SUM(CAST(credit AS DECIMAL(38,0))) AS DECIMAL(38,6))
        |      AS VARCHAR) AS DOUBLE) AS credit_usd_micro
        |FROM cr GROUP BY item ORDER BY item""".stripMargin,

    // exact sides + the asserted inclusion-exclusion bound (q40's
    // convention: the sketch estimate itself never crosses engines)
    "q153_audience_overlap" ->
      """WITH du AS (
        | SELECT DISTINCT event_type AS t, user_id FROM events),
        |n AS (SELECT t, COUNT(*) AS n FROM du GROUP BY t),
        |inter AS (
        | SELECT a.t AS ta, b.t AS tb, COUNT(*) AS n_inter
        | FROM du a JOIN du b ON a.user_id = b.user_id AND a.t < b.t
        | GROUP BY 1, 2)
        |SELECT i.ta, i.tb, na.n AS n_a, nb.n AS n_b, i.n_inter,
        | CAST(1 AS BIGINT) AS within_bound
        |FROM inter i
        |JOIN n na ON na.t = i.ta
        |JOIN n nb ON nb.t = i.tb
        |ORDER BY ta, tb""".stripMargin,

    // exact sides only (the q40 sketch contract): daily distinct, the
    // first-seen cumulative, and the asserted bound
    "q136_hll_rollup" ->
      """WITH ev AS (
        | SELECT user_id, date_trunc('day', ts) AS day FROM events),
        |daily AS (
        | SELECT day, COUNT(DISTINCT user_id) AS n_day_exact
        | FROM ev GROUP BY day),
        |firsts AS (SELECT user_id, MIN(day) AS day FROM ev GROUP BY user_id),
        |nn AS (SELECT day, COUNT(*) AS n_new FROM firsts GROUP BY day)
        |SELECT d.day, d.n_day_exact,
        | CAST(SUM(COALESCE(nn.n_new, 0)) OVER (ORDER BY d.day) AS BIGINT)
        |   AS n_cum_exact,
        | CAST(1 AS BIGINT) AS within_bound
        |FROM daily d LEFT JOIN nn ON d.day = nn.day
        |ORDER BY d.day""".stripMargin,

    "q137_hll_sliding" ->
      """WITH ev AS (
        | SELECT DISTINCT date_trunc('day', ts) AS d2, user_id FROM events),
        |days AS (SELECT DISTINCT d2 AS day FROM ev)
        |SELECT d.day,
        | COUNT(DISTINCT e.user_id) AS n_exact_7d,
        | CAST(1 AS BIGINT) AS within_bound
        |FROM days d JOIN ev e
        |  ON e.d2 <= d.day AND e.d2 >= d.day - INTERVAL 6 DAY
        |GROUP BY d.day ORDER BY d.day""".stripMargin,

    // the UNSALTED aggregate — equal hash proves the salted two-phase
    // plan changed the execution, not the answer
    "q80_salted_agg" ->
      """SELECT event_type, COUNT(*) AS n_events,
        | CAST(CAST(CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DECIMAL(38,6))
        |   AS VARCHAR) AS DOUBLE) AS sum_value,
        | CAST(CAST(CAST(MIN(CAST(value AS DECIMAL(12,2))) AS DECIMAL(38,6))
        |   AS VARCHAR) AS DOUBLE) AS min_value,
        | CAST(CAST(CAST(MAX(CAST(value AS DECIMAL(12,2))) AS DECIMAL(38,6))
        |   AS VARCHAR) AS DOUBLE) AS max_value
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    "q41_json_props" ->
      """SELECT event_type, COUNT(*) AS n,
        | MIN(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS min_k,
        | MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k,
        | ROUND(AVG(CAST(json_extract_string(props, '$.k') AS BIGINT)), 6) AS avg_k,
        | COUNT(*) FILTER (json_extract_string(props, '$.k') IS NULL) AS n_null_k
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    "q61_sliding_window" ->
      """SELECT time_bucket(INTERVAL '1 day', ts)
        |       - CAST(k.k AS INTEGER) * INTERVAL '1 day' AS win_start,
        | event_type, COUNT(*) AS n
        |FROM events CROSS JOIN range(7) k(k)
        |GROUP BY 1, 2 ORDER BY win_start, event_type""".stripMargin,

    "q62_session_window" -> SESSION_ORACLE_SQL,

    // ONE oracle for the salted/unsalted pair: two physical plans of the
    // same session contract must hash-match the same SQL (the q77/q113
    // shared-oracle discipline).
    "q145_salted_sessions" -> SESSION_ORACLE_SQL,

    "q55_dedup_batch" ->
      """WITH first AS (
        | SELECT event_id, event_type FROM (
        |  SELECT event_id, event_type,
        |   ROW_NUMBER() OVER (PARTITION BY event_id
        |                      ORDER BY ts, event_type) AS rn
        |  FROM events) WHERE rn = 1)
        |SELECT event_type, COUNT(*) AS n_unique_events
        |FROM first GROUP BY event_type ORDER BY event_type""".stripMargin,

    "q56_click_purchase_batch" ->
      """SELECT c.user_id, c.ts AS click_ts, p.ts AS purchase_ts
        |FROM (SELECT user_id, ts FROM events WHERE event_type = 'click') c
        |JOIN (SELECT user_id, ts FROM events WHERE event_type = 'purchase') p
        |  ON c.user_id = p.user_id
        | AND p.ts >= c.ts
        | AND epoch_us(p.ts) <= epoch_us(c.ts) + 1800000000
        |ORDER BY c.user_id, click_ts, purchase_ts""".stripMargin,

    "q147_click_abandonment" ->
      """SELECT c.user_id, c.ts AS click_ts
        |FROM (SELECT user_id, ts FROM events WHERE event_type = 'click') c
        |WHERE NOT EXISTS (
        |  SELECT 1
        |  FROM (SELECT user_id, ts FROM events
        |        WHERE event_type = 'purchase') p
        |  WHERE p.user_id = c.user_id
        |    AND p.ts >= c.ts
        |    AND epoch_us(p.ts) <= epoch_us(c.ts) + 1800000000)
        |ORDER BY user_id, click_ts""".stripMargin,

    "q42_date_math" ->
      """SELECT CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month,
        | COUNT(*) AS n_orders,
        | COUNT(*) FILTER (date_part('dow', o_orderdate) IN (0, 6)) AS n_weekend,
        | CAST(CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DECIMAL(38,6)) AS VARCHAR) AS DOUBLE)
        |   AS sum_price
        |FROM orders GROUP BY 1 ORDER BY month""".stripMargin,

    // same distinct-(user, week) base, per-user min, bounded-frame window
    "q105_cohort_retention" ->
      """WITH wk AS (
        | SELECT DISTINCT user_id, date_trunc('week', ts) AS wk FROM events),
        |f AS (SELECT user_id, MIN(wk) AS cohort FROM wk GROUP BY user_id),
        |g AS (
        | SELECT f.cohort,
        |  CAST(FLOOR(date_diff('day', CAST(f.cohort AS DATE),
        |                       CAST(wk.wk AS DATE)) / 7) AS BIGINT)
        |    AS week_offset,
        |  COUNT(*) AS n_users
        | FROM wk JOIN f ON wk.user_id = f.user_id
        | GROUP BY 1, 2),
        |s AS (
        | SELECT cohort, week_offset, n_users,
        |  MAX(CASE WHEN week_offset = 0 THEN n_users END)
        |    OVER (PARTITION BY cohort) AS cohort_size
        | FROM g)
        |SELECT CAST(cohort AS DATE) AS cohort_week, week_offset, n_users,
        | cohort_size,
        | ROUND(CAST(n_users AS DOUBLE) / cohort_size, 6) AS retention
        |FROM s ORDER BY cohort_week, week_offset""".stripMargin,

    // same staged first-event chain in µs on both engines
    "q109_funnel" ->
      """WITH e AS (
        | SELECT user_id, event_type, epoch_us(ts) AS us FROM events),
        |v AS (
        | SELECT user_id, MIN(us) AS t_view FROM e
        | WHERE event_type = 'view' GROUP BY user_id),
        |c AS (
        | SELECT e.user_id, MIN(us) AS t_click
        | FROM e JOIN v ON e.user_id = v.user_id
        | WHERE event_type = 'click' AND us >= t_view GROUP BY e.user_id),
        |p AS (
        | SELECT e.user_id, MIN(us) AS t_purchase
        | FROM e JOIN c ON e.user_id = c.user_id
        | WHERE event_type = 'purchase' AND us >= t_click GROUP BY e.user_id),
        |st AS (
        | SELECT 1 AS stage, 'view' AS step,
        |        (SELECT COUNT(*) FROM v) AS n_users
        | UNION ALL
        | SELECT 2, 'click_after_view', (SELECT COUNT(*) FROM c)
        | UNION ALL
        | SELECT 3, 'purchase_after_click', (SELECT COUNT(*) FROM p))
        |SELECT CAST(stage AS BIGINT) AS stage, step,
        | CAST(n_users AS BIGINT) AS n_users,
        | CASE WHEN FIRST_VALUE(n_users) OVER (ORDER BY stage) > 0
        |      THEN ROUND(CAST(n_users AS DOUBLE)
        |             / FIRST_VALUE(n_users) OVER (ORDER BY stage), 6)
        | END AS conv_from_first
        |FROM st ORDER BY stage""".stripMargin,

    // identical RANGE frame on epoch micros; decimal window sums
    "q112_trailing_window" ->
      """SELECT user_id, event_id, epoch_us(ts) AS us,
        | COUNT(*) OVER w AS n_1h,
        | CAST(CAST(CAST(SUM(CAST(value AS DECIMAL(12,2))) OVER w
        |   AS DECIMAL(38,6)) AS VARCHAR) AS DOUBLE) AS sum_1h
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
        |             RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
        |ORDER BY user_id, us, event_id""".stripMargin,

    // identical ranked-median/MAD construction; FLOOR on the mid rank
    // (DuckDB's double→BIGINT cast rounds, Spark's truncates)
    "q108_mad_outliers" ->
      """WITH ev AS (SELECT event_type, event_id, value FROM events),
        |rv AS (
        | SELECT event_type, event_id, value,
        |  ROW_NUMBER() OVER (PARTITION BY event_type
        |                     ORDER BY value, event_id) AS rn,
        |  COUNT(*) OVER (PARTITION BY event_type) AS n
        | FROM ev),
        |m AS (
        | SELECT event_type, value AS med FROM rv
        | WHERE rn = CAST(FLOOR((n + 1) / 2) AS BIGINT)),
        |dv AS (
        | SELECT ev.event_type, ev.event_id, ev.value, m.med,
        |  ABS(ev.value - m.med) AS adev
        | FROM ev JOIN m ON ev.event_type = m.event_type),
        |rd AS (
        | SELECT event_type, adev,
        |  ROW_NUMBER() OVER (PARTITION BY event_type
        |                     ORDER BY adev, event_id) AS rn,
        |  COUNT(*) OVER (PARTITION BY event_type) AS n
        | FROM dv),
        |md AS (
        | SELECT event_type, adev AS mad FROM rd
        | WHERE rn = CAST(FLOOR((n + 1) / 2) AS BIGINT)),
        |fin AS (
        | SELECT dv.event_type, dv.med, md.mad, dv.adev
        | FROM dv JOIN md ON dv.event_type = md.event_type)
        |SELECT event_type, COUNT(*) AS n_events,
        | MAX(med) AS median_value, MAX(mad) AS mad_value,
        | CAST(SUM(CASE WHEN adev > 4.4478 * mad THEN 1 ELSE 0 END)
        |   AS BIGINT) AS n_outliers,
        | ROUND(CAST(SUM(CASE WHEN adev > 4.4478 * mad THEN 1 ELSE 0 END)
        |   AS DOUBLE) / COUNT(*), 6) AS outlier_rate
        |FROM fin GROUP BY event_type ORDER BY event_type""".stripMargin,

    // grid = generate_series per user (inclusive both ends, same as
    // Spark's sequence); forward fill via last_value(IGNORE NULLS) over
    // the identical total order
    "q127_gap_fill" ->
      s"""WITH $DAILY_SQL,
        |span AS (
        | SELECT user_id, MIN(day) AS d0, MAX(day) AS d1
        | FROM daily GROUP BY user_id),
        |grid AS (
        | SELECT user_id,
        |  unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS day
        | FROM span),
        |j AS (
        | SELECT g.user_id, g.day, d.n_events, d.dsum,
        |  d.n_events IS NOT NULL AS observed
        | FROM grid g
        | LEFT JOIN daily d ON g.user_id = d.user_id AND g.day = d.day)
        |SELECT user_id, day, observed,
        | COALESCE(n_events, 0) AS n_events,
        | CAST(CAST(CAST(last_value(dsum IGNORE NULLS) OVER w
        |   AS DECIMAL(38,6)) AS VARCHAR) AS DOUBLE) AS value_ff,
        | date_diff('day',
        |   last_value(CASE WHEN observed THEN day END IGNORE NULLS) OVER w,
        |   day) AS days_stale
        |FROM j
        |WINDOW w AS (PARTITION BY user_id ORDER BY day
        |             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |ORDER BY user_id, day""".stripMargin,

    // identical unrolled-lag arithmetic; the α^k decimal literals are
    // interpolated from ewmaW so both engines compute exact decimal
    // numerator/denominator sums and divide only at the end, in double
    "q128_ewma" -> {
      val lagDefs = (1 until EWMA_K)
        .map(k => s"lag(dsum, $k) OVER w AS x$k").mkString(",\n |  ")
      def xref(k: Int) = if (k == 0) "dsum" else s"x$k"
      val numTerms = (0 until EWMA_K)
        .map(k => s"COALESCE(${xref(k)} * ${ewmaW(k)}, 0)").mkString(" + ")
      val denTerms = (0 until EWMA_K)
        .map(k =>
          s"CASE WHEN ${xref(k)} IS NOT NULL THEN ${ewmaW(k)} ELSE 0 END")
        .mkString(" + ")
      val obsTerms = (0 until EWMA_K)
        .map(k => s"CASE WHEN ${xref(k)} IS NOT NULL THEN 1 ELSE 0 END")
        .mkString(" + ")
      s"""WITH $DAILY_SQL,
        |l AS (
        | SELECT user_id, day, dsum,
        |  $lagDefs
        | FROM daily
        | WINDOW w AS (PARTITION BY user_id ORDER BY day))
        |SELECT user_id, day,
        | CAST(CAST(CAST(dsum AS DECIMAL(38,6)) AS VARCHAR) AS DOUBLE) AS day_value,
        | CAST($obsTerms AS BIGINT) AS n_window,
        | ROUND(CAST($numTerms AS DOUBLE) / CAST($denTerms AS DOUBLE), 6)
        |   AS ewma
        |FROM l ORDER BY user_id, day""".stripMargin
    },
  )
}
