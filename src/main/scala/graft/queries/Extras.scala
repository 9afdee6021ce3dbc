package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.model.Tables

/** Completion of the named SURVEY §2 surface items that had no dedicated
  * query yet: the as-of join (§2.3 J6), levenshtein (§2.8 string family),
  * and explicit GROUPING SETS (§2.4 A8) — including the `spark.sql` text
  * entry point.
  */
object Extras {

  /** The sort-based exact-quantile core, ONE definition shared by q50
    * and its approx-comparison twin q70 (drift between them would
    * silently invalidate the bound q70 asserts). quantile_cont position
    * (0-indexed): pos = p·(n−1); value = v[floor(pos)] + (pos −
    * floor(pos)) · (v[ceil(pos)] − v[floor(pos)]). Each boundary row is
    * selected by an exact rank equality, so the post-window filter keeps
    * ≤2 rows per (group, quantile) and the final aggregate carries
    * O(groups) rows. Returns (key, n, q_0, q_1, …) with RAW interpolated
    * values — callers round at their output boundary. */
  private def exactQuantiles(df: DataFrame, key: String, value: String,
      ps: Seq[Double]): DataFrame = {
    val w = Window.partitionBy(key).orderBy(value)
    val ranked = df.select(col(key), col(value))
      .withColumn("rn", row_number().over(w))
      .withColumn("n", count(lit(1)).over(Window.partitionBy(key)))
    case class Q(p: Double) {
      val pos = lit(p) * (col("n") - 1).cast("double")
      val lo = floor(pos).cast("long") + 1 // row_number is 1-based
      val hi = ceil(pos).cast("long") + 1
      def vLo = max(when(col("rn") === lo, col(value)))
      def vHi = max(when(col("rn") === hi, col(value)))
      def frac = max(pos - floor(pos))
      def raw = vLo + frac * (vHi - vLo)
    }
    val qs = ps.map(Q.apply)
    ranked
      .where(qs.map(q => col("rn") === q.lo || col("rn") === q.hi)
        .reduce(_ || _))
      .groupBy(key)
      .agg(max("n").as("n"),
        qs.zipWithIndex.map { case (q, i) => q.raw.as(s"q_$i") }: _*)
  }

  /** The one-pass sketch-NDV profile over `cols` — q140's scale path,
    * factored out so PlanAuditSpec can assert its plan stands WITHOUT an
    * Expand: `approx_count_distinct` is an ordinary partial-aggregable
    * expression (one HLL±± buffer per column), so all four NDVs plus
    * count/min/max/mean ride ONE scan → partial agg → 1-row final agg.
    * q110's exact `countDistinct` form plans an Expand (≈4× row
    * multiplication of the full scan) because each DISTINCT needs its own
    * de-dup grouping — that is the cost this twin removes at 100 TB. */

  /** Spread a CPU-heavy aggregation's input when the scan arrived
    * NARROW (round 16): every testdata parquet file is a single row
    * group, so Spark cannot split it and the Expand×5 distinct-profile
    * map stage ran on ONE core (StageProbe q110: a 2.2 s serial stage
    * inside a 3.3 s query). Guide §2.5's unsplittable-input remedy —
    * repartition right after the read — applied CONDITIONALLY: a scan
    * already at least half as wide as the session's shuffle width (any
    * real multi-file/multi-row-group table) is left untouched, so no
    * extra exchange ever appears at cluster scale. Round-robin is safe
    * here: every consumer below is an order-free aggregate. */
  private[graft] def spreadNarrowScan(df: DataFrame): DataFrame = {
    val width = df.sparkSession.conf
      .get("spark.sql.shuffle.partitions", "32").toInt
    if (df.rdd.getNumPartitions * 2 < width) df.repartition(width) else df
  }

  private[graft] def approxStats(df: DataFrame, cols: Seq[String]): DataFrame = {
    val aggs = cols.flatMap { c =>
      Seq(count(col(c)).as(s"n_$c"),
        approx_count_distinct(col(c), 0.02).as(s"ad_$c"),
        min(col(c)).as(s"mn_$c"), max(col(c)).as(s"mx_$c"),
        round(sum(col(c).cast("decimal(18,4)")).cast("decimal(38,6)")
          .cast("double") / count(col(c)).cast("double"), 6)
          .as(s"av_$c"))
    }
    df.agg(aggs.head, aggs.tail: _*)
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // q110's DECLARED 100 TB swap, promoted from prose to a checked query
    // (VERDICT r7 next #4): the column-statistics profile with NDV from
    // HLL sketches instead of exact countDistinct. The approx side
    // (`approxStats` above) is the plan you would ship on an ultra-wide
    // petabyte table — no Expand, one scan. The exact side below is the
    // verification scaffold ONLY (it still plans q110's Expand; at real
    // scale it is dropped, or replaced by sampled spot-checks): following
    // the q40/q70/q136 sketch contract, the output carries within_bound =
    // |sketch − exact| ≤ ⌈5 %·exact⌉ (rsd 0.02 ⇒ 2.5σ) per column, and the
    // DuckDB oracle asserts it — the hash check pins the sketch's error
    // bound cross-engine rather than trusting it.
    "q140_table_stats_hll" -> ((s, dir) => {
      val cols = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")
      val approx = approxStats(Tables(s, dir).lineitem, cols)
      val exactAggs = cols.map(c => countDistinct(col(c)).as(s"nd_$c"))
      val exact = spreadNarrowScan(Tables(s, dir).lineitem)
        .agg(exactAggs.head, exactAggs.tail: _*)
      val stackExpr = cols.map(c =>
        s"'$c', n_$c, nd_$c, mn_$c, mx_$c, av_$c, " +
          s"cast(abs(ad_$c - nd_$c) <= ceil(cast(0.05 as double) * nd_$c) " +
          "as long)").mkString(", ")
      approx.crossJoin(exact) // two 1-row frames — a broadcast pairing
        .selectExpr(
          s"stack(${cols.size}, $stackExpr) as " +
            "(col_name, n, n_distinct, min_v, max_v, mean_v, within_bound)")
        .orderBy("col_name")
    }),

    // As-of join, scale-safe window form: for every purchase, the most
    // recent STRICTLY PRIOR click of the same user. No range join and no
    // per-pair fan-out — one partition-ordered window pass, which is the
    // shape that survives when each user has millions of events.
    "q47_asof_join" -> ((s, dir) => {
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
      Tables(s, dir).events
        .where(col("event_type").isin("click", "purchase"))
        .withColumn("asof_click_ts",
          last(when(col("event_type") === "click", col("ts")), true).over(w))
        .where(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts"),
          col("asof_click_ts"),
          (unix_micros(col("ts")) - unix_micros(col("asof_click_ts")))
            .as("gap_us"))
        .orderBy("event_id")
    }),

    // The SAME as-of semantics through the custom whole-operator plan
    // (graft.plans: AsOfJoinPlan → AsOfJoinStrategy → AsOfJoinExec —
    // SURVEY §2.9 tier c): purchases as-of-join clicks per user with the
    // inclusive ≤ backward match, tie on click event_id. Unlike q47's
    // window composition, the native exec merges two independently-pruned,
    // co-partitioned sorted sides with O(1) state per partition — no
    // union, no window buffer. Oracle-checked with its own windowed SQL
    // (clicks sort before purchases at equal ts, so ≤ is expressible).
    "q77_asof_native" -> ((s, dir) => {
      val ev = Tables(s, dir).events
      val p = ev.where(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts"))
      val c = ev.where(col("event_type") === "click")
        .select(col("event_id").as("click_id"),
          col("user_id").as("c_user"), col("ts").as("click_ts"))
      graft.plans.AsOf
        .join(p, c, "user_id", "c_user", "ts", "click_ts", "click_id")
        .select(col("event_id"), col("user_id"), col("ts"),
          col("click_ts").as("asof_click_ts"),
          col("click_id").as("asof_click_id"),
          (unix_micros(col("ts")) - unix_micros(col("click_ts")))
            .as("gap_us"))
        .orderBy("event_id")
    }),

    // The SAME as-of semantics a third time, through the ZERO-SHUFFLE
    // broadcast physical form: `broadcast(clicks)` selects
    // BroadcastAsOfJoinExec — the purchase side is neither exchanged nor
    // sorted (its scan partitioning flows through), each task answers
    // purchases by hash-lookup + binary search against the broadcast
    // click index. THE scale shape for a big event log vs a small
    // reference timeline (config changes, rate ticks, deploy markers):
    // the sort-merge form (q77) pays a full shuffle+sort of the log;
    // this one touches it in place. Same oracle as q77 — one contract,
    // three plans (window, merge, broadcast), all hash-identical.
    "q113_asof_broadcast" -> ((s, dir) => {
      val ev = Tables(s, dir).events
      val p = ev.where(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts"))
      val c = ev.where(col("event_type") === "click")
        .select(col("event_id").as("click_id"),
          col("user_id").as("c_user"), col("ts").as("click_ts"))
      graft.plans.AsOf
        .join(p, broadcast(c), "user_id", "c_user", "ts", "click_ts",
          "click_id")
        .select(col("event_id"), col("user_id"), col("ts"),
          col("click_ts").as("asof_click_ts"),
          col("click_id").as("asof_click_id"),
          (unix_micros(col("ts")) - unix_micros(col("click_ts")))
            .as("gap_us"))
        .orderBy("event_id")
    }),

    // Levenshtein over BANDED document pairs (same lang, doc_id within a
    // window of 5): edit distance on the 20-char prefix. The band join is
    // keyed on (lang, doc_id-block): the left side emits its block and the
    // next one, the right side its own — every in-band pair meets on
    // exactly one key, the equi-join key space is O(|docs|/8) (not 5
    // langs, which would funnel a 5 M-pair near-cross-join through 5
    // tasks — measured 48 s that way), and the range predicate only
    // prunes within tiny blocks.
    "q48_levenshtein" -> ((s, dir) => {
      val d = Tables(s, dir).documents
        .select(col("doc_id"), col("lang"),
          substring(col("text"), 1, 20).as("prefix"),
          expr("doc_id div 8").as("blk"))
      val a = d.select(col("doc_id").as("da"), col("lang"),
        col("prefix").as("pa"),
        explode(array(col("blk"), col("blk") + 1)).as("jblk"))
      val b = d.select(col("doc_id").as("db"), col("lang"),
        col("prefix").as("pb"), col("blk").as("jblk"))
      a.join(b, Seq("lang", "jblk"))
        .where(col("db") > col("da") && col("db") <= col("da") + 5)
        .select(col("da"), col("db"), col("lang"),
          levenshtein(col("pa"), col("pb")).cast("long").as("lev"))
        .where(col("lev") <= 8)
        .orderBy("da", "db")
    }),

    // Exact percentiles (continuous interpolation ≡ DuckDB
    // `quantile_cont`): median and p90 of extended price per return
    // flag, computed SORT-BASED — rank every value with one window sort,
    // keep only the ≤4 boundary rows per group, interpolate. Spark's
    // `percentile` aggregate ships a per-partition value→count map
    // through the shuffle (~|distinct| entries per map task — 6.9 s at
    // sf0.1 and memory-unbounded in the distinct count); this form
    // shuffles each row once into a per-group sort and carries O(groups)
    // rows afterwards. The declared scale swap — approx_percentile with
    // constant mergeable state, once single groups outgrow a sort
    // partition's spill budget — now EXISTS as q70 below, with
    // ApproxPercentileSpec pinning its error against this exact form.
    "q50_percentiles" -> ((s, dir) =>
      exactQuantiles(Tables(s, dir).lineitem, "l_returnflag",
          "l_extendedprice", Seq(0.5, 0.9))
        .select(col("l_returnflag"), col("n"),
          round(col("q_0"), 6).as("median_price"),
          round(col("q_1"), 6).as("p90_price"))
        .orderBy("l_returnflag")),

    // The DECLARED 100 TB swap for q50: approx_percentile (t-digest-like
    // quantile summary, CONSTANT state per group, mergeable map-side)
    // replaces the per-group sort once a single group outgrows a sort
    // partition's spill budget. Raw sketch values are implementation-
    // specific (Spark's summary, not DuckDB's), so the OUTPUT is the
    // bounded-error comparison (VERDICT r5 #3): the exact quantiles
    // (Spark `percentile` ≡ DuckDB quantile_cont, the q50 equivalence)
    // plus within_bound = both approx quantiles inside 0.5 % relative
    // error — the ApproxPercentileSpec contract, now pinned cross-engine
    // by the driver's hash check instead of rows-only.
    "q70_percentiles_approx" -> ((s, dir) => {
      // exact side via the SHARED q50 sort-based ranked form (NOT the
      // `percentile` value-map aggregate — that form alone cost 4.5 s at
      // sf0.1, tripling the query whose point is the cheap scale path)
      val exact = exactQuantiles(Tables(s, dir).lineitem, "l_returnflag",
          "l_extendedprice", Seq(0.5, 0.9))
        .select(col("l_returnflag"), col("n"),
          col("q_0").as("med_e"), col("q_1").as("p90_e"))
      val approx = Tables(s, dir).lineitem
        .groupBy("l_returnflag")
        .agg(percentile_approx(col("l_extendedprice"),
          array(lit(0.5), lit(0.9)), lit(10000)).as("q"))
      exact.join(approx, "l_returnflag")
        .select(col("l_returnflag"), col("n"),
          round(col("med_e"), 6).as("median_exact"),
          round(col("p90_e"), 6).as("p90_exact"),
          ((abs(element_at(col("q"), 1) - col("med_e")) / col("med_e")
              <= 0.005) &&
           (abs(element_at(col("q"), 2) - col("p90_e")) / col("p90_e")
              <= 0.005)).cast("long").as("within_bound"))
        .orderBy("l_returnflag")
    }),

    // Explicit GROUPING SETS through the spark.sql text entry point —
    // subtotal rows labeled via grouping() exactly like q07/q08.
    // Column-statistics profile — the ANALYZE TABLE pass every
    // cost-based layer (CBO, file skipping, AQE thresholds) feeds on:
    // count / nulls / NDV / min / max / mean for each numeric measure,
    // collected in ONE corpus scan (a single aggregate computes every
    // column's stats side by side; `stack` reshapes the 1-row result to
    // the per-column long form — bounded, driver-free). Means run in
    // exact decimal; NDV is exact distinct here, with q40's HLL as the
    // declared 100 TB swap for ultra-wide profiling.
    "q110_table_stats" -> ((s, dir) => {
      val cols = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")
      val aggs = cols.flatMap { c =>
        Seq(count(col(c)).as(s"n_$c"),
          count(when(col(c).isNull, lit(1))).as(s"nn_$c"),
          countDistinct(col(c)).as(s"nd_$c"),
          min(col(c)).as(s"mn_$c"), max(col(c)).as(s"mx_$c"),
          // exact decimal sum → double BEFORE the divide (decimal
          // division scale rules differ across engines; double ops
          // on identical operands do not)
          round(sum(col(c).cast("decimal(18,4)")).cast("decimal(38,6)")
            .cast("double") / count(col(c)).cast("double"), 6)
            .as(s"av_$c"))
      }
      val one = spreadNarrowScan(Tables(s, dir).lineitem)
        .agg(aggs.head, aggs.tail: _*)
      val stackExpr = cols.map(c =>
        s"'$c', n_$c, nn_$c, nd_$c, mn_$c, mx_$c, av_$c").mkString(", ")
      one.selectExpr(
        s"stack(${cols.size}, $stackExpr) as " +
          "(col_name, n, n_null, n_distinct, min_v, max_v, mean_v)")
        .orderBy("col_name")
    }),

    // Dictionary-bounded fuzzy (edit-distance) self-join — catalog-string
    // near-dup for SHORT strings, the deterministic complement of the
    // LSH families: extract the distinct-name dictionary (bounded by
    // vocabulary, NOT corpus size — 20 k parts share ~90 names), verify
    // all dictionary pairs within a length band with exact levenshtein
    // ≤ 2, and weight each pair by how many rows it would link. The
    // all-pairs step is over the broadcast dictionary only (a
    // BroadcastNestedLoopJoin with the length-band prefilter inside it);
    // the corpus contributes one distinct-count aggregate. At 100 TB the
    // dictionary is still dictionary-sized, so the plan is unchanged.
    "q111_fuzzy_join" -> ((s, dir) => {
      // dictionary aggregated ONCE (lazy checkpoint) — as two live
      // subtrees the corpus scan + groupBy would plan twice, since the
      // broadcast side's exchange cannot be reused by the probe side
      val names = Tables(s, dir).part
        .groupBy(col("p_name").as("name"))
        .agg(count(lit(1)).as("n_rows"))
        .localCheckpoint(false)
      val a = names.select(col("name").as("na"), col("n_rows").as("ra"))
      val b = names.select(col("name").as("nb"), col("n_rows").as("rb"))
      a.join(broadcast(b),
          col("na") < col("nb") &&
          abs(length(col("na")) - length(col("nb"))) <= 2)
        .withColumn("dist", levenshtein(col("na"), col("nb")))
        .where(col("dist") <= 2)
        .select(col("na"), col("nb"), col("dist"),
          (col("ra") * col("rb")).as("n_linked_pairs"))
        .orderBy("na", "nb")
    }),

    "q49_grouping_sets" -> ((s, dir) => {
      Tables(s, dir).orders.createOrReplaceTempView("orders_q49")
      s.sql(
        """SELECT
          | CASE WHEN grouping(o_orderstatus) = 1 THEN 'ALL'
          |      ELSE o_orderstatus END AS status,
          | CASE WHEN grouping(o_orderpriority) = 1 THEN 'ALL'
          |      ELSE o_orderpriority END AS priority,
          | count(1) AS n
          |FROM orders_q49
          |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
          |ORDER BY status NULLS LAST, priority NULLS LAST""".stripMargin)
    }),
  )

  /** ONE oracle for the native as-of pair (q77 merge / q113 broadcast):
    * two physical forms of the same contract must hash-match the same
    * SQL — sharing the string makes divergence impossible by
    * construction. */
  private val ASOF_NATIVE_ORACLE =
    """SELECT event_id, user_id, ts, asof_click_ts, asof_click_id,
      | epoch_us(ts) - epoch_us(asof_click_ts) AS gap_us
      |FROM (
      | SELECT event_id, user_id, ts, event_type,
      |  LAST_VALUE(CASE WHEN event_type = 'click' THEN ts END IGNORE NULLS)
      |   OVER (PARTITION BY user_id
      |         ORDER BY ts,
      |           CASE WHEN event_type = 'click' THEN 0 ELSE 1 END,
      |           event_id
      |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      |   AS asof_click_ts,
      |  LAST_VALUE(CASE WHEN event_type = 'click' THEN event_id END
      |             IGNORE NULLS)
      |   OVER (PARTITION BY user_id
      |         ORDER BY ts,
      |           CASE WHEN event_type = 'click' THEN 0 ELSE 1 END,
      |           event_id
      |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      |   AS asof_click_id
      | FROM events WHERE event_type IN ('click', 'purchase')) t
      |WHERE event_type = 'purchase'
      |ORDER BY event_id""".stripMargin

  def oracles: Map[String, String] = Map(
    "q113_asof_broadcast" -> ASOF_NATIVE_ORACLE,

    "q47_asof_join" ->
      """SELECT event_id, user_id, ts, asof_click_ts,
        | epoch_us(ts) - epoch_us(asof_click_ts) AS gap_us
        |FROM (
        | SELECT event_id, user_id, ts, event_type,
        |  LAST_VALUE(CASE WHEN event_type = 'click' THEN ts END IGNORE NULLS)
        |   OVER (PARTITION BY user_id ORDER BY ts, event_id
        |         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
        |   AS asof_click_ts
        | FROM events WHERE event_type IN ('click', 'purchase')) t
        |WHERE event_type = 'purchase'
        |ORDER BY event_id""".stripMargin,

    "q77_asof_native" -> ASOF_NATIVE_ORACLE,

    "q48_levenshtein" ->
      """SELECT a.doc_id AS da, b.doc_id AS db, a.lang,
        | CAST(levenshtein(substr(a.text, 1, 20), substr(b.text, 1, 20))
        |      AS BIGINT) AS lev
        |FROM documents a JOIN documents b
        |  ON a.lang = b.lang AND b.doc_id > a.doc_id
        | AND b.doc_id <= a.doc_id + 5
        |WHERE levenshtein(substr(a.text, 1, 20), substr(b.text, 1, 20)) <= 8
        |ORDER BY da, db""".stripMargin,

    "q50_percentiles" ->
      """SELECT l_returnflag, COUNT(*) AS n,
        | ROUND(quantile_cont(l_extendedprice, 0.5), 6) AS median_price,
        | ROUND(quantile_cont(l_extendedprice, 0.9), 6) AS p90_price
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    // exact quantiles (quantile_cont ≡ Spark percentile, the q50
    // equivalence) + the asserted 0.5 % bound on the approx sketch
    "q70_percentiles_approx" ->
      """SELECT l_returnflag, COUNT(*) AS n,
        | ROUND(quantile_cont(l_extendedprice, 0.5), 6) AS median_exact,
        | ROUND(quantile_cont(l_extendedprice, 0.9), 6) AS p90_exact,
        | CAST(1 AS BIGINT) AS within_bound
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "q49_grouping_sets" ->
      """SELECT
        | CASE WHEN grouping(o_orderstatus) = 1 THEN 'ALL'
        |      ELSE o_orderstatus END AS status,
        | CASE WHEN grouping(o_orderpriority) = 1 THEN 'ALL'
        |      ELSE o_orderpriority END AS priority,
        | count(1) AS n
        |FROM orders
        |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        |ORDER BY status NULLS LAST, priority NULLS LAST""".stripMargin,

    // one stats row per column via UNION ALL; identical exact-decimal
    // means cast to DOUBLE before the divide
    "q110_table_stats" -> Seq(
      "l_quantity", "l_extendedprice", "l_discount", "l_tax").map { c =>
      s"""SELECT '$c' AS col_name, COUNT($c) AS n,
         | COUNT(*) FILTER ($c IS NULL) AS n_null,
         | COUNT(DISTINCT $c) AS n_distinct,
         | MIN($c) AS min_v, MAX($c) AS max_v,
         | ROUND(CAST(CAST(CAST(SUM(CAST($c AS DECIMAL(18,4)))
         |     AS DECIMAL(38,6)) AS VARCHAR) AS DOUBLE)
         |   / CAST(COUNT($c) AS DOUBLE), 6) AS mean_v
         |FROM lineitem""".stripMargin
    }.mkString("", "\nUNION ALL\n", "\nORDER BY col_name"),

    // exact NDV side + the asserted sketch bound (the q40 contract:
    // any out-of-bound column flips within_bound to 0 and the hash)
    "q140_table_stats_hll" -> Seq(
      "l_quantity", "l_extendedprice", "l_discount", "l_tax").map { c =>
      s"""SELECT '$c' AS col_name, COUNT($c) AS n,
         | COUNT(DISTINCT $c) AS n_distinct,
         | MIN($c) AS min_v, MAX($c) AS max_v,
         | ROUND(CAST(CAST(CAST(SUM(CAST($c AS DECIMAL(18,4)))
         |     AS DECIMAL(38,6)) AS VARCHAR) AS DOUBLE)
         |   / CAST(COUNT($c) AS DOUBLE), 6) AS mean_v,
         | CAST(1 AS BIGINT) AS within_bound
         |FROM lineitem""".stripMargin
    }.mkString("", "\nUNION ALL\n", "\nORDER BY col_name"),

    // same dictionary pairs + levenshtein verify (identical distance
    // definition in both engines)
    "q111_fuzzy_join" ->
      """WITH names AS (
        | SELECT p_name AS name, COUNT(*) AS n_rows FROM part
        | GROUP BY p_name)
        |SELECT a.name AS na, b.name AS nb,
        | CAST(levenshtein(a.name, b.name) AS INTEGER) AS dist,
        | a.n_rows * b.n_rows AS n_linked_pairs
        |FROM names a JOIN names b
        |  ON a.name < b.name
        | AND ABS(LENGTH(a.name) - LENGTH(b.name)) <= 2
        |WHERE levenshtein(a.name, b.name) <= 2
        |ORDER BY na, nb""".stripMargin,
  )
}
