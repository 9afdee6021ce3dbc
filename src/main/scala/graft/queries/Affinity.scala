package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.model.Tables

/** Item-affinity operators over the event stream's `props.$.k` item id —
  * the two classic signals a recommender / sequence-model training
  * pipeline extracts from an interaction log:
  *
  *  - q150: item co-occurrence (the bipartite user→item graph projected
  *    onto items), the "users who viewed X also viewed Y" statistic;
  *  - q151: next-item transition counts (a first-order Markov estimate),
  *    the training target of session-based sequence recommenders.
  *
  * Both read the SAME interaction set: view/click events whose props
  * carry an item id, deduplicated to distinct (user, item) for q150 and
  * kept as the raw timestamped sequence for q151.
  */
object Affinity {

  /** q150: users with MORE distinct items than this are dropped before
    * the pair join. This is the co-occurrence twin of q35's cap lesson:
    * the item-pair fan-out of one user is C(|basket|, 2), so a crawler
    * bot that touches 10⁶ items of a 100 TB catalog contributes 5·10¹¹
    * pairs to ONE user_id key — the curse-of-the-last-reducer shape —
    * while carrying no preference signal. Dropping oversize baskets
    * bounds every user's fan-out at C(CAP, 2) ≈ 500 rows and is the
    * standard production remedy (bot filtering), not a sampling trick.
    * The cap BINDS on the shipped data (p99 basket ≈ 31, max 34–39:
    * a handful of users drop at sf0.01/sf0.1 — AffinitySpec pins the
    * exact drop count, per the no-silent-caps convention). */
  private[graft] val BASKET_CAP = 32

  /** q150: co-items kept per item (support-desc, id-asc row_number). */
  private[graft] val TOP_CO = 5

  /** q151: a transition only counts when the next interaction follows
    * within this many minutes — the same 30-minute horizon the q38/q62
    * sessionizers and q147's abandonment window use. */
  private[graft] val TRANS_GAP_MIN = 30L

  /** Distinct (user_id, item) interactions — one shuffle (the distinct);
    * shared by q150's projection and its per-item support counts. */
  private def baskets(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir).events
      .where(col("event_type").isin("view", "click"))
      .select(col("user_id"),
        get_json_object(col("props"), "$.k").cast("long").as("item"))
      .where(col("item").isNotNull)
      .distinct()

  /** Baskets with the bot cap applied (≤ BASKET_CAP items/user) —
    * q150's fan-out input, shared with the debug stream below. */
  private def cappedBaskets(s: SparkSession, dir: String): DataFrame = {
    val b = baskets(s, dir)
    val ok = b.groupBy("user_id").agg(count(lit(1)).as("bs"))
      .where(col("bs") <= BASKET_CAP)
      .select("user_id")
    b.join(ok, Seq("user_id"), "left_semi")
  }

  /** ScaleDebug-only (SCALE.md #10 audit): q150's fan-out stream exactly
    * as the (i, j) pair aggregate consumes it — the capped-basket
    * self-join output, pre-aggregation. Also the catalog query's own
    * pair subtree (one definition, base-parameterized round 16 — the
    * house `…Of(base)` pattern — so the catalog query can feed both
    * self-join sides and its support counts from ONE materialized
    * basket relation; the old per-call build planned the events
    * scan+distinct+cap subtree four times, and the i/j column pruning
    * kept AQE's stage cache from deduping the legs). */
  private[graft] def q150FanOutDebug(s: SparkSession, dir: String)
      : DataFrame = q150FanOutDebugOf(cappedBaskets(s, dir))

  private[graft] def q150FanOutDebugOf(cb: DataFrame): DataFrame =
    cb.select(col("user_id"), col("item").as("i"))
      .join(cb.select(col("user_id"), col("item").as("j")), "user_id")
      .where(col("i") < col("j"))
      .select("i", "j")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Bipartite projection with a bot cap: capped baskets self-join on
    // user_id (co-partitioned with the distinct that built them — the
    // only corpus-sized shuffles are the distinct and the (i,j) pair
    // aggregate), pair supports symmetrized, jaccard from per-item
    // supports (a ~|catalog| frame, broadcast by AQE), then a top-5
    // row_number per item on the PAIR-sized frame. Ranking key is
    // (n_both DESC, co_item) — pure integers, no float rank risk; the
    // rounded jaccard is carried as a payload column only.
    "q150_item_cooccurrence" -> ((s, dir) => {
      // ONE eager cut of the capped-basket relation (round 16): the
      // support aggregate and BOTH self-join sides read it — the old
      // per-consumer rebuild planned the events scan+distinct+cap
      // subtree 4× (12 scans / 24 exchanges in the static plan). Same
      // defect class as prGraph/triangleCounts, same remedy.
      val cb = cappedBaskets(s, dir).localCheckpoint()
      val supp = cb.groupBy("item").agg(count(lit(1)).as("n_item"))
      // the symmetrizing union references the pair aggregate twice and
      // its i/j pruning splits the legs for the stage cache — cut it
      // once too (bounded by C(CAP,2)·|users|, far below the fan-out)
      val pr = q150FanOutDebugOf(cb)
        .groupBy("i", "j").agg(count(lit(1)).as("n_both"))
        .localCheckpoint()
      val sym = pr.select(col("i").as("item"), col("j").as("co_item"),
          col("n_both"))
        .unionByName(pr.select(col("j").as("item"), col("i").as("co_item"),
          col("n_both")))
      val jc = sym
        .join(supp.select(col("item"), col("n_item").as("n_a")), "item")
        .join(supp.select(col("item").as("co_item"),
          col("n_item").as("n_b")), "co_item")
        .select(col("item"), col("co_item"), col("n_both"),
          round(col("n_both").cast("double") /
            (col("n_a") + col("n_b") - col("n_both")), 6).as("jaccard"))
      val w = Window.partitionBy("item")
        .orderBy(col("n_both").desc, col("co_item"))
      jc.withColumn("rnk", row_number().over(w).cast("long"))
        .where(col("rnk") <= TOP_CO)
        .orderBy("item", "rnk")
    }),

    // First-order transition counts: one window pass per user (lead of
    // item and ts on (ts, event_id) order — the hot-user story is
    // q38's: one partition holds the hot user's sequence, row-count-
    // bounded by their event share; q145's slab salting is the remedy
    // if that share outgrows a task), transitions gated by the 30-min
    // gap, then a (src, dst) aggregate over a frame bounded by
    // |catalog|². p = n / Σ_dst n via a window over that bounded frame;
    // both engines divide the same exact integers as doubles and round
    // to 6 dp (the q29 convention).
    "q151_item_transitions" -> ((s, dir) => {
      val t = transitionCounts(s, dir)
      val ws = Window.partitionBy("src")
      t.select(col("src"), col("dst"), col("n"),
          round(col("n").cast("double") /
            sum("n").over(ws).cast("double"), 6).as("p"))
        .orderBy("src", "dst")
    }),

    // HITS hubs & authorities (Kleinberg JACM'99, round 14) over the
    // q151 transition DIGRAPH — link analysis with a genuinely
    // asymmetric signal, where q104's PageRank (undirected similarity
    // graph) has none: an AUTHORITY is an item sessions converge ON
    // (weighted in-links from good hubs), a HUB is an item sessions
    // fan out FROM. Fixed ROUNDS mutual-recursion in integer quanta:
    //   a_i ← Σ_{(s→i, n)} n·h_s,   h_i ← Σ_{(i→d, n)} n·a_d,
    // each half-round max-normalized back to SCALE via exact integral
    // division ((raw·SCALE) div max, the q104 quanta discipline — no
    // float anywhere until the output boundary, which stays integer
    // too). ROUNDS = 8 is plenty: power iteration on this graph's
    // principal eigengap, and the oracle unrolls the SAME 8 rounds, so
    // convergence is not a correctness question (the q158 80-round
    // precedent). Scale shape: the transition relation is cut ONCE
    // (eager checkpoint, 2·ROUNDS consumers); each half-round is one
    // edge-shuffle + a map-side-combined groupBy + a 1-row broadcast
    // max (J2); carried frames ride Fixpoint.checkpointRound so plan
    // stats stay bounded at any depth. The final top-K is the
    // distributed TakeOrderedAndProject (orderBy+limit, the q90/q118
    // convention) with rnk derived AFTER the limit, so the only rank
    // window runs over ≤ TOPK rows — never the node table (VERDICT
    // r14 #3). OVERFLOW CEILING (the bm25 dlBroadcastable
    // discipline): n is lifted to DECIMAL(38,0) BEFORE the per-edge
    // multiply (ADVICE r15 — a long×long product would silently wrap
    // past ~9·10¹⁸, i.e. n ≳ 10¹² edges on one key) and the sum
    // accumulates in decimal, matching the oracle's exact HUGEINT
    // arithmetic up to 38 digits — no per-edge long ceiling left; the
    // remaining bound (10³⁸) is unreachable at any physical SF.
    "q182_item_hits" -> ((s, dir) =>
      hitsTopK(transitionCounts(s, dir))),
  )

  /** HITS over an arbitrary (src, dst, n) transition digraph — q182's
    * body, factored (round 15) so the STREAMING incrementally-maintained
    * graph (EventStreams.transitionGraphPartials merge-many read) re-runs
    * the IDENTICAL link analysis batch-side (StreamHitsSpec pins the
    * equality); q182 stays the oracle-checked system of record. */
  private[graft] def hitsTopK(t0: DataFrame): DataFrame = {
      val t = t0.localCheckpoint()
      val nodes = t.select(col("src").as("item"))
        .unionByName(t.select(col("dst").as("item"))).distinct()
        .localCheckpoint()
      var h = nodes.withColumn("hq", lit(HITS_SCALE))
      // only h is seeded (the oracle's h0); a exists purely as the
      // loop-carried output of round 1's first half (ROUNDS >= 1)
      var a: DataFrame = null
      def normalized(raw: DataFrame, out: String, round: Int): DataFrame = {
        val all = Fixpoint.checkpointRound(
          nodes.join(raw, Seq("item"), "left")
            .select(col("item"), coalesce(col("raw"), lit(0L)).as("raw")),
          round)
        all.crossJoin(broadcast(all.agg(max("raw").as("mx"))))
          .select(col("item"),
            expr(s"CAST(raw AS DECIMAL(38,0)) * $HITS_SCALE div mx")
              .as(out))
      }
      // The score vector is NODE-sized (item catalog) while t is
      // EDGE-sized: broadcasting the vector into each half-round join
      // keeps t un-shuffled for all 2·ROUNDS rounds (the only edge-
      // sized exchange left is each groupBy's map-side-combined
      // partial). Broadcast ceiling = |catalog| rows of (id, score) —
      // the bm25 dim-join story; a 10⁹-item catalog flips these to
      // plain shuffle joins and everything else survives.
      for (r <- 1 to HITS_ROUNDS) {
        a = normalized(
          t.join(broadcast(h.select(col("item").as("src"), col("hq"))),
              "src")
            .groupBy(col("dst").as("item"))
            .agg(sum(col("n").cast("decimal(38,0)") * col("hq"))
              .as("raw")),
          "aq", 2 * r - 1)
        h = normalized(
          t.join(broadcast(a.select(col("item").as("dst"), col("aq"))),
              "dst")
            .groupBy(col("src").as("item"))
            .agg(sum(col("n").cast("decimal(38,0)") * col("aq"))
              .as("raw")),
          "hq", 2 * r)
      }
      a.join(h, "item")
        .orderBy(col("aq").desc, col("hq").desc, col("item"))
        .limit(HITS_TOPK)
        .withColumn("rnk", row_number().over(
          Window.orderBy(col("aq").desc, col("hq").desc, col("item"))))
        .select(col("rnk").cast("long").as("rnk"), col("item"),
          col("aq"), col("hq"))
        .orderBy("rnk")
  }

  /** The (src, dst, n) transition-count digraph — q151's subtree,
    * factored (round 14) so q182's HITS reads the IDENTICAL graph and
    * the two can never drift. One window pass per user (hot-user story
    * in the q151 scaladoc), gap-gated, then a (src, dst) aggregate
    * bounded by |catalog|². */
  private[graft] def transitionCounts(s: SparkSession,
      dir: String): DataFrame = {
    val ev = Tables(s, dir).events
      .where(col("event_type").isin("view", "click"))
      .select(col("user_id"), col("ts"), col("event_id"),
        get_json_object(col("props"), "$.k").cast("long").as("item"))
      .where(col("item").isNotNull)
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    ev.withColumn("dst", lead("item", 1).over(w))
      .withColumn("dst_ts", lead("ts", 1).over(w))
      .where(col("dst").isNotNull &&
        unix_micros(col("dst_ts"))
          <= unix_micros(col("ts")) + TRANS_GAP_MIN * 60L * 1000000L)
      .groupBy(col("item").as("src"), col("dst"))
      .agg(count(lit(1)).as("n"))
  }

  /** q182 geometry: fixed HITS power-iteration depth, the integer
    * quanta scale (scores live in [0, SCALE] after each max-normalize),
    * and the report size. */
  private[graft] val HITS_ROUNDS = 8
  private[graft] val HITS_SCALE = 1000000L
  private[graft] val HITS_TOPK = 20

  def oracles: Map[String, String] = Map(

    "q150_item_cooccurrence" ->
      s"""WITH b AS (
         | SELECT DISTINCT user_id,
         |  CAST(json_extract_string(props, '$$.k') AS BIGINT) AS item
         | FROM events
         | WHERE event_type IN ('view', 'click')
         |  AND json_extract_string(props, '$$.k') IS NOT NULL),
         |ok AS (
         | SELECT user_id FROM b GROUP BY user_id
         | HAVING COUNT(*) <= $BASKET_CAP),
         |cb AS (SELECT b.* FROM b JOIN ok USING (user_id)),
         |supp AS (SELECT item, COUNT(*) AS n_item FROM cb GROUP BY item),
         |pr AS (
         | SELECT a.item AS i, c.item AS j, COUNT(*) AS n_both
         | FROM cb a JOIN cb c
         |  ON a.user_id = c.user_id AND a.item < c.item
         | GROUP BY 1, 2),
         |sym AS (
         | SELECT i AS item, j AS co_item, n_both FROM pr
         | UNION ALL SELECT j, i, n_both FROM pr),
         |jc AS (
         | SELECT s.item, s.co_item, s.n_both,
         |  ROUND(CAST(s.n_both AS DOUBLE)
         |        / (si.n_item + sj.n_item - s.n_both), 6) AS jaccard
         | FROM sym s
         | JOIN supp si ON si.item = s.item
         | JOIN supp sj ON sj.item = s.co_item),
         |r AS (
         | SELECT item, co_item, n_both, jaccard,
         |  ROW_NUMBER() OVER (PARTITION BY item
         |                     ORDER BY n_both DESC, co_item) AS rnk
         | FROM jc)
         |SELECT item, co_item, n_both, jaccard, rnk
         |FROM r WHERE rnk <= $TOP_CO ORDER BY item, rnk""".stripMargin,

    "q151_item_transitions" ->
      s"""WITH $TRANS_CTES
         |SELECT src, dst, n,
         | ROUND(CAST(n AS DOUBLE)
         |       / CAST(SUM(n) OVER (PARTITION BY src) AS DOUBLE), 6) AS p
         |FROM t ORDER BY src, dst""".stripMargin,

    // the same 8 rounds the engine runs, unrolled (the q158 80-round
    // precedent): each half-round is a weighted in/out sum off the
    // PREVIOUS stage plus an exact integral max-normalize in HUGEINT
    "q182_item_hits" ->
      s"""WITH $TRANS_CTES,
         |nodes AS MATERIALIZED (
         | SELECT DISTINCT item FROM (
         |  SELECT src AS item FROM t UNION ALL SELECT dst FROM t)),
         |h0 AS MATERIALIZED (SELECT item, $HITS_SCALE AS hq FROM nodes),
         |${(1 to HITS_ROUNDS).map(hitsRoundSql).mkString(",\n")}
         |SELECT * FROM (
         | SELECT ROW_NUMBER() OVER (
         |   ORDER BY a$HITS_ROUNDS.aq DESC, h$HITS_ROUNDS.hq DESC,
         |            a$HITS_ROUNDS.item) AS rnk,
         |  a$HITS_ROUNDS.item, a$HITS_ROUNDS.aq, h$HITS_ROUNDS.hq
         | FROM a$HITS_ROUNDS JOIN h$HITS_ROUNDS USING (item))
         |WHERE rnk <= $HITS_TOPK ORDER BY rnk""".stripMargin,
  )

  /** q151/q182's shared transition-digraph CTE chain, ending in
    * `t(src, dst, n)` — the SQL twin of [[transitionCounts]]. */
  private val TRANS_CTES =
    s"""e AS (
       | SELECT user_id, ts, event_id,
       |  CAST(json_extract_string(props, '$$.k') AS BIGINT) AS item
       | FROM events
       | WHERE event_type IN ('view', 'click')
       |  AND json_extract_string(props, '$$.k') IS NOT NULL),
       |nx AS (
       | SELECT item AS src, ts,
       |  LEAD(item) OVER (PARTITION BY user_id
       |                   ORDER BY ts, event_id) AS dst,
       |  LEAD(ts) OVER (PARTITION BY user_id
       |                 ORDER BY ts, event_id) AS dst_ts
       | FROM e),
       |t AS MATERIALIZED (
       | SELECT src, dst, COUNT(*) AS n FROM nx
       | WHERE dst IS NOT NULL
       |  AND dst_ts <= ts + INTERVAL '$TRANS_GAP_MIN minutes'
       | GROUP BY 1, 2)""".stripMargin

  /** One unrolled HITS round r: authority sums off h_{r−1}, hub sums
    * off a_r, each max-normalized back to [0, SCALE] with the exact
    * integral form the engine uses ((raw · SCALE) div max — HUGEINT
    * intermediate, floor division on non-negatives in both engines). */
  private def hitsRoundSql(r: Int): String =
    s"""ar$r AS MATERIALIZED (
       | SELECT t.dst AS item, SUM(t.n * h.hq) AS raw
       | FROM t JOIN h${r - 1} h ON h.item = t.src GROUP BY 1),
       |a$r AS MATERIALIZED (
       | SELECT n.item,
       |  CAST(CAST(COALESCE(ar.raw, 0) AS HUGEINT) * $HITS_SCALE
       |       // (SELECT MAX(raw) FROM ar$r) AS BIGINT) AS aq
       | FROM nodes n LEFT JOIN ar$r ar USING (item)),
       |hr$r AS MATERIALIZED (
       | SELECT t.src AS item, SUM(t.n * a.aq) AS raw
       | FROM t JOIN a$r a ON a.item = t.dst GROUP BY 1),
       |h$r AS MATERIALIZED (
       | SELECT n.item,
       |  CAST(CAST(COALESCE(hr.raw, 0) AS HUGEINT) * $HITS_SCALE
       |       // (SELECT MAX(raw) FROM hr$r) AS BIGINT) AS hq
       | FROM nodes n LEFT JOIN hr$r hr USING (item))""".stripMargin
}
