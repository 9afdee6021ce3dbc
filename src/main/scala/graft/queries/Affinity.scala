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
    * pair subtree (one definition; ReuseExchange dedups the shared
    * basket build at execution). */
  private[graft] def q150FanOutDebug(s: SparkSession, dir: String)
      : DataFrame = {
    val cb = cappedBaskets(s, dir)
    cb.select(col("user_id"), col("item").as("i"))
      .join(cb.select(col("user_id"), col("item").as("j")), "user_id")
      .where(col("i") < col("j"))
      .select("i", "j")
  }

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
      val cb = cappedBaskets(s, dir)
      val supp = cb.groupBy("item").agg(count(lit(1)).as("n_item"))
      val pr = q150FanOutDebug(s, dir)
        .groupBy("i", "j").agg(count(lit(1)).as("n_both"))
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
      val ev = Tables(s, dir).events
        .where(col("event_type").isin("view", "click"))
        .select(col("user_id"), col("ts"), col("event_id"),
          get_json_object(col("props"), "$.k").cast("long").as("item"))
        .where(col("item").isNotNull)
      val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      val steps = ev
        .withColumn("dst", lead("item", 1).over(w))
        .withColumn("dst_ts", lead("ts", 1).over(w))
        .where(col("dst").isNotNull &&
          unix_micros(col("dst_ts"))
            <= unix_micros(col("ts")) + TRANS_GAP_MIN * 60L * 1000000L)
      val t = steps.groupBy(col("item").as("src"), col("dst"))
        .agg(count(lit(1)).as("n"))
      val ws = Window.partitionBy("src")
      t.select(col("src"), col("dst"), col("n"),
          round(col("n").cast("double") /
            sum("n").over(ws).cast("double"), 6).as("p"))
        .orderBy("src", "dst")
    }),
  )

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
      s"""WITH e AS (
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
         |t AS (
         | SELECT src, dst, COUNT(*) AS n FROM nx
         | WHERE dst IS NOT NULL
         |  AND dst_ts <= ts + INTERVAL '$TRANS_GAP_MIN minutes'
         | GROUP BY 1, 2)
         |SELECT src, dst, n,
         | ROUND(CAST(n AS DOUBLE)
         |       / CAST(SUM(n) OVER (PARTITION BY src) AS DOUBLE), 6) AS p
         |FROM t ORDER BY src, dst""".stripMargin,
  )
}
