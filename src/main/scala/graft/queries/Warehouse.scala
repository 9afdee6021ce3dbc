package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.model.Tables
import Exact.dPrice

/** Snapshot-maintenance operators — the three table-versioning primitives
  * a 100 TB lakehouse runs between ingest and query:
  *
  *  - q155: snapshot DIFF (added / removed / changed / unchanged between
  *    two table versions, detected by row fingerprint, not column-wise
  *    compare);
  *  - q156: per-partition content MANIFEST with an order-free Merkle-style
  *    root — the artifact that makes q155 incremental (only partitions
  *    whose leaf hash moved need the row-level diff);
  *  - q157: seasonal-baseline anomaly screen over the event stream
  *    (hour-of-week profile per event type, 3σ row flags) — the
  *    data-quality twin of the content integrity pair, computed in exact
  *    integers so both engines agree bit-for-bit.
  *
  * The second snapshot for q155 is derived DETERMINISTICALLY from
  * `orders` itself (the q103 CDC convention): deletes at key ≡ 7
  * (mod 101), price revisions at key ≡ 3 (mod 97), inserts mirrored to
  * fresh negative keys at key ≡ 0 (mod 103) — so both engines construct
  * the identical "tomorrow" table without any fixture.
  */
object Warehouse {

  private def h48(prefix: String, c: Column) = TextOps.h48(prefix, c)
  private def h48sum(c: Column)              = Sinks.h48sum(c)

  /** Snapshot rows in diff-ready shape: integer cents (the exact-money
    * rule), the order timestamp as epoch micros (engine-neutral), and
    * every payload column that participates in the fingerprint. */
  private def snapA(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir).orders.select(
      col("o_orderkey").as("key"),
      col("o_custkey").as("custkey"),
      col("o_orderstatus").as("status"),
      (dPrice(col("o_totalprice")) * 100).cast("long").as("cents"),
      col("o_orderpriority").as("priority"),
      // o_orderdate arrives TIMESTAMP_NTZ; the cast relabels the naive
      // wall clock as a UTC instant — exact because the catalog pins the
      // session zone to UTC during construction (Tables.withUtcSession),
      // so epoch micros here ≡ DuckDB's epoch_us on the naive value.
      unix_micros(col("o_orderdate").cast("timestamp")).as("dat_us"))

  /** The derived next-day snapshot (see object scaladoc). Deletes apply
    * first; the revision rule applies to survivors; inserts land on
    * −(key+1) so they can never collide with an existing key (key 0
    * would make a bare negation collide). */
  private def snapB(s: SparkSession, dir: String): DataFrame = {
    val a    = snapA(s, dir)
    val rev  = pmod(col("key"), lit(97)) === 3
    val kept = a.where(pmod(col("key"), lit(101)) =!= 7)
      .withColumn("cents", when(rev, col("cents") + 500).otherwise(col("cents")))
      .withColumn("status", when(rev, lit("R")).otherwise(col("status")))
    val ins = a.where(pmod(col("key"), lit(103)) === 0)
      .withColumn("key", -(col("key") + lit(1L)))
      .withColumn("status", lit("N"))
    kept.unionByName(ins)
  }

  /** Full-row fingerprint: ONE 48-bit hash over the pipe-joined payload.
    * Change detection compares this single long, so the diff's cost per
    * row is independent of column count — at 100 TB the alternative
    * (column-wise `<=>` chains) re-reads every payload column into the
    * join output. The oracle builds the identical string, so the
    * fingerprint itself is oracle-checked, not just the classification. */
  private def withFp(df: DataFrame): DataFrame =
    df.select(col("key"), col("priority"), col("cents"),
      h48("sd:", concat_ws("|",
        col("key"), col("status"), col("cents"), col("priority"),
        col("custkey"), col("dat_us"))).as("fp"))

  /** q156 leaf grain: calendar month of the order date (the natural
    * ingest partition of a date-partitioned fact), as year·100+month. */
  private def monthKey(c: Column): Column =
    (year(c) * 100 + month(c)).cast("long")

  /** q162: the month the correction batch lands in, and the in-month
    * selection rule. A mid-range month so it exists at every sf. */
  private[graft] val HOT_MONTH = 199603L
  private[graft] val HOT_MOD   = 7L

  /** q162's third snapshot: A with a MONTH-LOCALIZED correction batch —
    * keys ≡ 3 (mod 7) inside HOT_MONTH get a 5-dollar revision (the
    * late-arriving-corrections shape: one accounting period reopens,
    * the rest of the table is untouched). Same-key-set by construction:
    * updates only, no inserts/deletes. */
  private def snapC(s: SparkSession, dir: String): DataFrame = {
    val hit = col("pk") === HOT_MONTH &&
      pmod(col("key"), lit(HOT_MOD)) === 3
    snapAM(s, dir)
      .withColumn("cents", when(hit, col("cents") + 500).otherwise(col("cents")))
      .withColumn("status", when(hit, lit("C")).otherwise(col("status")))
  }

  /** snapA with the month partition key attached (timestamp_micros is
    * zone-free; year/month read it under the UTC-pinned session). */
  private def snapAM(s: SparkSession, dir: String): DataFrame =
    snapA(s, dir)
      .withColumn("pk", monthKey(timestamp_micros(col("dat_us"))))

  /** Fingerprint + month partition key, the q162 diff grain. */
  private def withFpM(df: DataFrame): DataFrame =
    df.select(col("key"), col("pk"), col("cents"),
      h48("id:", concat_ws("|",
        col("key"), col("status"), col("cents"), col("priority"),
        col("custkey"), col("dat_us"))).as("fp"))

  /** Exact-integer decimal width for the q157 anomaly arithmetic. */
  private val D = "decimal(38,0)"

  /** q157's cell projection: hour-of-week as pure integer arithmetic on
    * the epoch-microsecond timestamp (no calendar function to disagree
    * on), value in exact cents. Shared with the streaming twin
    * ([[graft.streaming.EventStreams.anomalyScreen]]) — with the ts
    * column passed through so the stream can watermark/window on it. */
  private[graft] def eventCells(events: DataFrame): DataFrame =
    events.select(col("ts"), col("event_type"),
      expr("(unix_micros(ts) div 3600000000) % 168").as("how"),
      (dPrice(col("value")) * 100).cast("long").as("cents"))

  /** The (event_type, hour-of-week) baseline: n, Σcents, Σcents² in
    * exact DECIMAL(38,0). Bounded by |event_type|·168 cells, so the
    * consumer side always broadcasts it. */
  private[graft] def seasonalBaseline(cells: DataFrame): DataFrame =
    cells.groupBy("event_type", "how").agg(
      count(lit(1)).as("n"),
      sum(col("cents").cast(D)).as("s"),
      sum(col("cents").cast(D) * col("cents")).as("q"))

  /** The cross-multiplied integer 3σ test — |v−μ| > 3σ with no float
    * division and no rounding tie:  (n·v − s)² > 9·(n·q − s²), all in
    * DECIMAL(38,0) (HUGEINT on the oracle). ONE definition shared by
    * q157 and the streaming screen so the flag rule cannot drift. */
  private[graft] def anomalyFlag: Column = {
    val lhs = col("n").cast(D) * col("cents") - col("s")
    val rhs = lit(9).cast(D) *
      (col("n").cast(D) * col("q") - col("s") * col("s"))
    when(lhs * lhs > rhs, 1L).otherwise(0L)
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Snapshot diff by fingerprint: full-outer join of the two versions
    // on the primary key, row identity decided by ONE hash compare.
    // Plan shape at scale: each side is a single projection over its
    // snapshot scan; the only shuffle is the key join — and when both
    // snapshots are bucketed by the key (the layout q71's bucketed writer
    // and BucketingSpec demonstrate), even that exchange disappears into
    // a sort-merge over co-located buckets, making the nightly diff a
    // scan-bound operation. Output is aggregate-sized (change class ×
    // priority), with an order-free h48 key-sum per cell so the oracle
    // pins WHICH rows changed, not just how many; cents_delta audits the
    // revision rule end-to-end (+500 per revised key, additions add their
    // full price, removals subtract theirs).
    "q155_snapshot_diff" -> ((s, dir) => {
      val fa = withFp(snapA(s, dir))
        .select(col("key").as("ka"), col("priority").as("pa"),
          col("cents").as("ca"), col("fp").as("fpa"))
      val fb = withFp(snapB(s, dir))
        .select(col("key").as("kb"), col("priority").as("pb"),
          col("cents").as("cb"), col("fp").as("fpb"))
      fa.join(fb, col("ka") === col("kb"), "full_outer")
        .select(
          when(col("ka").isNull, "added")
            .when(col("kb").isNull, "removed")
            .when(col("fpa") === col("fpb"), "unchanged")
            .otherwise("changed").as("change_type"),
          coalesce(col("pb"), col("pa")).as("priority"),
          coalesce(col("ka"), col("kb")).as("key"),
          (coalesce(col("cb"), lit(0L)) - coalesce(col("ca"), lit(0L)))
            .as("cd"))
        .groupBy("change_type", "priority")
        .agg(count(lit(1)).as("n_rows"),
          h48sum(h48("sd:", col("key").cast("string"))).as("key_hash_sum"),
          sum(col("cd").cast("decimal(38,0)")).cast("long").as("cents_delta"))
        .orderBy("change_type", "priority")
    }),

    // Partition manifest + Merkle-style root: per month-partition row
    // count, content hash (h48 of the SAME full-row fingerprint family
    // as q155, folded order-free mod 2⁴⁸), and exact cents total; one
    // 'root' row folds the leaf hashes again. Computed as ONE
    // rollup(part_key) pass: the grand-total row IS the root, because
    // the fold is an order-free SUM mod 2⁴⁸ and modular sums compose —
    // Σ_leaves (Σ rh mod m) ≡ Σ rh (mod m) — so "fold of the leaf
    // hashes" and "fold of all row hashes" are the same number, and the
    // plan is a single scan + one partial-aggregate exchange (the naive
    // leaf-then-root union re-scans the fact twice). This is the
    // incremental-sync artifact: a replica compares roots, walks down to
    // the leaves that differ, and runs q155's row diff on those
    // partitions only — a partition's hash is reproducible from any task
    // layout, the root from any leaf order, and appending a partition
    // updates the root in O(1). (part_key is never NULL in the data, so
    // the rollup's NULL grouping marks the root row unambiguously —
    // grouping() is used, not the NULL itself.)
    "q156_partition_manifest" -> ((s, dir) => {
      Tables(s, dir).orders.select(
          monthKey(col("o_orderdate")).as("part_key"),
          (dPrice(col("o_totalprice")) * 100).cast("long").as("cents"),
          h48("mk:", concat_ws("|",
            col("o_orderkey"), col("o_orderstatus"),
            (dPrice(col("o_totalprice")) * 100).cast("long"),
            col("o_orderpriority"), col("o_custkey"),
            unix_micros(col("o_orderdate").cast("timestamp")))).as("rh"))
        .rollup("part_key")
        .agg(grouping(col("part_key")).as("gflag"),
          count(lit(1)).as("n_rows"),
          h48sum(col("rh")).as("content_hash"),
          sum(col("cents").cast("decimal(38,0)")).cast("long").as("sum_cents"))
        .select(
          when(col("gflag") === 1, "root").otherwise("leaf").as("level"),
          coalesce(col("part_key"), lit(-1L)).as("part_key"),
          col("n_rows"), col("content_hash"), col("sum_cents"))
        .orderBy("level", "part_key")
    }),

    // Seasonal-baseline anomaly screen: per (event_type, hour-of-week)
    // cell — hour-of-week computed as pure integer arithmetic on the
    // epoch-microsecond timestamp, no calendar function to disagree on —
    // count the rows whose value sits more than 3σ from the CELL's own
    // mean. The test is the cross-multiplied integer form of
    // |v−μ| > 3σ:  (n·v − s)² > 9·(n·q − s²)  with s = Σv, q = Σv² in
    // exact cents, evaluated in DECIMAL(38,0) (HUGEINT on the oracle) so
    // there is no float division and no tie for the engines to round
    // differently. Plan shape at scale: the stats frame is bounded by
    // |event_type| · 168 cells, so it BROADCASTS back onto the event
    // scan — the flag pass is map-side, and the only corpus-sized
    // shuffles are the two partial-aggregate exchanges (cell-count-sized
    // after map-side combine). A window over (type, how) would instead
    // cap parallelism at 840 keys — ~120 GB per task at 100 TB — which
    // is exactly the shape this two-scan + broadcast form avoids.
    "q157_seasonal_anomaly" -> ((s, dir) => {
      val base = eventCells(Tables(s, dir).events)
      base.join(broadcast(seasonalBaseline(base)), Seq("event_type", "how"))
        .withColumn("fl", anomalyFlag)
        .groupBy("event_type", "how")
        .agg(count(lit(1)).as("n_events"),
          sum("fl").as("n_anomalies"),
          sum(col("cents").cast(D)).cast("long").as("sum_cents"),
          max("cents").as("max_cents"))
        .orderBy("event_type", "how")
    }),

    // Exact equi-depth histogram per event type — the optimizer-grade
    // statistic q63's equi-WIDTH histogram can't give (uniform bucket
    // POPULATIONS, data-driven boundaries). The classic form is
    // ntile(B) over a global sort — a single-partition sort of the
    // whole fact, the worst plan at 100 TB. This one rides DOMAIN
    // COMPRESSION instead: cents has a bounded value domain (≤ ~56k
    // distinct), so the fact-sized pass is ONE groupBy(type, cents)
    // partial-aggregate, and the running "rows strictly below v" window
    // runs on the domain-sized frame (type × distinct-value rows, ~280k
    // at any corpus size) — the window's partition is per type, never
    // per row. Bucket of a VALUE is ((rows below)·B) div n, so ties
    // never straddle a boundary (value-based equi-depth: populations
    // equalize up to tie spill) and floor division keeps both engines
    // bit-identical. Output is B rows per type with exact populations
    // and boundary values.
    "q159_equidepth_histogram" -> ((s, dir) => {
      val B = EQUIDEPTH_BUCKETS
      val d = Tables(s, dir).events
        .select(col("event_type"),
          (dPrice(col("value")) * 100).cast("long").as("cents"))
        .groupBy("event_type", "cents").agg(count(lit(1)).as("cnt"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("event_type").orderBy("cents")
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
      val n = d.groupBy("event_type").agg(sum("cnt").as("n"))
      d.withColumn("below", coalesce(sum("cnt").over(w), lit(0L)))
        .join(broadcast(n), "event_type")
        .withColumn("bucket", expr(s"(below * $B) div n"))
        .groupBy("event_type", "bucket")
        .agg(sum("cnt").as("n_rows"),
          min("cents").as("min_cents"),
          max("cents").as("max_cents"),
          sum(col("cents").cast("decimal(38,0)") * col("cnt"))
            .cast("long").as("sum_cents"))
        .orderBy("event_type", "bucket")
    }),

    // Join-key skew profile — the diagnostic a 100 TB shop runs BEFORE
    // choosing a shuffle strategy (q117's salting, q145's slabs, AQE
    // skew thresholds all assume you know the multiplicity shape).
    // Per (event_type): exact p50/p90/p99/max key multiplicity and the
    // hottest key's row share in ppm. Same domain-compression ladder as
    // q159: the only fact-sized pass is the groupBy(type, user_id)
    // partial aggregate; the multiplicity HISTOGRAM (distinct-count
    // values per type — hundreds of rows at any corpus size) is what
    // the running window and percentile selection run on. Percentile
    // rule is the integer form p_X = min{c : cum(c)·100 ≥ X·K} — no
    // interpolation, no ties for the engines to resolve differently.
    "q160_key_skew_profile" -> ((s, dir) => {
      val km = Tables(s, dir).events
        .groupBy("event_type", "user_id").agg(count(lit(1)).as("cnt"))
      val mh = km.groupBy("event_type", "cnt").agg(count(lit(1)).as("nk"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("event_type").orderBy("cnt")
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
      val tot = mh.groupBy("event_type").agg(
        sum("nk").as("k_keys"),
        sum(col("cnt").cast(D) * col("nk")).cast("long").as("n_rows"),
        max("cnt").as("max_mult"))
      mh.withColumn("cum", sum("nk").over(w))
        .join(broadcast(tot), "event_type")
        .groupBy("event_type")
        .agg(max("n_rows").as("n_rows"),
          max("k_keys").as("n_keys"),
          max("max_mult").as("max_mult"),
          min(when(col("cum") * 2 >= col("k_keys"), col("cnt")))
            .as("p50_mult"),
          min(when(col("cum") * 10 >= col("k_keys") * 9, col("cnt")))
            .as("p90_mult"),
          min(when(col("cum") * 100 >= col("k_keys") * 99, col("cnt")))
            .as("p99_mult"))
        .withColumn("hot_ppm", expr("(max_mult * 1000000) div n_rows"))
        .orderBy("event_type")
    }),

    // Incremental snapshot diff — the q156 ∘ q155 composition that makes
    // nightly diffs cheap: compare the two versions' per-month MANIFESTS
    // first (partition-count-sized), and run the row-level fingerprint
    // diff ONLY over months whose leaf hash moved. The change batch is
    // month-localized by construction (late-arriving corrections reopen
    // one accounting period), so the manifest prunes ~all of the fact:
    // the row join's input drops from |table| to |changed months|. The
    // changed-month set is runtime data (a broadcast semi-join, not a
    // static predicate) — on month-partitioned storage this is exactly
    // the shape dynamic partition pruning turns into skipped files, and
    // it is how a 100 TB replica syncs without ever scanning the 99.9 %
    // of partitions the manifest already proved identical. Updates-only
    // batch ⇒ both snapshots hold the same key set, so the per-month
    // row join is inner and the output accounts every compared row
    // (n_rows vs n_changed) plus the exact money moved.
    "q162_incremental_diff" -> ((s, dir) => {
      val aFp = withFpM(snapAM(s, dir))
      val cFp = withFpM(snapC(s, dir))
      def manifest(f: DataFrame) =
        f.groupBy("pk").agg(h48sum(col("fp")).as("h"))
      val changed = manifest(aFp).as("ma")
        .join(manifest(cFp).as("mc"), "pk")
        .where(col("ma.h") =!= col("mc.h"))
        .select(col("pk"))
      val a = aFp.join(broadcast(changed), "pk")
        .select(col("pk"), col("key"), col("cents").as("ca"),
          col("fp").as("fpa"))
      val c = cFp.join(broadcast(changed), "pk")
        .select(col("key"), col("cents").as("cb"), col("fp").as("fpb"))
      a.join(c, "key")
        .groupBy("pk")
        .agg(count(lit(1)).as("n_rows"),
          sum(when(col("fpa") =!= col("fpb"), 1L).otherwise(0L))
            .as("n_changed"),
          sum((col("cb") - col("ca")).cast(D)).cast("long")
            .as("cents_delta"))
        .select(col("pk").as("part_key"), col("n_rows"),
          col("n_changed"), col("cents_delta"))
        .orderBy("part_key")
    }),

    // Right-to-be-forgotten cascade — the deletion a privacy request
    // forces through the star: a batch of customers (key ≡ 11 mod 53)
    // is purged, their orders with them, and the lineitems of those
    // orders transitively. Per table the report carries purge/keep
    // counts AND an order-free h48 key-sum of the SURVIVORS, so the
    // oracle pins exactly which rows remain — a count-only audit would
    // pass a cascade that deleted the wrong rows. Plan shape at scale:
    // the request batch is dimension-derived (|customer|/53), so the
    // customer and orders purges are BROADCAST anti-joins (zero fact
    // shuffle); the lineitem cascade keys off the DELETED ORDERS key
    // set, which is fact-derived and can outgrow a broadcast at 100 TB —
    // that anti-join is left as a shuffled LEFT ANTI on the distinct
    // key set (the q152 discipline), the honest cost of a transitive
    // cascade. Everything is one pass per table; no window, no sort
    // beyond the 3-row output.
    "q163_delete_propagation" -> ((s, dir) => {
      val t = Tables(s, dir)
      val del = t.customer
        .where(pmod(col("c_custkey"), lit(DEL_MOD)) === DEL_RES)
        .select(col("c_custkey").as("k"))
      val odel = t.orders.join(t.dim(del), col("o_custkey") === col("k"))
        .select(col("o_orderkey").as("ok"))
      def report(name: String, total: DataFrame, keep: DataFrame,
          keyStr: Column): DataFrame =
        keep.agg(count(lit(1)).as("n_kept"),
            h48sum(h48("dp:", keyStr)).as("kept_key_hash"))
          .crossJoin(broadcast(total.agg(count(lit(1)).as("n_total"))))
          .select(lit(name).as("table_name"), col("n_total"),
            (col("n_total") - col("n_kept")).as("n_purged"),
            col("n_kept"), col("kept_key_hash"))
      val cust = report("customer", t.customer,
        t.customer.join(t.dim(del), col("c_custkey") === col("k"),
          "left_anti"),
        col("c_custkey").cast("string"))
      val ord = report("orders", t.orders,
        t.orders.join(t.dim(del), col("o_custkey") === col("k"),
          "left_anti"),
        col("o_orderkey").cast("string"))
      val li = report("lineitem", t.lineitem,
        t.lineitem.join(odel, col("l_orderkey") === col("ok"), "left_anti"),
        concat_ws("|", col("l_orderkey"), col("l_linenumber")))
      cust.unionByName(ord).unionByName(li).orderBy("table_name")
    }),
  )

  /** q163: the privacy-request batch — every 53rd customer. */
  private[graft] val DEL_MOD = 53L
  private[graft] val DEL_RES = 11L

  /** q159: bucket count — small enough that every bucket is populated
    * at sf0.001, large enough that equi-depth differs visibly from
    * q63's equi-width on the exponential-ish value distribution. */
  private[graft] val EQUIDEPTH_BUCKETS = 10

  /** The oracle's twin of [[snapA]]/[[snapB]]/[[withFp]] as CTE text —
    * one definition string so the derivation rules cannot drift between
    * q155 and any future consumer. */
  private val SNAP_CTES =
    """a AS (
      | SELECT o_orderkey AS key, o_custkey AS custkey,
      |  o_orderstatus AS status,
      |  CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT) AS cents,
      |  o_orderpriority AS priority, epoch_us(o_orderdate) AS dat_us
      | FROM orders),
      |b AS (
      | SELECT key, custkey,
      |  CASE WHEN key % 97 = 3 THEN 'R' ELSE status END AS status,
      |  CASE WHEN key % 97 = 3 THEN cents + 500 ELSE cents END AS cents,
      |  priority, dat_us
      | FROM a WHERE key % 101 <> 7
      | UNION ALL
      | SELECT -(key + 1), custkey, 'N', cents, priority, dat_us
      | FROM a WHERE key % 103 = 0),
      |fa AS (
      | SELECT key, priority, cents,
      |  CAST('0x' || substr(md5('sd:' || CAST(key AS VARCHAR) || '|' ||
      |    status || '|' || CAST(cents AS VARCHAR) || '|' || priority ||
      |    '|' || CAST(custkey AS VARCHAR) || '|' ||
      |    CAST(dat_us AS VARCHAR)), 1, 12) AS BIGINT) AS fp
      | FROM a),
      |fb AS (
      | SELECT key, priority, cents,
      |  CAST('0x' || substr(md5('sd:' || CAST(key AS VARCHAR) || '|' ||
      |    status || '|' || CAST(cents AS VARCHAR) || '|' || priority ||
      |    '|' || CAST(custkey AS VARCHAR) || '|' ||
      |    CAST(dat_us AS VARCHAR)), 1, 12) AS BIGINT) AS fp
      | FROM b)""".stripMargin

  def oracles: Map[String, String] = Map(

    "q155_snapshot_diff" ->
      s"""WITH $SNAP_CTES,
         |j AS (
         | SELECT fa.key AS ka, fb.key AS kb, fa.priority AS pa,
         |  fb.priority AS pb, fa.cents AS ca, fb.cents AS cb,
         |  fa.fp AS fpa, fb.fp AS fpb
         | FROM fa FULL OUTER JOIN fb ON fa.key = fb.key),
         |c AS (
         | SELECT CASE WHEN ka IS NULL THEN 'added'
         |             WHEN kb IS NULL THEN 'removed'
         |             WHEN fpa = fpb THEN 'unchanged'
         |             ELSE 'changed' END AS change_type,
         |  COALESCE(pb, pa) AS priority, COALESCE(ka, kb) AS key,
         |  COALESCE(cb, 0) - COALESCE(ca, 0) AS cd
         | FROM j)
         |SELECT change_type, priority, COUNT(*) AS n_rows,
         | CAST(SUM(CAST('0x' || substr(md5('sd:' || CAST(key AS VARCHAR)),
         |   1, 12) AS BIGINT)) % 281474976710656 AS BIGINT) AS key_hash_sum,
         | CAST(SUM(cd) AS BIGINT) AS cents_delta
         |FROM c GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "q156_partition_manifest" ->
      """WITH rows_ AS (
        | SELECT (year(o_orderdate) * 100 + month(o_orderdate)) AS part_key,
        |  CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT) AS cents,
        |  CAST('0x' || substr(md5('mk:' || CAST(o_orderkey AS VARCHAR) ||
        |    '|' || o_orderstatus || '|' ||
        |    CAST(CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT)
        |      AS VARCHAR) || '|' || o_orderpriority || '|' ||
        |    CAST(o_custkey AS VARCHAR) || '|' ||
        |    CAST(epoch_us(o_orderdate) AS VARCHAR)), 1, 12)
        |   AS BIGINT) AS rh
        | FROM orders),
        |leaf AS (
        | SELECT part_key, COUNT(*) AS n_rows,
        |  CAST(SUM(rh) % 281474976710656 AS BIGINT) AS content_hash,
        |  CAST(SUM(cents) AS BIGINT) AS sum_cents
        | FROM rows_ GROUP BY part_key)
        |SELECT 'leaf' AS level, part_key, n_rows, content_hash, sum_cents
        |FROM leaf
        |UNION ALL
        |SELECT 'root', -1, CAST(SUM(n_rows) AS BIGINT),
        | CAST(SUM(content_hash) % 281474976710656 AS BIGINT),
        | CAST(SUM(sum_cents) AS BIGINT)
        |FROM leaf
        |ORDER BY level, part_key""".stripMargin,

    "q157_seasonal_anomaly" ->
      """WITH base AS (
        | SELECT event_type, (epoch_us(ts) // 3600000000) % 168 AS how,
        |  CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT) AS cents
        | FROM events),
        |st AS (
        | SELECT event_type, how, COUNT(*) AS n,
        |  SUM(CAST(cents AS HUGEINT)) AS s,
        |  SUM(CAST(cents AS HUGEINT) * cents) AS q
        | FROM base GROUP BY 1, 2),
        |fl AS (
        | SELECT b.event_type, b.how, b.cents,
        |  CASE WHEN (CAST(st.n AS HUGEINT) * b.cents - st.s) *
        |            (CAST(st.n AS HUGEINT) * b.cents - st.s)
        |          > 9 * (st.n * st.q - st.s * st.s)
        |       THEN 1 ELSE 0 END AS fl
        | FROM base b JOIN st USING (event_type, how))
        |SELECT event_type, how, COUNT(*) AS n_events,
        | CAST(SUM(fl) AS BIGINT) AS n_anomalies,
        | CAST(SUM(cents) AS BIGINT) AS sum_cents,
        | MAX(cents) AS max_cents
        |FROM fl GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "q159_equidepth_histogram" ->
      s"""WITH base AS (
         | SELECT event_type,
         |  CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT) AS cents
         | FROM events),
         |d AS (
         | SELECT event_type, cents, COUNT(*) AS cnt
         | FROM base GROUP BY 1, 2),
         |n AS (SELECT event_type, COUNT(*) AS n FROM base GROUP BY 1),
         |c AS (
         | SELECT event_type, cents, cnt,
         |  COALESCE(SUM(cnt) OVER (PARTITION BY event_type ORDER BY cents
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS below
         | FROM d),
         |b AS (
         | SELECT c.event_type, cents, cnt,
         |  CAST((below * $EQUIDEPTH_BUCKETS) // n AS BIGINT) AS bucket
         | FROM c JOIN n USING (event_type))
         |SELECT event_type, bucket, CAST(SUM(cnt) AS BIGINT) AS n_rows,
         | MIN(cents) AS min_cents, MAX(cents) AS max_cents,
         | CAST(SUM(CAST(cents AS HUGEINT) * cnt) AS BIGINT) AS sum_cents
         |FROM b GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "q160_key_skew_profile" ->
      """WITH km AS (
        | SELECT event_type, user_id, COUNT(*) AS cnt
        | FROM events GROUP BY 1, 2),
        |mh AS (
        | SELECT event_type, cnt, COUNT(*) AS nk FROM km GROUP BY 1, 2),
        |c AS (
        | SELECT event_type, cnt, nk,
        |  SUM(nk) OVER (PARTITION BY event_type ORDER BY cnt
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        | FROM mh),
        |tot AS (
        | SELECT event_type, CAST(SUM(nk) AS BIGINT) AS k_keys,
        |  CAST(SUM(CAST(cnt AS HUGEINT) * nk) AS BIGINT) AS n_rows,
        |  MAX(cnt) AS max_mult
        | FROM mh GROUP BY 1)
        |SELECT event_type, MAX(n_rows) AS n_rows, MAX(k_keys) AS n_keys,
        | MAX(max_mult) AS max_mult,
        | MIN(CASE WHEN cum * 2 >= k_keys THEN cnt END) AS p50_mult,
        | MIN(CASE WHEN cum * 10 >= k_keys * 9 THEN cnt END) AS p90_mult,
        | MIN(CASE WHEN cum * 100 >= k_keys * 99 THEN cnt END) AS p99_mult,
        | CAST((MAX(max_mult) * 1000000) // MAX(n_rows) AS BIGINT)
        |  AS hot_ppm
        |FROM c JOIN tot USING (event_type)
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q162_incremental_diff" ->
      s"""WITH a AS (
         | SELECT o_orderkey AS key, o_custkey AS custkey,
         |  o_orderstatus AS status,
         |  CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT) AS cents,
         |  o_orderpriority AS priority, epoch_us(o_orderdate) AS dat_us,
         |  (year(o_orderdate) * 100 + month(o_orderdate)) AS pk
         | FROM orders),
         |c AS (
         | SELECT key, custkey,
         |  CASE WHEN pk = $HOT_MONTH AND key % $HOT_MOD = 3
         |       THEN 'C' ELSE status END AS status,
         |  CASE WHEN pk = $HOT_MONTH AND key % $HOT_MOD = 3
         |       THEN cents + 500 ELSE cents END AS cents,
         |  priority, dat_us, pk
         | FROM a),
         |fa AS (
         | SELECT key, pk, cents,
         |  CAST('0x' || substr(md5('id:' || CAST(key AS VARCHAR) || '|' ||
         |    status || '|' || CAST(cents AS VARCHAR) || '|' || priority ||
         |    '|' || CAST(custkey AS VARCHAR) || '|' ||
         |    CAST(dat_us AS VARCHAR)), 1, 12) AS BIGINT) AS fp
         | FROM a),
         |fc AS (
         | SELECT key, pk, cents,
         |  CAST('0x' || substr(md5('id:' || CAST(key AS VARCHAR) || '|' ||
         |    status || '|' || CAST(cents AS VARCHAR) || '|' || priority ||
         |    '|' || CAST(custkey AS VARCHAR) || '|' ||
         |    CAST(dat_us AS VARCHAR)), 1, 12) AS BIGINT) AS fp
         | FROM c),
         |ma AS (
         | SELECT pk, CAST(SUM(fp) % 281474976710656 AS BIGINT) AS h
         | FROM fa GROUP BY pk),
         |mc AS (
         | SELECT pk, CAST(SUM(fp) % 281474976710656 AS BIGINT) AS h
         | FROM fc GROUP BY pk),
         |ch AS (
         | SELECT pk FROM ma JOIN mc USING (pk) WHERE ma.h <> mc.h)
         |SELECT fa.pk AS part_key, COUNT(*) AS n_rows,
         | CAST(SUM(CASE WHEN fa.fp <> fc.fp THEN 1 ELSE 0 END) AS BIGINT)
         |  AS n_changed,
         | CAST(SUM(fc.cents - fa.cents) AS BIGINT) AS cents_delta
         |FROM fa JOIN fc USING (key) JOIN ch ON fa.pk = ch.pk
         |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q163_delete_propagation" ->
      s"""WITH del AS (
         | SELECT c_custkey AS k FROM customer
         | WHERE c_custkey % $DEL_MOD = $DEL_RES),
         |odel AS (
         | SELECT o_orderkey AS ok FROM orders
         | JOIN del ON o_custkey = k),
         |ck AS (
         | SELECT c_custkey FROM customer
         | WHERE NOT EXISTS (SELECT 1 FROM del WHERE k = c_custkey)),
         |ok_ AS (
         | SELECT o_orderkey FROM orders
         | WHERE NOT EXISTS (SELECT 1 FROM del WHERE k = o_custkey)),
         |lk AS (
         | SELECT l_orderkey, l_linenumber FROM lineitem
         | WHERE NOT EXISTS (SELECT 1 FROM odel WHERE ok = l_orderkey))
         |SELECT 'customer' AS table_name,
         | (SELECT COUNT(*) FROM customer) AS n_total,
         | (SELECT COUNT(*) FROM customer) - COUNT(*) AS n_purged,
         | COUNT(*) AS n_kept,
         | CAST(SUM(CAST('0x' || substr(md5('dp:' ||
         |   CAST(c_custkey AS VARCHAR)), 1, 12) AS BIGINT))
         |  % 281474976710656 AS BIGINT) AS kept_key_hash
         |FROM ck
         |UNION ALL
         |SELECT 'lineitem',
         | (SELECT COUNT(*) FROM lineitem),
         | (SELECT COUNT(*) FROM lineitem) - COUNT(*), COUNT(*),
         | CAST(SUM(CAST('0x' || substr(md5('dp:' ||
         |   CAST(l_orderkey AS VARCHAR) || '|' ||
         |   CAST(l_linenumber AS VARCHAR)), 1, 12) AS BIGINT))
         |  % 281474976710656 AS BIGINT)
         |FROM lk
         |UNION ALL
         |SELECT 'orders',
         | (SELECT COUNT(*) FROM orders),
         | (SELECT COUNT(*) FROM orders) - COUNT(*), COUNT(*),
         | CAST(SUM(CAST('0x' || substr(md5('dp:' ||
         |   CAST(o_orderkey AS VARCHAR)), 1, 12) AS BIGINT))
         |  % 281474976710656 AS BIGINT)
         |FROM ok_
         |ORDER BY table_name""".stripMargin,
  )
}
