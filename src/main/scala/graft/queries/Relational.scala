package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.model.Tables

/** Core relational surface (SURVEY §2.3 J6, §2.4 A8, §2.5 W4, §2.6–2.8).
  *
  * Determinism rules (SURVEY §7.6.1): every query ends in an ORDER BY on a
  * unique key; money arithmetic runs in exact DECIMAL and is cast to DOUBLE
  * only at the output boundary, so Spark and the DuckDB oracle agree
  * bit-for-bit regardless of summation order; computed integers are cast to
  * BIGINT to match DuckDB's output types.
  *
  * Scale notes: star joins broadcast every dimension side (region/nation/
  * customer/supplier/part stay small relative to facts at any SF); the only
  * shuffles are the fact-side aggregations, which do map-side partial
  * aggregation for free. Filters are literal predicates that push down to
  * the parquet scan (verified via explain: PushedFilters).
  */
object Relational {

  // Money-exactness boundary: see the shared Exact object for the
  // decimal-width and double-cast rationale.
  private def dPrice(c: Column) = Exact.dPrice(c)
  private def dFrac(c: Column)  = Exact.dFrac(c)
  private def asD(c: Column)    = Exact.asD(c)

  /** Fixed lang domain of the documents table (stable across every SF —
    * pivot needs an explicit value list for a deterministic schema; an
    * inferred list would be a driver-side distinct scan anyway). Must
    * match the q95/q96 oracles' column/VALUES lists. */
  private val LANGS = Seq("de", "en", "es", "fr", "zh")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Pivot — long→wide reshape (the numpy grid ↔ long-form duality the
    // poster recast exercises daily, as a first-class relational op).
    // Explicit value list ⇒ no extra distinct job and a static schema;
    // the pivot itself is one partial-agg shuffle keyed by source.
    "q95_pivot_reshape" -> ((s, dir) => {
      val p = Tables(s, dir).documents
        .groupBy("source").pivot("lang", LANGS).agg(count(lit(1)))
      p.select(col("source") +:
        LANGS.map(l => coalesce(col(l), lit(0L)).as(s"n_$l")): _*)
        .orderBy("source")
    }),

    // Unpivot — the inverse reshape via stack(): wide back to long with
    // zero-combos retained, proving the round trip is lossless. Runs on
    // top of the q95 frame, so the pair shares one plan shape.
    "q96_unpivot_reshape" -> ((s, dir) => {
      val wide = queries("q95_pivot_reshape")(s, dir)
      val stackExpr = "stack(" + LANGS.length + ", " +
        LANGS.map(l => s"'$l', n_$l").mkString(", ") + ") as (lang, n)"
      wide.select(col("source"), expr(stackExpr))
        .orderBy("source", "lang")
    }),

    "q01_pricing_summary" -> ((s, dir) => {
      val l = Tables(s, dir).lineitem
        .where(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
      l.groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          asD(sum(dPrice(col("l_quantity")))).as("sum_qty"),
          asD(sum(dPrice(col("l_extendedprice")))).as("sum_base_price"),
          asD(sum(dPrice(col("l_extendedprice")) * dFrac(lit(1.0) - col("l_discount"))))
            .as("sum_disc_price"),
          asD(sum(dPrice(col("l_extendedprice")) * dFrac(lit(1.0) - col("l_discount"))
            * dFrac(lit(1.0) + col("l_tax")))).as("sum_charge"),
          round(asD(sum(dPrice(col("l_quantity")))) / count(lit(1)), 6).as("avg_qty"),
          round(asD(sum(dPrice(col("l_extendedprice")))) / count(lit(1)), 6).as("avg_price"),
          round(asD(sum(dFrac(col("l_discount")))) / count(lit(1)), 6).as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    }),

    "q02_star_revenue" -> ((s, dir) => {
      val t = Tables(s, dir)
      // Star join: fact lineitem → orders, then broadcast all dims so the
      // fact side never shuffles on a dimension key (SURVEY §2.3 J6).
      t.lineitem
        .join(t.orders, col("l_orderkey") === col("o_orderkey"))
        .join(t.dim(t.customer), col("o_custkey") === col("c_custkey"))
        .join(t.dim(t.nation), col("c_nationkey") === col("n_nationkey"))
        .join(t.dim(t.region), col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("r_name"), col("n_name"))
        .agg(
          asD(sum(dPrice(col("l_extendedprice")) * dFrac(lit(1.0) - col("l_discount"))))
            .as("revenue"),
          countDistinct(col("o_custkey")).as("n_customers"),
          count(lit(1)).as("n_lineitems"))
        .orderBy(col("r_name"), col("n_name"))
    }),

    // A8 histogram: fixed-width price buckets over lineitem — the
    // explicit floor((v-lo)/step) form (not width_bucket) so both
    // engines share the identical arithmetic. Output bounded at NB rows.
    "q63_histogram" -> ((s, dir) => {
      val lo = 900.0; val hi = 105000.0; val nb = 20
      val step = (hi - lo) / nb
      val b = least(greatest(
        floor((col("l_extendedprice") - lo) / step), lit(0.0)),
        lit((nb - 1).toDouble)).cast("long")
      Tables(s, dir).lineitem
        .select(b.as("bucket"))
        .groupBy("bucket")
        .agg(count(lit(1)).as("n"))
        .orderBy("bucket")
    }),

    // A8 statistical moments: per-flag correlation / covariance / spread
    // of quantity vs extended price — the column-profiling aggregates a
    // pipeline health-check reports. All are one-pass (map-side partial)
    // aggregates; rounded to 6 before compare (summation-order noise).
    "q64_stats_moments" -> ((s, dir) => {
      Tables(s, dir).lineitem
        .groupBy("l_returnflag")
        .agg(count(lit(1)).as("n"),
          round(corr(col("l_quantity"), col("l_extendedprice")), 6)
            .as("corr_qty_price"),
          round(covar_samp(col("l_quantity"), col("l_extendedprice")), 6)
            .as("covar_qty_price"),
          round(stddev_samp(col("l_extendedprice")), 6).as("sd_price"),
          round(var_samp(col("l_quantity")), 6).as("var_qty"))
        .orderBy("l_returnflag")
    }),

    "q03_topk_orders" -> ((s, dir) => {
      val t = Tables(s, dir)
      // Global top-k: orderBy+limit plans TakeOrderedAndProject — no full
      // sort materializes; per-partition heaps feed a single driver merge.
      t.lineitem
        .groupBy(col("l_orderkey"))
        .agg(asD(sum(dPrice(col("l_extendedprice")) * dFrac(lit(1.0) - col("l_discount"))))
          .as("revenue"))
        .join(t.orders, col("l_orderkey") === col("o_orderkey"))
        .select(col("o_orderkey"), col("o_orderdate"), col("o_orderpriority"), col("revenue"))
        .orderBy(col("revenue").desc, col("o_orderkey"))
        .limit(10)
    }),

    "q04_semi_join" -> ((s, dir) => {
      val t = Tables(s, dir)
      // EXISTS → LEFT SEMI: no fan-out, only the probe side survives.
      t.customer
        .join(t.orders.where(col("o_orderstatus") === "F"),
          col("c_custkey") === col("o_custkey"), "left_semi")
        .select(col("c_custkey"), col("c_name"), col("c_mktsegment"))
        .orderBy(col("c_custkey"))
    }),

    "q05_anti_join" -> ((s, dir) => {
      val t = Tables(s, dir)
      // NOT EXISTS → LEFT ANTI.
      t.customer
        .join(t.orders, col("c_custkey") === col("o_custkey"), "left_anti")
        .select(col("c_custkey"), col("c_name"), col("c_acctbal"))
        .orderBy(col("c_custkey"))
    }),

    "q06_revenue_forecast" -> ((s, dir) => {
      // TPC-H Q6 shape: pure scan+filter+agg; all predicates push to parquet.
      Tables(s, dir).lineitem
        .where(col("l_shipdate") >= lit("1996-01-01").cast("timestamp")
          && col("l_shipdate") < lit("1997-01-01").cast("timestamp")
          && col("l_discount").between(0.05, 0.07)
          && col("l_quantity") < 24)
        .agg(
          asD(sum(dPrice(col("l_extendedprice")) * dFrac(col("l_discount")))).as("promo_revenue"),
          count(lit(1)).as("n_rows"))
    }),

    "q07_rollup" -> ((s, dir) => {
      // grouping() (not coalesce) labels subtotal rows, so genuine NULL data
      // values can never be conflated with subtotals.
      Tables(s, dir).lineitem
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(
          // grouping() is only valid inside the Aggregate operator, so the
          // subtotal labels are computed here, not in a downstream select.
          when(grouping(col("l_returnflag")) === 1, lit("ALL"))
            .otherwise(col("l_returnflag")).as("rf"),
          when(grouping(col("l_linestatus")) === 1, lit("ALL"))
            .otherwise(col("l_linestatus")).as("ls"),
          count(lit(1)).as("n"),
          asD(sum(dPrice(col("l_quantity")))).as("sum_qty"))
        .select(col("rf"), col("ls"), col("n"), col("sum_qty"))
        // Explicit NULLS LAST on both sides: Spark's asc default is NULLS
        // FIRST, DuckDB's is NULLS LAST — only bites if group keys ever
        // hold genuine NULLs, but pin it so the row order can't diverge.
        .orderBy(col("rf").asc_nulls_last, col("ls").asc_nulls_last)
    }),

    "q08_cube" -> ((s, dir) => {
      Tables(s, dir).orders
        .cube(col("o_orderstatus"), col("o_orderpriority"))
        .agg(
          when(grouping(col("o_orderstatus")) === 1, lit("ALL"))
            .otherwise(col("o_orderstatus")).as("status"),
          when(grouping(col("o_orderpriority")) === 1, lit("ALL"))
            .otherwise(col("o_orderpriority")).as("priority"),
          count(lit(1)).as("n"),
          asD(sum(dPrice(col("o_totalprice")))).as("sum_price"))
        .select(col("status"), col("priority"), col("n"), col("sum_price"))
        .orderBy(col("status").asc_nulls_last, col("priority").asc_nulls_last)
    }),

    "q09_window_topk" -> ((s, dir) => {
      // Per-group top-k: rank inside the group, filter — the canonical W4.
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      Tables(s, dir).orders
        .withColumn("rnk", row_number().over(w).cast("long"))
        .where(col("rnk") <= 3)
        .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"), col("rnk"))
        .orderBy(col("o_custkey"), col("rnk"))
    }),

    "q10_running_spend" -> ((s, dir) => {
      // Running sum + lag per customer, but the OUTPUT is bounded: one final
      // row per customer (latest order), so the declared result grows with
      // |customers|, never with |orders| — a full-fact-table ORDER BY +
      // full-table emit would be a scale-killer at 100 TB.
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate"), col("o_orderkey"))
      val wDesc = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate").desc, col("o_orderkey").desc)
      Tables(s, dir).orders
        .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"),
          asD(sum(dPrice(col("o_totalprice"))).over(w)).as("lifetime_spend"),
          lag(col("o_totalprice"), 1).over(w).as("prev_price"),
          count(lit(1)).over(w).as("n_orders"),
          row_number().over(wDesc).as("rn"))
        .where(col("rn") === 1)
        .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"),
          col("lifetime_spend"), col("prev_price"), col("n_orders"))
        .orderBy(col("o_custkey"))
    }),

    "q11_event_summary" -> ((s, dir) => {
      Tables(s, dir).events
        .groupBy(col("event_type"))
        .agg(
          countDistinct(col("user_id")).as("n_users"),
          count(lit(1)).as("n_events"),
          asD(sum(dPrice(col("value")))).as("total_value"))
        .orderBy(col("event_type"))
    }),

    "q12_set_ops" -> ((s, dir) => {
      val c = Tables(s, dir).customer
      val a = c.where(col("c_mktsegment") === "FURNITURE").select(col("c_custkey"))
      val b = c.where(col("c_mktsegment") === "BUILDING").select(col("c_custkey"))
      val pos = c.where(col("c_acctbal") > 1000).select(col("c_custkey"))
      val low = c.where(col("c_acctbal") < 2000).select(col("c_custkey"))
      a.union(b).distinct()            // UNION (set semantics)
        .intersect(pos)                // INTERSECT DISTINCT
        .except(low)                   // EXCEPT DISTINCT
        .orderBy(col("c_custkey"))
    }),

    // CDC upsert compaction + SCD2 history (the warehouse-maintenance
    // operator a 100 TB lakehouse runs nightly: MERGE INTO expressed as
    // union-of-batches + one per-key window). The change stream is derived
    // DETERMINISTICALLY from `orders` itself — batch v1 lands every key,
    // v2 re-lands keys ≡ 0 (mod 3) with a 10 % price revision, v3 re-lands
    // keys ≡ 0 (mod 9) compounding it — so both engines construct the
    // identical CDC log without any fixture. The SCD2 rewrite is ONE
    // key-partitioned window (lead over version): valid_from/valid_to
    // interval chaining plus the is_current flag, which is exactly the
    // keep-latest compaction a MERGE would materialize (is_current = the
    // row `row_number() over (key, version desc) = 1` would keep). Plan
    // shape at scale: the union is map-side concatenation (no shuffle);
    // the single shuffle is the per-key window — bucketing the history
    // table by the merge key amortizes it across nightly runs. Price
    // revisions run in exact DECIMAL (price × factor at scale 6) and cast
    // to DOUBLE only at the output boundary — the standard money rule.
    "q103_scd2_history" -> ((s, dir) => {
      val o = Tables(s, dir).orders
        .select(col("o_orderkey"), col("o_totalprice"))
      def batch(ver: Int, modBase: Int, factor: String) = {
        val keep = if (modBase == 1) o
                   else o.where(pmod(col("o_orderkey"), lit(modBase)) === 0)
        keep.select(col("o_orderkey"), lit(ver.toLong).as("version"),
          asD(dPrice(col("o_totalprice")) * dFrac(lit(factor))).as("price"))
      }
      val chg = batch(1, 1, "1.0")
        .unionByName(batch(2, 3, "1.10"))
        .unionByName(batch(3, 9, "1.21"))
      val w = Window.partitionBy("o_orderkey").orderBy("version")
      chg
        .withColumn("valid_to", lead(col("version"), 1).over(w))
        .select(col("o_orderkey"), col("version").as("valid_from"),
          col("price"), col("valid_to"),
          col("valid_to").isNull.cast("long").as("is_current"))
        .orderBy("o_orderkey", "valid_from")
    }),

    // Correlated SCALAR subquery (TPC-H Q17 shape; VERDICT r8 #2 — the
    // last classic relational form absent from the catalog): revenue of
    // "small-quantity" lineitems, where small means below 20 % of THAT
    // part's own average quantity. Written as SQL so Catalyst's
    // decorrelation is what's under test: RewriteCorrelatedScalarSubquery
    // turns the per-row subquery into ONE aggregate over lineitem grouped
    // by l_partkey joined back to the fact — no per-row re-execution, two
    // shuffles total on the same key (verified in PLANS.md round 9: the
    // physical plan is Aggregate→Join, zero Subquery nodes). AVG stays
    // cross-engine exact because l_quantity is integral and |group| sums
    // stay far below 2^53. Money in exact DECIMAL, cast at the boundary.
    "q144_correlated_subquery" -> ((s, dir) => {
      val t = Tables(s, dir)
      t.lineitem.createOrReplaceTempView("lineitem_q144")
      t.part.createOrReplaceTempView("part_q144")
      s.sql(
        """SELECT p_brand,
          | CAST(CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)))
          |   AS DECIMAL(38,6)) AS STRING) AS DOUBLE) AS small_qty_revenue,
          | COUNT(*) AS n_lineitems,
          | COUNT(DISTINCT p_partkey) AS n_parts
          |FROM lineitem_q144 JOIN part_q144 ON l_partkey = p_partkey
          |WHERE l_quantity < (SELECT CAST(0.2 AS DOUBLE) * AVG(l2.l_quantity)
          |                    FROM lineitem_q144 l2
          |                    WHERE l2.l_partkey = p_partkey)
          |GROUP BY p_brand ORDER BY p_brand""".stripMargin)
    }),

    // Referential-integrity audit over the star's seven FK edges — the
    // data-quality gate a warehouse runs before trusting a join. Per
    // edge: child row/null/distinct-key counts, orphan keys (child keys
    // with no parent — LEFT ANTI on the DISTINCT key set, never on raw
    // fact rows), and childless parents (the reverse anti-join: parts
    // never ordered, customers who never bought). Every per-edge
    // subtree prunes its scan to the ONE key column (lineitem appears
    // on three edges = three single-column scans, not three full-width
    // reads), anti-joins run against deduped keys sized |key domain|,
    // and the 7 one-row aggregates cross-join into the summary — a
    // constant-size frame regardless of SF.
    "q152_fk_audit" -> ((s, dir) => {
      val t = Tables(s, dir)
      val tabs = Map("lineitem" -> t.lineitem, "orders" -> t.orders,
        "customer" -> t.customer, "supplier" -> t.supplier,
        "nation" -> t.nation, "part" -> t.part, "region" -> t.region)
      FK_EDGES.map { case (nm, c, ck, p, pk) =>
        val child = tabs(c).select(col(ck).as("k"))
        val dk = child.where(col("k").isNotNull).distinct()
        val parent = tabs(p).select(col(pk).as("k"))
        val base = child.agg(count(lit(1)).as("n_child"),
          count(col("k")).as("n_nonnull"))
        val nd = dk.agg(count(lit(1)).as("n_distinct"))
        val orph = dk.join(parent, Seq("k"), "left_anti")
          .agg(count(lit(1)).as("n_orphan_keys"))
        val childless = parent.join(dk, Seq("k"), "left_anti")
          .agg(count(lit(1)).as("n_childless_parents"))
        base.crossJoin(nd).crossJoin(orph).crossJoin(childless)
          .select(lit(nm).as("fk"), col("n_child"),
            (col("n_child") - col("n_nonnull")).as("n_null"),
            col("n_distinct"), col("n_orphan_keys"),
            col("n_childless_parents"))
      }.reduce(_ unionByName _).orderBy("fk")
    }),

    // Per-segment trend detection: exact OLS of monthly gross revenue
    // per nation — the "is this segment growing" regression the global
    // q06 aggregate can't answer. All regression sums are exact
    // integers (revenue in cents via the DECIMAL money path, month
    // index x = year·12 + month), accumulated in DECIMAL(38,0);
    // slope = (nΣxy − ΣxΣy)/(nΣx² − (Σx)²) and intercept =
    // (ΣyΣx² − ΣxΣxy)/same den are each ONE division of exact digit
    // strings at the boundary (the q161 discipline — OLS needs no
    // sqrt, so nothing else leaves integer space). Plan: the only
    // fact-sized work is orders ⋈ broadcast(customer⋈nation) folding
    // straight into a partial-aggregated groupBy(nation, month); the
    // regression runs on the months-per-nation frame (≤ ~80 rows ×
    // 25 nations at ANY corpus size). den = 0 (a nation with ONE
    // active month) yields NULL slope, not a fabricated 0.
    "q171_revenue_trend" -> ((s, dir) => {
      val D = "decimal(38,0)"
      val t = Tables(s, dir)
      val mo = t.orders
        .join(broadcast(t.customer
          .select(col("c_custkey"), col("c_nationkey"))
          .join(broadcast(t.nation
            .select(col("n_nationkey"), col("n_name"))),
            col("c_nationkey") === col("n_nationkey"))),
          col("o_custkey") === col("c_custkey"))
        .groupBy(col("n_name").as("nation"),
          (year(col("o_orderdate")) * 12 + month(col("o_orderdate")))
            .cast("long").as("x"))
        .agg(sum((dPrice(col("o_totalprice")) * 100).cast(D)).as("y"))
      val sums = mo.groupBy("nation").agg(
        count(lit(1)).as("n_months"),
        sum(col("x").cast(D)).as("sx"),
        sum(col("y")).as("sy"),
        sum(col("x").cast(D) * col("y")).as("sxy"),
        sum(col("x").cast(D) * col("x")).as("sxx"))
      val den = col("n_months").cast(D) * col("sxx") - col("sx") * col("sx")
      sums.select(col("nation"), col("n_months"),
          when(den > 0, asD(col("n_months").cast(D) * col("sxy")
              - col("sx") * col("sy")) / asD(den)).as("slope_cents"),
          when(den > 0, asD(col("sy") * col("sxx")
              - col("sx") * col("sxy")) / asD(den)).as("intercept_cents"))
        .orderBy("nation")
    }),
  )

  /** q152: the star's FK edges — (edge label, child table, child key,
    * parent table, parent key). Shared by the Spark audit and the
    * generated oracle so the two sides cannot drift. */
  private[graft] val FK_EDGES = Seq(
    ("customer.c_nationkey -> nation", "customer", "c_nationkey",
      "nation", "n_nationkey"),
    ("lineitem.l_orderkey -> orders", "lineitem", "l_orderkey",
      "orders", "o_orderkey"),
    ("lineitem.l_partkey -> part", "lineitem", "l_partkey",
      "part", "p_partkey"),
    ("lineitem.l_suppkey -> supplier", "lineitem", "l_suppkey",
      "supplier", "s_suppkey"),
    ("nation.n_regionkey -> region", "nation", "n_regionkey",
      "region", "r_regionkey"),
    ("orders.o_custkey -> customer", "orders", "o_custkey",
      "customer", "c_custkey"),
    ("supplier.s_nationkey -> nation", "supplier", "s_nationkey",
      "nation", "n_nationkey"),
  )

  // DuckDB dialect of each query, value-identical by construction.
  def oracles: Map[String, String] = Map(
    // generated from the SAME FK_EDGES list as the Spark side
    "q152_fk_audit" -> (FK_EDGES.map { case (nm, c, ck, p, pk) =>
      s"""SELECT '$nm' AS fk,
         | (SELECT COUNT(*) FROM $c) AS n_child,
         | (SELECT COUNT(*) FROM $c WHERE $ck IS NULL) AS n_null,
         | (SELECT COUNT(DISTINCT $ck) FROM $c) AS n_distinct,
         | (SELECT COUNT(*) FROM
         |   (SELECT DISTINCT $ck AS k FROM $c WHERE $ck IS NOT NULL) d
         |  WHERE NOT EXISTS (SELECT 1 FROM $p WHERE $pk = d.k))
         |  AS n_orphan_keys,
         | (SELECT COUNT(*) FROM $p WHERE NOT EXISTS
         |   (SELECT 1 FROM $c WHERE $c.$ck = $p.$pk))
         |  AS n_childless_parents""".stripMargin
    }.mkString("\nUNION ALL\n") + "\nORDER BY fk"),

    "q95_pivot_reshape" ->
      s"""SELECT source,
         |${LANGS.map(l =>
             s" CAST(SUM(CASE WHEN lang='$l' THEN 1 ELSE 0 END) AS BIGINT) AS n_$l")
           .mkString(",\n")}
         |FROM documents GROUP BY source ORDER BY source""".stripMargin,

    "q96_unpivot_reshape" ->
      s"""WITH l(lang) AS (VALUES ${LANGS.map(l => s"('$l')").mkString(", ")}),
         |s AS (SELECT DISTINCT source FROM documents),
         |c AS (SELECT source, lang, COUNT(*) AS n FROM documents
         |      GROUP BY source, lang)
         |SELECT s.source, l.lang, CAST(COALESCE(c.n, 0) AS BIGINT) AS n
         |FROM s CROSS JOIN l
         |LEFT JOIN c ON c.source = s.source AND c.lang = l.lang
         |ORDER BY s.source, l.lang""".stripMargin,

    "q63_histogram" ->
      """SELECT CAST(LEAST(GREATEST(
        |   FLOOR((l_extendedprice - 900.0) / ((105000.0 - 900.0) / 20)),
        |   0.0), 19.0) AS BIGINT) AS bucket,
        | COUNT(*) AS n
        |FROM lineitem GROUP BY bucket ORDER BY bucket""".stripMargin,

    "q64_stats_moments" ->
      """SELECT l_returnflag, COUNT(*) AS n,
        | ROUND(corr(l_quantity, l_extendedprice), 6) AS corr_qty_price,
        | ROUND(covar_samp(l_quantity, l_extendedprice), 6) AS covar_qty_price,
        | ROUND(stddev_samp(l_extendedprice), 6) AS sd_price,
        | ROUND(var_samp(l_quantity), 6) AS var_qty
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "q01_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        | CAST(CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DECIMAL(38,6)) AS VARCHAR) AS DOUBLE) AS sum_qty,
        | CAST(CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DECIMAL(38,6)) AS VARCHAR) AS DOUBLE) AS sum_base_price,
        | CAST(CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1.0 - l_discount AS DECIMAL(6,4))) AS DECIMAL(38,6)) AS VARCHAR) AS DOUBLE) AS sum_disc_price,
        | CAST(CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1.0 - l_discount AS DECIMAL(6,4)) * CAST(1.0 + l_tax AS DECIMAL(6,4))) AS DECIMAL(38,6)) AS VARCHAR) AS DOUBLE) AS sum_charge,
        | ROUND(CAST(CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DECIMAL(38,6)) AS VARCHAR) AS DOUBLE) / COUNT(*), 6) AS avg_qty,
        | ROUND(CAST(CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DECIMAL(38,6)) AS VARCHAR) AS DOUBLE) / COUNT(*), 6) AS avg_price,
        | ROUND(CAST(CAST(CAST(SUM(CAST(l_discount AS DECIMAL(6,4))) AS DECIMAL(38,6)) AS VARCHAR) AS DOUBLE) / COUNT(*), 6) AS avg_disc,
        | COUNT(*) AS count_order
        |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "q02_star_revenue" ->
      """SELECT r_name, n_name,
        | CAST(CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1.0 - l_discount AS DECIMAL(6,4))) AS DECIMAL(38,6)) AS VARCHAR) AS DOUBLE) AS revenue,
        | COUNT(DISTINCT o_custkey) AS n_customers,
        | COUNT(*) AS n_lineitems
        |FROM lineitem
        | JOIN orders   ON l_orderkey = o_orderkey
        | JOIN customer ON o_custkey = c_custkey
        | JOIN nation   ON c_nationkey = n_nationkey
        | JOIN region   ON n_regionkey = r_regionkey
        |GROUP BY r_name, n_name
        |ORDER BY r_name, n_name""".stripMargin,

    "q03_topk_orders" ->
      """SELECT o_orderkey, o_orderdate, o_orderpriority, revenue FROM (
        | SELECT l_orderkey,
        |  CAST(CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1.0 - l_discount AS DECIMAL(6,4))) AS DECIMAL(38,6)) AS VARCHAR) AS DOUBLE) AS revenue
        | FROM lineitem GROUP BY l_orderkey) rev
        |JOIN orders ON l_orderkey = o_orderkey
        |ORDER BY revenue DESC, o_orderkey LIMIT 10""".stripMargin,

    "q04_semi_join" ->
      """SELECT c_custkey, c_name, c_mktsegment FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders
        |              WHERE o_custkey = c_custkey AND o_orderstatus = 'F')
        |ORDER BY c_custkey""".stripMargin,

    "q05_anti_join" ->
      """SELECT c_custkey, c_name, c_acctbal FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |ORDER BY c_custkey""".stripMargin,

    "q06_revenue_forecast" ->
      """SELECT
        | CAST(CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(l_discount AS DECIMAL(6,4))) AS DECIMAL(38,6)) AS VARCHAR) AS DOUBLE) AS promo_revenue,
        | COUNT(*) AS n_rows
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
        |  AND l_discount BETWEEN 0.05 AND 0.07
        |  AND l_quantity < 24""".stripMargin,

    "q07_rollup" ->
      """SELECT
        | CASE WHEN GROUPING(l_returnflag) = 1 THEN 'ALL' ELSE l_returnflag END AS rf,
        | CASE WHEN GROUPING(l_linestatus) = 1 THEN 'ALL' ELSE l_linestatus END AS ls,
        | COUNT(*) AS n,
        | CAST(CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DECIMAL(38,6)) AS VARCHAR) AS DOUBLE) AS sum_qty
        |FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
        |ORDER BY rf NULLS LAST, ls NULLS LAST""".stripMargin,

    "q08_cube" ->
      """SELECT
        | CASE WHEN GROUPING(o_orderstatus) = 1 THEN 'ALL' ELSE o_orderstatus END AS status,
        | CASE WHEN GROUPING(o_orderpriority) = 1 THEN 'ALL' ELSE o_orderpriority END AS priority,
        | COUNT(*) AS n,
        | CAST(CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DECIMAL(38,6)) AS VARCHAR) AS DOUBLE) AS sum_price
        |FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority)
        |ORDER BY status NULLS LAST, priority NULLS LAST""".stripMargin,

    "q09_window_topk" ->
      """SELECT o_custkey, o_orderkey, o_totalprice, rnk FROM (
        | SELECT o_custkey, o_orderkey, o_totalprice,
        |  ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rnk
        | FROM orders) t
        |WHERE rnk <= 3 ORDER BY o_custkey, rnk""".stripMargin,

    "q10_running_spend" ->
      """SELECT o_custkey, o_orderkey, o_orderdate, lifetime_spend, prev_price, n_orders FROM (
        | SELECT o_custkey, o_orderkey, o_orderdate,
        |  CAST(CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2)))
        |    OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS DECIMAL(38,6)) AS VARCHAR) AS DOUBLE) AS lifetime_spend,
        |  LAG(o_totalprice, 1) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS prev_price,
        |  COUNT(*) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS n_orders,
        |  ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
        | FROM orders) t
        |WHERE rn = 1 ORDER BY o_custkey""".stripMargin,

    "q11_event_summary" ->
      """SELECT event_type,
        | COUNT(DISTINCT user_id) AS n_users,
        | COUNT(*) AS n_events,
        | CAST(CAST(CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DECIMAL(38,6)) AS VARCHAR) AS DOUBLE) AS total_value
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    "q12_set_ops" ->
      """SELECT c_custkey FROM (
        | (
        |  (SELECT c_custkey FROM customer WHERE c_mktsegment = 'FURNITURE'
        |   UNION
        |   SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING')
        |  INTERSECT
        |  SELECT c_custkey FROM customer WHERE c_acctbal > 1000
        | )
        | EXCEPT
        | SELECT c_custkey FROM customer WHERE c_acctbal < 2000
        |) t ORDER BY c_custkey""".stripMargin,

    // same deterministic CDC log + one LEAD window; exact-decimal prices
    "q103_scd2_history" ->
      """WITH chg AS (
        | SELECT o_orderkey, CAST(1 AS BIGINT) AS version,
        |  CAST(CAST(CAST(CAST(o_totalprice AS DECIMAL(12,2))
        |    * CAST('1.0' AS DECIMAL(6,4)) AS DECIMAL(38,6)) AS VARCHAR) AS DOUBLE) AS price
        | FROM orders
        | UNION ALL
        | SELECT o_orderkey, CAST(2 AS BIGINT),
        |  CAST(CAST(CAST(CAST(o_totalprice AS DECIMAL(12,2))
        |    * CAST('1.10' AS DECIMAL(6,4)) AS DECIMAL(38,6)) AS VARCHAR) AS DOUBLE)
        | FROM orders WHERE o_orderkey % 3 = 0
        | UNION ALL
        | SELECT o_orderkey, CAST(3 AS BIGINT),
        |  CAST(CAST(CAST(CAST(o_totalprice AS DECIMAL(12,2))
        |    * CAST('1.21' AS DECIMAL(6,4)) AS DECIMAL(38,6)) AS VARCHAR) AS DOUBLE)
        | FROM orders WHERE o_orderkey % 9 = 0)
        |SELECT o_orderkey, version AS valid_from, price,
        | LEAD(version) OVER w AS valid_to,
        | CAST(LEAD(version) OVER w IS NULL AS BIGINT) AS is_current
        |FROM chg
        |WINDOW w AS (PARTITION BY o_orderkey ORDER BY version)
        |ORDER BY o_orderkey, valid_from""".stripMargin,

    // Same correlated scalar subquery verbatim (both engines decorrelate;
    // the CONTRACT is the per-row semantics, which DuckDB checks).
    "q144_correlated_subquery" ->
      """SELECT p_brand,
        | CAST(CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)))
        |   AS DECIMAL(38,6)) AS VARCHAR) AS DOUBLE) AS small_qty_revenue,
        | COUNT(*) AS n_lineitems,
        | COUNT(DISTINCT p_partkey) AS n_parts
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE l_quantity < (SELECT CAST(0.2 AS DOUBLE) * AVG(l2.l_quantity)
        |                    FROM lineitem l2
        |                    WHERE l2.l_partkey = p_partkey)
        |GROUP BY p_brand ORDER BY p_brand""".stripMargin,

    // same cents/month-index construction; HUGEINT sums, string-route
    // divisions, NULL on the degenerate one-month den
    "q171_revenue_trend" ->
      """WITH mo AS (
        | SELECT n.n_name AS nation,
        |  CAST(year(o.o_orderdate)*12 + month(o.o_orderdate) AS BIGINT)
        |    AS x,
        |  SUM(CAST(CAST(o.o_totalprice AS DECIMAL(12,2)) * 100
        |      AS HUGEINT)) AS y
        | FROM orders o
        | JOIN customer c ON o.o_custkey = c.c_custkey
        | JOIN nation n ON c.c_nationkey = n.n_nationkey
        | GROUP BY 1, 2),
        |s AS (
        | SELECT nation, COUNT(*) AS n_months,
        |  SUM(CAST(x AS HUGEINT)) AS sx, SUM(y) AS sy,
        |  SUM(CAST(x AS HUGEINT) * y) AS sxy,
        |  SUM(CAST(x AS HUGEINT) * x) AS sxx
        | FROM mo GROUP BY 1)
        |SELECT nation, n_months,
        | CASE WHEN n_months*sxx - sx*sx > 0 THEN
        |  CAST(CAST(CAST(n_months*sxy - sx*sy AS DECIMAL(38,6))
        |    AS VARCHAR) AS DOUBLE)
        |  / CAST(CAST(CAST(n_months*sxx - sx*sx AS DECIMAL(38,6))
        |    AS VARCHAR) AS DOUBLE) END AS slope_cents,
        | CASE WHEN n_months*sxx - sx*sx > 0 THEN
        |  CAST(CAST(CAST(sy*sxx - sx*sxy AS DECIMAL(38,6))
        |    AS VARCHAR) AS DOUBLE)
        |  / CAST(CAST(CAST(n_months*sxx - sx*sx AS DECIMAL(38,6))
        |    AS VARCHAR) AS DOUBLE) END AS intercept_cents
        |FROM s ORDER BY nation""".stripMargin,
  )
}
