package graft.queries

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.util.sketch.CountMinSketch

import graft.model.Tables

/** Round-6 closing family — the sketch/serving tier a 100 TB pipeline
  * puts AROUND the exact operators: frequency sketches for heavy-hitter
  * detection (q98), int8 scalar quantization for the embedding serving
  * tier (q99), Bloom-filter membership prefilters that replace a shuffle
  * with a broadcast of a few megabytes (q100), and temperature-weighted
  * deterministic source resampling for training-mix construction (q101).
  *
  * Scale stance: every sketch here is CONSTANT-SIZE mergeable state —
  * the Count-Min table and the Bloom bitset aggregate tree-wise across
  * partitions and come back to the driver as one small object (the same
  * sanctioned driver-side materialization as the 37-row kernel table:
  * O(1) in the data), then travel back OUT as a literal inside
  * whole-stage codegen. Nothing corpus-sized ever reaches the driver.
  *
  * Determinism stance (what makes these oracle-checkable): sketch
  * internals never cross the engine boundary — q98 emits the exact
  * metric plus an asserted bound (the q40 bounded-error form), q100's
  * bloom is swept exact by the semi-join above it, q99's quantizer is
  * pure closed-form IEEE arithmetic reproduced verbatim in DuckDB, and
  * q101's sampler draws from the md5-derived uniform family shared with
  * q66/q67.
  */
object ScaleOps {

  private def docs(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir).documents

  /** The canonical engine-portable md5 hash family (TextOps.h48) and
    * the double-cast non-null-element embedding frame (VectorOps.emb) —
    * reused, not copied, so the cross-engine constructions can never
    * drift per-file. */
  private def h48(prefix: String, c: Column): Column = TextOps.h48(prefix, c)
  private def emb(s: SparkSession, dir: String): DataFrame =
    VectorOps.emb(s, dir)

  /** CMS parameters — must match the literals in the q98 scaladoc and
    * bound check. eps 0.001 ⇒ width 2000 counters; confidence 0.99 ⇒
    * depth 7 rows: a ~112 KB sketch regardless of corpus size. */
  private val CMS_EPS  = 0.001
  private val CMS_CONF = 0.99
  private val CMS_SEED = 42
  private val TOP_K    = 8

  /** q106 Morton width per dimension (bits) — 16+16 interleave into a
    * 32-bit z value; cells are the top 6 z-bits (3 per dimension). */
  private val Z_BITS = 16

  /** q126 join-size sketch geometry: depth (independent hash rows) ×
    * width (counters per row). Inner-product error grows as
    * N_left·N_right / WIDTH, so width is the accuracy dial: 4×32768
    * (~1 MB of mergeable state, the realistic CBO size point) puts the
    * overcount at ~45 % on sf0.1's 100 k × 150 k rows and ~5 % at
    * sf0.01 — collisions visibly present (the estimate provably
    * OVERcounts), the signal intact. Deterministic md5 hash family ⇒
    * the estimate itself is oracle hash-checked, not just a bound. */
  private[graft] val JSZ_DEPTH = 4
  private[graft] val JSZ_WIDTH = 32768L

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // A8 sketch family, frequency side (next to q40's cardinality side):
    // Count-Min heavy-hitter verification. One distributed pass builds
    // the CMS (partial sketches merge associatively below the final
    // aggregate — constant ~112 KB state per partition, like HLL) plus
    // the total token count; a distributed TakeOrdered (the q90 vocab
    // pattern) picks the top-8 exact heavy hitters; the driver then asks
    // the sketch for each candidate's estimate. OUTPUT is the q40
    // bounded-error form: within_bound = est ≥ exact AND est ≤ exact +
    // ⌈eps·N⌉ (the CMS contract: never undercounts, overcount ≤ eps·N
    // w.p. ≥ confidence) — the DuckDB oracle computes the exact side and
    // asserts the bound, hash-pinning the sketch contract cross-engine.
    // At 100 TB the same plan holds: the sketch and the K-row candidate
    // frame are O(1); only the two token-keyed aggregates scale.
    "q98_cms_heavy_hitters" -> ((s, dir) => {
      import s.implicits._
      val toks = docs(s, dir)
        .select(explode(split(col("text"), " ")).as("tok"))
      val sk = toks.agg(
        count(lit(1)).as("n_total"),
        count_min_sketch(col("tok"), lit(CMS_EPS), lit(CMS_CONF),
          lit(CMS_SEED)).as("cms")).head()
      val nTotal = sk.getLong(0)
      val cms = CountMinSketch.readFrom(
        new ByteArrayInputStream(sk.getAs[Array[Byte]](1)))
      val bound = math.ceil(CMS_EPS * nTotal).toLong
      val top = toks.groupBy("tok")
        .agg(count(lit(1)).as("n_exact"))
        .orderBy(col("n_exact").desc, col("tok"))
        .limit(TOP_K)
        .as[(String, Long)].collect() // ≤ TOP_K rows, O(1) in the corpus
      top.toSeq.map { case (tok, exact) =>
        val est = cms.estimateCount(tok)
        (tok, exact, if (est >= exact && est <= exact + bound) 1L else 0L)
      }.toDF("tok", "n_exact", "within_bound").orderBy("tok")
    }),

    // Embedding quantization for the serving tier: int8 scalar
    // quantization with ONE corpus-wide absmax scale (a 1-row broadcast,
    // never a shuffle), reconstruction, and the fidelity metric a real
    // pipeline gates on — cos(original, dequantized) per vector. The
    // whole quantize→reconstruct→score path is closed-form arithmetic
    // inside one whole-stage-codegen projection (floor/multiply/divide +
    // vec_dot), reproduced operation-for-operation in DuckDB lambdas, so
    // the rounded cosine is hash-checked EXACTLY — not a bounded claim.
    // within_bound additionally asserts the int8 fidelity floor
    // (cos ≥ 0.999) that makes 4×-smaller vectors safe for ANN serving.
    "q99_embedding_quantization" -> ((s, dir) => {
      val base = emb(s, dir)
      val sm = base.agg(
        max(array_max(transform(col("e"), x => abs(x)))).as("smax"))
      base.crossJoin(broadcast(sm))
        .withColumn("qs", lit(127.0) / col("smax"))
        .withColumn("eq",
          // coalesce pins containsNull=false for vec_dot's type check —
          // qs is formally nullable (aggregate result); the NaN branch
          // never fires on the non-empty corpus
          transform(col("e"), x => coalesce(
            floor(x * col("qs") + lit(0.5)) / col("qs"), lit(Double.NaN))))
        .withColumn("cos_q",
          round(call_function("vec_dot", col("e"), col("eq")) /
            (col("nrm") *
              sqrt(call_function("vec_dot", col("eq"), col("eq")))), 6))
        .select(col("vec_id"), col("cos_q"),
          (col("cos_q") >= 0.999).cast("long").as("within_bound"))
        .orderBy("vec_id")
    }),

    // Bloom-filter membership prefilter — the broadcast-not-shuffle join
    // reduction: build a Bloom over the urgent-order keys (constant-size
    // mergeable bitset, built distributed via stat.bloomFilter, ~1.2 MB
    // at 1 % fpp per million keys), ship it back as a LITERAL into the
    // probe scan's codegen (bloom_might_contain — Spark's own runtime-
    // filter expression, surfaced in GraftExtensions), and only THEN run
    // the exact semi-join over the ~fpp-inflated survivor set. At 100 TB
    // the bloom removes ~82 % of probe rows BEFORE the join shuffle; the
    // false positives are swept out by the exact join, so the answer —
    // and the DuckDB oracle, a plain IN-subquery semi-join — is
    // unchanged: the remedy changes the plan, not the answer (the q80
    // principle). BloomPrefilterSpec pins no-false-negatives and that
    // the prefilter actually drops rows.
    "q100_bloom_prefilter" -> ((s, dir) => {
      val t = Tables(s, dir)
      val urgent = t.orders
        .where(col("o_orderpriority") === "1-URGENT")
        .select(col("o_orderkey"))
      val hashed = urgent.select(xxhash64(col("o_orderkey")).as("h"))
      val nk = hashed.count() // one scalar: sizes the bloom
      val bf = hashed.stat.bloomFilter("h", math.max(nk, 1L), 0.01)
      val bos = new ByteArrayOutputStream()
      bf.writeTo(bos)
      val pre = t.lineitem.where(
        call_function("bloom_might_contain",
          lit(bos.toByteArray), xxhash64(col("l_orderkey"))))
      val dimU = t.dim(urgent)
      pre.join(dimU, pre("l_orderkey") === dimU("o_orderkey"), "left_semi")
        .groupBy("l_returnflag")
        .agg(count(lit(1)).as("n_items"),
          Exact.asD(sum(Exact.dPrice(col("l_extendedprice"))))
            .as("sum_price"))
        .orderBy("l_returnflag")
    }),

    // Temperature-weighted source resampling (the training-mix builder):
    // per-source share of the kept CORPUS VOLUME ∝ vol^T over character
    // volume (T = 0.7 flattens the head, fattens the tail — the
    // multilingual-mix standard; volume, not doc count, is what a token
    // budget actually rations), target kept volume M = V/2, per-source
    // keep rate r_s = min(1, M·w_s/vol_s), and a DETERMINISTIC Bernoulli
    // draw from the md5-uniform family (q66) — the same docs survive at
    // any parallelism on any cluster. Plan shape: one tiny per-source
    // aggregate (|sources| rows), one 1-row normalizer (long/decimal
    // sums → order-free), rates broadcast back onto the corpus — two
    // corpus scans total (one for the volume statistic, one for the
    // draw) plus the final bounded aggregate.
    "q101_source_mix_resample" -> ((s, dir) => {
      val rates = mixRates(docs(s, dir))
      keepDecision(docs(s, dir), rates)
        .groupBy("source", "n_docs", "rate")
        .agg(sum(col("keep")).as("n_kept"))
        .select(col("source"), col("n_docs"), col("n_kept"), col("rate"))
        .orderBy("source")
    }),

    // CMS join-size estimation (Cormode & Muthukrishnan's inner-product
    // estimate) — the CBO primitive: |A ⋈ B| on a key from two
    // constant-size sketches WITHOUT executing the join. Each side
    // reduces to per-key counts (one keyed shuffle with map-side
    // combine), explodes to DEPTH (row, bucket) cells over the md5 hash
    // family, and aggregates to a DEPTH×WIDTH table; est_r = Σ_b
    // cA[r][b]·cB[r][b] per row, estimate = min_r. At 100 TB the
    // sketches are mergeable DEPTH×WIDTH (4×32768, ~1 MB) tables built
    // in one pass each and the estimating join touches ≤ DEPTH·WIDTH
    // rows — the exact side here exists only to grade the estimate
    // (inner-product CMS can only OVERcount, pinned in the output). The
    // md5 family makes the estimate itself deterministic, so the oracle
    // hash-checks the ESTIMATE, not just a bound — sketch "internals"
    // never cross the engine boundary, only the final cell table does.
    // Cell products/sums run in DECIMAL(38,0) on BOTH engines (long
    // sums would wrap in Spark where DuckDB promotes to HUGEINT —
    // divergent exactly at the huge-side scale this operator targets),
    // and every DEPTH row is present with est_r = 0 before the min, so
    // disjoint sketches estimate 0 rather than NULL.
    "q126_join_size_estimate" -> ((s, dir) => {
      val t = Tables(s, dir)
      def keyed(df: DataFrame, key: Column): DataFrame =
        df.where(key.isNotNull)
          .select(key.cast("string").as("k"))
          .groupBy("k").agg(count(lit(1)).as("n"))
      def sketch(keyCounts: DataFrame, cname: String): DataFrame =
        keyCounts.select(col("n"), explode(array(
            (0 until JSZ_DEPTH).map(r => struct(lit(r).as("r"),
              pmod(h48(s"jsz$r:", col("k")), lit(JSZ_WIDTH)).as("b"))): _*))
            .as("rb"))
          .groupBy(col("rb.r").as("r"), col("rb.b").as("b"))
          .agg(sum("n").as(cname))
      val ca = keyed(t.events, col("user_id"))
      val cb = keyed(t.orders, col("o_custkey"))
      def d19(c: Column): Column = c.cast("decimal(19,0)")
      val perRow = sketch(ca, "cnt_a").join(sketch(cb, "cnt_b"), Seq("r", "b"))
        .groupBy("r").agg(sum(d19(col("cnt_a")) * d19(col("cnt_b"))).as("est_r"))
      val est = s.range(JSZ_DEPTH).select(col("id").cast("int").as("r"))
        .join(perRow, Seq("r"), "left")
        .agg(min(coalesce(col("est_r"), expr("CAST(0 AS DECIMAL(38,0))")))
          .cast("long").as("est_size"))
      val exact = ca.join(cb.select(col("k"), col("n").as("m")), "k")
        .agg(coalesce(sum(d19(col("n")) * d19(col("m"))),
          expr("CAST(0 AS DECIMAL(38,0))")).cast("long").as("exact_size"))
      val tots = ca.agg(sum("n").as("n_left"))
        .crossJoin(cb.agg(sum("n").as("n_right")))
      tots.crossJoin(broadcast(exact)).crossJoin(broadcast(est))
        .select(col("n_left"), col("n_right"), col("exact_size"),
          col("est_size"),
          when(col("exact_size") > 0,
            round(col("est_size").cast("double") / col("exact_size"), 6))
            .as("inflation"),
          (col("est_size") >= col("exact_size")).as("never_undercounts"))
    }),

    // Z-order (Morton) clustering — the write-layout operator behind
    // multi-dimensional data skipping (Delta/Iceberg OPTIMIZE ZORDER):
    // interleave the low 16 bits of two join/filter dimensions with pure
    // shift/mask arithmetic (one codegen projection, no UDF), then treat
    // the top 6 z-bits as the file cell a range-partitioned write would
    // produce. The query PROVES the locality claim from the data instead
    // of asserting it: per-cell (max−min) extents of BOTH dimensions
    // under z-cells next to the same extents under naive linear-on-x
    // cells — z-cells bound every dimension (each cell fixes the top 3
    // bits of x AND y, so spans stay < 2^13), linear cells bound only x
    // and leave y at full range. At 100 TB the identical projection
    // feeds repartitionByRange(z) before the write, and every file's
    // min/max stats become selective for 2-D predicates — scan pruning
    // where a single-column sort gives none. Integer-only arithmetic →
    // bit-identical cross-engine.
    "q106_zorder_clustering" -> ((s, dir) => {
      def interleave(c: Column, off: Int): Column =
        (0 until Z_BITS).map(b =>
          shiftleft(shiftrightunsigned(c, b).bitwiseAND(lit(1L)), 2 * b + off))
          .reduce(_ + _)
      val base = Tables(s, dir).lineitem
        .select(col("l_partkey").bitwiseAND(lit(65535L)).as("x"),
          col("l_suppkey").bitwiseAND(lit(65535L)).as("y"))
        .withColumn("z", interleave(col("x"), 0) + interleave(col("y"), 1))
      // ONE corpus scan: each row emits its (scheme, cell) pair for both
      // layouts in-flight (explode over a 2-element literal array) — a
      // self-union would plan the scan + interleave projection twice
      base
        .select(col("x"), col("y"), explode(array(
          struct(lit("zorder").as("scheme"),
            shiftrightunsigned(col("z"), 2 * Z_BITS - 6).as("cell")),
          struct(lit("linear").as("scheme"),
            shiftrightunsigned(col("x"), Z_BITS - 6).as("cell")))).as("sc"))
        .select(col("sc.scheme").as("scheme"), col("sc.cell").as("cell"),
          col("x"), col("y"))
        .groupBy("scheme", "cell")
        .agg(count(lit(1)).as("n"),
          (max("x") - min("x")).as("x_span"),
          (max("y") - min("y")).as("y_span"))
        .orderBy("scheme", "cell")
    }))

  /** Per-source keep rates for q101 — a bounded |sources|-row frame
    * computed OFFLINE in the real architecture and broadcast to the
    * ingest path. pow rounded to 6 before the decimal sum: the sum is
    * then exact (order-free) and the one cross-engine libm risk — pow's
    * last ulp — is quantized away before it can spread. */
  private[graft] def mixRates(d: DataFrame): DataFrame = {
    // volumes stay LONG through both sum levels (exact, order-free at
    // any partition layout — a double sum would go ulp-unstable past
    // 2^53 total chars) and cast to double only at the rate arithmetic
    val c = d.groupBy("source")
      .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("voln"))
      .withColumn("vol", col("voln").cast("double"))
    val pw = round(pow(col("vol"), lit(0.7)), 6)
    val z = c.agg(
      sum(pw.cast("decimal(38,6)")).cast("double").as("z"),
      sum(col("voln")).as("vvn"))
    c.crossJoin(broadcast(z))
      .select(col("source"), col("n_docs"), col("vol"),
        round(least(lit(1.0),
          lit(0.5) * col("vvn").cast("double") * pw / col("z") / col("vol")),
          6).as("rate"))
  }

  /** The q101 keep-decision as a STATELESS frame transform: a
    * broadcast join against the bounded rates frame plus a pure
    * projection (deterministic md5-uniform draw), so it applies to a
    * streaming micro-batch exactly as to a batch frame —
    * StreamCurationSpec pins batch/stream row parity (the
    * backfill-to-ingest promotion contract, as with piiRedaction). */
  private[graft] def keepDecision(d: DataFrame, rates: DataFrame): DataFrame = {
    val u = pmod(h48("mix:", col("doc_id").cast("string")), lit(1000000L))
      .cast("double") / lit(1000000.0)
    d.select(col("source"), col("doc_id"))
      .join(broadcast(rates), "source")
      .select(col("source"), col("doc_id"), col("n_docs"), col("rate"),
        when(u < col("rate"), 1L).otherwise(0L).as("keep"))
  }

  def oracles: Map[String, String] = Map(

    // exact side + asserted CMS bound (the q40 form)
    "q98_cms_heavy_hitters" ->
      """WITH t AS (
        | SELECT unnest(string_split(text, ' ')) AS tok FROM documents),
        |top AS (
        | SELECT tok, COUNT(*) AS n_exact FROM t GROUP BY tok
        | ORDER BY n_exact DESC, tok LIMIT 8)
        |SELECT tok, n_exact, CAST(1 AS BIGINT) AS within_bound
        |FROM top ORDER BY tok""".stripMargin,

    // the identical quantize→reconstruct→score arithmetic in DuckDB
    // lambdas; the rounded cosine must match EXACTLY
    "q99_embedding_quantization" ->
      """WITH e AS (
        | SELECT vec_id, embedding::DOUBLE[] AS e,
        |  SQRT(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[]))
        |    AS nrm
        | FROM embeddings),
        |s AS (
        | SELECT 127.0 / MAX(list_max(list_transform(e, x -> ABS(x)))) AS qs
        | FROM e),
        |q AS (
        | SELECT vec_id, nrm,
        |  list_dot_product(e,
        |    list_transform(e, x -> FLOOR(x * qs + 0.5) / qs)) AS d_eq,
        |  list_dot_product(
        |    list_transform(e, x -> FLOOR(x * qs + 0.5) / qs),
        |    list_transform(e, x -> FLOOR(x * qs + 0.5) / qs)) AS d_qq
        | FROM e, s),
        |c AS (
        | SELECT vec_id, ROUND(d_eq / (nrm * SQRT(d_qq)), 6) AS cos_q FROM q)
        |SELECT vec_id, cos_q,
        | CAST(cos_q >= 0.999 AS BIGINT) AS within_bound
        |FROM c ORDER BY vec_id""".stripMargin,

    // the UNFILTERED semi-join — equal hash proves the bloom prefilter
    // changed the execution, not the answer
    "q100_bloom_prefilter" ->
      """SELECT l_returnflag, COUNT(*) AS n_items,
        | CAST(CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)))
        |   AS DECIMAL(38,6)) AS VARCHAR) AS DOUBLE) AS sum_price
        |FROM lineitem
        |WHERE l_orderkey IN (
        | SELECT o_orderkey FROM orders WHERE o_orderpriority = '1-URGENT')
        |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "q101_source_mix_resample" ->
      """WITH c AS (
        | SELECT source, COUNT(*) AS n_docs, SUM(n_chars) AS voln,
        |  CAST(SUM(n_chars) AS DOUBLE) AS vol
        | FROM documents GROUP BY source),
        |z AS (
        | SELECT CAST(SUM(CAST(ROUND(POW(vol, 0.7), 6) AS DECIMAL(38,6)))
        |          AS DOUBLE) AS z,
        |        SUM(voln) AS vvn
        | FROM c),
        |r AS (
        | SELECT source, n_docs,
        |  ROUND(LEAST(1.0,
        |    0.5 * CAST(z.vvn AS DOUBLE) * ROUND(POW(vol, 0.7), 6)
        |      / z.z / vol), 6) AS rate
        | FROM c, z),
        |k AS (
        | SELECT d.source, r.n_docs, r.rate,
        |  CASE WHEN (CAST('0x' || substr(md5('mix:' ||
        |         CAST(d.doc_id AS VARCHAR)), 1, 12) AS BIGINT) % 1000000)
        |       / 1000000.0 < r.rate
        |  THEN 1 ELSE 0 END AS keep
        | FROM documents d JOIN r ON d.source = r.source)
        |SELECT source, n_docs, CAST(SUM(keep) AS BIGINT) AS n_kept, rate
        |FROM k GROUP BY source, n_docs, rate ORDER BY source""".stripMargin,

    // the same md5 cell hashes ⇒ the ESTIMATE is hash-compared exactly
    "q126_join_size_estimate" ->
      s"""WITH ca AS MATERIALIZED (
        | SELECT CAST(user_id AS VARCHAR) AS k, COUNT(*) AS n
        | FROM events WHERE user_id IS NOT NULL GROUP BY 1),
        |cb AS MATERIALIZED (
        | SELECT CAST(o_custkey AS VARCHAR) AS k, COUNT(*) AS n
        | FROM orders WHERE o_custkey IS NOT NULL GROUP BY 1),
        |sa AS (
        | SELECT r, CAST('0x' || substr(md5('jsz' || CAST(r AS VARCHAR)
        |     || ':' || k), 1, 12) AS BIGINT) % $JSZ_WIDTH AS b,
        |  SUM(n) AS cnt_a
        | FROM ca CROSS JOIN range($JSZ_DEPTH) t(r) GROUP BY 1, 2),
        |sb AS (
        | SELECT r, CAST('0x' || substr(md5('jsz' || CAST(r AS VARCHAR)
        |     || ':' || k), 1, 12) AS BIGINT) % $JSZ_WIDTH AS b,
        |  SUM(n) AS cnt_b
        | FROM cb CROSS JOIN range($JSZ_DEPTH) t(r) GROUP BY 1, 2),
        |est AS (
        | SELECT CAST(MIN(COALESCE(est_r, 0)) AS BIGINT) AS est_size
        | FROM range($JSZ_DEPTH) t(r) LEFT JOIN (
        |  SELECT r, SUM(CAST(cnt_a AS DECIMAL(19,0))
        |              * CAST(cnt_b AS DECIMAL(19,0))) AS est_r
        |  FROM sa JOIN sb USING (r, b) GROUP BY r) p USING (r)),
        |ex AS (
        | SELECT CAST(COALESCE(SUM(CAST(ca.n AS DECIMAL(19,0))
        |                        * CAST(cb.n AS DECIMAL(19,0))), 0)
        |   AS BIGINT) AS exact_size
        | FROM ca JOIN cb USING (k)),
        |tot AS (
        | SELECT (SELECT CAST(SUM(n) AS BIGINT) FROM ca) AS n_left,
        |  (SELECT CAST(SUM(n) AS BIGINT) FROM cb) AS n_right)
        |SELECT n_left, n_right, exact_size, est_size,
        | CASE WHEN exact_size > 0
        |      THEN ROUND(CAST(est_size AS DOUBLE) / exact_size, 6)
        | END AS inflation,
        | est_size >= exact_size AS never_undercounts
        |FROM tot, ex, est""".stripMargin,

    // the identical interleave arithmetic, generated from the same Z_BITS
    "q106_zorder_clustering" -> {
      val terms = (0 until Z_BITS).flatMap(b => Seq(
        s"(((x >> $b) & 1) << ${2 * b})",
        s"(((y >> $b) & 1) << ${2 * b + 1})")).mkString(" + ")
      s"""WITH p AS (
         | SELECT l_partkey & 65535 AS x, l_suppkey & 65535 AS y
         | FROM lineitem),
         |z AS (SELECT x, y, $terms AS z FROM p),
         |u AS (
         | SELECT s.scheme,
         |  CASE s.scheme WHEN 'zorder' THEN z >> ${2 * Z_BITS - 6}
         |       ELSE x >> ${Z_BITS - 6} END AS cell,
         |  x, y
         | FROM z CROSS JOIN (VALUES ('zorder'), ('linear')) s(scheme))
         |SELECT scheme, CAST(cell AS BIGINT) AS cell, COUNT(*) AS n,
         | CAST(MAX(x) - MIN(x) AS BIGINT) AS x_span,
         | CAST(MAX(y) - MIN(y) AS BIGINT) AS y_span
         |FROM u GROUP BY scheme, cell ORDER BY scheme, cell""".stripMargin
    })
}
