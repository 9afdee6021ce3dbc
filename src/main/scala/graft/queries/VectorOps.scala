package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.model.Tables

/** Similarity search over the `embeddings` table (64-dim float vectors):
  * brute-force cosine top-k as the correctness baseline, a data-driven
  * sign-quantizer block join as the IVF-style scale path, a banded
  * random-hyperplane LSH as the hash-bucketed scale path, and a recall@1
  * query that measures both approximate paths against the brute-force
  * answer — the number that justifies calling them ANN.
  *
  * Scale stance: the brute-force queries bound their QUERY SET — they are
  * oracle baselines / offline eval, not production paths. The production
  * paths never do all-pairs: q35 joins within a 256-cell data-driven
  * quantizer block, q37 joins within 8-bit LSH band buckets (8 bands,
  * union of candidates, per-bucket size cap à la q27), so join fan-out is
  * bucket-sized and capped, not |corpus|². Dot products run inside
  * Catalyst HOFs (zip_with/aggregate) on the executors; nothing collects.
  *
  * Recall on THIS data: the synthetic embeddings are isotropic (no
  * cluster structure), the hardest case for similarity hashing — q51
  * measures recall@1 = recall_strict at sf0.1 of 0.53 for the
  * MULTI-PROBE k-means IVF path (q69: nprobe = 5 of K = 31 cells, 16 %
  * candidate coverage ⇒ 84 % pruning, vs 0.305 for r4's single-probe
  * K = 8), 0.205 for the banded LSH (q37), and 0.03 for the sign
  * quantizer (q35), against a random-pick baseline of 1/|corpus| =
  * 0.0005 — a 60–1000× lift. On real clustered embeddings every path
  * does far better; the eval query is the point — it ships WITH the ANN
  * operators so the tradeoff is measured, not asserted.
  *
  * Determinism: cosines are rounded to 6 decimals BEFORE ranking, so the
  * ≤1e-15 cross-engine summation-order noise cannot flip an ordering;
  * quantizer/LSH thresholds are applied to projections rounded to 9
  * decimals for the same reason; remaining ties break on vec_id. The LSH
  * hyperplane signs are md5-derived Rademacher ±1 constants computed once
  * driver-side and inlined as literals in BOTH engines' plans, so q37 is
  * fully oracle-checked (the r3 xxhash64 form was rows-only).
  */
object VectorOps {

  private val DIM = 64
  /** LSH geometry: BANDS bands × BITS bits = DIM hyperplanes. */
  private val BANDS = 8
  private val BITS = 8
  /** Candidate buckets larger than this identify nothing (the skew cap —
    * same rationale as q27's 20-doc band-bucket cap). */
  private val BUCKET_CAP = 50
  /** q142: representatives kept per quantizer cell — bounds the blocked
    * self-join at |cell|·BLOCK_CAP (vs q35's |cell|², measured 49× at
    * 10× data on the dense-cluster cell, SCALE.md #3). */
  private val BLOCK_CAP = 64
  /** Recall eval query-set bound: first RECALL_Q vec_ids. */
  private val RECALL_Q = 200

  /** q188 sweep points: nprobe values the dial is measured at. All
    * test SFs have n ≥ 500 ⇒ kmGeom's K ≥ 16 > max(NPS); on a corpus
    * where K dropped below 10, the rn ≤ np filter simply saturates at
    * all K cells (coverage 100 %) — defined, just no longer a sweep. */
  private val SWEEP_NPS = Seq(1, 3, 5, 10)

  /** q125 ranking-quality depth, and the per-position discount /
    * reciprocal-rank decimals computed ONCE driver-side (12 dp) and
    * inlined as IDENTICAL CASE text in both engines (the signList
    * pattern): no runtime log2 in either plan, so libm differences
    * cannot touch the metrics. */
  private val NDCG_K = 10
  private def dec12(x: Double): String =
    BigDecimal(x).setScale(12, BigDecimal.RoundingMode.HALF_UP).toString
  private def disc12(i: Int): String =
    dec12(1.0 / (math.log(i + 1.0) / math.log(2.0)))
  private lazy val DISC_CASE = (1 to NDCG_K)
    .map(i => s"WHEN $i THEN CAST(${disc12(i)} AS DECIMAL(14,12))")
    .mkString("CASE pos ", " ", " END")
  private lazy val RR_CASE = (1 to NDCG_K)
    .map(i => s"WHEN $i THEN CAST(${dec12(1.0 / i)} AS DECIMAL(14,12))")
    .mkString("CASE pos ", " ", " END")
  /** Ideal DCG@K (grades K..1 in discount order), exact decimal over the
    * same 12-dp discount literals — every query's ideal, since the brute
    * truth always has ≥ K non-self neighbors on these corpora. */
  private lazy val IDCG = (1 to NDCG_K)
    .map(i => BigDecimal(NDCG_K + 1 - i) * BigDecimal(disc12(i)))
    .sum.toString
  /** Embedding near-dup threshold: a pair is a duplicate when its exact
    * cosine (rounded to 6 before the test, both engines) is ≥ TAU. */
  private val TAU = 0.40

  /** TextOps.h48 (the canonical engine-independent md5 family): seeds
    * the k-means init so centroid choice is deterministic but
    * ordering-INDEPENDENT (the r4 `vec_id < K` init collapsed if low
    * ids were correlated — one shard, one label). */
  private def h48(prefix: String, c: Column): Column =
    TextOps.h48(prefix, c)

  /** Rademacher sign for (plane p, dimension pos): parity of the UNICODE
    * CODE POINT of the first hex character of md5("p,pos") — note: NOT
    * the hex digit's numeric value ('b' (98, even) → −1 although 0xb is
    * odd). Any independent re-derivation must reproduce exactly this
    * char-code rule. Computed ONCE here and inlined as literal arrays in
    * both the Spark plan and the DuckDB oracle, so the two engines share
    * signs by construction (no runtime hashing in either plan). */
  private def planeSign(p: Int, pos: Int): Double = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s"$p,$pos".getBytes("UTF-8"))
    val firstHex = "%02x".format(d(0) & 0xff).charAt(0)
    if (firstHex.toInt % 2 == 1) 1.0 else -1.0
  }
  private val signs: IndexedSeq[IndexedSeq[Double]] =
    (0 until DIM).map(p => (0 until DIM).map(pos => planeSign(p, pos)))

  /** Session shuffle width for fan-out-heavy pair stages (q78/q185):
    * the explicit partition count handed to the AQE-exempt repartition
    * that pins candidate-scoring parallelism. */
  private def pairWidth(s: SparkSession): Int =
    s.conf.get("spark.sql.shuffle.partitions", "32").toInt

  /** Embeddings with exact float→double cast and precomputed L2 norm.
    * The coalesce pins `double NOT NULL` elements — vec_dot rejects
    * nullable elements (same contract as point_in_polygon); embedding
    * components are never null, so the NaN arm only carries nullability. */
  private[graft] def emb(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir).embeddings
      .select(col("vec_id"), col("label").cast("long").as("label"),
        transform(col("embedding"),
          x => coalesce(x.cast("double"), lit(Double.NaN))).as("e"))
      .withColumn("nrm", sqrt(dot(col("e"), col("e"))))

  /** Codegen dot product (graft.functions.VecDot): bit-identical to the
    * former aggregate(zip_with(...)) HOF fold — same sequential op order
    * — but compiled into whole-stage codegen instead of interpreting a
    * boxed lambda per element. */
  private def dot(a: Column, b: Column): Column =
    call_function("vec_dot", a, b)

  /** Sequential-fold dot product against a literal sign vector, rounded
    * to 9 decimals before any sign test (cross-engine determinism). */
  private def proj(p: Int): Column =
    round(dot(col("e"), array(signs(p).map(lit): _*)), 9)

  /** 8-bit data-driven quantizer cell (the IVF coarse code): bit j = sign
    * of the j-th contiguous 8-dim subvector sum. Explicit left-assoc adds
    * (not a float-order-ambiguous SUM) so both engines agree bit-exactly. */
  private def quantCell: Column =
    (0 until 8).map { j =>
      val sub = (1 to 8).map(k => element_at(col("e"), j * 8 + k))
        .reduce(_ + _)
      when(round(sub, 9) > 0, lit(1L << j)).otherwise(lit(0L))
    }.reduce(_ + _)

  /** q35 core: best in-cell neighbor per vector (vec_id, cell, best, cos).
    * Vectors alone in their cell have no candidates and are absent. */
  // Round-16 measured rule for the standalone (s, dir) wrappers: the
  // 3-reference bodies whose references are EXPENSIVE subtrees
  // (lshScored's banded-signature pass, ivfRanked's probe+home joins,
  // pqAdcRanked's LUT+probe passes) eagerly checkpoint the emb() base —
  // q69 3.50->2.03 s, q75 2.68->1.32 s at sf0.1. The 2-reference
  // blocked/capped arms and the lshBest/lshRanked heads measured flat
  // to slightly WORSE with a checkpoint (q142 +0.15 s) — their second
  // reference rides an AQE broadcast of a cheap subtree — so they stay
  // checkpoint-free (bench_only_sf0.1_r16_wrapckpt.json). q51/q125 pass
  // their own shared checkpoint, so the Of variants never re-checkpoint.
  private def blockedRanked(s: SparkSession, dir: String): DataFrame =
    blockedRankedOf(emb(s, dir))

  private def blockedRankedOf(base: DataFrame): DataFrame = {
    val a = base.withColumn("cell", quantCell)
    val pairs = a.select(col("vec_id"), col("cell"), col("e"), col("nrm"))
      .as("a")
      .join(a.select(col("vec_id").as("bid"), col("cell"),
        col("e").as("be"), col("nrm").as("bn")).as("b"), Seq("cell"))
      .where(col("vec_id") =!= col("bid"))
      .select(col("cell"), col("vec_id"), col("bid"),
        round(dot(col("e"), col("be")) / (col("nrm") * col("bn")), 6)
          .as("cos"))
    val w = Window.partitionBy("vec_id").orderBy(col("cos").desc, col("bid"))
    pairs.withColumn("rn", row_number().over(w))
  }

  private[graft] def blockedBest(s: SparkSession, dir: String): DataFrame =
    blockedBestOf(emb(s, dir))

  private def blockedBestOf(base: DataFrame): DataFrame =
    blockedRankedOf(base)
      .where(col("rn") === 1)
      .select(col("vec_id"), col("cell"), col("bid").as("best"), col("cos"))

  /** q142 core: blocked best neighbor with the BLOCK_CAP representative
    * policy — each cell's candidates are its BLOCK_CAP smallest-id
    * vectors, bounding the hot-cell join at |cell|·BLOCK_CAP (SCALE.md
    * finding #3). Shares q51's recall eval as method 'blocked_capped'. */
  private[graft] def cappedBlockedBest(s: SparkSession, dir: String): DataFrame =
    cappedBlockedBestOf(emb(s, dir))

  private def cappedBlockedBestOf(base: DataFrame): DataFrame = {
    val a = base.withColumn("cell", quantCell)
    val reps = a
      .select(col("vec_id").as("bid"), col("cell"),
        col("e").as("be"), col("nrm").as("bn"))
      .withColumn("rk", row_number().over(
        Window.partitionBy("cell").orderBy("bid")))
      .where(col("rk") <= BLOCK_CAP)
      .drop("rk")
    a.select(col("vec_id"), col("cell"), col("e"), col("nrm"))
      .join(reps, Seq("cell"))
      .where(col("vec_id") =!= col("bid"))
      .select(col("vec_id"), col("cell"), col("bid"),
        round(dot(col("e"), col("be")) / (col("nrm") * col("bn")), 6)
          .as("cos"))
      .groupBy("vec_id", "cell")
      .agg(max(struct(col("cos"), (-col("bid")).as("nb"),
        col("bid").as("bid"))).as("b"))
      .select(col("vec_id"), col("cell"), col("b.bid").as("best"),
        col("b.cos").as("cos"))
  }

  /** q37 core: banded-LSH best neighbor per vector (vec_id, best, cos).
    * BANDS bands × BITS md5-sign hyperplane bits; candidates are vectors
    * sharing any band bucket of size 2..BUCKET_CAP; candidates verified
    * with the exact cosine; best = max (cos, then smallest id). */
  private def lshBest(s: SparkSession, dir: String): DataFrame =
    lshBestOf(emb(s, dir))

  private def lshBestOf(base: DataFrame): DataFrame =
    lshScoredOf(base).select(explode(array(
        struct(col("da").as("vec_id"), col("db").as("other"), col("cos")),
        struct(col("db").as("vec_id"), col("da").as("other"), col("cos"))))
        .as("x"))
      .groupBy(col("x.vec_id").as("vec_id"))
      .agg(max(struct(col("x.cos").as("cos"), (-col("x.other")).as("no"),
        col("x.other").as("other"))).as("b"))
      .select(col("vec_id"), col("b.other").as("best"), col("b.cos").as("cos"))

  /** Full LSH candidate ranking per vector (q125's top-K list; lshBest
    * keeps its window-free max-struct form for the rn=1 case). Same
    * (cos desc, id) tie contract as every ranked core. */
  private def lshRanked(s: SparkSession, dir: String): DataFrame =
    lshRankedOf(emb(s, dir))

  private def lshRankedOf(base: DataFrame): DataFrame =
    lshScoredOf(base).select(explode(array(
        struct(col("da").as("vec_id"), col("db").as("other"), col("cos")),
        struct(col("db").as("vec_id"), col("da").as("other"), col("cos"))))
        .as("x"))
      .select(col("x.vec_id"), col("x.other"), col("x.cos").as("cos"))
      .withColumn("rn", row_number().over(Window.partitionBy("vec_id")
        .orderBy(col("cos").desc, col("other"))))

  /** Shared LSH candidate pipeline: exact-cosine-scored unordered pairs
    * (da < db, cos) whose members share any 2..BUCKET_CAP band bucket —
    * the candidate generator behind both q37 (best neighbor) and q75
    * (near-dup dedup). */
  private def lshScored(s: SparkSession, dir: String): DataFrame =
    lshScoredOf(emb(s, dir).localCheckpoint())

  private def lshScoredOf(base: DataFrame): DataFrame = {
    val withBands = base.select((col("vec_id") +: col("e") +: col("nrm") +:
      (0 until BANDS).map { b =>
        (0 until BITS).map { j =>
          when(proj(b * BITS + j) > 0, lit(1L << j)).otherwise(lit(0L))
        }.reduce(_ + _).as(s"band$b")
      }): _*)
    val bands = withBands.select(col("vec_id"),
      posexplode(array((0 until BANDS).map(b => col(s"band$b")): _*))
        .as(Seq("band", "sig")))
    // Buckets → capped member lists → in-place pair expansion (the q27
    // pattern: one groupBy, no bucket-count window + self-join).
    val buckets = bands.groupBy("band", "sig")
      .agg(collect_list("vec_id").as("vs"))
      .where(size(col("vs")).between(2, BUCKET_CAP))
    val cands = buckets.select(explode(expr(
      "flatten(transform(vs, (a, i) -> " +
        "transform(slice(vs, i + 2, size(vs)), " +
        "b -> struct(least(a, b) AS da, greatest(a, b) AS db))))"))
      .as("pr"))
      .select(col("pr.da"), col("pr.db"))
      .distinct()
    val v = base.select(col("vec_id"), col("e"), col("nrm"))
    cands
      .join(v.select(col("vec_id").as("da"), col("e").as("ea"),
        col("nrm").as("na")), "da")
      .join(v.select(col("vec_id").as("db"), col("e").as("eb"),
        col("nrm").as("nb")), "db")
      .select(col("da"), col("db"),
        round(dot(col("ea"), col("eb")) / (col("na") * col("nb")), 6)
          .as("cos"))
  }

  /** Codebook geometry, scaled to the corpus: K = clamp(8, 64,
    * round(0.7·√n)) centroids (K ∝ √n keeps both |cell| ≈ n/K and the
    * assignment crossJoin ∝ n·K balanced as the corpus grows) and
    * nprobe = max(3, round(0.16·K)) probed cells per query — a fixed
    * ~16 % candidate coverage, i.e. ~84 % pruning, at every scale. The
    * count() is a metadata-scale scan; the identical formulas run inside
    * the oracle SQL (kk CTE), so both engines derive the same geometry
    * from the data. */
  private[graft] def kmGeom(s: SparkSession, dir: String): (Int, Int) =
    kmGeomOf(Tables(s, dir).embeddings.count())

  /** The same geometry from an explicit corpus size — q189 derives it
    * from the BASE split's count, not the whole table's. */
  private[graft] def kmGeomOf(n: Long): (Int, Int) = {
    val k = math.max(8, math.min(64, math.round(0.7 * math.sqrt(n.toDouble)).toInt))
    val np = math.max(3, math.round(0.16 * k).toInt)
    (k, np)
  }

  /** q68 core: the k-means codebook after KM_ITER Lloyd iterations.
    * Init: the K vectors with the smallest h48("km:", vec_id) — a
    * deterministic hash reservoir (the q67 trick), planned as a
    * distributed TakeOrderedAndProject, never a single-partition sort. */
  private def kmCentroids(s: SparkSession, dir: String, k: Int): DataFrame =
    kmCentroidsOf(emb(s, dir).select(col("vec_id"), col("e")), k)

  /** The Lloyd loop over an ARBITRARY (vec_id, e) base — factored (round
    * 16) so q189 can train on the base split only while q68/q78 keep the
    * whole-corpus behavior verbatim. */
  private def kmCentroidsOf(base: DataFrame, k: Int): DataFrame = {
    var cents = base
      .withColumn("hk", h48("km:", col("vec_id").cast("string")))
      .orderBy(col("hk"), col("vec_id")).limit(k)
      .select(col("vec_id").as("cid"), col("e").as("c"))
    for (_ <- 1 to KM_ITER) {
      val assigned = assignStep(base, cents).select("vec_id", "cid")
      cents = assigned.join(base, "vec_id")
        .select(col("cid"), posexplode(col("e")).as(Seq("pos", "v")))
        .groupBy("cid", "pos").agg(round(avg("v"), 9).as("cv"))
        .groupBy("cid")
        .agg(transform(
          array_sort(collect_list(struct(col("pos"), col("cv")))),
          x => coalesce(x.getField("cv"), lit(Double.NaN))).as("c"))
        // lazy: plan truncation happens immediately (LogicalRDD), but the
        // 3-round chain materializes in ONE job at the single consumer
        // (each round's cents feeds exactly one broadcast) instead of one
        // eager job per round
        .localCheckpoint(false)
    }
    cents
  }

  /** q69 core: MULTI-PROBE IVF best neighbor (vec_id, best, cos, n_cand).
    * Every vector lives in its nearest-centroid HOME cell; a query probes
    * its `nprobe` nearest cells and scores only vectors homed there —
    * single-probe recall was ceiling-limited at 0.305 on this isotropic
    * data (r4), multi-probe recovers the neighbors that fell just across
    * a cell boundary while still pruning ~84 % of the corpus (n_cand, the
    * per-query candidate count, makes the pruning measurable in the
    * output). Queries with no non-self candidate in any probed cell are
    * absent, as in q35/q37. */
  private def ivfRanked(s: SparkSession, dir: String): DataFrame =
    ivfRankedOf(s, dir, emb(s, dir).localCheckpoint())

  private def ivfRankedOf(s: SparkSession, dir: String,
      base: DataFrame): DataFrame = {
    val (k, np) = kmGeom(s, dir)
    // Cell ranking per vector; home (rn=1) ⊆ probes (rn≤np), so one
    // ranked pass serves both. Materialized: O(n·nprobe) id-only rows.
    val probes = rankCells(base.select(col("vec_id"), col("e")),
        kmCentroids(s, dir, k))
      .where(col("rn") <= np)
      .select(col("vec_id"), col("cid").as("cell"), col("rn"))
      .localCheckpoint()
    val home = probes.where(col("rn") === 1).drop("rn")
    val qside = base.join(probes.drop("rn"), "vec_id")
    val cside = base.join(home, "vec_id")
    val pairs = qside.select(col("vec_id"), col("cell"), col("e"), col("nrm"))
      .join(cside.select(col("vec_id").as("bid"), col("cell"),
        col("e").as("be"), col("nrm").as("bn")), Seq("cell"))
      .where(col("vec_id") =!= col("bid"))
      .select(col("vec_id"), col("bid"),
        round(dot(col("e"), col("be")) / (col("nrm") * col("bn")), 6)
          .as("cos"))
    val p = Window.partitionBy("vec_id")
    pairs
      .withColumn("n_cand", count(lit(1)).over(p))
      .withColumn("rn",
        row_number().over(p.orderBy(col("cos").desc, col("bid"))))
  }

  private def ivfBest(s: SparkSession, dir: String): DataFrame =
    ivfBestOf(s, dir, emb(s, dir).localCheckpoint())

  private def ivfBestOf(s: SparkSession, dir: String,
      base: DataFrame): DataFrame =
    ivfRankedOf(s, dir, base)
      .where(col("rn") === 1)
      .select(col("vec_id"), col("bid").as("best"), col("cos"), col("n_cand"))

  /** Build-once registry for the q78 serving index (VERDICT r5 #2): per
    * (session, sfDir), the eagerly-checkpointed k-means codebook plus the
    * path of the cell-PARTITIONED parquet index it produced. The first
    * call pays the whole build — k-means chain, home-cell assignment,
    * partitioned write — and every later call probes only, so "build
    * once, probe many" is a measurable property: Bench's 2nd..nth samples
    * of q78 time the probe phase alone.
    *
    * The memo is keyed by (session object, sfDir): the session reference
    * itself (identity equality — SparkSession doesn't override equals) is
    * collision-proof because the map's strong reference keeps the object
    * alive, unlike a bare identityHashCode which can recur after GC. Each
    * entry's index PATH carries the per-JVM run token (Sinks.runToken)
    * plus a per-BUILD monotonic id, so two live sessions in one JVM (or
    * two builds by one session) never write or read the same directory.
    * Entries whose session has been stopped are pruned on every access —
    * the map holds at most one live entry per (live session, sfDir) and
    * can never serve a DataFrame bound to a stopped SparkContext.
    * Lifecycle lives in the shared [[BuildOnceMemo]] (VERDICT r11 #5). */
  private val ivfIndexMemo =
    new BuildOnceMemo[(DataFrame, String)]("graft_ivf_index")

  private def ivfIndex(s: SparkSession, dir: String): (DataFrame, String) =
    ivfIndexMemo.getOrBuild(s, dir)(buildIvfIndex(s, dir))

  private def buildIvfIndex(s: SparkSession, dir: String): (DataFrame, String) = {
      val (k, _) = kmGeom(s, dir)
      val base = emb(s, dir)
      // Eager checkpoint: the k-means chain runs here, at build time, and
      // its 37..64-row codebook is what probe invocations rank against.
      val cents = kmCentroids(s, dir, k).localCheckpoint()
      val home = rankCells(base.select(col("vec_id"), col("e")), cents)
        .where(col("rn") === 1)
        .select(col("vec_id"), col("cid").as("cell"))
      val path = ivfIndexMemo.nextPath(dir)
      base.join(home, "vec_id")
        .select(col("vec_id"), col("e"), col("nrm"), col("cell"))
        .write.mode("overwrite").partitionBy("cell").parquet(path)
      (cents, path)
  }

  // --------------------------------- incremental IVF maintenance (q189)

  /** Incremental-batch split rule: vec_id % INC_MOD == INC_REM plays the
    * 20 % of the corpus that arrives AFTER the index was built. */
  private[graft] val INC_MOD = 5
  private[graft] val INC_REM = 4

  /** Frozen-codebook assignment of ONE batch — the q189 append job and
    * the q189 base build share this so the two phases cannot drift, and
    * so IvfIncrementalSpec can pin that the append plan carries NO Lloyd
    * update (rankCells against a checkpointed codebook only). */
  /** The frozen-codebook home cell as a pure PROJECTION over column `e`
    * — rankCells' exact contract (d2 rounded to 6 BEFORE the argmin,
    * ties → smallest cid) folded into one expression against a LITERAL
    * codebook (≤64 rows, the 37-tap-kernel literal-bound class). This is
    * the STREAMING form of incAssign: no window, no join, no state —
    * per-row O(K) inside whole-stage codegen — so ingest assignment
    * needs no shuffle at all; only the downstream per-cell count is
    * stateful. StreamIngestSpec pins row-for-row equality with
    * incAssign on the same batch. array_min on (d2, cid) structs is the
    * lexicographic argmin == ORDER BY d2, cid LIMIT 1. */
  private[graft] def assignLitExpr(cents: Seq[(Long, Seq[Double])]): Column = {
    val entries = cents.map { case (cid, c) =>
      val cl = array(c.map(lit): _*)
      struct(
        round(dot(col("e"), col("e")) - lit(2.0) * dot(col("e"), cl)
          + dot(cl, cl), 6).as("d2"),
        lit(cid).as("cid"))
    }
    array_min(array(entries: _*)).getField("cid")
  }

  private[graft] def incAssign(batch: DataFrame, cents: DataFrame): DataFrame =
    batch.join(
      rankCells(batch.select(col("vec_id"), col("e")), cents)
        .where(col("rn") === 1)
        .select(col("vec_id"), col("cid").as("cell")),
      "vec_id")
      .select(col("vec_id"), col("e"), col("nrm"), col("cell"))

  /** The shared IVF probe pipeline (q78's serving probe and q189's
    * grown-index probe — factored round 16 on review: the block had
    * grown a near-verbatim copy per consumer, and its width pin is
    * exactly the kind of contract a missed copy regresses silently at
    * sf1): multi-probe cell ranking against a frozen codebook, the
    * width-pinned candidate-pair scoring join, and the per-query best
    * (cos desc, bid tiebreak) with candidate count.
    *
    * The `repartition(pairWidth, vec_id, cell)` is the round-15 AQE
    * fan-out fix and lives ONLY here for this shape: every relation
    * feeding the cell join is thin (n·nprobe rows) next to the
    * ~n·nprobe·(n/K) candidate-pair fan-out, so the planner broadcasts
    * the thin sides and the whole scoring pipeline — both joins, the
    * per-pair vec_dot, and the vec_id window whose requirement the join
    * output already satisfies — collapses into whatever stage feeds it
    * (at sf1: the 2-split embeddings file scan, a 69M-dot workload on
    * TWO tasks, ≈140-158 s). The numbered repartition survives planning
    * ONLY on a key set no upstream partitioning satisfies — (vec_id,
    * cell), not vec_id alone, which EnsureRequirements elides against
    * the probes window exchange — and REPARTITION_BY_NUM is the one
    * shuffle AQE never coalesces. sf1: 158 → 16.3 s (SCALE.md round-15
    * addendum); WidthPinSpec pins the executed-plan shape in every
    * consumer. q188 keeps its own variant (it carries the probe rank
    * through the pair stage); q185's ADC stage shares the pin
    * convention, not the scorer. */
  private def ivfProbeBest(s: SparkSession, queries: DataFrame,
      idx: DataFrame, cents: DataFrame, np: Int): DataFrame = {
    val probes = rankCells(queries.select(col("vec_id"), col("e")), cents)
      .where(col("rn") <= np)
      .select(col("vec_id"), col("cid").as("cell"))
    val pairs = queries.join(probes, "vec_id")
      .select(col("vec_id"), col("cell"), col("e"), col("nrm"))
      .repartition(pairWidth(s), col("vec_id"), col("cell"))
      .join(idx.select(col("vec_id").as("bid"), col("cell"),
        // the read-back schema has nullable elements — re-pin the
        // `double NOT NULL` element type vec_dot requires (same NaN-arm
        // trick as emb; components are never actually null)
        transform(col("e"), x => coalesce(x, lit(Double.NaN))).as("be"),
        col("nrm").as("bn")), Seq("cell"))
      .where(col("vec_id") =!= col("bid"))
      .select(col("vec_id"), col("bid"),
        round(dot(col("e"), col("be")) / (col("nrm") * col("bn")), 6)
          .as("cos"))
    val p = Window.partitionBy("vec_id")
    pairs
      .withColumn("n_cand", count(lit(1)).over(p))
      .withColumn("rn",
        row_number().over(p.orderBy(col("cos").desc, col("bid"))))
      .where(col("rn") === 1)
      .select(col("vec_id"), col("bid").as("best"), col("cos"),
        col("n_cand"))
  }

  private val grownIvfMemo =
    new BuildOnceMemo[(DataFrame, String, Int)]("graft_ivf_grown")

  private[graft] def grownIvfIndex(s: SparkSession, dir: String)
      : (DataFrame, String, Int) =
    grownIvfMemo.getOrBuild(s, dir)(buildGrownIvfIndex(s, dir))

  /** Build the index on the BASE split only, then run the INCREMENTAL
    * ingest: assign the delta batch to the FROZEN base cells (one
    * rankCells rn=1 pass — no Lloyd re-run anywhere after the build) and
    * append it partition-wise into the same cell-partitioned layout (new
    * files inside existing cell=... directories; no rewrite of base
    * files, no codebook rebuild — the maintenance loop a 100 TB serving
    * index actually runs on every arriving batch). Geometry (K, nprobe)
    * derives from the BASE count — frozen with the codebook, exactly
    * what an online index does between periodic full retrains. */
  private def buildGrownIvfIndex(s: SparkSession, dir: String)
      : (DataFrame, String, Int) = {
    val all = emb(s, dir)
    val base = all.where(col("vec_id") % INC_MOD =!= INC_REM)
    val (k, np) = kmGeomOf(base.count())
    val cents = kmCentroidsOf(base.select(col("vec_id"), col("e")), k)
      .localCheckpoint()
    val path = grownIvfMemo.nextPath(dir)
    incAssign(base, cents)
      .write.mode("overwrite").partitionBy("cell").parquet(path)
    incAssign(all.where(col("vec_id") % INC_MOD === INC_REM), cents)
      .write.mode("append").partitionBy("cell").parquet(path)
    (cents, path, np)
  }

  // ------------------------------------------------ product quantization

  /** PQ geometry (Jégou/Douze/Schmid, TPAMI 2011 "Product Quantization
    * for Nearest Neighbor Search"): PQ_M contiguous subspaces of
    * PQ_SUBDIM dims each; PQ_KSUB centroids per subspace, so one code is
    * 4 bits and a whole vector packs into one 32-bit word — 16× smaller
    * than the 64 int8s of q99 and 128× smaller than the raw doubles.
    * PQ_ITER Lloyd rounds per subspace: K'=16 on 8-dim subvectors
    * converges in 1-2 rounds (each centroid sees ~n/16 points in 8-d);
    * the oracle unrolls the SAME rounds, so depth is a pinned constant,
    * not a convergence question (the q68/q182 convention). */
  private val PQ_M = 8
  private val PQ_SUBDIM = 8
  private val PQ_KSUB = 16
  private val PQ_ITER = 2

  /** (vec_id, m, sub): the m-th contiguous PQ_SUBDIM-slice of every
    * vector — ONE projection with a generator explode, not PQ_M scans.
    * Element non-nullness survives slice(), so vec_dot stays happy. */
  private def subvecs(base: DataFrame): DataFrame =
    base.select(col("vec_id"),
        explode(sequence(lit(0), lit(PQ_M - 1))).as("m"), col("e"))
      .select(col("vec_id"), col("m"),
        slice(col("e"), col("m") * PQ_SUBDIM + 1, lit(PQ_SUBDIM)).as("sub"))

  /** Rank (vector, m) × subspace codebook by squared distance, rounded
    * to 6 BEFORE the rank, ties to the smallest cid — rankCells' exact
    * contract, keyed by subspace. The codebook (PQ_M·PQ_KSUB = 128 rows)
    * is always a broadcast. */
  /** Subvector↔centroid squared distance, rounded to 6 BEFORE any rank
    * or quantization — ONE definition for the assignment (pqRankSub)
    * and the ADC LUT (pqLut): the rounding scale and term shape are a
    * cross-engine contract with the oracle, so two copies could drift
    * (round-15 review finding). */
  private def pqD2: Column = round(
    dot(col("sub"), col("sub")) - lit(2.0) * dot(col("sub"), col("c"))
      + dot(col("c"), col("c")), 6)

  private def pqRankSub(sv: DataFrame, cents: DataFrame): DataFrame = {
    val w = Window.partitionBy("vec_id", "m").orderBy(col("d2"), col("cid"))
    sv.join(broadcast(cents), Seq("m"))
      .select(col("vec_id"), col("m"), col("cid"), pqD2.as("d2"))
      .withColumn("rn", row_number().over(w))
  }

  /** All PQ_M subspace codebooks after PQ_ITER Lloyd rounds — ONE joint
    * iteration keyed by m (8 independent k-means runs ride a single
    * grouped job per round, not 8 driver-sequenced jobs). Init: every
    * subspace seeds from the SAME PQ_KSUB hash-reservoir vectors (their
    * m-th slices) — one ranked limit serves all 8, and the oracle's CTE
    * stays one subquery. cid = the seeding vec_id (the q68 convention). */
  private def pqCodebooks(s: SparkSession, dir: String): DataFrame =
    pqCodebooksOf(emb(s, dir))

  /** Parameterized on the training split (round 16, the kmCentroidsOf
    * pattern): q184/q185 train on the whole corpus, q193 on the base
    * split only — same round algebra, one definition. */
  private def pqCodebooksOf(base: DataFrame): DataFrame = {
    val sv = subvecs(base)
    val seed = base
      .withColumn("hk", h48("pq:", col("vec_id").cast("string")))
      .orderBy(col("hk"), col("vec_id")).limit(PQ_KSUB)
      .select(col("vec_id"))
    var cents = sv.join(broadcast(seed), "vec_id")
      .select(col("m"), col("vec_id").as("cid"), col("sub").as("c"))
    for (_ <- 1 to PQ_ITER) {
      val assigned = pqRankSub(sv, cents).where(col("rn") === 1)
        .select("vec_id", "m", "cid")
      cents = assigned.join(sv, Seq("vec_id", "m"))
        .select(col("m"), col("cid"),
          posexplode(col("sub")).as(Seq("pos", "v")))
        .groupBy("m", "cid", "pos").agg(round(avg("v"), 9).as("cv"))
        .groupBy("m", "cid")
        .agg(transform(
          array_sort(collect_list(struct(col("pos"), col("cv")))),
          x => coalesce(x.getField("cv"), lit(Double.NaN))).as("c"))
        .localCheckpoint(false)
    }
    cents
  }

  /** Codebook + dense code index: idx = rank of cid within its subspace
    * (0..PQ_KSUB-1) — the 4-bit code. A window over 128 rows. */
  private def pqCentsIdx(cents: DataFrame): DataFrame =
    cents.withColumn("idx",
      (row_number().over(Window.partitionBy("m").orderBy("cid")) - 1)
        .cast("int"))

  /** Build-once registry for the PQ serving index (the q78 pattern): the
    * eagerly-checkpointed (m, cid, c, idx) codebook plus the path of the
    * persisted codes table — (vec_id, codes ARRAY<INT>, cell) PARTITIONED
    * BY the coarse IVF cell, so an IVFADC probe reads only its nprobe/K
    * cell directories and never the raw vectors. The coarse cells come
    * from the SAME persisted q78 index (one coarse quantizer for the
    * whole serving stack — the IVFADC layout of the paper). */
  private val pqIndexMemo =
    new BuildOnceMemo[(DataFrame, String)]("graft_pq_index")

  private def pqIndex(s: SparkSession, dir: String): (DataFrame, String) =
    pqIndexMemo.getOrBuild(s, dir)(buildPqIndex(s, dir))

  /** Frozen-codebook PQ encoding of ONE batch — (vec_id, codes). The
    * build-time encode and the q193 incremental append share this (the
    * incAssign discipline: two phases that cannot drift, and the spec
    * can pin that the append path plans no Lloyd update). */
  private[graft] def pqEncode(batch: DataFrame, centsIdx: DataFrame): DataFrame =
    pqRankSub(subvecs(batch), centsIdx)
      .where(col("rn") === 1)
      .join(centsIdx.select(col("m"), col("cid"), col("idx")),
        Seq("m", "cid"))
      .groupBy("vec_id")
      .agg(transform(
        array_sort(collect_list(struct(col("m"), col("idx")))),
        x => x.getField("idx")).as("codes"))

  private def buildPqIndex(s: SparkSession, dir: String): (DataFrame, String) = {
    val centsIdx = pqCentsIdx(pqCodebooks(s, dir)).localCheckpoint()
    val (_, ivfPath) = ivfIndex(s, dir) // one coarse quantizer, shared
    val home = s.read
      .schema("vec_id LONG, e ARRAY<DOUBLE>, nrm DOUBLE, cell LONG")
      .parquet(ivfPath).select(col("vec_id"), col("cell"))
    val path = pqIndexMemo.nextPath(dir)
    pqEncode(emb(s, dir), centsIdx).join(home, "vec_id")
      .write.mode("overwrite").partitionBy("cell").parquet(path)
    (centsIdx, path)
  }

  /** The query-side ADC lookup table, packed one row per query as a
    * MAP keyed by m·PQ_KSUB + idx — pdq = round(‖qsub−c‖²·10⁶), the
    * q104/q182 integer-quanta discipline (exact, order-free sums; no
    * float ever crosses an aggregation). A map, NOT a positional array
    * (round-15 review finding): an empty Lloyd cluster leaves a
    * subspace with < PQ_KSUB survivors, and a compacted array would
    * silently SHIFT every later subspace's entries under the static
    * position arithmetic — the map lookup is keyed, so surviving-idx
    * keys (the only ones codes can reference) always resolve exactly. */
  private def pqLut(s: SparkSession, dir: String, centsIdx: DataFrame): DataFrame =
    pqLutOf(subvecs(emb(s, dir)), centsIdx)

  private def pqLutOf(sv: DataFrame, centsIdx: DataFrame): DataFrame =
    sv.join(broadcast(centsIdx), Seq("m"))
      .select(col("vec_id").as("qid"),
        (col("m") * PQ_KSUB + col("idx")).as("pos"),
        // round AFTER the 10⁶ scale-up: a bare cast would floor the
        // 123.99999999-style wobble of double multiply to 123
        round(pqD2 * lit(1e6), 0).cast("long").as("pdq"))
      .groupBy("qid")
      .agg(map_from_entries(collect_list(struct(col("pos"), col("pdq"))))
        .as("lut"))

  /** IVFADC candidate ranking (vec_id, bid, adq, n_cand, rn): coarse
    * multi-probe cells select candidates (never all-pairs), the PQ code
    * + LUT score them — a STATIC 8-term integer expression inside
    * whole-stage codegen, no HOF, no explode: the per-pair cost is 8
    * keyed lookups on a ≤128-entry query-local map instead of a
    * 64-dim dot on raw vectors (the asymmetric-distance trade that makes
    * 100 TB serving RAM-resident). Rank = (adq asc, bid) — exact
    * integer order. */
  private def pqAdcRanked(s: SparkSession, dir: String): DataFrame =
    pqAdcRankedOf(s, dir, emb(s, dir).localCheckpoint())

  private def pqAdcRankedOf(s: SparkSession, dir: String,
      base: DataFrame): DataFrame = {
    val (centsIdx, path) = pqIndex(s, dir)
    val (_, np) = kmGeom(s, dir)
    val (coarseCents, _) = ivfIndex(s, dir)
    val idx = s.read.schema("vec_id LONG, codes ARRAY<INT>, cell LONG")
      .parquet(path)
    adcRanked(s, base, centsIdx, coarseCents, idx, np)
  }

  /** The shared IVFADC probe pipeline (q185's full-corpus probe and
    * q193's grown-index probe — the ivfProbeBest factoring applied to
    * the ADC scorer): coarse multi-probe ranking against a frozen coarse
    * codebook, the width-pinned LUT×codes candidate join, and the exact
    * integer ADC rank. ONE home for the scoring contract and the width
    * pin, so a missed copy cannot silently regress either. */
  private def adcRanked(s: SparkSession, queries: DataFrame,
      centsIdx: DataFrame, coarseCents: DataFrame, idx: DataFrame,
      np: Int): DataFrame = {
    val probes = rankCells(queries.select(col("vec_id"), col("e")),
        coarseCents)
      .where(col("rn") <= np)
      .select(col("vec_id"), col("cid").as("cell"))
    // same AQE fan-out-blindness remedy as q78's pair stage (see the
    // comment there): pin the ADC-stage width with the uncoalescible
    // (qid, cell) numbered repartition, or the 8-lookup scoring of
    // ~n·nprobe·(n/K) pairs and the qid window inherit a 2-task read
    val qside = pqLutOf(subvecs(queries), centsIdx).join(probes,
        col("qid") === col("vec_id")).drop("vec_id")
      .repartition(pairWidth(s), col("qid"), col("cell"))
    val adq = (0 until PQ_M).map { m =>
      element_at(col("lut"),
        element_at(col("codes"), m + 1) + lit(m * PQ_KSUB))
    }.reduce(_ + _)
    val pairs = qside
      .join(idx.select(col("vec_id").as("bid"), col("codes"), col("cell")),
        Seq("cell"))
      .where(col("qid") =!= col("bid"))
      .select(col("qid").as("vec_id"), col("bid"), adq.as("adq"))
    val p = Window.partitionBy("vec_id")
    pairs
      .withColumn("n_cand", count(lit(1)).over(p))
      .withColumn("rn",
        row_number().over(p.orderBy(col("adq"), col("bid"))))
  }

  private def pqBest(s: SparkSession, dir: String): DataFrame =
    pqBestOf(s, dir, emb(s, dir).localCheckpoint())

  private def pqBestOf(s: SparkSession, dir: String,
      base: DataFrame): DataFrame =
    pqAdcRankedOf(s, dir, base).where(col("rn") === 1)
      .select(col("vec_id"), col("bid").as("best"), col("adq"),
        col("n_cand"))

  // ------------------------------ incremental PQ maintenance (q193)

  private val grownPqMemo =
    new BuildOnceMemo[(DataFrame, String)]("graft_pq_grown")

  private[graft] def grownPqIndex(s: SparkSession, dir: String)
      : (DataFrame, String) =
    grownPqMemo.getOrBuild(s, dir)(buildGrownPqIndex(s, dir))

  /** q189's maintenance loop applied to the CODES tier: subspace
    * codebooks train on the BASE split only, the base split is encoded
    * and persisted cell-partitioned, then the delta batch is encoded
    * against the FROZEN codebooks (the same pqEncode the build ran — no
    * Lloyd re-run, no codebook rebuild, no base-file rewrite) and
    * appended partition-wise into the existing cell directories. The
    * coarse cells come from the GROWN q189 quantizer — one base-trained
    * coarse index for the whole incremental serving stack, exactly the
    * IVFADC layout a production index maintains between full retrains. */
  private def buildGrownPqIndex(s: SparkSession, dir: String)
      : (DataFrame, String) = {
    val all = emb(s, dir)
    val base = all.where(col("vec_id") % INC_MOD =!= INC_REM)
    val centsIdx = pqCentsIdx(pqCodebooksOf(base)).localCheckpoint()
    val (_, coarsePath, _) = grownIvfIndex(s, dir)
    val home = s.read
      .schema("vec_id LONG, e ARRAY<DOUBLE>, nrm DOUBLE, cell LONG")
      .parquet(coarsePath).select(col("vec_id"), col("cell"))
    val path = grownPqMemo.nextPath(dir)
    pqEncode(base, centsIdx).join(home, "vec_id")
      .write.mode("overwrite").partitionBy("cell").parquet(path)
    pqEncode(all.where(col("vec_id") % INC_MOD === INC_REM), centsIdx)
      .join(home, "vec_id")
      .write.mode("append").partitionBy("cell").parquet(path)
    (centsIdx, path)
  }

  /** Brute-force best neighbor over the whole corpus for a bounded query
    * set — ground truth for recall@1. */
  /** Shared brute-force scoring core (q34 + recall ground truth): exact
    * cosine of the first `nq` query vectors against the whole corpus,
    * ranked per query (cos desc, then id). ONE definition so the
    * rounding/tie-break contract can never drift between the top-k query
    * and the recall truth it is measured against. */
  private def bruteRanked(s: SparkSession, dir: String, nq: Int): DataFrame =
    bruteRankedOf(emb(s, dir), nq)

  private def bruteRankedOf(all: DataFrame, nq: Int): DataFrame = {
    val q = all.select(col("vec_id").as("qid"), col("e").as("qe"),
      col("nrm").as("qn")).where(col("qid") < nq)
    val scored = broadcast(q).crossJoin(all)
      .where(col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id"),
        round(dot(col("qe"), col("e")) / (col("qn") * col("nrm")), 6)
          .as("cos"))
    val w = Window.partitionBy("qid").orderBy(col("cos").desc, col("vec_id"))
    scored.withColumn("rn", row_number().over(w))
  }

  private[graft] def bruteBest(s: SparkSession, dir: String, nq: Int): DataFrame =
    bruteBestOf(emb(s, dir), nq)

  private def bruteBestOf(all: DataFrame, nq: Int): DataFrame =
    bruteRankedOf(all, nq)
      .where(col("rn") === 1)
      .select(col("qid"), col("vec_id").as("tbest"))

  /** Lloyd iteration count (oracle unrolls the same number of CTEs). */
  private val KM_ITER = 3

  /** Rank every (vector, centroid) pair by squared distance ‖v−c‖² =
    * v·v − 2 v·c + c·c, rounded to 6 BEFORE the rank (ties → smallest
    * cid) — the identical expression shape and rounding the DuckDB
    * oracle uses, so cell ranks match exactly. rn=1 is the home cell;
    * rn ≤ nprobe is the multi-probe set. */
  private def rankCells(base: DataFrame, cents: DataFrame): DataFrame = {
    val d2 = round(
      dot(col("e"), col("e")) - lit(2.0) * dot(col("e"), col("c"))
        + dot(col("c"), col("c")), 6)
    val w = Window.partitionBy("vec_id").orderBy(col("d2"), col("cid"))
    base.crossJoin(broadcast(cents))
      .select(col("vec_id"), col("cid"), d2.as("d2"))
      .withColumn("rn", row_number().over(w))
  }

  /** Home-cell assignment: the rn=1 slice of rankCells. */
  private def assignStep(base: DataFrame, cents: DataFrame): DataFrame =
    rankCells(base, cents)
      .where(col("rn") === 1)
      .select("vec_id", "cid", "d2")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // k-means over the embeddings (Lloyd, K ∝ √n, 3 iterations) — the
    // canonical clustering primitive of a training-data pipeline
    // (semantic bucketing / mixture balancing). Deterministic end-to-end
    // AND ordering-independent: init = the K vectors with the smallest
    // md5-derived hash (not `vec_id < K`, which collapses when low ids
    // are correlated); per-iteration centroids are per-dimension means
    // ROUNDED to 9 (summation-order noise) before the next assignment,
    // distances rounded to 6 before each argmin. Iterative shape matches
    // q65: one shuffle per step, lineage truncated with localCheckpoint;
    // the DuckDB oracle unrolls the same three iterations as CTEs, so
    // assignments agree exactly.
    "q68_kmeans" -> ((s, dir) => {
      val (k, _) = kmGeom(s, dir)
      val base = emb(s, dir).select(col("vec_id"), col("e"))
      assignStep(base, kmCentroids(s, dir, k))
        .groupBy("cid")
        .agg(count(lit(1)).as("n_members"),
          round(sum("d2"), 6).as("inertia"))
        .orderBy("cid")
    }),

    // TRUE IVF ANN, multi-probe: the coarse quantizer is the q68 k-means
    // codebook (data-driven centroids, not the sign heuristic of q35);
    // each query scores the vectors homed in its `nprobe` nearest cells.
    // K ∝ √n and nprobe ∝ K keep coverage a fixed ~16 % of the corpus at
    // any scale (n_cand in the output measures it); recall@1 of this
    // path is measured in q51 beside blocked and lsh.
    "q69_ann_ivf" -> ((s, dir) =>
      ivfBest(s, dir).orderBy("vec_id")),

    // The production serving shape of the SAME index: build once — the
    // k-means assignment persisted as a parquet table PARTITIONED BY its
    // IVF cell (ivfIndex, memoized per session+sfDir) — then probe the
    // prebuilt table. The probe phase never touches the k-means chain:
    // it ranks queries against the tiny CHECKPOINTED codebook (one
    // broadcast crossJoin against ≤64 rows) and joins the index on cell;
    // a selective online probe reads only its nprobe/K cell directories
    // (partition pruning on the layout q71 proves). Answers are
    // bit-identical to q69 (double vectors round-trip parquet exactly),
    // so the ORACLE IS q69's.
    "q78_ann_ivf_prebuilt" -> ((s, dir) => {
      val (_, np) = kmGeom(s, dir)
      val (cents, path) = ivfIndex(s, dir) // build once, memoized
      val idx = s.read
        // cell = a centroid's vec_id: LONG, like every id in the corpus —
        // an INT here would fail the partition-value parse (silently
        // dropping whole cells) once ids exceed 2^31
        .schema("vec_id LONG, e ARRAY<DOUBLE>, nrm DOUBLE, cell LONG")
        .parquet(path)
      // probe = the shared width-pinned scorer (rationale + the round-15
      // sf1 measurement at its definition); the query base is cut ONCE
      // (round 16) — ivfProbeBest references it twice (cell ranking +
      // pair join) and the static plan re-derived the cast+norm emb()
      // map per reference (4 embeddings scans, q69's defect class)
      ivfProbeBest(s, emb(s, dir).localCheckpoint(), idx, cents, np)
        .orderBy("vec_id")
    }),

    // PQ BUILD (round 15) — the vector-serving form the q68/q69/q78/q99
    // family lacked: subspace codebooks (PQ_M=8 × PQ_KSUB=16, Lloyd per
    // subspace in ONE grouped job per round) + per-vector 4-bit codes
    // packed into a single 32-bit word, persisted cell-partitioned (the
    // q78 layout) for the q185 probe. Output = the packed code plus the
    // fidelity metric a pipeline gates on — cos(original, PQ
    // reconstruction) per vector, computed WITHOUT materializing the
    // reconstruction (Σ_m sub·c and Σ_m c·c ride exact DECIMAL sums; one
    // double division at the output row). Complements q99: scalar int8
    // is 4× smaller / cos ≈ 0.9997, PQ is 128× smaller with honestly
    // lower fidelity the metric makes visible — the memory/recall dial
    // of the serving tier.
    "q184_pq_encode" -> ((s, dir) => {
      val (centsIdx, path) = pqIndex(s, dir) // build once: Lloyd + persist
      val sv = subvecs(emb(s, dir))
      // read the assignment BACK from the index the build just
      // persisted instead of re-running the 128-way distance ranking
      // (round-15 review finding): after the memoized build, each
      // execution pays one thin scan + two keyed joins, not a second
      // full assignment window
      val terms = s.read
        .schema("vec_id LONG, codes ARRAY<INT>, cell LONG").parquet(path)
        .select(col("vec_id"), posexplode(col("codes")).as(Seq("m", "idx")))
        .join(broadcast(centsIdx.select(col("m"), col("idx"), col("c"))),
          Seq("m", "idx"))
        .join(sv, Seq("vec_id", "m"))
        .select(col("vec_id"), col("idx"), col("m"),
          round(dot(col("sub"), col("c")), 9).cast("decimal(20,9)")
            .as("pnum"),
          round(dot(col("c"), col("c")), 9).cast("decimal(20,9)")
            .as("prq"))
      terms.groupBy("vec_id")
        .agg(sum(expr("shiftleft(CAST(idx AS BIGINT), 4 * m)"))
            .as("pq_code"),
          sum(col("pnum")).as("num"), sum(col("prq")).as("rq"))
        .join(emb(s, dir).select(col("vec_id"), col("nrm")), "vec_id")
        .select(col("vec_id"), col("pq_code"),
          round(col("num").cast("double") /
            (col("nrm") * sqrt(col("rq").cast("double"))), 6).as("cos_pq"))
        .orderBy("vec_id")
    }),

    // PQ PROBE (IVFADC — the paper's serving layout): coarse multi-probe
    // cells (the SAME persisted q78 quantizer — one coarse index for the
    // whole serving stack) select candidates, asymmetric distance scores
    // them from the persisted codes: 8 integer lookups per pair on a
    // query-local 128-entry LUT, never a raw-vector dot. The oracle
    // re-derives codebooks, codes, LUT, and candidates relationally in
    // DuckDB, so the approximate answer is still hash-exact. Recall of
    // this path vs ivf/lsh/blocked is measured in q51/q125 (method
    // 'pq') — PQ is the one method whose FINAL scorer is approximate,
    // exactly the divergence q125's graded metrics exist to expose.
    "q185_ann_pq" -> ((s, dir) =>
      pqBest(s, dir)
        .select(col("vec_id"), col("best"),
          (col("adq").cast("double") / lit(1e6)).as("adist"),
          col("n_cand"))
        .orderBy("vec_id")),

    // nprobe SWEEP (round 15) — q51 grades the IVF path at ONE
    // operating point (nprobe = kmGeom's 16%-coverage default); this
    // query measures the whole pruning/recall dial the serving tier
    // actually tunes: recall@1 and candidate coverage at nprobe ∈
    // {1,3,5,10}, against the same brute truth. ONE candidate-pair
    // pass at nprobe=10 with the probe rank retained; each smaller
    // nprobe's best is a CONDITIONAL struct-argmax over that pass
    // (max(struct(cos, −bid)) filtered to prn ≤ np — map-side
    // combinable, no per-np window, no re-scoring), so the sweep costs
    // one scoring pass + one aggregate, not 4× q69. Probes the same
    // persisted q78 index; pair stage carries the round-15 width pin.
    "q188_ann_nprobe_sweep" -> ((s, dir) => {
      import s.implicits._
      // ONE eager cut feeds the query side (2 references) AND the brute
      // truth pass (2 more) — the q51/q125 shared-base treatment; the
      // static plan scanned embeddings 6× before (round 16)
      val base = emb(s, dir).localCheckpoint()
      val (cents, path) = ivfIndex(s, dir)
      val idx = s.read
        .schema("vec_id LONG, e ARRAY<DOUBLE>, nrm DOUBLE, cell LONG")
        .parquet(path)
      val q = base.where(col("vec_id") < RECALL_Q)
      val probes = rankCells(q.select(col("vec_id"), col("e")), cents)
        .where(col("rn") <= SWEEP_NPS.max)
        .select(col("vec_id"), col("cid").as("cell"), col("rn").as("prn"))
      val pairs = q.join(probes, "vec_id")
        .select(col("vec_id"), col("cell"), col("prn"), col("e"),
          col("nrm"))
        .repartition(pairWidth(s), col("vec_id"), col("cell"))
        .join(idx.select(col("vec_id").as("bid"), col("cell"),
          transform(col("e"), x => coalesce(x, lit(Double.NaN))).as("be"),
          col("nrm").as("bn")), Seq("cell"))
        .where(col("vec_id") =!= col("bid"))
        .select(col("vec_id"), col("prn"), col("bid"),
          round(dot(col("e"), col("be")) / (col("nrm") * col("bn")), 6)
            .as("cos"))
      val aggCols = SWEEP_NPS.flatMap(np => Seq(
        max(when(col("prn") <= np,
          struct(col("cos").as("cos"), (-col("bid")).as("nb"))))
          .as(s"b$np"),
        count(when(col("prn") <= np, lit(1))).as(s"c$np")))
      val perq = pairs.groupBy("vec_id")
        .agg(aggCols.head, aggCols.tail: _*)
      val perNp = perq.select(col("vec_id").as("qid"),
          explode(array(SWEEP_NPS.map(np =>
            struct(lit(np).as("nprobe"),
              col(s"b$np").getField("nb").as("nb"),
              col(s"c$np").as("n_cand"))): _*)).as("r"))
        .select(col("qid"), col("r.nprobe").as("nprobe"),
          (-col("r.nb")).as("best"), col("r.n_cand").as("n_cand"))
      bruteBestOf(base, RECALL_Q)
        .crossJoin(broadcast(SWEEP_NPS.toDF("nprobe")))
        .join(perNp, Seq("qid", "nprobe"), "left")
        .groupBy("nprobe")
        .agg(count(lit(1)).as("n_queries"),
          count(col("best")).as("n_answered"),
          round(count(when(col("best") === col("tbest"), lit(1)))
            .cast("double") / count(lit(1)), 4).as("recall_strict"),
          round(avg(col("n_cand")), 4).as("avg_n_cand"))
        .orderBy("nprobe")
    }),

    // INCREMENTAL index maintenance (round 16) — the serving tier's
    // missing loop (VERDICT r15 #4): q78 builds once and probes many,
    // but a production corpus GROWS between full retrains. Here the
    // index is built on the base split (80 %: vec_id % 5 != 4), then the
    // delta batch (20 %) is ingested incrementally — assigned to the
    // FROZEN base cells by one rankCells pass and appended partition-
    // wise into the existing cell directories. No Lloyd re-run, no
    // codebook rebuild, no base-file rewrite (IvfIncrementalSpec pins
    // all three); the q136 sketch-once/merge-many shape applied to the
    // ANN tier. The probe then serves the GROWN index and the output
    // grades it exactly where an append bug would show: recall split by
    // WHERE THE TRUTH LIVES — queries whose true nearest neighbor is a
    // DELTA vector can only be answered if the appended rows are really
    // in the index (drop them and the delta row craters to 0 while
    // every build-time gate stays green). Pair stage carries the
    // round-15 width pin.
    "q189_ivf_incremental" -> ((s, dir) => {
      // one eager cut for probe queries + brute truth (the q188 story)
      val all = emb(s, dir).localCheckpoint()
      val (cents, path, np) = grownIvfIndex(s, dir)
      val idx = s.read
        .schema("vec_id LONG, e ARRAY<DOUBLE>, nrm DOUBLE, cell LONG")
        .parquet(path)
      val best = ivfProbeBest(s, all.where(col("vec_id") < RECALL_Q),
          idx, cents, np)
        .select(col("vec_id").as("qid"), col("best"), col("n_cand"))
      bruteBestOf(all, RECALL_Q)
        .withColumn("truth_part",
          when(col("tbest") % INC_MOD === INC_REM, lit("delta"))
            .otherwise(lit("base")))
        .join(best, Seq("qid"), "left")
        .groupBy("truth_part")
        .agg(count(lit(1)).as("n_queries"),
          count(col("best")).as("n_answered"),
          round(count(when(col("best") === col("tbest"), lit(1)))
            .cast("double") / count(lit(1)), 4).as("recall_strict"),
          round(avg(col("n_cand")), 4).as("avg_n_cand"))
        .orderBy("truth_part")
    }),

    // INCREMENTAL maintenance of the CODES tier (round 16) — q189 keeps
    // the coarse IVF index current between retrains; this closes the
    // same loop for the PQ serving layout q184/q185 built: codebooks
    // frozen at base-build time, the arriving batch encoded with the
    // SAME pqEncode the build ran and appended partition-wise into the
    // existing cell directories (PqIncrementalSpec pins no-Lloyd /
    // co-location / nonzero delta recall, the IvfIncrementalSpec
    // trio). The probe is the shared width-pinned ADC scorer over the
    // GROWN codes table — 8 integer LUT lookups per pair, never a raw
    // vector — and the output grades recall exactly where an append bug
    // would show: split by whether the true neighbor is a base or a
    // delta vector (drop the appended codes and the delta row craters
    // to 0 while every build-time gate stays green).
    "q193_pq_incremental" -> ((s, dir) => {
      // one eager cut for probe queries + brute truth (the q188 story)
      val all = emb(s, dir).localCheckpoint()
      val (coarseCents, _, np) = grownIvfIndex(s, dir)
      val (centsIdx, path) = grownPqIndex(s, dir)
      val idx = s.read.schema("vec_id LONG, codes ARRAY<INT>, cell LONG")
        .parquet(path)
      val best = adcRanked(s, all.where(col("vec_id") < RECALL_Q),
          centsIdx, coarseCents, idx, np)
        .where(col("rn") === 1)
        .select(col("vec_id").as("qid"), col("bid").as("best"),
          col("n_cand"))
      bruteBestOf(all, RECALL_Q)
        .withColumn("truth_part",
          when(col("tbest") % INC_MOD === INC_REM, lit("delta"))
            .otherwise(lit("base")))
        .join(best, Seq("qid"), "left")
        .groupBy("truth_part")
        .agg(count(lit(1)).as("n_queries"),
          count(col("best")).as("n_answered"),
          round(count(when(col("best") === col("tbest"), lit(1)))
            .cast("double") / count(lit(1)), 4).as("recall_strict"),
          round(avg(col("n_cand")), 4).as("avg_n_cand"))
        .orderBy("truth_part")
    }),

    // INDEX STALENESS monitor (round 16) — the decision metric the
    // incremental tier (q189/q193) leaves open: appended batches are
    // served correctly, but the codebook was trained on the base split,
    // and every append moves the data away from the frozen centroids.
    // Per cell: population, delta share, and drift² = ‖mean(members) −
    // frozen centroid‖² in the exact rankCells d2 algebra (rounded to 6;
    // member-mean components rounded to 9, the Lloyd-update discipline) —
    // the quantity a serving stack thresholds to schedule the next full
    // retrain. Scale shape: one scan of the persisted index (the mean
    // rides a per-dimension partial aggregate, map-side combinable), one
    // broadcast join against the ≤64-row codebook — no shuffle wider
    // than |cells|·dim.
    "q194_index_staleness" -> ((s, dir) => {
      val (cents, path, _) = grownIvfIndex(s, dir)
      val idx = s.read
        .schema("vec_id LONG, e ARRAY<DOUBLE>, nrm DOUBLE, cell LONG")
        .parquet(path)
      val stats = idx.groupBy("cell").agg(
        count(lit(1)).as("n_total"),
        count(when(col("vec_id") % INC_MOD === INC_REM, lit(1)))
          .as("n_delta"))
      val mean = idx
        .select(col("cell"), posexplode(col("e")).as(Seq("pos", "v")))
        .groupBy("cell", "pos").agg(round(avg("v"), 9).as("mv"))
        .groupBy("cell")
        .agg(transform(
          array_sort(collect_list(struct(col("pos"), col("mv")))),
          x => coalesce(x.getField("mv"), lit(Double.NaN))).as("mvec"))
      stats.join(mean, "cell")
        .join(broadcast(cents.select(col("cid").as("cell"), col("c"))),
          "cell")
        .select(col("cell"), col("n_total"), col("n_delta"),
          round(col("n_delta").cast("double") / col("n_total"), 4)
            .as("delta_frac"),
          round(dot(col("mvec"), col("mvec"))
            - lit(2.0) * dot(col("mvec"), col("c"))
            + dot(col("c"), col("c")), 6).as("drift2"))
        .orderBy("cell")
    }),

    // Brute-force cosine top-3 for a bounded query set (vec_id < 10) —
    // the exactness baseline every ANN variant is judged against.
    "q34_cosine_topk" -> ((s, dir) =>
      bruteRanked(s, dir, 10)
        .withColumn("rank", col("rn").cast("long"))
        .where(col("rank") <= 3)
        .select(col("qid"), col("vec_id"), col("cos"), col("rank"))
        .orderBy("qid", "rank")),

    // Data-driven blocked nearest neighbor (the IVF-style scale path):
    // the cell is an 8-bit sign quantizer of the vector itself (256 cells
    // whose population scales with data, not a 10-value category — the r3
    // label-block form had |block| ≈ n/10). Oracle-checked.
    "q35_ann_blocked" -> ((s, dir) =>
      blockedBest(s, dir).orderBy("vec_id")),

    // The CAPPED block policy the r8 scale sweep showed q35 needs
    // (SCALE.md finding #3): q35's per-cell self-join is quadratic in
    // the hottest cell — a 3,000-vector dense cluster cost it 49×
    // growth on 10× data while the capped q37/q69 stayed single-digit.
    // Here each cell keeps only its BLOCK_CAP smallest-id vectors as
    // CANDIDATE representatives; queries score against representatives
    // only, so the hot cell costs |cell|·BLOCK_CAP, never |cell|².
    // Recall trade is explicit and measurable (q51/q125 pattern): a
    // best neighbor outside the representative set is missed — the
    // same deal q37's BUCKET_CAP and q69's nprobe make. Every vector
    // sharing a cell with ≥1 representative other than itself gets a
    // row (vectors alone in their cell have no candidates, as in q35).
    "q142_ann_blocked_capped" -> ((s, dir) =>
      cappedBlockedBest(s, dir).orderBy("vec_id")),

    // Array/HOF family over embeddings: per-label count, mean norm, and
    // centroid norm (positional explode → per-dimension mean → L2).
    "q36_embedding_stats" -> ((s, dir) => {
      val base = emb(s, dir)
      val stats = base.groupBy("label").agg(
        count(lit(1)).as("n"), round(avg("nrm"), 6).as("avg_norm"))
      val centroid = base
        .select(col("label"), posexplode(col("e")).as(Seq("pos", "v")))
        .groupBy("label", "pos").agg(round(avg("v"), 9).as("c"))
        .groupBy("label").agg(round(sqrt(sum(col("c") * col("c"))), 6)
          .as("centroid_norm"))
      stats.join(centroid, "label").orderBy("label")
    }),

    // Banded random-hyperplane LSH ANN — now 8 bands × 8 bits with a
    // 50-vector bucket cap (the r3 form was a single 8-bit table: 256
    // buckets over the whole corpus ⇒ ~n²/256 uncapped pair fan-out).
    // Candidates union across bands; exact-cosine verify; oracle-checked.
    "q37_ann_lsh" -> ((s, dir) =>
      lshBest(s, dir).orderBy("vec_id")),

    // Embedding-cosine near-dup DEDUP (the fifth dedup family beside
    // exact/MinHash/SimHash/Jaccard): LSH band buckets generate the
    // candidates (never all-pairs), the exact cosine ≥ TAU verifies, and
    // the dedup decision is keep-smallest-id — a vector is a duplicate
    // iff ANY smaller-id vector (itself a duplicate or not) is within
    // TAU; dup_of is the smallest such partner, n_dups the number of
    // them. This is the one-pass ANY-smaller-id policy (what a single
    // groupBy computes at scale), NOT the sequential retained-set policy
    // the streaming twin implements (streamingNearDup checks only
    // RETAINED vectors, so on a chain a~b, b~c, a!~c the streaming side
    // keeps c while this query marks it dup_of b) — the two differ by
    // design on chains; each is pinned by its own oracle/spec. Fully
    // oracle-checked: DuckDB rebuilds the identical bucketed candidate
    // set from the same inlined hyperplane signs.
    "q75_embedding_near_dup" -> ((s, dir) =>
      lshScored(s, dir).where(col("cos") >= TAU)
        .groupBy("db")
        .agg(min(struct(col("da").as("da"), col("cos").as("cos"))).as("m"),
          count(lit(1)).as("n_dups"))
        .select(col("db").as("vec_id"), col("m.da").as("dup_of"),
          col("m.cos").as("cos"), col("n_dups"))
        .orderBy("vec_id")),

    // SemDeDup (Abbas et al. 2023, arXiv:2303.09540): semantic dedup
    // scoped to k-means clusters — the published web-scale recipe (they
    // prune LAION/C4 with exactly this shape). Reuses the q68 Lloyd
    // codebook verbatim: every vector is assigned to its home cell, and
    // WITHIN each cell a vector is dropped when some cell-mate with
    // strictly better keep-rank is ≥ TAU cosine-similar to it. Keep-rank
    // follows the paper: LOW centroid-cosine survives (the point furthest
    // from the cluster center is the most informative representative),
    // ties on vec_id. The paper's "drop if similar to any EARLIER point
    // in the ordering, survivor or not" one-pass rule is exactly this
    // dominance self-join — no iteration, no connected components (q65
    // covers the transitive-closure flavor; the two differ by design on
    // chains, like q75 vs q114).
    //
    // Scale: the pairwise work is Σ|cell|² — bounded by the CODEBOOK
    // GEOMETRY, not the corpus: K must grow ∝ n so cells stay O(1)-sized
    // (the paper runs 50k clusters on LAION-440M; kmGeom's K≤64 cap is a
    // test-scale artifact of sharing q68's oracle chain). One codebook
    // broadcast + one cell-keyed shuffle; no driver data-path state.
    "q129_semdedup" -> ((s, dir) => {
      val base = emb(s, dir)
      val (k, _) = kmGeom(s, dir)
      val cents = kmCentroids(s, dir, k)
      val home = assignStep(base.select(col("vec_id"), col("e")), cents)
      // centroid cosine once per vector (round 6 — the cross-engine rank
      // currency); localCheckpoint: both sides of the dominance join and
      // the final output reuse it without re-running k-means.
      val ranked = home.join(base, "vec_id")
        .join(broadcast(cents
          .select(col("cid"), col("c"),
            sqrt(dot(col("c"), col("c"))).as("cn"))), "cid")
        .select(col("vec_id"), col("cid").as("cell"), col("e"), col("nrm"),
          round(dot(col("e"), col("c")) / (col("nrm") * col("cn")), 6)
            .as("cent_cos"))
        .localCheckpoint(false)
      val a = ranked.select(col("cell"), col("vec_id").as("aid"),
        col("e").as("ae"), col("nrm").as("an"), col("cent_cos").as("ac"))
      val b = ranked.select(col("cell"), col("vec_id").as("bid"),
        col("e").as("be"), col("nrm").as("bn"), col("cent_cos").as("bc"))
      val dropped = a.join(b, Seq("cell"))
        .where(col("ac") < col("bc") ||
          (col("ac") === col("bc") && col("aid") < col("bid")))
        .where(round(dot(col("ae"), col("be")) / (col("an") * col("bn")), 6)
          >= TAU)
        .select(col("bid").as("vec_id")).distinct()
        .withColumn("dup", lit(true))
      ranked.join(dropped, Seq("vec_id"), "left")
        .select(col("vec_id"), col("cell"), col("cent_cos"),
          coalesce(col("dup"), lit(false)).as("is_dup"))
        .orderBy("vec_id")
    }),

    // Recall@1 of both ANN paths against the brute-force answer on a
    // 200-query sample — the offline-eval query a production ANN pipeline
    // ships with. n_answered counts queries where the path produced any
    // neighbor; n_correct counts exact agreement with the true best
    // (ties broken identically on both sides, so id-match is exact).
    "q51_ann_recall" -> ((s, dir) => {
      // ONE brute-force truth pass; both methods join onto it and the
      // per-method rows come from an explode, not a union (a union would
      // duplicate the expensive truth subtree in the physical plan).
      // ONE embeddings base for all six arms (round 16): each arm used
      // to re-derive emb() privately, so the eval re-scanned embeddings
      // and re-computed the cast/norm map once per arm. Eager checkpoint
      // (the jaccardPairs/degreeAssortativity discipline — the arms race
      // inside the one final job otherwise).
      val base = emb(s, dir).localCheckpoint()
      val truth = bruteBestOf(base, RECALL_Q)
      val joined = truth
        .join(blockedBestOf(base).where(col("vec_id") < RECALL_Q)
          .select(col("vec_id").as("qid"), col("best").as("b_best")),
          Seq("qid"), "left")
        .join(lshBestOf(base).where(col("vec_id") < RECALL_Q)
          .select(col("vec_id").as("qid"), col("best").as("l_best")),
          Seq("qid"), "left")
        .join(ivfBestOf(s, dir, base).where(col("vec_id") < RECALL_Q)
          .select(col("vec_id").as("qid"), col("best").as("i_best")),
          Seq("qid"), "left")
        .join(cappedBlockedBestOf(base).where(col("vec_id") < RECALL_Q)
          .select(col("vec_id").as("qid"), col("best").as("c_best")),
          Seq("qid"), "left")
        .join(pqBestOf(s, dir, base).where(col("vec_id") < RECALL_Q)
          .select(col("vec_id").as("qid"), col("best").as("p_best")),
          Seq("qid"), "left")
      joined.select(col("tbest"), explode(array(
          struct(lit("blocked").as("method"), col("b_best").as("best")),
          struct(lit("blocked_capped").as("method"), col("c_best").as("best")),
          struct(lit("ivf").as("method"), col("i_best").as("best")),
          struct(lit("lsh").as("method"), col("l_best").as("best")),
          struct(lit("pq").as("method"), col("p_best").as("best")))).as("m"))
        .groupBy(col("m.method").as("method"))
        .agg(count(lit(1)).as("n_queries"),
          count(col("m.best")).as("n_answered"),
          // per-answered rate: flatters a path that only answers easy
          // queries, so it is NOT the headline — NULL (not 0/0=NaN) when
          // a method answers nothing, matching the oracle's NULLIF: Spark
          // double 0.0/0 is NaN while DuckDB division by zero is NULL,
          // so the unguarded form hash-diverges exactly on degenerate data
          when(count(col("m.best")) > 0,
            round(count(when(col("m.best") === col("tbest"), lit(1)))
              .cast("double") / count(col("m.best")), 4)).as("recall_at_1"),
          // — standard recall (missing answer = miss) is:
          round(count(when(col("m.best") === col("tbest"), lit(1)))
            .cast("double") / count(lit(1)), 4).as("recall_strict"))
        .orderBy("method")
    }),

    // Ranking-quality eval: MRR@10 / nDCG@10 / recall@10 of the ANN
    // paths against the brute-force truth RANKING (grade = 11 −
    // truth rank for the true top-10, 0 otherwise) — recall@1 (q51)
    // cannot distinguish "true best at rank 2" from "not found at all",
    // which is exactly what a retrieval pipeline tunes. Shapes: ONE
    // brute truth pass (the q51 discipline), each method's list cut to
    // top-K by the ranked window (WindowGroupLimit), metric arithmetic
    // = integer grades × inlined decimal discount literals summed
    // exactly (order-free), one double division per metric at the end.
    // Mean nDCG = Σ dcg / (n · IDCG): the per-query ideal is constant
    // because the brute truth always has ≥ K non-self neighbors here.
    // Structural invariant (pinned in RankingQualitySpec): because every
    // path VERIFIES candidates with the same rounded-cosine/tie contract
    // as the truth, the true best ranks FIRST whenever it is a candidate
    // at all ⇒ mrr_at_10 ≡ recall_at_10 ≡ q51.recall_strict; nDCG is
    // the metric that genuinely adds information here (graded credit for
    // the rest of the true top-10). The metrics diverge only for a
    // method whose final scorer is approximate — since round 15 the
    // catalog HAS one: 'pq' ranks by the asymmetric PQ distance, so its
    // mrr can fall strictly below its recall@10 (RankingQualitySpec pins
    // the one-sided bounds), which is exactly what this query is for.
    "q125_ranking_quality" -> ((s, dir) => {
      import s.implicits._
      // shared eager-checkpointed embeddings base — the q51 discipline
      val base = emb(s, dir).localCheckpoint()
      val grades = bruteRankedOf(base, RECALL_Q)
        .where(col("rn") <= NDCG_K)
        .select(col("qid").as("gqid"), col("vec_id").as("gvid"),
          (lit(NDCG_K + 1) - col("rn")).cast("int").as("grade"))
      def cut(d: DataFrame, id: String, nbr: String, m: String) =
        d.where(col(id) < RECALL_Q && col("rn") <= NDCG_K)
          .select(lit(m).as("method"), col(id).as("qid"),
            col(nbr).as("bid"), col("rn").cast("int").as("pos"))
      val meth = cut(blockedRankedOf(base), "vec_id", "bid", "blocked")
        .unionByName(cut(ivfRankedOf(s, dir, base), "vec_id", "bid", "ivf"))
        .unionByName(cut(lshRankedOf(base), "vec_id", "other", "lsh"))
        .unionByName(cut(pqAdcRankedOf(s, dir, base), "vec_id", "bid", "pq"))
      val hit = meth.join(grades,
          col("qid") === col("gqid") && col("bid") === col("gvid"), "left")
        .select(col("method"), col("qid"), col("pos"),
          coalesce(col("grade"), lit(0)).as("rel"),
          when(col("grade") === NDCG_K, 1).otherwise(0).as("is_best"))
      val perq = hit
        .groupBy("method", "qid")
        .agg(sum(col("rel") * expr(DISC_CASE)).as("dcg"),
          max(col("is_best")).as("found"),
          max(when(col("is_best") === 1, expr(RR_CASE))).as("rr"))
      val grid = grades.select(col("gqid").as("qid")).distinct()
        .crossJoin(Seq("blocked", "ivf", "lsh", "pq").toDF("method"))
      grid.join(perq, Seq("method", "qid"), "left")
        .groupBy("method")
        .agg(count(lit(1)).as("n_queries"),
          round(sum(coalesce(col("found"), lit(0))).cast("double") /
            count(lit(1)), 4).as("recall_at_10"),
          round(sum(coalesce(col("rr"),
              lit(0).cast("decimal(14,12)"))).cast("double") /
            count(lit(1)), 6).as("mrr_at_10"),
          round(sum(coalesce(col("dcg"),
              lit(0).cast("decimal(14,12)"))).cast("double") /
            (count(lit(1)) * expr(s"CAST($IDCG AS DOUBLE)")), 6)
            .as("ndcg_at_10"))
        .orderBy("method")
    }),
  )

  // ------------------------------------------------------------- oracles

  /** DuckDB literal list for plane p's sign vector. */
  private def signList(p: Int): String =
    signs(p).map(v => if (v > 0) "1.0" else "-1.0").mkString("[", ",", "]")

  private val E_CTE =
    """e AS MATERIALIZED (
      | SELECT vec_id, embedding::DOUBLE[] AS e,
      |  SQRT(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS nrm
      | FROM embeddings)""".stripMargin

  /** Quantizer cell in DuckDB: same explicit left-assoc 8-dim sums. */
  private val CELL_SQL = (0 until 8).map { j =>
    val sub = (1 to 8).map(k => s"e[${j * 8 + k}]").mkString(" + ")
    s"CASE WHEN ROUND($sub, 9) > 0 THEN (1::BIGINT << $j) ELSE 0 END"
  }.mkString(" + ")

  private val BLOCKED_CTES =
    s"""cells AS MATERIALIZED (
       | SELECT vec_id, e, nrm, $CELL_SQL AS cell FROM e),
       |bpairs AS (
       | SELECT a.cell, a.vec_id, b.vec_id AS bid,
       |  ROUND(list_dot_product(a.e, b.e) / (a.nrm * b.nrm), 6) AS cos
       | FROM cells a JOIN cells b
       |   ON a.cell = b.cell AND a.vec_id != b.vec_id),
       |branked AS (
       | SELECT cell, vec_id, bid, cos,
       |  ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY cos DESC, bid) AS rn
       | FROM bpairs),
       |blocked AS (
       | SELECT vec_id, cell, bid AS best, cos FROM branked WHERE rn = 1)"""
      .stripMargin

  /** q142's capped-block chain, on top of the `cells` CTE (defined in
    * BLOCKED_CTES or standalone); ends in `capped(vec_id, cell, best,
    * cos)`. CTE names prefixed c- to avoid collisions in the q51 eval
    * where all four method chains coexist. */
  private val CAPPED_CTES =
    s"""creps AS (
       | SELECT bid, cell, be, bn FROM (
       |  SELECT vec_id AS bid, cell, e AS be, nrm AS bn,
       |   ROW_NUMBER() OVER (PARTITION BY cell ORDER BY vec_id) AS rk
       |  FROM cells)
       | WHERE rk <= $BLOCK_CAP),
       |cscored AS (
       | SELECT a.vec_id, a.cell, r.bid,
       |  ROUND(list_dot_product(a.e, r.be) / (a.nrm * r.bn), 6) AS cos
       | FROM cells a JOIN creps r
       |   ON a.cell = r.cell AND a.vec_id != r.bid),
       |cranked AS (
       | SELECT vec_id, cell, bid, cos,
       |  ROW_NUMBER() OVER (PARTITION BY vec_id
       |                     ORDER BY cos DESC, bid) AS rn
       | FROM cscored),
       |capped AS (
       | SELECT vec_id, cell, bid AS best, cos FROM cranked WHERE rn = 1)"""
      .stripMargin

  /** LSH band signatures in DuckDB from the same inlined sign lists. */
  private val LSH_CTES = {
    val bandCols = (0 until BANDS).map { b =>
      (0 until BITS).map { j =>
        val p = b * BITS + j
        s"CASE WHEN ROUND(list_dot_product(e, ${signList(p)}), 9) > 0 " +
          s"THEN (1::BIGINT << $j) ELSE 0 END"
      }.mkString("(", " + ", s") AS band$b")
    }.mkString(",\n  ")
    val bandCase = (0 until BANDS)
      .map(b => s"WHEN $b THEN band$b").mkString(" ")
    s"""sigs AS (
       | SELECT vec_id,
       |  $bandCols
       | FROM e),
       |lbands AS MATERIALIZED (
       | SELECT vec_id, t.band, CASE t.band $bandCase END AS sig
       | FROM sigs CROSS JOIN range($BANDS) t(band)),
       |lbuck AS (
       | SELECT band, sig FROM lbands GROUP BY band, sig
       | HAVING COUNT(*) BETWEEN 2 AND $BUCKET_CAP),
       |lmem AS (SELECT b.* FROM lbands b JOIN lbuck USING (band, sig)),
       |lcand AS (
       | SELECT DISTINCT a.vec_id AS da, b.vec_id AS db
       | FROM lmem a JOIN lmem b
       |   ON a.band = b.band AND a.sig = b.sig AND a.vec_id < b.vec_id),
       |lscored AS MATERIALIZED (
       | SELECT da, db,
       |  ROUND(list_dot_product(ea.e, eb.e) / (ea.nrm * eb.nrm), 6) AS cos
       | FROM lcand
       | JOIN e ea ON lcand.da = ea.vec_id
       | JOIN e eb ON lcand.db = eb.vec_id),
       |lboth AS (
       | SELECT da AS vec_id, db AS other, cos FROM lscored
       | UNION ALL SELECT db, da, cos FROM lscored),
       |lranked AS (
       | SELECT vec_id, other, cos,
       |  ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY cos DESC, other) AS rn
       | FROM lboth),
       |lsh AS (SELECT vec_id, other AS best, cos FROM lranked WHERE rn = 1)"""
      .stripMargin
  }

  private val TRUTH_CTES =
    s"""tscored AS (
       | SELECT q.vec_id AS qid, a.vec_id,
       |  ROUND(list_dot_product(q.e, a.e) / (q.nrm * a.nrm), 6) AS cos
       | FROM e q JOIN e a ON a.vec_id != q.vec_id
       | WHERE q.vec_id < $RECALL_Q),
       |tranked AS (
       | SELECT qid, vec_id, cos,
       |  ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cos DESC, vec_id) AS rn
       | FROM tscored),
       |truth AS (SELECT qid, vec_id AS tbest FROM tranked WHERE rn = 1)"""
      .stripMargin

  /** One unrolled Lloyd iteration for the q68 oracle. */
  private def kmIterSql(i: Int): String = kmIterSqlOn(i, "e")

  /** One unrolled Lloyd iteration over an arbitrary source CTE —
    * parameterized (round 16) so q189's oracle trains on the base split
    * (`eb`) with the identical round algebra. */
  private def kmIterSqlOn(i: Int, src: String): String = {
    s"""d$i AS (
       | SELECT v.vec_id, c.cid,
       |  ROUND(list_dot_product(v.e, v.e)
       |       - 2.0 * list_dot_product(v.e, c.c)
       |       + list_dot_product(c.c, c.c), 6) AS d2
       | FROM $src v CROSS JOIN c${i - 1} c),
       |a$i AS (
       | SELECT vec_id, cid, d2 FROM (
       |  SELECT vec_id, cid, d2,
       |   ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d2, cid) AS rn
       |  FROM d$i) WHERE rn = 1),
       |c$i AS (
       | SELECT cid, list(cv ORDER BY pos) AS c FROM (
       |  SELECT a.cid, t.pos, ROUND(AVG(t.comp), 9) AS cv
       |  FROM a$i a JOIN (
       |   SELECT vec_id, generate_subscripts(e, 1) AS pos,
       |    unnest(e) AS comp FROM $src) t USING (vec_id)
       |  GROUP BY a.cid, t.pos)
       | GROUP BY cid)""".stripMargin
  }

  /** Codebook geometry in SQL — the same K/nprobe formulas kmGeom
    * evaluates in Scala, derived from the data inside the oracle. */
  private def kkCteOn(src: String): String =
    s"""kk AS (
      | SELECT k, GREATEST(3, CAST(ROUND(0.16 * k, 0) AS BIGINT)) AS np
      | FROM (SELECT GREATEST(8, LEAST(64,
      |   CAST(ROUND(0.7 * SQRT(COUNT(*)), 0) AS BIGINT))) AS k FROM $src))"""
      .stripMargin
  private val KK_CTE = kkCteOn("e")

  /** Hash-seeded init: the K vectors with the smallest 48-bit md5 hash —
    * byte-identical to the Spark side's h48("km:", vec_id) reservoir. */
  private def c0CteOn(src: String): String =
    s"""c0 AS (
      | SELECT vec_id AS cid, e AS c FROM (
      |  SELECT vec_id, e, ROW_NUMBER() OVER (ORDER BY
      |    CAST('0x' || substr(md5('km:' || vec_id), 1, 12) AS BIGINT),
      |    vec_id) AS rn
      |  FROM $src)
      | WHERE rn <= (SELECT k FROM kk))""".stripMargin
  private val C0_CTE = c0CteOn("e")

  /** k-means CTE chain (c0..cN) + the multi-probe IVF best-neighbor CTEs,
    * ending in `ivf(vec_id, best, cos, n_cand)` — shared by q69 and q51. */
  private lazy val IVF_CTES =
    s"""$KK_CTE,
       |$C0_CTE,
       |${(1 to KM_ITER).map(kmIterSql).mkString(",\n")},
       |pr AS MATERIALIZED (
       | SELECT vec_id, cid, ROW_NUMBER() OVER (
       |   PARTITION BY vec_id ORDER BY d2, cid) AS rn
       | FROM (
       |  SELECT v.vec_id, c.cid,
       |   ROUND(list_dot_product(v.e, v.e)
       |        - 2.0 * list_dot_product(v.e, c.c)
       |        + list_dot_product(c.c, c.c), 6) AS d2
       |  FROM e v CROSS JOIN c$KM_ITER c)),
       |vhome AS (SELECT vec_id, cid AS cell FROM pr WHERE rn = 1),
       |vprobe AS (
       | SELECT vec_id, cid AS cell FROM pr WHERE rn <= (SELECT np FROM kk)),
       |ipairs AS (
       | SELECT q.vec_id, h.vec_id AS bid,
       |  ROUND(list_dot_product(ea.e, eb.e) / (ea.nrm * eb.nrm), 6) AS cos
       | FROM vprobe q JOIN vhome h
       |   ON q.cell = h.cell AND q.vec_id != h.vec_id
       | JOIN e ea ON q.vec_id = ea.vec_id
       | JOIN e eb ON h.vec_id = eb.vec_id),
       |iranked AS (
       | SELECT vec_id, bid, cos,
       |  COUNT(*) OVER (PARTITION BY vec_id) AS n_cand,
       |  ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY cos DESC, bid) AS rn
       | FROM ipairs),
       |ivf AS (
       | SELECT vec_id, bid AS best, cos, n_cand FROM iranked WHERE rn = 1)"""
      .stripMargin

  /** PQ oracle chain: subvector explode, hash-seeded per-subspace init,
    * PQ_ITER unrolled Lloyd rounds keyed by m, the indexed codebook
    * (pqc) and the final per-(vector, subspace) code (pcodes) — the
    * DuckDB mirror of pqCodebooks/pqCentsIdx/pqRankSub. */
  /** One unrolled per-subspace Lloyd round over an arbitrary training
    * subvector CTE — parameterized (round 16, the kmIterSqlOn pattern)
    * so q193's oracle trains on the base split (`subb`) with the
    * identical round algebra. */
  private def pqIterSqlOn(i: Int, src: String): String =
    s"""pqd$i AS (
       | SELECT s.vec_id, s.m, c.cid,
       |  ROUND(list_dot_product(s.sub, s.sub)
       |       - 2.0 * list_dot_product(s.sub, c.c)
       |       + list_dot_product(c.c, c.c), 6) AS d2
       | FROM $src s JOIN pq${i - 1} c ON s.m = c.m),
       |pqa$i AS (
       | SELECT vec_id, m, cid FROM (
       |  SELECT vec_id, m, cid,
       |   ROW_NUMBER() OVER (PARTITION BY vec_id, m ORDER BY d2, cid) AS rn
       |  FROM pqd$i) WHERE rn = 1),
       |pq$i AS (
       | SELECT m, cid, list(cv ORDER BY pos) AS c FROM (
       |  SELECT a.m, a.cid, t.pos, ROUND(AVG(t.comp), 9) AS cv
       |  FROM pqa$i a JOIN (
       |   SELECT vec_id, m, generate_subscripts(sub, 1) AS pos,
       |    unnest(sub) AS comp FROM $src) t
       |    ON a.vec_id = t.vec_id AND a.m = t.m
       |  GROUP BY a.m, a.cid, t.pos)
       | GROUP BY m, cid)""".stripMargin

  /** The sub CTE (all vectors' PQ slices — codes and LUTs need every
    * vector regardless of the training split). */
  private val SUB_CTE =
    s"""sub AS MATERIALIZED (
       | SELECT vec_id, m,
       |  e[m*$PQ_SUBDIM+1 : m*$PQ_SUBDIM+$PQ_SUBDIM] AS sub
       | FROM e CROSS JOIN (SELECT unnest(range($PQ_M)) AS m))"""
      .stripMargin

  /** Seed + PQ_ITER Lloyd rounds on (`vecSrc`, `subSrc`) + the frozen
    * codebook (pqc), the frozen assignment of EVERY vector (pqdf), and
    * the final codes (pcodes). Training reads only the `subSrc` slice;
    * assignment always runs the full `sub` — for vecSrc = e the two
    * coincide (q184/q185's original chain), for vecSrc = eb the
    * base/delta union is exactly "encode all against the final base
    * codebook", the q189 oracle argument applied to codes. */
  private def pqTrainCtes(vecSrc: String, subSrc: String): String =
    s"""pq0 AS (
       | SELECT m, vec_id AS cid, sub AS c FROM $subSrc
       | WHERE vec_id IN (
       |  SELECT vec_id FROM (
       |   SELECT vec_id, ROW_NUMBER() OVER (ORDER BY
       |     CAST('0x' || substr(md5('pq:' || vec_id), 1, 12) AS BIGINT),
       |     vec_id) AS rn
       |   FROM $vecSrc) WHERE rn <= $PQ_KSUB)),
       |${(1 to PQ_ITER).map(i => pqIterSqlOn(i, subSrc)).mkString(",\n")},
       |pqc AS MATERIALIZED (
       | SELECT m, cid, c,
       |  CAST(ROW_NUMBER() OVER (PARTITION BY m ORDER BY cid) - 1 AS INT)
       |    AS idx
       | FROM pq$PQ_ITER),
       |pqdf AS (
       | SELECT s.vec_id, s.m, c.cid,
       |  ROUND(list_dot_product(s.sub, s.sub)
       |       - 2.0 * list_dot_product(s.sub, c.c)
       |       + list_dot_product(c.c, c.c), 6) AS d2
       | FROM sub s JOIN pqc c ON s.m = c.m),
       |pcodes AS MATERIALIZED (
       | SELECT a.vec_id, a.m, a.cid, c.idx
       | FROM (
       |  SELECT vec_id, m, cid FROM (
       |   SELECT vec_id, m, cid,
       |    ROW_NUMBER() OVER (PARTITION BY vec_id, m ORDER BY d2, cid) AS rn
       |   FROM pqdf) WHERE rn = 1) a
       | JOIN pqc c ON a.m = c.m AND a.cid = c.cid)""".stripMargin

  /** q184/q185's original chain: train on the whole corpus. */
  private lazy val PQ_CTES = s"$SUB_CTE,\n${pqTrainCtes("e", "sub")}"

  /** The IVFADC probe chain on top of the PQ chain + a coarse
    * home/probe pair: integer-quanta LUT, cell-bucketed candidates, and
    * the exact integer ADC rank — ends in `pranked`. Parameterized
    * (round 16) so q193 probes the grown chain (gprobe/ghome, queries
    * restricted to the recall set) with the identical scoring text. */
  private def pqAdcCtesOn(probe: String, home: String,
      lutWhere: String): String =
    s"""lutq AS (
       | SELECT s.vec_id AS qid, c.m, c.cid,
       |  CAST(ROUND(ROUND(list_dot_product(s.sub, s.sub)
       |       - 2.0 * list_dot_product(s.sub, c.c)
       |       + list_dot_product(c.c, c.c), 6) * 1000000, 0) AS BIGINT)
       |    AS pdq
       | FROM sub s JOIN pqc c ON s.m = c.m$lutWhere),
       |pcand AS (
       | SELECT q.vec_id, h.vec_id AS bid FROM $probe q JOIN $home h
       |   ON q.cell = h.cell AND q.vec_id != h.vec_id),
       |pads AS (
       | SELECT p.vec_id, p.bid, CAST(SUM(l.pdq) AS BIGINT) AS adq
       | FROM pcand p
       | JOIN pcodes cb ON cb.vec_id = p.bid
       | JOIN lutq l ON l.qid = p.vec_id AND l.m = cb.m AND l.cid = cb.cid
       | GROUP BY p.vec_id, p.bid),
       |pranked AS (
       | SELECT vec_id, bid, adq,
       |  COUNT(*) OVER (PARTITION BY vec_id) AS n_cand,
       |  ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY adq, bid) AS rn
       | FROM pads)""".stripMargin

  private lazy val PQ_ADC_CTES = pqAdcCtesOn("vprobe", "vhome", "")

  /** The grown-index coarse chain shared by the q189 and q193 oracles:
    * Lloyd runs on the BASE split only (eb); the home/probe ranking runs
    * EVERY vector against those frozen centroids — the union of the
    * build-time base assignment and the append-time delta assignment is
    * exactly "assign all against the final base codebook". Geometry (kk)
    * also derives from eb, mirroring the frozen-with-the-codebook
    * contract. Ends in ghome (all vectors) / gprobe (recall queries). */
  private lazy val GROWN_COARSE_CTES =
    s"""eb AS MATERIALIZED (
       | SELECT * FROM e WHERE vec_id % $INC_MOD != $INC_REM),
       |${kkCteOn("eb")},
       |${c0CteOn("eb")},
       |${(1 to KM_ITER).map(i => kmIterSqlOn(i, "eb")).mkString(",\n")},
       |gpr AS MATERIALIZED (
       | SELECT vec_id, cid, ROW_NUMBER() OVER (
       |   PARTITION BY vec_id ORDER BY d2, cid) AS rn
       | FROM (
       |  SELECT v.vec_id, c.cid,
       |   ROUND(list_dot_product(v.e, v.e)
       |        - 2.0 * list_dot_product(v.e, c.c)
       |        + list_dot_product(c.c, c.c), 6) AS d2
       |  FROM e v CROSS JOIN c$KM_ITER c)),
       |ghome AS (SELECT vec_id, cid AS cell FROM gpr WHERE rn = 1),
       |gprobe AS (
       | SELECT vec_id, cid AS cell FROM gpr
       | WHERE rn <= (SELECT np FROM kk) AND vec_id < $RECALL_Q)"""
      .stripMargin

  /** The base/delta recall grade shared by q189/q193 — `best` must
    * expose (vec_id, best, n_cand). */
  private def grownGradeSql(best: String): String =
    s"""$TRUTH_CTES
       |SELECT
       | CASE WHEN t.tbest % $INC_MOD = $INC_REM THEN 'delta'
       |      ELSE 'base' END AS truth_part,
       | COUNT(*) AS n_queries,
       | COUNT(b.best) AS n_answered,
       | ROUND(CAST(COUNT(*) FILTER (b.best = t.tbest) AS DOUBLE)
       |       / COUNT(*), 4) AS recall_strict,
       | ROUND(AVG(b.n_cand), 4) AS avg_n_cand
       |FROM truth t LEFT JOIN $best b ON t.qid = b.vec_id
       |GROUP BY 1 ORDER BY truth_part""".stripMargin

  def oracles: Map[String, String] = Map(
    // The naive per-np form (one ranked/filtered pass per sweep point)
    // — the engine's one-pass conditional-argmax must reproduce it
    // exactly (shared-oracle equivalence, the q145/q183 convention).
    "q188_ann_nprobe_sweep" ->
      s"""WITH $E_CTE,
         |$TRUTH_CTES,
         |$IVF_CTES,
         |svp AS (
         | SELECT vec_id, cid AS cell, rn AS prn FROM pr
         | WHERE rn <= ${SWEEP_NPS.max} AND vec_id < $RECALL_Q),
         |sp AS MATERIALIZED (
         | SELECT q.vec_id, q.prn, h.vec_id AS bid,
         |  ROUND(list_dot_product(ea.e, eb.e) / (ea.nrm * eb.nrm), 6)
         |    AS cos
         | FROM svp q JOIN vhome h
         |   ON q.cell = h.cell AND q.vec_id != h.vec_id
         | JOIN e ea ON q.vec_id = ea.vec_id
         | JOIN e eb ON h.vec_id = eb.vec_id)
         |${SWEEP_NPS.map(np =>
            s"""SELECT $np AS nprobe, COUNT(*) AS n_queries,
               | COUNT(b.best) AS n_answered,
               | ROUND(CAST(COUNT(*) FILTER (b.best = t.tbest) AS DOUBLE)
               |       / COUNT(*), 4) AS recall_strict,
               | ROUND(AVG(b.n_cand), 4) AS avg_n_cand
               |FROM truth t LEFT JOIN (
               | SELECT vec_id,
               |  -- lexicographic struct max == Spark's
               |  -- max(struct(cos, -bid)): best cos, ties to lowest bid
               |  -(MAX(CASE WHEN prn <= $np
               |        THEN {'cos': cos, 'nb': -bid} END).nb) AS best,
               |  COUNT(*) FILTER (prn <= $np) AS n_cand
               | FROM sp GROUP BY vec_id) b ON t.qid = b.vec_id"""
              .stripMargin).mkString("\nUNION ALL\n")}
         |ORDER BY nprobe""".stripMargin,

    // Lloyd runs on the BASE split only (eb); the home/probe ranking runs
    // EVERY vector against those frozen centroids — the union of the
    // build-time base assignment and the append-time delta assignment is
    // exactly "assign all against the final base codebook", which is what
    // gpr computes. Geometry (kk) also derives from eb, mirroring the
    // frozen-with-the-codebook contract.
    "q189_ivf_incremental" ->
      s"""WITH $E_CTE,
         |$GROWN_COARSE_CTES,
         |gpairs AS (
         | SELECT q.vec_id, h.vec_id AS bid,
         |  ROUND(list_dot_product(ea.e, eh.e) / (ea.nrm * eh.nrm), 6)
         |    AS cos
         | FROM gprobe q JOIN ghome h
         |   ON q.cell = h.cell AND q.vec_id != h.vec_id
         | JOIN e ea ON q.vec_id = ea.vec_id
         | JOIN e eh ON h.vec_id = eh.vec_id),
         |gbest AS (
         | SELECT vec_id, bid AS best, n_cand FROM (
         |  SELECT vec_id, bid,
         |   COUNT(*) OVER (PARTITION BY vec_id) AS n_cand,
         |   ROW_NUMBER() OVER (PARTITION BY vec_id
         |     ORDER BY cos DESC, bid) AS rn
         |  FROM gpairs) WHERE rn = 1),
         |${grownGradeSql("gbest")}""".stripMargin,

    // The q189 coarse chain + the PQ chain trained on the SAME base
    // split (subb) + the ADC probe over the frozen-codebook codes of
    // every vector — the oracle mirror of "append the delta codes, no
    // Lloyd re-run" (see pqTrainCtes / GROWN_COARSE_CTES docs).
    "q193_pq_incremental" ->
      s"""WITH $E_CTE,
         |$GROWN_COARSE_CTES,
         |$SUB_CTE,
         |subb AS (
         | SELECT * FROM sub WHERE vec_id % $INC_MOD != $INC_REM),
         |${pqTrainCtes("eb", "subb")},
         |${pqAdcCtesOn("gprobe", "ghome",
             s" WHERE s.vec_id < $RECALL_Q")},
         |pbest AS (
         | SELECT vec_id, bid AS best, n_cand FROM pranked WHERE rn = 1),
         |${grownGradeSql("pbest")}""".stripMargin,

    // ghome is the oracle twin of the grown index's (vec_id → cell)
    // layout (q189's argument); the member mean re-derives kmIterSql's
    // centroid-update algebra grouped by the FROZEN home cell, and
    // drift² is rankCells' d2 between that mean and the frozen centroid.
    "q194_index_staleness" ->
      s"""WITH $E_CTE,
         |$GROWN_COARSE_CTES,
         |cellmean AS (
         | SELECT cell, list(mv ORDER BY pos) AS mvec FROM (
         |  SELECT h.cell, t.pos, ROUND(AVG(t.comp), 9) AS mv
         |  FROM ghome h JOIN (
         |   SELECT vec_id, generate_subscripts(e, 1) AS pos,
         |    unnest(e) AS comp FROM e) t USING (vec_id)
         |  GROUP BY h.cell, t.pos)
         | GROUP BY cell),
         |cellstats AS (
         | SELECT cell, COUNT(*) AS n_total,
         |  COUNT(*) FILTER (vec_id % $INC_MOD = $INC_REM) AS n_delta
         | FROM ghome GROUP BY cell)
         |SELECT s.cell, s.n_total, s.n_delta,
         | ROUND(CAST(s.n_delta AS DOUBLE) / s.n_total, 4) AS delta_frac,
         | ROUND(list_dot_product(m.mvec, m.mvec)
         |      - 2.0 * list_dot_product(m.mvec, c.c)
         |      + list_dot_product(c.c, c.c), 6) AS drift2
         |FROM cellstats s JOIN cellmean m USING (cell)
         |JOIN c$KM_ITER c ON s.cell = c.cid
         |ORDER BY s.cell""".stripMargin,

    "q184_pq_encode" ->
      s"""WITH $E_CTE,
         |$PQ_CTES
         |SELECT e.vec_id, pc.pq_code,
         | ROUND(CAST(pc.num AS DOUBLE)
         |      / (e.nrm * SQRT(CAST(pc.rq AS DOUBLE))), 6) AS cos_pq
         |FROM e JOIN (
         | SELECT p.vec_id,
         |  CAST(SUM(CAST(p.idx AS BIGINT) << (4 * p.m)) AS BIGINT)
         |    AS pq_code,
         |  SUM(CAST(ROUND(list_dot_product(s.sub, c.c), 9)
         |        AS DECIMAL(20,9))) AS num,
         |  SUM(CAST(ROUND(list_dot_product(c.c, c.c), 9)
         |        AS DECIMAL(20,9))) AS rq
         | FROM pcodes p
         | JOIN sub s ON p.vec_id = s.vec_id AND p.m = s.m
         | JOIN pqc c ON p.m = c.m AND p.cid = c.cid
         | GROUP BY p.vec_id) pc ON e.vec_id = pc.vec_id
         |ORDER BY e.vec_id""".stripMargin,

    "q185_ann_pq" ->
      s"""WITH $E_CTE,
         |$IVF_CTES,
         |$PQ_CTES,
         |$PQ_ADC_CTES
         |SELECT vec_id, bid AS best,
         | CAST(adq AS DOUBLE) / 1000000.0 AS adist, n_cand
         |FROM pranked WHERE rn = 1 ORDER BY vec_id""".stripMargin,

    "q69_ann_ivf" ->
      s"""WITH $E_CTE,
         |$IVF_CTES
         |SELECT vec_id, best, cos, n_cand FROM ivf ORDER BY vec_id"""
        .stripMargin,

    // bit-identical to q69 by construction (see the query's scaladoc)
    "q78_ann_ivf_prebuilt" ->
      s"""WITH $E_CTE,
         |$IVF_CTES
         |SELECT vec_id, best, cos, n_cand FROM ivf ORDER BY vec_id"""
        .stripMargin,

    "q68_kmeans" ->
      s"""WITH $E_CTE,
         |$KK_CTE,
         |$C0_CTE,
         |${(1 to KM_ITER).map(kmIterSql).mkString(",\n")},
         |dfin AS (
         | SELECT v.vec_id, c.cid,
         |  ROUND(list_dot_product(v.e, v.e)
         |       - 2.0 * list_dot_product(v.e, c.c)
         |       + list_dot_product(c.c, c.c), 6) AS d2
         | FROM e v CROSS JOIN c$KM_ITER c),
         |afin AS (
         | SELECT vec_id, cid, d2 FROM (
         |  SELECT vec_id, cid, d2,
         |   ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d2, cid) AS rn
         |  FROM dfin) WHERE rn = 1)
         |SELECT cid, COUNT(*) AS n_members, ROUND(SUM(d2), 6) AS inertia
         |FROM afin GROUP BY cid ORDER BY cid""".stripMargin,
    "q34_cosine_topk" ->
      s"""WITH $E_CTE,
         |scored AS (
         | SELECT q.vec_id AS qid, a.vec_id,
         |  ROUND(list_dot_product(q.e, a.e) / (q.nrm * a.nrm), 6) AS cos
         | FROM e q JOIN e a ON a.vec_id != q.vec_id
         | WHERE q.vec_id < 10),
         |ranked AS (
         | SELECT qid, vec_id, cos,
         |  ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cos DESC, vec_id) AS rank
         | FROM scored)
         |SELECT qid, vec_id, cos, rank FROM ranked
         |WHERE rank <= 3 ORDER BY qid, rank""".stripMargin,

    "q35_ann_blocked" ->
      s"""WITH $E_CTE,
         |$BLOCKED_CTES
         |SELECT vec_id, cell, best, cos FROM blocked ORDER BY vec_id"""
        .stripMargin,

    "q142_ann_blocked_capped" ->
      s"""WITH $E_CTE,
         |cells AS MATERIALIZED (
         | SELECT vec_id, e, nrm, $CELL_SQL AS cell FROM e),
         |$CAPPED_CTES
         |SELECT vec_id, cell, best, cos FROM capped
         |ORDER BY vec_id""".stripMargin,

    "q36_embedding_stats" ->
      """WITH e AS (
        | SELECT vec_id, CAST(label AS BIGINT) AS label,
        |  embedding::DOUBLE[] AS e,
        |  SQRT(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS nrm
        | FROM embeddings),
        |stats AS (
        | SELECT label, COUNT(*) AS n, ROUND(AVG(nrm), 6) AS avg_norm
        | FROM e GROUP BY label),
        |comps AS (
        | SELECT label, generate_subscripts(e, 1) - 1 AS pos, unnest(e) AS v
        | FROM e),
        |centroid AS (
        | SELECT label, ROUND(SQRT(SUM(c * c)), 6) AS centroid_norm FROM (
        |  SELECT label, pos, ROUND(AVG(v), 9) AS c FROM comps GROUP BY 1, 2)
        | GROUP BY label)
        |SELECT label, n, avg_norm, centroid_norm
        |FROM stats JOIN centroid USING (label) ORDER BY label""".stripMargin,

    "q37_ann_lsh" ->
      s"""WITH $E_CTE,
         |$LSH_CTES
         |SELECT vec_id, best, cos FROM lsh ORDER BY vec_id""".stripMargin,

    "q75_embedding_near_dup" ->
      s"""WITH $E_CTE,
         |$LSH_CTES,
         |ndup AS (
         | SELECT db AS vec_id, MIN(da) AS dup_of, COUNT(*) AS n_dups
         | FROM lscored WHERE cos >= $TAU GROUP BY db)
         |SELECT d.vec_id, d.dup_of, s.cos, d.n_dups
         |FROM ndup d JOIN lscored s
         |  ON s.db = d.vec_id AND s.da = d.dup_of
         |ORDER BY d.vec_id""".stripMargin,

    // Same Lloyd chain as q68's oracle (final codebook c$KM_ITER, final
    // assignment afin), then the SemDeDup dominance self-join per cell.
    "q129_semdedup" ->
      s"""WITH $E_CTE,
         |$KK_CTE,
         |$C0_CTE,
         |${(1 to KM_ITER).map(kmIterSql).mkString(",\n")},
         |dfin AS (
         | SELECT v.vec_id, c.cid,
         |  ROUND(list_dot_product(v.e, v.e)
         |       - 2.0 * list_dot_product(v.e, c.c)
         |       + list_dot_product(c.c, c.c), 6) AS d2
         | FROM e v CROSS JOIN c$KM_ITER c),
         |afin AS (
         | SELECT vec_id, cid, d2 FROM (
         |  SELECT vec_id, cid, d2,
         |   ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d2, cid) AS rn
         |  FROM dfin) WHERE rn = 1),
         |ranked AS MATERIALIZED (
         | SELECT a.vec_id, a.cid AS cell, v.e, v.nrm,
         |  ROUND(list_dot_product(v.e, c.c)
         |      / (v.nrm * SQRT(list_dot_product(c.c, c.c))), 6) AS cent_cos
         | FROM afin a JOIN e v USING (vec_id)
         | JOIN c$KM_ITER c ON a.cid = c.cid),
         |dropped AS (
         | SELECT DISTINCT b.vec_id
         | FROM ranked a JOIN ranked b ON a.cell = b.cell
         |  AND (a.cent_cos < b.cent_cos
         |    OR (a.cent_cos = b.cent_cos AND a.vec_id < b.vec_id))
         | WHERE ROUND(list_dot_product(a.e, b.e) / (a.nrm * b.nrm), 6)
         |   >= $TAU)
         |SELECT r.vec_id, r.cell, r.cent_cos,
         | (d.vec_id IS NOT NULL) AS is_dup
         |FROM ranked r LEFT JOIN dropped d ON r.vec_id = d.vec_id
         |ORDER BY r.vec_id""".stripMargin,

    "q51_ann_recall" ->
      s"""WITH $E_CTE,
         |$TRUTH_CTES,
         |$BLOCKED_CTES,
         |$CAPPED_CTES,
         |$LSH_CTES,
         |$IVF_CTES,
         |$PQ_CTES,
         |$PQ_ADC_CTES,
         |ev AS (
         | SELECT 'blocked' AS method, t.qid, m.best, t.tbest
         | FROM truth t LEFT JOIN blocked m
         |   ON t.qid = m.vec_id AND m.vec_id < $RECALL_Q
         | UNION ALL
         | SELECT 'blocked_capped', t.qid, m.best, t.tbest
         | FROM truth t LEFT JOIN capped m
         |   ON t.qid = m.vec_id AND m.vec_id < $RECALL_Q
         | UNION ALL
         | SELECT 'ivf', t.qid, m.best, t.tbest
         | FROM truth t LEFT JOIN ivf m
         |   ON t.qid = m.vec_id AND m.vec_id < $RECALL_Q
         | UNION ALL
         | SELECT 'lsh', t.qid, m.best, t.tbest
         | FROM truth t LEFT JOIN lsh m
         |   ON t.qid = m.vec_id AND m.vec_id < $RECALL_Q
         | UNION ALL
         | SELECT 'pq', t.qid, m.best, t.tbest
         | FROM truth t LEFT JOIN
         |  (SELECT vec_id, bid AS best FROM pranked WHERE rn = 1) m
         |   ON t.qid = m.vec_id AND m.vec_id < $RECALL_Q)
         |SELECT method, COUNT(*) AS n_queries,
         | COUNT(best) AS n_answered,
         | ROUND(CAST(COUNT(*) FILTER (best = tbest) AS DOUBLE)
         |       / NULLIF(COUNT(best), 0), 4) AS recall_at_1,
         | ROUND(CAST(COUNT(*) FILTER (best = tbest) AS DOUBLE)
         |       / COUNT(*), 4) AS recall_strict
         |FROM ev GROUP BY method ORDER BY method""".stripMargin,

    "q125_ranking_quality" ->
      s"""WITH $E_CTE,
         |$TRUTH_CTES,
         |$BLOCKED_CTES,
         |$LSH_CTES,
         |$IVF_CTES,
         |$PQ_CTES,
         |$PQ_ADC_CTES,
         |grades AS MATERIALIZED (
         | SELECT qid, vec_id, CAST($NDCG_K + 1 - rn AS INT) AS grade
         | FROM tranked WHERE rn <= $NDCG_K),
         |meth AS (
         | SELECT 'blocked' AS method, vec_id AS qid, bid, rn AS pos
         | FROM branked WHERE vec_id < $RECALL_Q AND rn <= $NDCG_K
         | UNION ALL
         | SELECT 'ivf', vec_id, bid, rn FROM iranked
         | WHERE vec_id < $RECALL_Q AND rn <= $NDCG_K
         | UNION ALL
         | SELECT 'lsh', vec_id, other, rn FROM lranked
         | WHERE vec_id < $RECALL_Q AND rn <= $NDCG_K
         | UNION ALL
         | SELECT 'pq', vec_id, bid, rn FROM pranked
         | WHERE vec_id < $RECALL_Q AND rn <= $NDCG_K),
         |hit AS (
         | SELECT m.method, m.qid, m.pos,
         |  COALESCE(g.grade, 0) AS rel,
         |  CASE WHEN g.grade = $NDCG_K THEN 1 ELSE 0 END AS is_best
         | FROM meth m LEFT JOIN grades g
         |   ON m.qid = g.qid AND m.bid = g.vec_id),
         |perq AS (
         | SELECT method, qid,
         |  SUM(rel * ($DISC_CASE)) AS dcg,
         |  MAX(is_best) AS found,
         |  MAX(CASE WHEN is_best = 1 THEN ($RR_CASE) END) AS rr
         | FROM hit GROUP BY 1, 2),
         |qbase AS (
         | SELECT m.method, q.qid
         | FROM (SELECT DISTINCT qid FROM tranked) q
         | CROSS JOIN (VALUES ('blocked'), ('ivf'), ('lsh'), ('pq'))
         |   m(method))
         |SELECT b.method, COUNT(*) AS n_queries,
         | ROUND(CAST(SUM(COALESCE(p.found, 0)) AS DOUBLE)
         |       / COUNT(*), 4) AS recall_at_10,
         | ROUND(CAST(SUM(COALESCE(p.rr, CAST(0 AS DECIMAL(14,12))))
         |         AS DOUBLE) / COUNT(*), 6) AS mrr_at_10,
         | ROUND(CAST(SUM(COALESCE(p.dcg, CAST(0 AS DECIMAL(14,12))))
         |         AS DOUBLE)
         |       / (COUNT(*) * CAST($IDCG AS DOUBLE)), 6) AS ndcg_at_10
         |FROM qbase b LEFT JOIN perq p
         |  ON b.method = p.method AND b.qid = p.qid
         |GROUP BY 1 ORDER BY 1""".stripMargin,
  )
}
