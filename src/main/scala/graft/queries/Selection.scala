package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.model.Tables

/** Round-6 data-selection tier — the operators that decide WHICH data a
  * training run sees, sitting between curation (Curation/TextOps) and
  * batching (q84): importance-weighted domain selection (DSIR, Xie et
  * al. NeurIPS'23), contrastive positive/hard-negative pair mining for
  * embedding-model training, the salted-join skew remedy promoted from
  * aggregation (q80) to the join side, and the adjacent-pair statistics
  * that seed a BPE tokenizer-training run.
  *
  * Scale stance: the two language models in q115 reduce to ONE grouped
  * frequency table each (hash shuffle on token) merged by an outer join
  * on the same key; the corpus-level scalars (token totals, vocab size)
  * are 1-row frames broadcast back (the J2 pattern). q116 bounds its
  * query set (the q34 contract: brute force is for bounded eval sets —
  * production mining would swap the scored subtree for the q69 IVF
  * candidates without touching the rank/role logic). q117 replicates
  * the DIM side S× and salts the fact side per-ROW, so one skewed user
  * spreads over S tasks — the join is pinned shuffle-hash because at
  * production scale the dim does not broadcast (here it would, hiding
  * the very exchange the query demonstrates). q118's top-k is a
  * distributed TakeOrdered (orderBy+limit), never a single-partition
  * window — the q90 vocabulary pattern.
  *
  * Determinism: q115 pins each token's log-ratio to DECIMAL(28,12)
  * before the per-doc sum (decimal addition is order-free — the q82
  * discipline); q116 rounds cosines to 6 decimals before ranking and
  * breaks ties on vec_id; q117 outputs exact counts and decimal sums
  * (the Exact boundary); q118's ordering (cnt desc, a, b) is total.
  */
object Selection {

  private def docs(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir).documents

  /** DSIR target domain: the curated slice importance weights aim at
    * (interpolated into the q115 oracle, so the two sides can't drift). */
  private[graft] val DSIR_TARGET = Seq("src1", "src2")
  private def dsirTargetSql: String =
    DSIR_TARGET.map(t => s"'$t'").mkString(", ")

  /** Salt fan-out for the skew-join remedy; must match the oracle-free
    * side only (the oracle is the UNSALTED join — salting must not
    * change the answer). */
  private[graft] val SALT = 8

  /** Merge-candidate report size (interpolated into the q118 oracle). */
  private[graft] val PAIR_K = 20

  /** MMR geometry: selection size and the relevance/diversity tradeoff.
    * Must match the q119 oracle's unroll depth and literals. */
  private[graft] val MMR_K = 5
  private[graft] val MMR_LAMBDA = 0.7
  /** The diversity weight as its own literal — NOT computed as
    * 1.0 − λ, whose double value (0.30000000000000004) differs from
    * the parsed literal 0.3 the oracle uses. */
  private[graft] val MMR_MU = 0.3

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // DSIR importance-weighted selection (Xie et al., "Data Selection
    // for Language Models via Importance Resampling"): score every doc
    // by how much more likely its tokens are under a TARGET-domain
    // unigram model than under the RAW-corpus model,
    //   w(doc) = (1/n) Σ_tok [ln p_t(tok) − ln p_r(tok)],
    // with add-1 smoothing over the joint vocabulary so raw-only tokens
    // stay finite. selected = w > 0 ("more target-like than raw").
    // Per-token log-ratios are pinned to DECIMAL(28,12) BEFORE the
    // per-doc sum (order-free summation, the q82 discipline); the mean
    // divides in double and rounds 4 at the output boundary.
    "q115_dsir_selection" -> ((s, dir) => {
      val toks = docs(s, dir)
        .select(col("doc_id"), col("source"),
          explode(split(col("text"), " ")).as("tok"))
      // BOTH language models from ONE grouped pass (conditional count
      // for the target side — no second explode, no outer merge join);
      // the corpus scalars are one 1-row frame off it, broadcast back
      // (J2). Two corpus scans total: this freq build + the doc rejoin.
      val freq = toks.groupBy("tok").agg(count(lit(1)).as("tf_r"),
        count(when(col("source").isin(DSIR_TARGET: _*), 1)).as("tf_t"))
      val tot = freq.agg(count(lit(1)).as("v"), sum("tf_r").as("n_r"),
        sum("tf_t").as("n_t"))
      val model = freq
        .crossJoin(broadcast(tot))
        .select(col("tok"),
          (log((col("tf_t") + 1).cast("double") /
               (col("n_t") + col("v")).cast("double")) -
           log((col("tf_r") + 1).cast("double") /
               (col("n_r") + col("v")).cast("double")))
            .cast("decimal(28,12)").as("lw"))
      toks.join(model, "tok")
        .groupBy("doc_id", "source")
        .agg(count(lit(1)).as("n_toks"),
          round(sum("lw").cast("double") / count(lit(1)), 4)
            .as("dsir_weight"))
        .withColumn("selected", col("dsir_weight") > 0)
        .orderBy("doc_id")
    }),

    // Contrastive pair mining — the training-set construction step for
    // embedding models (sentence-transformers style): for each query
    // vector, its nearest SAME-label neighbor (the positive) and the 2
    // nearest DIFFERENT-label neighbors (hard negatives — close in
    // embedding space, wrong by label: exactly the pairs a contrastive
    // loss learns most from). One scored subtree feeds both branches;
    // cosines round to 6 before ranking, ties break on vec_id (the q34
    // contract). Query set bounded to vec_id < 10 — production mining
    // would swap the brute subtree for q69's IVF candidates.
    "q116_hard_negatives" -> ((s, dir) => {
      val all = VectorOps.emb(s, dir)
      val q = all.where(col("vec_id") < 10)
        .select(col("vec_id").as("qid"), col("label").as("qlabel"),
          col("e").as("qe"), col("nrm").as("qn"))
      val scored = broadcast(q).crossJoin(all)
        .where(col("vec_id") =!= col("qid"))
        .select(col("qid"), col("qlabel"), col("vec_id"), col("label"),
          round(call_function("vec_dot", col("qe"), col("e")) /
            (col("qn") * col("nrm")), 6).as("cos"))
        // One physical evaluation for both role branches: their filters
        // differ below the qid exchange, so ReuseExchange alone cannot
        // dedup the broadcast crossJoin (the q119 `rel` idiom).
        .localCheckpoint(false)
      val w = Window.partitionBy("qid")
        .orderBy(col("cos").desc, col("vec_id"))
      val pos = scored.where(col("label") === col("qlabel"))
        .withColumn("rnk", row_number().over(w)).where(col("rnk") === 1)
        .withColumn("role", lit("positive"))
      val neg = scored.where(col("label") =!= col("qlabel"))
        .withColumn("rnk", row_number().over(w)).where(col("rnk") <= 2)
        .withColumn("role", lit("hard_negative"))
      pos.unionByName(neg)
        .select(col("qid"), col("role"), col("rnk").cast("long").as("rnk"),
          col("vec_id"), col("label"), col("cos"))
        .orderBy("qid", "role", "rnk")
    }),

    // Salted skew JOIN — q80's remedy promoted from aggregation to the
    // join itself: the dim side (customer) is replicated SALT× and the
    // fact side (events) salts per-ROW on event_id, so a hot user_id's
    // rows spread across SALT join tasks instead of pinning one. The
    // join is pinned shuffle-hash: at production scale the dim does NOT
    // broadcast, and auto-broadcast here would erase the salted
    // exchange the query exists to demonstrate. The ORACLE is the
    // plain unsalted join — the remedy must change the plan, never the
    // answer. Money stays decimal to the output boundary (Exact).
    "q117_salted_join" -> ((s, dir) => {
      val t = Tables(s, dir)
      val facts = t.events
        .select(col("user_id"), Exact.dPrice(col("value")).as("v"),
          pmod(xxhash64(col("event_id")), lit(SALT.toLong)).as("salt"))
      val dim = t.customer
        .select(col("c_custkey"), col("c_nationkey"),
          explode(sequence(lit(0L), lit(SALT.toLong - 1))).as("salt"))
      facts
        .join(dim.hint("shuffle_hash"),
          facts("user_id") === dim("c_custkey") &&
            facts("salt") === dim("salt"))
        .groupBy("c_nationkey")
        .agg(count(lit(1)).as("n_events"),
          Exact.asD(sum(col("v"))).as("sum_value"))
        .orderBy("c_nationkey")
    }),

    // BPE merge-pair statistics — step 1 of every tokenizer-training
    // run (Sennrich et al. 2016): count adjacent token pairs across the
    // corpus and report the top-K merge candidates. The pair explode is
    // per-doc bounded (n−1 pairs); the top-k is a distributed
    // TakeOrdered on the total order (cnt desc, a, b) — no
    // single-partition window (the q90 pattern). A full training loop
    // re-runs this after each merge; the per-round statistic is this
    // exact query.
    "q118_merge_pairs" -> ((s, dir) => {
      val toks = docs(s, dir)
        .select(split(col("text"), " ").as("toks"))
        .where(size(col("toks")) >= 2)
      toks
        // sequence(1, size-1) is safe under the >= 2 filter (Spark's
        // sequence DESCENDS when end < start — the shingles guard).
        .select(explode(expr(
          "transform(sequence(1, size(toks) - 1), " +
            "i -> struct(toks[i - 1] AS a, toks[i] AS b))")).as("p"))
        .select(col("p.a").as("a"), col("p.b").as("b"))
        .groupBy("a", "b").agg(count(lit(1)).as("cnt"))
        .orderBy(col("cnt").desc, col("a"), col("b"))
        .limit(PAIR_K)
    }),

    // MMR diverse selection (Carbonell & Goldstein '98) — the greedy
    // diversity-aware pick every "select a representative subset"
    // curation step runs: round r adds the vector maximizing
    //   score = λ·rel − (1−λ)·max_{s ∈ selected} cos(v, s),
    // rel = cosine to the corpus centroid, empty-set max = 0 (so round
    // 1 scores λ·rel under the SAME formula the oracle unrolls). Each
    // round is ONE distributed pass over the corpus against a
    // broadcast ≤K selected set — O(K·n) total, the canonical
    // distributed form of the greedy facility-location family; driver
    // state is K rows (the Components/kmeans fixpoint-loop exception:
    // iterative driver state bounded by the iteration count, never by
    // the data). Determinism: centroid components round 9 (q36), all
    // cosines and scores round 6 before the argmax, ties on vec_id.
    "q119_mmr_selection" -> ((s, dir) => {
      val base = VectorOps.emb(s, dir)
      // Corpus centroid as ONE array row built distributively (64
      // structs through collect_list), broadcast-rejoined — no driver
      // collect on the data path.
      val cent = base
        .select(posexplode(col("e")).as(Seq("pos", "v")))
        .groupBy("pos").agg(round(avg("v"), 9).as("c"))
        .agg(sort_array(collect_list(struct(col("pos"), col("c"))))
          .as("pc"))
        // coalesce pins `double NOT NULL` elements for vec_dot (the emb
        // contract); centroid components are never actually null.
        .select(transform(col("pc"),
          x => coalesce(x.getField("c"), lit(Double.NaN))).as("c"))
        .select(col("c"),
          sqrt(call_function("vec_dot", col("c"), col("c"))).as("cn"))
      val rel = base.crossJoin(broadcast(cent))
        .select(col("vec_id"), col("e"), col("nrm"),
          round(call_function("vec_dot", col("e"), col("c")) /
            (col("nrm") * col("cn")), 6).as("rel"))
        .localCheckpoint(false)
      val lam = MMR_LAMBDA
      // BATCHED lazy greedy (VERDICT r6 #7): the sequential form ran one
      // Spark job per pick — correct, but K jobs of scheduler latency at
      // scale. Batching is exact because MMR scores are MONOTONE
      // NON-INCREASING in the selected set (maxsim only grows; round(·,6)
      // is monotone): fetch the top-(K−|sel|) candidates in ONE job, then
      // replay the greedy driver-side inside the batch, recomputing each
      // remaining candidate's score against every new pick with the
      // query's exact arithmetic (vec_dot's left-to-right accumulation,
      // per-pair round-6 before max, HALF_UP — the same contract the
      // SelectionSpec local model pins). A pick is provably the GLOBAL
      // argmax while its recomputed score stays strictly above the
      // fetch-time score of the batch's last member: every outsider
      // scored ≤ that bound when fetched and can only have decayed since.
      // On == the pick could lose a vec_id tie-break to an unseen
      // outsider, so the batch is abandoned and refetched. Typical run:
      // 1 fetch job (diversity rarely promotes an outsider past the
      // bound); worst case K jobs — the sequential policy, pick for pick.
      def rnd6(x: Double): Double =
        BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      def ddot(a: Seq[Double], b: Seq[Double]): Double = {
        val n = math.min(a.length, b.length)
        var acc = 0.0; var i = 0
        while (i < n) { acc += a(i) * b(i); i += 1 }
        acc
      }
      final case class Cand(id: Long, e: Seq[Double], nrm: Double,
                            rel: Double, maxsim: Double, score: Double)
      var sel = Vector.empty[(Long, Seq[Double], Double, Double, Double)]
      var exhausted = false // corpus smaller than K: stop early
      while (!exhausted && sel.length < MMR_K) {
        val want = MMR_K - sel.length
        val picked =
          if (sel.isEmpty)
            rel.select(col("vec_id"), col("e"), col("nrm"), col("rel"),
              lit(0.0).as("maxsim"),
              round(lit(lam) * col("rel"), 6).as("score"))
          else {
            import s.implicits._
            val selDf = sel.map(t => (t._1, t._2, t._3))
              .toDF("sid", "se", "sn")
            rel.where(!col("vec_id").isin(sel.map(_._1): _*))
              .crossJoin(broadcast(selDf))
              .select(col("vec_id"), col("e"), col("nrm"), col("rel"),
                round(call_function("vec_dot", col("e"), col("se")) /
                  (col("nrm") * col("sn")), 6).as("sim"))
              .groupBy("vec_id")
              .agg(first("e").as("e"), first("nrm").as("nrm"),
                first("rel").as("rel"), max("sim").as("maxsim"))
              .select(col("vec_id"), col("e"), col("nrm"), col("rel"),
                col("maxsim"),
                round(lit(lam) * col("rel") -
                  lit(MMR_MU) * col("maxsim"), 6).as("score"))
          }
        val batch = picked
          .orderBy(col("score").desc, col("vec_id")).limit(want).collect()
        if (batch.isEmpty) exhausted = true
        else {
          // A short batch means NO unfetched candidates remain — no
          // outsider to guard against, so the bound drops away.
          val bound =
            if (batch.length < want) Double.NegativeInfinity
            else batch.last.getDouble(5)
          var cand = batch.toVector.map(r => Cand(r.getLong(0),
            r.getSeq[Double](1), r.getDouble(2), r.getDouble(3),
            r.getDouble(4), r.getDouble(5)))
          // The head of a fresh batch IS the sequential argmax (the fetch
          // ordered by (score desc, vec_id) against the current selected
          // set), so it is accepted without the bound test — which also
          // guarantees ≥1 pick per job, i.e. termination in ≤K jobs.
          var fresh = true
          var live = true
          while (live && cand.nonEmpty && sel.length < MMR_K) {
            val best = cand.minBy(c => (-c.score, c.id))
            if (fresh || best.score > bound) {
              fresh = false
              sel = sel :+ ((best.id, best.e, best.nrm, best.rel, best.score))
              cand = cand.filterNot(_.id == best.id).map { c =>
                val sim = rnd6(ddot(c.e, best.e) / (c.nrm * best.nrm))
                val ms = math.max(c.maxsim, sim)
                c.copy(maxsim = ms, score = rnd6(lam * c.rel - MMR_MU * ms))
              }
            } else live = false // decayed to the bound: refetch globally
          }
        }
      }
      import s.implicits._
      sel.zipWithIndex
        .map { case (t, i) => ((i + 1).toLong, t._1, t._4, t._5) }
        .toDF("rnk", "vec_id", "rel", "score")
        .orderBy("rnk")
    }),
  )

  /** One unrolled MMR round for the q119 oracle: pick the argmax of
    * λ·rel − µ·maxsim over the not-yet-selected, maxsim vs sel{i-1}. */
  private def mmrRoundSql(i: Int): String =
    s"""s$i AS (
       | SELECT $i AS rnk, r.vec_id, r.e, r.nrm, r.rel,
       |  ROUND(CAST($MMR_LAMBDA AS DOUBLE) * r.rel
       |      - CAST($MMR_MU AS DOUBLE) * m.maxsim, 6) AS score
       | FROM rel r JOIN (
       |  SELECT r2.vec_id,
       |   MAX(ROUND(list_dot_product(r2.e, s.e) / (r2.nrm * s.nrm), 6))
       |     AS maxsim
       |  FROM rel r2 CROSS JOIN sel${i - 1} s
       |  WHERE r2.vec_id NOT IN (SELECT vec_id FROM sel${i - 1})
       |  GROUP BY r2.vec_id) m ON r.vec_id = m.vec_id
       | ORDER BY score DESC, r.vec_id LIMIT 1),
       |sel$i AS (SELECT * FROM sel${i - 1} UNION ALL SELECT * FROM s$i)"""
      .stripMargin

  def oracles: Map[String, String] = Map(

    "q119_mmr_selection" ->
      s"""WITH e AS MATERIALIZED (
         | SELECT vec_id, embedding::DOUBLE[] AS e,
         |  SQRT(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[]))
         |    AS nrm
         | FROM embeddings),
         |cent AS MATERIALIZED (
         | SELECT list(c ORDER BY pos) AS c FROM (
         |  SELECT pos, ROUND(AVG(v), 9) AS c FROM (
         |   SELECT generate_subscripts(e, 1) AS pos, unnest(e) AS v
         |   FROM e)
         |  GROUP BY pos)),
         |cn AS (SELECT SQRT(list_dot_product(c, c)) AS cn FROM cent),
         |rel AS MATERIALIZED (
         | SELECT vec_id, e.e AS e, nrm,
         |  ROUND(list_dot_product(e.e, cent.c) / (nrm * cn.cn), 6) AS rel
         | FROM e, cent, cn),
         |s1 AS (
         | SELECT 1 AS rnk, vec_id, e, nrm, rel,
         |  ROUND(CAST($MMR_LAMBDA AS DOUBLE) * rel, 6) AS score
         | FROM rel ORDER BY score DESC, vec_id LIMIT 1),
         |sel1 AS (SELECT * FROM s1),
         |${(2 to MMR_K).map(mmrRoundSql).mkString(",\n")}
         |SELECT CAST(rnk AS BIGINT) AS rnk, vec_id, rel, score
         |FROM sel$MMR_K ORDER BY rnk""".stripMargin,

    "q115_dsir_selection" ->
      s"""WITH toks AS MATERIALIZED (
        | SELECT doc_id, source, unnest(string_split(text, ' ')) AS tok
        | FROM documents),
        |freq AS MATERIALIZED (
        | SELECT tok, COUNT(*) AS tf_r,
        |  COUNT(*) FILTER (source IN ($dsirTargetSql)) AS tf_t
        | FROM toks GROUP BY tok),
        |tot AS (
        | SELECT COUNT(*) AS v, SUM(tf_r) AS n_r, SUM(tf_t) AS n_t
        | FROM freq),
        |model AS (
        | SELECT tok,
        |  CAST(ln(CAST(tf_t + 1 AS DOUBLE)
        |          / CAST(n_t + v AS DOUBLE))
        |     - ln(CAST(tf_r + 1 AS DOUBLE)
        |          / CAST(n_r + v AS DOUBLE)) AS DECIMAL(28,12)) AS lw
        | FROM freq, tot)
        |SELECT k.doc_id, k.source, COUNT(*) AS n_toks,
        | -- + 0 normalizes the signed zero: DuckDB's float-based ROUND
        | -- yields -0.0 for means in (-5e-5, 0) while Spark's
        | -- BigDecimal round has no signed zero — the weight metric is
        | -- CENTERED at 0, so this band is populated (20 docs at sf0.1)
        | -- and -0.0 vs +0.0 flips a byte-level hash compare.
        | ROUND(CAST(SUM(m.lw) AS DOUBLE) / COUNT(*), 4) + 0
        |   AS dsir_weight,
        | (ROUND(CAST(SUM(m.lw) AS DOUBLE) / COUNT(*), 4) > 0) AS selected
        |FROM toks k JOIN model m USING (tok)
        |GROUP BY k.doc_id, k.source ORDER BY k.doc_id""".stripMargin,

    "q116_hard_negatives" ->
      """WITH e AS MATERIALIZED (
        | SELECT vec_id, CAST(label AS BIGINT) AS label,
        |  embedding::DOUBLE[] AS e,
        |  SQRT(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[]))
        |    AS nrm
        | FROM embeddings),
        |scored AS MATERIALIZED (
        | SELECT q.vec_id AS qid, q.label AS qlabel, a.vec_id, a.label,
        |  ROUND(list_dot_product(q.e, a.e) / (q.nrm * a.nrm), 6) AS cos
        | FROM e q JOIN e a ON a.vec_id != q.vec_id
        | WHERE q.vec_id < 10),
        |pos AS (
        | SELECT qid, 'positive' AS role, rnk, vec_id, label, cos FROM (
        |  SELECT qid, vec_id, label, cos,
        |   ROW_NUMBER() OVER (PARTITION BY qid
        |     ORDER BY cos DESC, vec_id) AS rnk
        |  FROM scored WHERE label = qlabel) WHERE rnk = 1),
        |neg AS (
        | SELECT qid, 'hard_negative' AS role, rnk, vec_id, label, cos
        | FROM (
        |  SELECT qid, vec_id, label, cos,
        |   ROW_NUMBER() OVER (PARTITION BY qid
        |     ORDER BY cos DESC, vec_id) AS rnk
        |  FROM scored WHERE label != qlabel) WHERE rnk <= 2)
        |SELECT qid, role, rnk, vec_id, label, cos FROM pos
        |UNION ALL
        |SELECT qid, role, rnk, vec_id, label, cos FROM neg
        |ORDER BY qid, role, rnk""".stripMargin,

    // The UNSALTED join: the remedy must be answer-invariant.
    "q117_salted_join" ->
      """SELECT c.c_nationkey, COUNT(*) AS n_events,
        | CAST(CAST(CAST(SUM(CAST(e.value AS DECIMAL(12,2))) AS DECIMAL(38,6))
        |   AS VARCHAR) AS DOUBLE) AS sum_value
        |FROM events e JOIN customer c ON e.user_id = c.c_custkey
        |GROUP BY c.c_nationkey ORDER BY c.c_nationkey""".stripMargin,

    "q118_merge_pairs" ->
      s"""WITH t AS (
        | SELECT string_split(text, ' ') AS toks FROM documents
        | WHERE len(string_split(text, ' ')) >= 2),
        |pairs AS (
        | SELECT unnest(list_transform(
        |   range(1, len(toks)),
        |   i -> struct_pack(a := toks[i], b := toks[i + 1]))) AS p
        | FROM t)
        |SELECT p.a AS a, p.b AS b, COUNT(*) AS cnt
        |FROM pairs GROUP BY 1, 2
        |ORDER BY cnt DESC, a, b LIMIT $PAIR_K""".stripMargin,
  )
}
