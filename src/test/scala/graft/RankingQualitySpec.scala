package graft

import org.scalatest.funsuite.AnyFunSuite

/** q125 ranking-quality invariants beyond the DuckDB hash: metric
  * ranges, the self-scored-candidate identity (mrr@10 ≡ recall@10 ≡
  * q51's recall_strict — every EXACT-scorer ANN path verifies
  * candidates with the truth's own rounded-cosine/tie contract, so the
  * true best ranks first whenever it is found at all), and cross-query
  * consistency with q51 computed from the same session.
  *
  * The 'pq' method (round 15) is the deliberate exception: its final
  * ranking comes from the APPROXIMATE asymmetric PQ distance, so the
  * true best can be found yet rank below 1 — mrr may fall strictly
  * under recall@10 (the divergence q125's graded metrics exist to
  * expose), and q51's rank-1 recall may fall under q125's top-10
  * recall. Those looser one-sided bounds are pinned here instead.
  */
class RankingQualitySpec extends AnyFunSuite {
  private lazy val s = TestSpark.spark
  private val sfDir = "/root/testdata/sf0.001"

  /** Methods whose candidate scorer is the exact rounded cosine. */
  private val ExactScorers = Set("blocked", "ivf", "lsh")

  test("q125 metrics are in range and honor the self-scored identity") {
    val rows = SparkEntry.queries("q125_ranking_quality")(s, sfDir)
      .collect()
    assert(rows.map(_.getString(0)).toSeq ==
      Seq("blocked", "ivf", "lsh", "pq"), "one row per method, ordered")
    rows.foreach { r =>
      val (m, rec, mrr, ndcg) =
        (r.getString(0), r.getDouble(2), r.getDouble(3), r.getDouble(4))
      Seq(rec, mrr, ndcg).foreach(v =>
        assert(v >= 0.0 && v <= 1.0, s"$m metric $v out of [0,1]"))
      if (ExactScorers(m)) {
        // Self-scored candidate lists: true best is rank 1 iff found.
        assert(math.abs(mrr - rec) < 2e-4,
          s"$m: mrr $mrr must equal recall@10 $rec (rounding apart)")
      } else {
        // Approximate scorer: the true best may be found below rank 1,
        // so rr mass per found query is at most 1 — and at least 1/10.
        assert(mrr <= rec + 2e-4,
          s"$m: mrr $mrr cannot exceed recall@10 $rec")
        assert(mrr + 1e-9 >= rec / 10.0,
          s"$m: a found best contributes at least 1/10 rr")
      }
      // Graded credit can only add to the binary hit signal.
      assert(ndcg + 1e-9 >= mrr * (1.0 / 3.0),
        s"$m: found-at-1 queries alone contribute 10/IDCG ≈ mrr/3")
      if (rec == 0.0) assert(mrr == 0.0, s"$m: no hit ⇒ no rr mass")
    }
  }

  test("q125 recall@10 vs q51 recall_strict: equal for exact scorers, " +
      "one-sided for pq") {
    val q125 = SparkEntry.queries("q125_ranking_quality")(s, sfDir)
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    val q51 = SparkEntry.queries("q51_ann_recall")(s, sfDir)
      .collect().map(r => r.getString(0) -> r.getDouble(4)).toMap
    // q51 additionally carries blocked_capped (the r8 BLOCK_CAP policy
    // overlay on the blocked geometry); q125 ranks the base geometry
    // families, so the cross-check runs on the intersection — and the
    // capped overlay must agree with blocked at this SF, where no cell
    // exceeds the cap.
    assert(q125.keySet.subsetOf(q51.keySet))
    assert(q51.keySet -- q125.keySet == Set("blocked_capped"))
    assert(q51("blocked_capped") == q51("blocked"),
      "cap binds at sf0.01 — cells grew past BLOCK_CAP?")
    q125.foreach { case (m, rec10) =>
      if (ExactScorers(m))
        assert(math.abs(rec10 - q51(m)) < 2e-4,
          s"$m: recall@10 $rec10 vs q51 recall_strict ${q51(m)}")
      else
        // pq's q51 number demands the true best at ADC rank 1; its q125
        // number only demands it in the ADC top-10.
        assert(rec10 + 2e-4 >= q51(m),
          s"$m: recall@10 $rec10 below rank-1 recall ${q51(m)}?")
    }
  }
}
