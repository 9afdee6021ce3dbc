package graft

import org.scalatest.funsuite.AnyFunSuite

/** q188 nprobe-sweep invariants beyond the DuckDB hash: the dial must
  * behave like one (recall and coverage monotone in nprobe), and the
  * sweep must agree with q51 at the operating point q51 measures —
  * kmGeom's default nprobe (3 at this corpus size) — because both are
  * the SAME candidate semantics against the SAME truth.
  */
class NprobeSweepSpec extends AnyFunSuite {
  private lazy val s = TestSpark.spark
  private val sfDir = "/root/testdata/sf0.001"

  test("recall and coverage are monotone in nprobe; full-probe answers " +
      "everything the truth covers") {
    val rows = SparkEntry.queries("q188_ann_nprobe_sweep")(s, sfDir)
      .collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4)))
    assert(rows.map(_._1).toSeq == Seq(1, 3, 5, 10))
    rows.sliding(2).foreach {
      case Array(a, b) =>
        assert(b._4 >= a._4,
          s"recall fell ${a._4} -> ${b._4} raising nprobe ${a._1} -> ${b._1}")
        // coverage is monotone NON-DECREASING between adjacent points: a
        // centroid homing zero vectors between two sweep points would
        // legitimately plateau avg_n_cand on another corpus (ADVICE r15
        // #3) — strict growth is only guaranteed end-to-end (below)
        assert(b._5 >= a._5,
          s"coverage must not shrink with nprobe (${a._5} -> ${b._5})")
      case _ => ()
    }
    // endpoints: probing 10 cells instead of 1 MUST strictly widen
    // coverage unless the index is degenerate (K=16 cells, n=500 — the
    // 9 extra probes cannot all be empty)
    assert(rows.last._5 > rows.head._5,
      s"coverage flat across the whole dial (${rows.head._5} -> " +
        s"${rows.last._5}) — the sweep is not probing")
    rows.foreach { case (np, nq, _, rec, _) =>
      assert(nq == 200L, s"np=$np: truth set must be the RECALL_Q queries")
      assert(rec >= 0.0 && rec <= 1.0)
    }
  }

  test("the sweep's default-nprobe row equals q51's ivf recall_strict") {
    // kmGeom at n=500: K=16, nprobe = max(3, round(0.16*16)) = 3 — the
    // operating point q51/q69 run at; identical candidate semantics
    // must produce identical recall.
    val sweep = SparkEntry.queries("q188_ann_nprobe_sweep")(s, sfDir)
      .collect().map(r => r.getInt(0) -> r.getDouble(3)).toMap
    val q51 = SparkEntry.queries("q51_ann_recall")(s, sfDir)
      .collect().map(r => r.getString(0) -> r.getDouble(4)).toMap
    assert(sweep(3) == q51("ivf"),
      s"sweep np=3 recall ${sweep(3)} != q51 ivf ${q51("ivf")}")
  }
}
