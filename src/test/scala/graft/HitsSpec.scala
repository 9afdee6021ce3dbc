package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins q182's HITS recursion independently of the DuckDB oracle: a
  * from-scratch BigInt power iteration over the ENGINE'S OWN transition
  * graph (q151's subtree — itself oracle-checked row for row) must
  * reproduce the catalog output exactly — normalization quanta,
  * zero-in-degree handling, rank tie order, top-k cut. BigInt makes the
  * model overflow-proof, so it also witnesses that the engine's
  * DECIMAL(38,0) normalize loses nothing at this scale. */
class HitsSpec extends AnyFunSuite {
  private lazy val s = TestSpark.spark
  private val sfDir = "/root/testdata/sf0.01"

  test("q182 equals a BigInt HITS model over the q151 transition graph") {
    val edges = graft.queries.Affinity.transitionCounts(s, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(edges.nonEmpty, "fixture graph must not be empty")
    val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct.sorted
    val SCALE = BigInt(graft.queries.Affinity.HITS_SCALE)

    var a = nodes.map(_ -> SCALE).toMap
    var h = nodes.map(_ -> SCALE).toMap
    def normalize(raw: Map[Long, BigInt]): Map[Long, BigInt] = {
      val mx = raw.values.max
      nodes.map(n => n -> raw.getOrElse(n, BigInt(0)) * SCALE / mx).toMap
    }
    for (_ <- 1 to graft.queries.Affinity.HITS_ROUNDS) {
      a = normalize(edges.groupBy(_._2).map { case (dst, es) =>
        dst -> es.map(e => BigInt(e._3) * h(e._1)).sum })
      h = normalize(edges.groupBy(_._1).map { case (src, es) =>
        src -> es.map(e => BigInt(e._3) * a(e._2)).sum })
    }
    val want = nodes
      .map(n => (n, a(n), h(n)))
      .sortBy { case (n, aq, hq) => (-aq, -hq, n) }
      .take(graft.queries.Affinity.HITS_TOPK)
      .zipWithIndex
      .map { case ((n, aq, hq), i) =>
        (i + 1L, n, aq.toLong, hq.toLong) }

    val got = SparkEntry.queries("q182_item_hits")(s, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq
    assert(got == want.toSeq,
      s"engine vs BigInt model:\n got ${got.take(5)}\nwant ${want.take(5)}")
    // scores are max-normalized quanta: every round ends with exactly
    // one 10^6 somewhere, and the top authority must carry it
    assert(got.head._3 == graft.queries.Affinity.HITS_SCALE)
  }
}
