package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.queries.TextOps

/** q173's two-level prefix sum: a hand-computed curve, and slab width
  * as a pure parallelism knob (any width gives the same global
  * positions — the q145 slab-invariance discipline). */
class VocabGrowthSpec extends AnyFunSuite {
  private val s = TestSpark.spark

  // stream: doc0 [a b a], doc1 [b c], doc2 [] , doc3 [d a]
  // global first positions: a=0, b=1, c=4, d=5; total = 7
  private val docs = Seq(
    (0L, Seq("a", "b", "a")),
    (1L, Seq("b", "c")),
    (2L, Seq.empty[String]),
    (3L, Seq("d", "a")))

  private def run(slab: Long, ladder: Seq[Long]): Seq[(Long, Long)] = {
    import s.implicits._
    TextOps.vocabGrowth(s, docs.toDF("doc_id", "toks"), slab, ladder)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
  }

  test("curve matches hand-computed first occurrences") {
    // prefix 1 → {a}; 2 → {a,b}; 5 → {a,b,c}; 6 → {a,b,c,d}; 7 = total
    assert(run(1000L, Seq(1L, 2L, 5L, 6L, 7L, 100L)) ===
      Seq((1L, 1L), (2L, 2L), (5L, 3L), (6L, 4L), (7L, 4L)))
  }

  test("slab width is a pure parallelism knob") {
    val want = run(1000L, Seq(2L, 5L, 7L))
    for (slab <- Seq(1L, 2L, 3L)) {
      assert(run(slab, Seq(2L, 5L, 7L)) === want, s"slab $slab diverged")
    }
  }
}
