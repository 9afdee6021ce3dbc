package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins q179's interpolated-bigram model against a from-scratch local
  * reimplementation on a hand corpus — counts, smoothing weights, the
  * decimal-pinned per-bigram log-prob, and the short-doc rule — so the
  * semantics are proven independently of the DuckDB oracle (which by
  * design shares the model, not the code). */
class BigramLogprobSpec extends AnyFunSuite {
  private lazy val s = TestSpark.spark

  // 4 docs: shared bigrams across docs (so c(w1 w2) > 1 and the history
  // mass spans docs), a doc ending in a token that also starts bigrams
  // elsewhere (history vs unigram counts genuinely differ), a 1-token
  // doc (no bigrams), and a repeated-token doc (p(b|b) dominated by ML).
  private val rows = Seq(
    (1L, "a b c a b", "en", "s1"),
    (2L, "b c d", "en", "s1"),
    (3L, "x", "de", "s2"),
    (4L, "b b b b", "de", "s2"))

  private def local(): Map[Long, (Long, Option[Double])] = {
    val toks = rows.map { case (id, t, _, _) => id -> t.split(" ").toSeq }
    val bigrams = toks.flatMap { case (id, ts) =>
      ts.sliding(2).filter(_.size == 2).map(p => (id, p(0), p(1))) }
    val cbi = bigrams.groupBy(b => (b._2, b._3)).view.mapValues(_.size)
    val ch = bigrams.groupBy(_._2).view.mapValues(_.size)
    val cu = toks.flatMap(_._2).groupBy(identity).view.mapValues(_.size)
    val tot = toks.map(_._2.size).sum
    def lp(w1: String, w2: String): BigDecimal = {
      val p = 0.75 * cbi((w1, w2)).toDouble / ch(w1).toDouble +
        0.25 * cu(w2).toDouble / tot.toDouble
      // the engine pins each contribution to DECIMAL(28,12) (HALF_UP,
      // Spark's double->decimal cast) before the order-free sum
      BigDecimal(math.log(p)).setScale(12, BigDecimal.RoundingMode.HALF_UP)
    }
    toks.map { case (id, ts) =>
      val bs = ts.sliding(2).filter(_.size == 2).toSeq
      if (bs.isEmpty) id -> ((0L, None: Option[Double]))
      else {
        val sum = bs.map(p => lp(p(0), p(1))).sum
        val avg = BigDecimal(sum.toDouble / bs.size)
          .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
        id -> ((bs.size.toLong, Some(avg)))
      }
    }.toMap
  }

  test("q179 equals the local interpolated-bigram model, including the " +
      "short-doc NULL rule") {
    val dir = TestDocs.write(s, "bigram", rows)
    val got = SparkEntry.queries("q179_bigram_logprob")(s, dir).collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getDouble(3))))).toMap
    val want = local()
    assert(got.keySet == rows.map(_._1).toSet, "every doc must surface")
    rows.foreach { case (id, _, lang, _) =>
      val (gLang, gN, gAvg) = got(id)
      val (wN, wAvg) = want(id)
      assert(gLang == lang, s"doc $id lang")
      assert(gN == wN, s"doc $id n_bigrams: got $gN want $wN")
      assert(gAvg == wAvg, s"doc $id avg_logprob: got $gAvg want $wAvg")
    }
    // the 1-token doc exercises the left join: present, 0 bigrams, NULL
    assert(got(3L)._2 == 0L && got(3L)._3.isEmpty)
    // scores are log-probs of a proper mixture: strictly negative
    got.values.foreach { case (_, _, avg) =>
      avg.foreach(a => assert(a < 0.0, s"log-prob must be negative: $a")) }
  }
}
