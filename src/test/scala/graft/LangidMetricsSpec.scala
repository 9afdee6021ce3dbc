package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.queries.TextOps

/** q170's classification metrics on a hand-built corpus where every
  * confusion cell is known, plus the exact 2 %-gate boundary the
  * integer multiply-compare must hit (the tie case the old
  * round(double, 6) form could flip cross-engine). */
class LangidMetricsSpec extends AnyFunSuite {
  private val s = TestSpark.spark

  test("detector boundary: exactly 2% stopwords is 'en', just under is not") {
    import s.implicits._
    // 1 stopword in 50 tokens = exactly 0.02 → en; 1 in 51 → unknown
    val at = ("the " + Seq.fill(49)("zz").mkString(" "))
    val under = ("the " + Seq.fill(50)("zz").mkString(" "))
    val got = TextOps.langidConfusion(
      Seq(("en", at), ("en", under)).toDF("lang", "text"))
      .collect().map(r => (r.getString(1), r.getLong(2))).toMap
    assert(got === Map("en" -> 1L, "unknown" -> 1L))
  }

  test("per-class precision/recall/F1 match the hand-computed matrix") {
    import s.implicits._
    import org.apache.spark.sql.functions._
    // en hit, en miss (no stopwords), zh hit (CJK char), es miss →
    // classes en/zh/es/unknown with every metric derivable by hand
    val docs = Seq(
      ("en", "the cat sat"),
      ("en", "zzz qqq www"),
      ("zh", "中文 text here"),
      ("es", "hola mundo aqui")).toDF("lang", "text")
    val got = TextOps.langidMetricsFrom(TextOps.langidConfusion(docs))
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        Option(r.get(4)).map(_.asInstanceOf[Double]),
        Option(r.get(5)).map(_.asInstanceOf[Double]),
        Option(r.get(6)).map(_.asInstanceOf[Double]))))
      .toMap
    assert(got("en") === ((1L, 0L, 1L, Some(1.0), Some(0.5), Some(2.0 / 3.0))))
    assert(got("zh") === ((1L, 0L, 0L, Some(1.0), Some(1.0), Some(1.0))))
    assert(got("es") === ((0L, 0L, 1L, None, Some(0.0), Some(0.0))))
    assert(got("unknown") === ((0L, 2L, 0L, Some(0.0), None, Some(0.0))))
  }

  test("kappa matches the hand-computed chance-corrected agreement") {
    import s.implicits._
    // binary 2x2: tp(a,a)=4, (a,b)=1, (b,a)=1, (b,b)=4 → N=10, agree=8,
    // margins 5/5 each → pe_num = 5·5 + 5·5 = 50;
    // κ = (8·10 − 50)/(100 − 50) = 30/50 = 0.6
    val cm = Seq(("a", "a", 4L), ("a", "b", 1L), ("b", "a", 1L),
      ("b", "b", 4L)).toDF("lang", "predicted", "n")
    val r = TextOps.kappaFrom(cm).collect().head
    assert((r.getLong(0), r.getLong(1), r.getDouble(2)) === ((10L, 8L, 0.6)))
    // chance-level detector: predicts 'a' always on a 50/50 truth →
    // po = pe → κ = 0 exactly
    val cm0 = Seq(("a", "a", 5L), ("b", "a", 5L))
      .toDF("lang", "predicted", "n")
    val r0 = TextOps.kappaFrom(cm0).collect().head
    assert(r0.getDouble(2) === 0.0)
  }
}
