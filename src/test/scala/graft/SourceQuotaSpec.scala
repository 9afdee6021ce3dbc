package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins q183's per-source quota semantics against a local recomputation
  * of the UNSALTED rule — sort (score_u DESC, doc_id), keep CAP — on a
  * corpus built to stress exactly what the salted two-pass could get
  * wrong: one source large enough that pass 1 BINDS (> SALT·CAP docs)
  * with heavy score TIES spanning salt cells (30 identical docs per
  * text variant), so a cell-local rank error or a tie broken anywhere
  * but global (score, doc_id) order changes the kept set. The score
  * formula itself is q31's (pinned elsewhere); this suite fixes the
  * selection layer. */
class SourceQuotaSpec extends AnyFunSuite {
  private lazy val s = TestSpark.spark

  // 120 docs in "big" (4 text variants x 30 identical copies, ids
  // interleaved across variants so ties cross doc_id % SALT cells) and
  // 3 docs in "small" (quota does not bind there: n_kept = n_docs).
  private val variants = Seq(
    "the cat sat on the mat and then ran away home today again quickly",
    "a dog in a park is to run and to jump over the little fence now",
    "numbers 123 456 789 everywhere 000 111 222 333 444 555 666 777",
    "plain words without any stopwords punctuation or digits here")
  private val rows =
    (1 to 120).map(i =>
      (i.toLong, variants((i - 1) % 4), "en", "big")) ++
    Seq((201L, variants(0), "en", "small"),
        (202L, variants(2), "en", "small"),
        (203L, variants(3), "en", "small"))

  test("q183 salted two-pass equals the unsalted local rule, ties " +
      "global on (score desc, doc_id), non-binding sources keep all") {
    val dir = TestDocs.write(s, "quota", rows)
    import s.implicits._
    val scores = graft.queries.TextOps.qualityScored(
        rows.toDF("doc_id", "text", "lang", "source")
          .withColumn("n_chars", length(col("text")).cast("long")))
      .select("doc_id", "score_u").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap

    def localQuota(src: String): (Long, Long, Double) = {
      val ids = rows.filter(_._4 == src).map(_._1)
      val kept = ids.sortBy(id => (-scores(id), id))
        .take(graft.queries.TextOps.QUOTA_CAP)
      (ids.size.toLong, kept.size.toLong,
        kept.map(scores).min.toDouble / 1e6)
    }

    val got = SparkEntry.queries("q183_source_quota")(s, dir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3), r.getDouble(4)))).toMap
    assert(got.keySet == Set("big", "small"))
    for (src <- Seq("big", "small")) {
      val (wantN, wantK, wantBar) = localQuota(src)
      val (n, k, d, bar) = got(src)
      assert(n == wantN && k == wantK && d == wantN - wantK,
        s"$src counts: got ($n, $k, $d) want ($wantN, $wantK)")
      assert(bar == wantBar, s"$src admission bar: got $bar want $wantBar")
    }
    // the quota binds on big (120 -> 10) and not on small (3 -> 3)
    assert(got("big")._2 == 10L && got("big")._3 == 110L)
    assert(got("small")._2 == 3L && got("small")._3 == 0L)
  }
}
