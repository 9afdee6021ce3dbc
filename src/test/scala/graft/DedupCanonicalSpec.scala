package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins q181's selection semantics on a hand corpus: the kept member is
  * the (score_u DESC, doc_id ASC) argmax — an EQUAL-score cluster must
  * keep the LOWEST doc_id (the integer tie rule, no float order
  * anywhere) — singletons never surface, and n_dropped counts the rest.
  * The score formula itself is q31's, pinned by its own specs; this
  * suite only fixes the selection layer above it. */
class DedupCanonicalSpec extends AnyFunSuite {
  private lazy val s = TestSpark.spark

  // Two dup clusters over word-3-gram Jaccard (identical texts share all
  // shingles): docs 7/3 are byte-identical (equal score_u -> tie ->
  // keep 3, NOT 7), docs 10/11 are near-dups of different quality
  // (11 repeats digits -> higher digit_ratio -> lower score -> keep 10
  // unless scores say otherwise; the spec derives the expectation from
  // qualityScored rather than hand-guessing the formula). Doc 99 is a
  // singleton and must not appear.
  private val t1 = "the cat sat on the mat and then ran away home today"
  private val t2 = "red fish blue fish swim in a deep cold lake every morning"
  private val t3 = "red fish blue fish swim in a deep cold lake 12345 morning"
  private val rows = Seq(
    (7L, t1, "en", "s1"),
    (3L, t1, "en", "s1"),
    (10L, t2, "en", "s1"),
    (11L, t3, "en", "s1"),
    (99L, "completely different text with no shared shingles at all zz",
      "en", "s2"))

  test("q181 keeps the (score desc, doc_id asc) argmax per cluster and " +
      "drops singletons") {
    val dir = TestDocs.write(s, "canon", rows)
    val got = SparkEntry.queries("q181_dedup_canonical")(s, dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getLong(4)))).toMap

    // clusters are labeled by component-min doc_id: {3,7} -> 3,
    // {10,11} -> 10; the singleton 99 must be absent
    assert(got.keySet == Set(3L, 10L), s"clusters: ${got.keySet}")

    // equal-score cluster: identical text => identical score_u => the
    // tie MUST break to the lower doc_id
    val (n1, keep1, _, drop1) = got(3L)
    assert(n1 == 2L && drop1 == 1L)
    assert(keep1 == 3L, s"equal-score tie must keep doc 3, kept $keep1")

    // unequal cluster: expectation derived from qualityScored itself
    import s.implicits._
    val q = graft.queries.TextOps.qualityScored(
        rows.toDF("doc_id", "text", "lang", "source")
          .withColumn("n_chars", length(col("text")).cast("long")))
      .select("doc_id", "score_u").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val expKeep = Seq(10L, 11L).minBy(id => (-q(id), id))
    val (n2, keep2, score2, drop2) = got(10L)
    assert(n2 == 2L && drop2 == 1L)
    assert(keep2 == expKeep, s"cluster {10,11}: kept $keep2, want $expKeep")
    assert(score2 == q(expKeep).toDouble / 1e6,
      "keep_score must be the kept member's q31 score")
  }
}
