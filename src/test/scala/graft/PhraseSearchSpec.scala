package graft

import org.scalatest.funsuite.AnyFunSuite

/** q164: start-normalized positional phrase matching on hand documents —
  * 3-term chaining, overlapping self-similar matches, and the
  * almost-phrase decoys the bag-of-words index cannot reject.
  */
class PhraseSearchSpec extends AnyFunSuite {
  private lazy val s = TestSpark.spark

  private def search(phrase: Seq[String], docs: (Long, String)*) = {
    import s.implicits._
    queries.Retrieval.phraseSearch(
        docs.toSeq.toDF("doc_id", "text"), phrase)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
  }

  test("3-term phrase: consecutive only, decoys rejected") {
    val got = search(Seq("big", "data", "table"),
      1L -> "big data table x",          // match at 0
      2L -> "x big data table",          // match at 1
      3L -> "big data x table",          // gap — all terms, no phrase
      4L -> "table data big",            // reversed — no match
      5L -> "big data",                  // prefix only
      6L -> "big data table big data table") // two matches
    assert(got === Map(1L -> (1L, 0L), 2L -> (1L, 1L), 6L -> (2L, 0L)))
  }

  test("self-overlapping phrase counts every start position") {
    // "a a a a" contains "a a a" at starts 0 and 1
    val got = search(Seq("a", "a", "a"), 9L -> "a a a a")
    assert(got === Map(9L -> (2L, 0L)))
  }
}
