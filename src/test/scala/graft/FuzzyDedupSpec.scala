package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** q166 sorted-neighborhood edit-distance dedup — properties relating
  * the output to the input corpus, which the cross-engine hash check
  * cannot express: planted-twin recall, threshold soundness, and pair
  * uniqueness. */
class FuzzyDedupSpec extends AnyFunSuite {
  private lazy val s = TestSpark.spark
  private val sfDir = "/root/testdata/sf0.001"

  private lazy val out =
    SparkEntry.queries("q166_fuzzy_dedup")(s, sfDir).cache()

  test("every ASCII-gated planted twin is recovered (100% planted recall)") {
    // A doc passes the gate iff >= half its chars survive [a-z0-9 ]
    // normalization; the twin's 'zz'+' v<k>' edits preserve that gate
    // margin on this corpus, so every gated doc_id % 7 == 0 original
    // must surface as the pair (doc_id, doc_id + off), where off is the
    // corpus-derived offset (max(doc_id) rounded up to the next multiple
    // of 400 — ADVICE r10 #1; recomputed here independently).
    val docsT = graft.model.Tables(s, sfDir).documents
    val maxId = docsT.agg(max("doc_id")).collect()(0).getLong(0)
    val off = maxId - (maxId % 400) + 400
    assert(off > maxId, "twin offset must be disjoint from real ids")
    assert(off % 400 === 0, "offset must preserve doc_id%40 and %10")
    val gated = docsT
      .where(col("doc_id") % 7 === 0)
      .where(length(regexp_replace(lower(col("text")), "[^a-z0-9 ]", ""))
        * 2 >= length(col("text")))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(gated.nonEmpty, "fixture corpus unexpectedly has no gated twins")
    val planted = out
      .where(col("b_id") - col("a_id") === off)
      .select("a_id").collect().map(_.getLong(0)).toSet
    assert((gated -- planted) === Set.empty,
      s"planted twins missed: ${(gated -- planted).take(5)}")
  }

  test("threshold soundness and pair uniqueness") {
    val rows = out.select("a_id", "b_id", "dist").collect()
    assert(rows.nonEmpty)
    assert(rows.forall(r => r.getLong(2) >= 0 && r.getLong(2) <= 12),
      "a pair escaped the levenshtein threshold")
    assert(rows.forall(r => r.getLong(0) < r.getLong(1)),
      "pair ids not in canonical order")
    val keys = rows.map(r => (r.getLong(0), r.getLong(1)))
    assert(keys.distinct.length === keys.length, "duplicate pair emitted")
  }
}
