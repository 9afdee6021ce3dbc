package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** q174 invariants relating the encoding to the source corpus — the
  * conservation laws the cross-engine hash can't express. */
class BpeEncodeSpec extends AnyFunSuite {
  private lazy val s = TestSpark.spark
  private val sfDir = "/root/testdata/sf0.001"

  test("encoding conserves words/chars and actually compresses") {
    val out = SparkEntry.queries("q174_bpe_encode")(s, sfDir).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(out.nonEmpty)
    // per-lang sanity: a symbol covers >= 1 char and a word >= 1 symbol
    out.foreach { case (lang, (nw, nc, ns)) =>
      assert(ns <= nc, s"$lang: more symbols than chars")
      assert(ns >= nw, s"$lang: fewer symbols than words")
    }
    // conservation against an independent corpus aggregate
    val src = graft.model.Tables(s, sfDir).documents
      .select(col("lang"), explode(split(col("text"), " ")).as("w"))
      .groupBy("lang")
      .agg(count(lit(1)).as("nw"), sum(length(col("w"))).as("nc"))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap
    assert(out.keySet === src.keySet)
    src.foreach { case (lang, (nw, nc)) =>
      assert(out(lang)._1 === nw, s"$lang word count drifted")
      assert(out(lang)._2 === nc, s"$lang char count drifted")
    }
    // the 8 learned merges must compress SOMETHING: strictly fewer
    // symbols than characters corpus-wide
    assert(out.values.map(_._3).sum < out.values.map(_._2).sum,
      "encoding performed no compression at all")
  }
}
