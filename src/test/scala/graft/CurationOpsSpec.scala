package graft

import org.scalatest.funsuite.AnyFunSuite

/** Structural invariants of the round-6 curation operators — properties
  * the DuckDB hash check can't express because they relate the output to
  * the input corpus, not to another engine's answer. */
class CurationOpsSpec extends AnyFunSuite {
  private lazy val s = TestSpark.spark
  private val sfDir = "/root/testdata/sf0.001"

  test("q84 packing conserves tokens and fills bins sequentially") {
    import org.apache.spark.sql.functions._
    val out = SparkEntry.queries("q84_sequence_packing")(s, sfDir)
    val docs = graft.model.Tables(s, sfDir).documents
      .select(col("lang"),
        size(split(col("text"), " ")).cast("long").as("n_tok"))
    // conservation: every token of every doc lands in exactly one bin
    val packed = out.groupBy("lang")
      .agg(sum("total_toks").as("t"), sum("n_docs").as("d"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    val source = docs.groupBy("lang")
      .agg(sum("n_tok").as("t"), count(lit(1)).as("d"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    assert(packed === source)
    // sequential fill: the first doc of each lang starts at offset 0 →
    // bin 0 exists; a doc longer than B may legitimately skip bins, but
    // no bin id can exceed the last start offset's bin,
    // floor((total_tokens − 1)/B)
    out.collect().groupBy(_.getString(0)).foreach { case (lang, rows) =>
      val bins = rows.map(_.getLong(1)).sorted
      assert(bins.head === 0L, s"$lang: first bin must be 0")
      assert(bins.distinct.length === bins.length, s"$lang: duplicate bins")
      val total = source(lang)._1
      assert(bins.last <= (total - 1) / 512,
        s"$lang: bin ${bins.last} past the token stream (total $total)")
    }
  }

  test("q85 repetition ratio is in [0,1] and null only for sub-3-token docs") {
    import org.apache.spark.sql.functions._
    val out = SparkEntry.queries("q85_repetition")(s, sfDir).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val nSh = r.getLong(2)
      if (nSh == 0) assert(r.isNullAt(4), s"doc ${r.getLong(0)}: null ratio expected")
      else {
        val ratio = r.getDouble(4)
        assert(ratio >= 0.0 && ratio <= 1.0,
          s"doc ${r.getLong(0)}: ratio $ratio out of range")
        assert(r.getLong(3) <= nSh, "distinct cannot exceed total")
      }
    }
  }

  test("q81 flags only cross-split pairs with the strongest train match") {
    import org.apache.spark.sql.functions._
    val out = SparkEntry.queries("q81_decontamination")(s, sfDir).collect()
    // every eval_id appears once; split is never 'train'
    val ids = out.map(_.getLong(0))
    assert(ids.distinct.length === ids.length)
    out.foreach(r => assert(r.getString(1) != "train"))
    out.foreach(r => assert(r.getDouble(3) >= 0.2))
  }
}
