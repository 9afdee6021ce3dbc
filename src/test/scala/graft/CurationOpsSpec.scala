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

  test("q87 detects exactly the planted PII spans and redaction moves the hash") {
    import org.apache.spark.sql.functions._
    val out = SparkEntry.queries("q87_pii_redaction")(s, sfDir).collect()
    assert(out.length === 500)
    // the fixture corpus has no '@' and no digits, so the ONLY matches are
    // the planted spans: one email iff doc_id % 3 != 0, one phone iff even
    out.foreach { r =>
      val id = r.getLong(0)
      assert(r.getLong(1) === (if (id % 3 != 0) 1L else 0L),
        s"doc $id: email count")
      assert(r.getLong(2) === (if (id % 2 == 0) 1L else 0L),
        s"doc $id: phone count")
    }
    // redacted text of a doc with PII must not hash like its raw text
    val raw = graft.model.Tables(s, sfDir).documents
      .select(col("doc_id"), md5(col("text")).as("h"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    out.filter(r => r.getLong(1) + r.getLong(2) > 0)
      .foreach(r => assert(r.getString(3) != raw(r.getLong(0))))
  }

  test("q88 chunk counts follow floor(n_tok/3) and ratios are bounded") {
    import org.apache.spark.sql.functions._
    val expected = graft.model.Tables(s, sfDir).documents
      .select(col("doc_id"),
        (size(split(col("text"), " ")) / 3).cast("long").as("nch"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val out = SparkEntry.queries("q88_chunk_dedup")(s, sfDir).collect()
    assert(out.length === 500)
    out.foreach { r =>
      val id = r.getLong(0)
      assert(r.getLong(2) === expected(id), s"doc $id: chunk count")
      assert(r.getLong(3) <= r.getLong(2), s"doc $id: boiler > chunks")
      if (r.getLong(2) > 0) {
        val ratio = r.getDouble(4)
        assert(ratio >= 0.0 && ratio <= 1.0, s"doc $id: ratio $ratio")
      } else assert(r.isNullAt(4), s"doc $id: null ratio expected")
    }
  }

  test("q89 keeps at least the top three quartiles per lang") {
    val out = SparkEntry.queries("q89_quality_gate")(s, sfDir).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val (n, kept) = (r.getLong(2), r.getLong(3))
      // rows below the cutoff are exactly those ranked before ceil(n/4)
      assert(kept >= n - (n + 3) / 4 + 1,
        s"${r.getString(0)}: kept $kept of $n")
      assert(kept <= n)
      assert(r.getLong(4) > 0, "kept_chars must be positive")
    }
  }

  test("q90 OOV totals reconcile with a direct token count") {
    import org.apache.spark.sql.functions._
    val out = SparkEntry.queries("q90_vocab_coverage")(s, sfDir).collect()
    assert(out.length === 500)
    val totalTok = graft.model.Tables(s, sfDir).documents
      .select(sum(size(split(col("text"), " "))).cast("long"))
      .collect()(0).getLong(0)
    assert(out.map(_.getLong(2)).sum === totalTok, "token conservation")
    out.foreach { r =>
      assert(r.getLong(3) <= r.getLong(2))
      val rate = r.getDouble(4)
      assert(rate >= 0.0 && rate <= 1.0)
    }
    // with an 8-token vocab over a 31-token vocabulary, some doc must
    // contain at least one OOV token
    assert(out.exists(_.getLong(3) > 0), "degenerate: no OOV anywhere")
  }

  // ---------------------------------------------------------------- q132
  // The chunker's laws, checked against the raw corpus: every doc is
  // covered (last window ends exactly at the doc's token count), starts
  // sit on the stride grid, every non-final window is full-width, and
  // consecutive windows overlap by exactly WIN - STRIDE tokens — the
  // invariants a retriever depends on (no token unreachable, no gap at
  // window seams).
  test("q132 windows cover every doc on the stride grid with exact overlap") {
    val n = graft.model.Tables(s, sfDir).documents
      .select(org.apache.spark.sql.functions.col("doc_id"),
        org.apache.spark.sql.functions.size(
          org.apache.spark.sql.functions.split(
            org.apache.spark.sql.functions.col("text"), " ")).as("n"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val ch = SparkEntry.queries("q132_rag_chunks")(s, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .groupBy(_._1)
    assert(ch.keySet == n.keySet, "every doc must produce >= 1 window")
    ch.foreach { case (d, rows) =>
      val srt = rows.sortBy(_._2)
      srt.zipWithIndex.foreach { case ((_, cid, start, w), i) =>
        assert(cid == i && start == i * 48L, s"doc $d window $i off-grid")
        if (i < srt.length - 1)
          assert(w == 64L, s"doc $d non-final window $i not full-width")
      }
      val (_, _, lastStart, lastW) = srt.last
      assert(lastStart + lastW == n(d).toLong, s"doc $d tail not covered")
      // no window fully contained in its predecessor: the tail's END must
      // advance past the previous window's end (starts alone can't catch
      // an overcounted ragged tail — review r7 #3)
      if (srt.length > 1) {
        val (_, _, ps, pw) = srt(srt.length - 2)
        assert(lastStart + lastW > ps + pw, s"doc $d degenerate tail")
      }
    }
  }
}
