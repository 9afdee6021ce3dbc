package graft

import org.scalatest.funsuite.AnyFunSuite

/** Randomized cross-check of the curation operators against LOCAL
  * reference models: seeded synthetic `documents` tables are written to
  * a temp dir and the REAL catalog queries run against them (the same
  * path the driver exercises), so the comparison covers the full plan,
  * not a re-implementation. Domains are chosen adversarially — token
  * counts straddling the 512 bin budget (bin-skipping docs), sub-3-token
  * docs (null repetition), heavy duplicate shingles. */
class CurationFuzzSpec extends AnyFunSuite {
  private lazy val s = TestSpark.spark

  /** Write a synthetic documents table; returns its sfDir. */
  private def writeDocs(seed: Int,
      rows: Seq[(Long, String, String)]): String = {
    import s.implicits._
    val dir = java.nio.file.Files
      .createTempDirectory(s"graft_fuzz_$seed").toString
    rows.toDF("doc_id", "text", "lang")
      .selectExpr("doc_id", "text", "lang", "'src' AS source",
        "CAST(length(text) AS BIGINT) AS n_chars")
      .coalesce(2)
      .write.mode("overwrite").parquet(dir + "/documents.parquet")
    dir
  }

  test("q84 packing matches a local reference on random corpora") {
    for (seed <- 1 to 3) {
      val rnd = new scala.util.Random(seed)
      val rows = (0L until 120L).map { id =>
        // 1..700 tokens: docs longer than the 512 budget skip bins
        val n = 1 + rnd.nextInt(700)
        (id, Seq.fill(n)("w" + rnd.nextInt(50)).mkString(" "),
          "l" + rnd.nextInt(3))
      }
      val dir = writeDocs(seed, rows)
      val got = SparkEntry.queries("q84_sequence_packing")(s, dir)
        .collect()
        .map(r => (r.getString(0), r.getLong(1)) ->
          ((r.getLong(2), r.getLong(3)))).toMap
      // local model: per-lang doc_id order, bin = start offset / 512
      val want = rows
        .map { case (id, text, lang) =>
          (lang, id, text.split(" ").length.toLong) }
        .groupBy(_._1).toSeq
        .flatMap { case (lang, ds) =>
          var cum = 0L
          ds.sortBy(_._2).map { case (_, _, n) =>
            val bin = cum / 512; cum += n; ((lang, bin), n)
          }
        }
        .groupBy(_._1)
        .map { case (k, vs) =>
          k -> ((vs.size.toLong, vs.map(_._2).sum)) }
      assert(got === want, s"seed $seed")
    }
  }

  test("q85 repetition matches a local reference on random corpora") {
    for (seed <- 11 to 13) {
      val rnd = new scala.util.Random(seed)
      val rows = (0L until 150L).map { id =>
        // 0..40 tokens over a 6-word vocab: heavy repeats + short docs
        val n = rnd.nextInt(41)
        (id, Seq.fill(n)("t" + rnd.nextInt(6)).mkString(" "),
          "l" + rnd.nextInt(2))
      }
      val dir = writeDocs(seed, rows)
      val got = SparkEntry.queries("q85_repetition")(s, dir)
        .collect()
        .map(r => r.getLong(0) ->
          ((r.getLong(2), r.getLong(3),
            if (r.isNullAt(4)) None else Some(r.getDouble(4)))))
        .toMap
      rows.foreach { case (id, text, _) =>
        val toks = text.split(" ", -1).toSeq
        val total = math.max(toks.length - 2, 0).toLong
        val distinct =
          if (toks.length < 3) 0L
          else toks.sliding(3).map(_.mkString(" ")).toSet.size.toLong
        val ratio =
          if (total > 0)
            Some(BigDecimal(1.0 - distinct.toDouble / total)
              .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
          else None
        assert(got(id) === ((total, distinct, ratio)),
          s"seed $seed doc $id")
      }
    }
  }
}
