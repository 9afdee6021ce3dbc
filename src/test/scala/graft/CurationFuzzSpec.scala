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
      rows: Seq[(Long, String, String)]): String =
    TestDocs.write(s, s"fuzz_$seed",
      rows.map { case (id, t, lang) => (id, t, lang, "src") })

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

  test("q88 chunk dedup matches a local reference on random corpora") {
    for (seed <- 21 to 23) {
      val rnd = new scala.util.Random(seed)
      // 2-word vocab + short docs: 3-token chunks collide constantly,
      // including the same chunk repeating WITHIN one doc (nd=1 there)
      val rows = (0L until 120L).map { id =>
        val n = rnd.nextInt(14)
        (id, Seq.fill(n)("c" + rnd.nextInt(2)).mkString(" "),
          "l" + rnd.nextInt(2))
      }
      val dir = writeDocs(seed, rows)
      val chunksOf = rows.map { case (id, text, _) =>
        id -> text.split(" ", -1).grouped(3).filter(_.length == 3)
          .map(_.mkString(" ")).toSeq
      }.toMap
      val docsPerChunk = chunksOf.toSeq
        .flatMap { case (id, cs) => cs.distinct.map(_ -> id) }
        .groupBy(_._1).map { case (c, xs) => c -> xs.size }
      val got = SparkEntry.queries("q88_chunk_dedup")(s, dir)
        .collect()
        .map(r => r.getLong(0) -> ((r.getLong(2), r.getLong(3),
          if (r.isNullAt(4)) None else Some(r.getDouble(4))))).toMap
      rows.foreach { case (id, _, _) =>
        val cs = chunksOf(id)
        val boiler = cs.count(c => docsPerChunk(c) >= 2).toLong
        val ratio =
          if (cs.nonEmpty)
            Some(BigDecimal(boiler.toDouble / cs.length)
              .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
          else None
        assert(got(id) === ((cs.length.toLong, boiler, ratio)),
          s"seed $seed doc $id")
      }
    }
  }

  test("q89 percentile gate matches a local reference on random corpora") {
    for (seed <- 31 to 33) {
      val rnd = new scala.util.Random(seed)
      // tie-heavy lengths: many docs share n_chars so the cutoff rank
      // lands inside a tie run — the doc_id tiebreak must not matter
      // for the VALUE chosen, only for which row carries it
      val rows = (0L until 100L).map { id =>
        val n = 1 + rnd.nextInt(8)
        (id, Seq.fill(n)("x").mkString(" "), "l" + rnd.nextInt(3))
      }
      val dir = writeDocs(seed, rows)
      val got = SparkEntry.queries("q89_quality_gate")(s, dir)
        .collect()
        .map(r => r.getString(0) ->
          ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
      rows.groupBy(_._3).foreach { case (lang, ds) =>
        val lens = ds.map(_._2.length.toLong)
        val sorted = ds.map(d => (d._2.length.toLong, d._1)).sorted
        val cutoff = sorted(((sorted.size + 3) / 4) - 1)._1
        val kept = lens.count(_ >= cutoff).toLong
        val keptChars = lens.filter(_ >= cutoff).sum
        assert(got(lang) === ((cutoff, lens.size.toLong, kept, keptChars)),
          s"seed $seed lang $lang")
      }
    }
  }

  test("q90 vocab coverage matches a local reference on random corpora") {
    for (seed <- 41 to 43) {
      val rnd = new scala.util.Random(seed)
      // 12-word vocab with skewed draws: the top-8 boundary falls inside
      // a count tie, exercising the (count desc, token asc) total order
      val rows = (0L until 100L).map { id =>
        val n = 1 + rnd.nextInt(30)
        val toks = Seq.fill(n)("v" + rnd.nextInt(rnd.nextInt(12) + 1))
        (id, toks.mkString(" "), "l" + rnd.nextInt(2))
      }
      val dir = writeDocs(seed, rows)
      val counts = rows.flatMap(_._2.split(" ", -1)).groupBy(identity)
        .map { case (t, xs) => t -> xs.size.toLong }
      val vocab = counts.toSeq.sortBy { case (t, c) => (-c, t) }
        .take(8).map(_._1).toSet
      val got = SparkEntry.queries("q90_vocab_coverage")(s, dir)
        .collect()
        .map(r => r.getLong(0) -> ((r.getLong(2), r.getLong(3)))).toMap
      rows.foreach { case (id, text, _) =>
        val toks = text.split(" ", -1)
        val oov = toks.count(t => !vocab(t)).toLong
        assert(got(id) === ((toks.length.toLong, oov)),
          s"seed $seed doc $id")
      }
    }
  }

  test("q87 redaction matches a local reference on adversarial text") {
    // natural text that already contains email/phone-shaped spans —
    // the planted-span invariant of CurationOpsSpec doesn't hold here,
    // so count/redact must handle MULTIPLE matches per doc
    val emailRe = "[a-z0-9]+@[a-z0-9.]+\\.[a-z]+".r
    val phoneRe = "\\+1-555-[0-9]{4}".r
    for (seed <- 51 to 53) {
      val rnd = new scala.util.Random(seed)
      val rows = (0L until 90L).map { id =>
        val parts = (0 until rnd.nextInt(6)).map { _ =>
          rnd.nextInt(4) match {
            case 0 => s"bob${rnd.nextInt(99)}@mail${rnd.nextInt(9)}.org"
            case 1 => s"+1-555-${1000 + rnd.nextInt(9000)}"
            case 2 => "plain@@half." // near-miss: must NOT match
            case _ => "word" + rnd.nextInt(20)
          }
        }
        (id, ("lead " + parts.mkString(" ")).trim, "l" + rnd.nextInt(2))
      }
      val dir = writeDocs(seed, rows)
      val got = SparkEntry.queries("q87_pii_redaction")(s, dir)
        .collect()
        .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
      rows.foreach { case (id, text, lang) =>
        val aug = text +
          (if (id % 3 != 0) s" contact user$id@$lang.example.com" else "") +
          (if (id % 2 == 0) s" call +1-555-${"%04d".format(id % 1000)}" else "")
        val want = (emailRe.findAllIn(aug).size.toLong,
          phoneRe.findAllIn(aug).size.toLong)
        assert(got(id) === want, s"seed $seed doc $id [$aug]")
      }
    }
  }
}
