package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Retrieval & redundancy tier (q120–q124) invariants beyond the DuckDB
  * hash check: the q121 bucket-recast equivalence proof, BM25 and
  * duplicate-span cross-checks against local reference models through
  * the REAL catalog queries (the CurationFuzzSpec contract), the q123
  * asymmetry that motivates directed containment, and q124's
  * partition/budget laws.
  */
class RetrievalSpec extends AnyFunSuite {
  import graft.queries.Retrieval
  private lazy val s = TestSpark.spark
  private val sfDir = "/root/testdata/sf0.001"

  private def writeDocs(tag: String,
      rows: Seq[(Long, String)]): String =
    TestDocs.write(s, s"retr_$tag",
      rows.map { case (id, t) => (id, t, "en", "srcX") })

  // ---------------------------------------------------------------- q121
  // The scale plan replaces the theta join (s0 < i1 AND i0 <= s1) with an
  // equi-join on exploded hour buckets. The recast is sound iff, for a
  // closed session [s0, s1] and an incident occupying exactly its own
  // bucket [bH, (b+1)H):   b ∈ [s0 div H, s1 div H]  ⟺  the theta holds.
  // Exhaustive check over every (s0, s1, b) in a range that covers all
  // alignment cases (boundary hits, containment, disjoint, point
  // sessions). Integer division IS floor here: epoch_us ≥ 0.
  test("q121 bucket equi-join ⟺ interval-overlap theta (exhaustive)") {
    val H = 4L
    for (s0 <- 0L to 24L; s1 <- s0 to 24L; b <- 0L to 7L) {
      val bucketHit = (s0 / H) <= b && b <= (s1 / H)
      val theta = s0 < (b + 1) * H && b * H <= s1
      assert(bucketHit == theta,
        s"s0=$s0 s1=$s1 b=$b H=$H: bucket=$bucketHit theta=$theta")
    }
  }

  test("q121 on catalog data: overlap positive-length or boundary-touch") {
    // sf0.001's event stream never reaches ERR_MIN errors in one hour;
    // sf0.01 is the smallest scale where incidents exist.
    val rows = SparkEntry.queries("q121_interval_join")(
      s, "/root/testdata/sf0.01").collect()
    assert(rows.nonEmpty, "sf0.01 must surface at least one incident")
    val H = Retrieval.HOUR_US
    rows.foreach { r =>
      val (i0, ov) = (r.getLong(2), r.getLong(4))
      assert(i0 % H == 0, "incident start must be bucket-aligned")
      // closed-session × half-open-incident: a session whose only
      // contact is the incident START yields overlap 0; anything else
      // inside the bucket is positive and at most the bucket width.
      assert(ov >= 0 && ov <= H, s"overlap $ov out of [0, $H]")
    }
  }

  // ---------------------------------------------------------------- q120
  test("q120 BM25 matches a local model on a synthetic corpus") {
    for (seed <- 31 to 32) {
      val rnd = new scala.util.Random(seed)
      // Zipf-ish vocabulary so df spans common → rare; 120 docs ⇒ two
      // query docs (0, 100) under the doc_id % 100 == 0 selector.
      def tok() = "w" + (math.pow(rnd.nextDouble(), 2.0) * 40).toInt
      val rows = (0L until 120L).map { id =>
        (id, Seq.fill(3 + rnd.nextInt(25))(tok()).mkString(" "))
      }
      val dir = writeDocs(s"bm25_$seed", rows)
      val got = SparkEntry.queries("q120_bm25_retrieval")(s, dir)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1)) ->
          ((r.getLong(2), r.getDouble(3))))
      // Local model with the query's exact constants and rounding.
      val toks = rows.map { case (id, t) => id -> t.split(" ").toSeq }
      val tf = toks.flatMap { case (id, ts) =>
        ts.groupBy(identity).map { case (t, v) => (id, t, v.size.toLong) }
      }
      val dl = tf.groupBy(_._1).map { case (id, xs) =>
        id -> xs.map(_._3).sum }
      val df = tf.groupBy(_._2).map { case (t, xs) => t -> xs.size.toLong }
      val n = dl.size.toLong
      val avgdl = dl.values.sum.toDouble / n
      val scores = for {
        qid <- (0L until 120L).filter(_ % Retrieval.QMOD == 0)
        qts = toks.toMap.apply(qid).distinct
        (did, ts) <- toks if did != qid
        inter = qts.filter(ts.contains) if inter.nonEmpty
      } yield {
        val c = inter.map { t =>
          val idf = math.log(1.0 +
            ((n - df(t)).toDouble + 0.5) / (df(t).toDouble + 0.5))
          val tfd = tf.find(x => x._1 == did && x._2 == t).get._3
          val tfn = tfd.toDouble * Retrieval.BM25_K1P1 /
            (tfd.toDouble + Retrieval.BM25_K1 *
              ((1.0 - Retrieval.BM25_B) +
                Retrieval.BM25_B * dl(did) / avgdl))
          BigDecimal(idf * tfn).setScale(12, BigDecimal.RoundingMode.HALF_UP)
        }.sum
        (qid, did, BigDecimal(c.toDouble)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
      }
      val want = scores.groupBy(_._1).flatMap { case (qid, xs) =>
        xs.sortBy(x => (-x._3, x._2)).take(Retrieval.BM25_TOPK)
          .zipWithIndex.map {
          case ((_, did, sc), i) => (qid, i + 1L) -> ((did, sc)) }
      }
      assert(got.toMap == want, s"seed $seed")
      assert(got.length == want.size, s"seed $seed arity")
    }
  }

  // ---------------------------------------------------------------- q122
  test("q122 spans match a local model; copied paragraph is seen") {
    // Docs 1/2 share a 6-token paragraph embedded in otherwise-unique
    // text (the span-level case doc-level dedup misses); doc 3 is
    // unique; doc 4 is sub-3-token (must yield the all-zero row); doc 5
    // repeats ITS OWN shingle (within-doc repeat must NOT count).
    val para = "the quick brown fox jumps high"
    val rows = Seq(
      1L -> s"alpha beta $para gamma delta",
      2L -> s"one two three $para four",
      3L -> "unique text only here nothing shared",
      4L -> "too short",
      5L -> "rep rep rep rep rep rep rep")
    val dir = writeDocs("spans", rows)
    val got = SparkEntry.queries("q122_duplicate_spans")(s, dir)
      .collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))))
      .toMap
    // Local model: positioned 3-gram shingles, shared = in ≥2 docs.
    val sh = rows.map { case (id, t) =>
      val ts = t.split(" ")
      id -> (if (ts.length < 3) Seq.empty
             else (0 to ts.length - 3).map(i =>
               (i + 1L, ts.slice(i, i + 3).mkString(" "))))
    }
    val docsPer = sh.flatMap { case (id, ps) =>
      ps.map(_._2).distinct.map(_ -> id) }
      .groupBy(_._1).map { case (g, xs) => g -> xs.map(_._2).toSet }
    val want = sh.map { case (id, ps) =>
      val shared = ps.filter(p => docsPer(p._2).size >= 2).map(_._1)
      val runs = if (shared.isEmpty) Seq.empty[Long] else {
        shared.zipWithIndex.groupBy { case (p, i) => p - i }
          .values.map(_.size.toLong).toSeq
      }
      val ndup = shared.size.toLong
      val span = if (runs.isEmpty) 0L else runs.max + 2
      val frac = if (ps.isEmpty) 0.0 else BigDecimal(ndup.toDouble / ps.size)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      id -> ((ps.size.toLong, ndup, span, frac))
    }.toMap
    assert(got == want)
    // The shared paragraph spans 4 shingles ⇒ max span 6 tokens in both.
    assert(got(1L)._3 == 6 && got(2L)._3 == 6)
    assert(got(4L) == ((0L, 0L, 0L, 0.0)), "sub-3-token all-zero row")
    assert(got(5L)._2 == 0L, "within-doc repeats are not duplication")
  }

  // ---------------------------------------------------------------- q123
  test("q123 containment is directional: quoted doc scores 1.0") {
    // A's whole text appears contiguously inside B ⇒ c(A→B) = 1 while
    // c(B→A) = |A|/|B| — the asymmetry symmetric Jaccard dilutes.
    val rows = Seq(
      1L -> "a b c d e",                  // 3 distinct shingles
      2L -> "x y a b c d e z",            // contains doc 1 ⇒ 6 shingles
      3L -> "totally different words here five six")
    val dir = writeDocs("contain", rows)
    val got = SparkEntry.queries("q123_containment")(s, dir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getDouble(4))))
      .toMap
    assert(got((1L, 2L)) == ((3L, 3L, 1.0)), "A fully quoted in B")
    assert(got((2L, 1L)) == ((3L, 6L, 0.5)), "reverse direction diluted")
    assert(!got.keySet.exists(p => p._1 == 3L || p._2 == 3L),
      "disjoint doc must produce no pair")
  }

  test("q123 containment matches a local set model on random corpora") {
    for (seed <- 41 to 42) {
      val rnd = new scala.util.Random(seed)
      // Tiny vocabulary ⇒ dense 3-gram collisions across docs.
      val rows = (0L until 60L).map { id =>
        (id, Seq.fill(3 + rnd.nextInt(12))("t" + rnd.nextInt(6))
          .mkString(" "))
      }
      val dir = writeDocs(s"cont_$seed", rows)
      val got = SparkEntry.queries("q123_containment")(s, dir)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getLong(3), r.getDouble(4)))
      val sets = rows.map { case (id, t) =>
        val ts = t.split(" ")
        id -> (0 to ts.length - 3).map(i =>
          ts.slice(i, i + 3).mkString(" ")).toSet
      }.toMap
      val want = (for {
        (a, sa) <- sets.toSeq if sa.nonEmpty
        (b, sb) <- sets.toSeq if a != b
        inter = (sa & sb).size if inter > 0
      } yield (a, b, inter.toLong, sa.size.toLong,
        BigDecimal(inter.toDouble / sa.size)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble))
        .sortBy(x => (-x._5, x._1, x._2))
        .take(Retrieval.CONTAIN_TOPK)
      assert(got.toSeq == want, s"seed $seed")
    }
  }

  test("q124 bins match a local histogram model on random corpora") {
    for (seed <- 51 to 52) {
      val rnd = new scala.util.Random(seed)
      val rows = (0L until 200L).map { id =>
        (id, Seq.fill(1 + rnd.nextInt(20))(
          "w" * (1 + rnd.nextInt(9))).mkString(" "))
      }
      val dir = writeDocs(s"bins_$seed", rows)
      val got = SparkEntry.queries("q124_curriculum_bins")(s, dir)
        .collect()
        .map(r => r.getLong(0) ->
          ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4))))
        .toMap
      val d = rows.map { case (id, t) =>
        val nt = t.split(" ").length.toLong
        (id, nt, t.length.toLong * 100 / nt)
      }
      val hist = d.groupBy(_._3).map { case (dc, xs) =>
        dc -> xs.map(_._2).sum }.toSeq.sortBy(_._1)
      val total = hist.map(_._2).sum
      val cum = hist.scanLeft(0L)(_ + _._2)
      val stageOf = hist.zip(cum).map { case ((dc, _), cumb) =>
        dc -> cumb * Retrieval.NBINS / total }.toMap
      val want = d.groupBy(x => stageOf(x._3)).map { case (st, xs) =>
        st -> ((xs.size.toLong, xs.map(_._2).sum,
          xs.map(_._3).min.toDouble / 100, xs.map(_._3).max.toDouble / 100))
      }
      assert(got == want, s"seed $seed")
    }
  }

  // ---------------------------------------------------------------- q124
  test("q124 stages partition the corpus into ordered token-budget bins") {
    val t = graft.model.Tables(s, sfDir)
    val rows = SparkEntry.queries("q124_curriculum_bins")(s, sfDir)
      .collect()
    assert(rows.map(_.getLong(0)).toSeq ==
      (0L until Retrieval.NBINS).toSeq,
      "exactly stages 0..NBINS-1 in order")
    val (nd, nt) = (rows.map(_.getLong(1)).sum, rows.map(_.getLong(2)).sum)
    val base = t.documents
      .selectExpr("CAST(size(split(text, ' ')) AS BIGINT) AS n",
        "n_chars * 100 div CAST(size(split(text, ' ')) AS BIGINT) AS dc")
    assert(nd == base.count(), "stages must partition every doc")
    assert(nt == base.agg(sum("n")).head.getLong(0),
      "token mass must be conserved")
    // Difficulty ranges are disjoint and ordered: boundaries sit
    // BETWEEN integer centi-difficulty buckets.
    rows.sliding(2).foreach { case Array(lo, hi) =>
      assert(lo.getDouble(4) < hi.getDouble(3),
        "stage difficulty ranges must not overlap")
    }
    // Budget balance: each stage's token mass deviates from total/4 by
    // less than the heaviest single difficulty bucket (the granularity
    // floor of any bucket-aligned equal-budget cut).
    val maxBucket = base.groupBy("dc").agg(sum("n").as("b"))
      .agg(max("b")).head.getLong(0)
    val target = nt.toDouble / Retrieval.NBINS
    rows.foreach { r =>
      assert(math.abs(r.getLong(2) - target) < maxBucket + 1,
        s"stage ${r.getLong(0)} budget ${r.getLong(2)} vs $target")
    }
  }

  // ------------------------------------------------- bm25Score contract
  // ADVICE r12: the old coalesce(dl, raise_error) INSIDE tfn could never
  // fire on a MISSED dim join — the miss nulls n_docs/avgdl too, so idf
  // (the left operand of idf*tfn) is null and Spark's null-short-
  // circuiting Multiply skips tfn entirely; c silently nulled and sum()
  // skewed the score. The guard is now a CaseWhen on dl IS NULL, whose
  // condition evaluates before any arithmetic can short-circuit. This
  // test feeds an actual GAP and requires the loud failure.
  test("bm25Score fails loudly when dl misses a posting's doc_id") {
    import s.implicits._
    val tf = Seq((1L, "a", 2L), (2L, "a", 1L), (100L, "a", 1L))
      .toDF("doc_id", "tok", "tf")
    val qt = Seq((100L, "a")).toDF("qid", "tok")
    def chain(t: Throwable): String =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
        .map(x => String.valueOf(x.getMessage)).mkString(" | ")
    // full coverage: the same shape scores cleanly
    val full = Seq((1L, 2L), (2L, 1L), (100L, 1L)).toDF("doc_id", "dl")
    assert(Retrieval.bm25Score(tf, qt, full).collect().nonEmpty)
    // doc 2 gapped out of dl: must throw the contract message, not
    // return a silently-shrunk score set
    val gap = Seq((1L, 2L), (100L, 1L)).toDF("doc_id", "dl")
    val e = intercept[Exception] {
      Retrieval.bm25Score(tf, qt, gap).collect()
    }
    assert(chain(e).contains("bm25Score contract violated"),
      s"expected the contract raise_error, got: ${chain(e)}")
    // same gap through the sort-merge fallback path (dlBroadcastable
    // = false) — the guard must fire in both physical forms
    val e2 = intercept[Exception] {
      Retrieval.bm25Score(tf, qt, gap, dlBroadcastable = false).collect()
    }
    assert(chain(e2).contains("bm25Score contract violated"),
      s"expected the contract raise_error, got: ${chain(e2)}")
  }

  // ------------------------------------ frozen-sorted-layout corpus gate
  // VERDICT r12 #4: the lazy-checkpoint layout is gated on corpus size
  // (it only pays for itself at sf1+). The gate must (a) resolve OFF at
  // the small scales and honor both overrides, and (b) change ONLY the
  // physical layout — the two paths must be row-identical.
  test("sorted-layout gate resolves by corpus size and never the answer") {
    val dir01 = "/root/testdata/sf0.01"
    assert(!Retrieval.sortedLayoutWorthwhile(s, dir01),
      "sf0.01 documents (65 KB) must sit below the 2 MB gate")
    def withLayout[T](mode: String)(f: => T): T = {
      s.conf.set("spark.graft.bm25.sortedLayout", mode)
      try f finally s.conf.unset("spark.graft.bm25.sortedLayout")
    }
    assert(withLayout("always")(Retrieval.sortedLayoutWorthwhile(s, dir01)))
    assert(!withLayout("never")(Retrieval.sortedLayoutWorthwhile(s, dir01)))
    val frozen = withLayout("always")(
      SparkEntry.queries("q120_bm25_retrieval")(s, dir01).collect().toSeq)
    val plain = withLayout("never")(
      SparkEntry.queries("q120_bm25_retrieval")(s, dir01).collect().toSeq)
    assert(frozen == plain, "layout gate must not change the answer")
  }

  test("postingPartitions sizes from docs bytes with the session floor " +
      "and the hard cap (round 14)") {
    val floor = s.conf.get("spark.sql.shuffle.partitions").toInt
    val unit = Retrieval.POSTING_PARTITION_DOCS_BYTES
    // below / at the floor: the session width wins (sf1 and under)
    assert(Retrieval.postingPartitions(s, 0L) == floor)
    assert(Retrieval.postingPartitions(s, unit * (floor - 1)) == floor)
    // above: ceil(bytes / unit) — the 30x synthpost corpus (185.7 MB
    // docs-equivalent) must size to 709, the measured-winning width
    assert(Retrieval.postingPartitions(s, 185677200L) == 709)
    assert(Retrieval.postingPartitions(s, unit * 1000 + 1) == 1001)
    // a pathological size clamps at the cap instead of exploding the
    // task count
    assert(Retrieval.postingPartitions(s, Long.MaxValue / 4) ==
      Retrieval.POSTING_PARTITION_MAX)
    // the dir form returns 0 (= inherit the session width, the
    // AQE-coalescible pre-r14 form) whenever the rule does NOT bind:
    // unreadable table, and every SF this repo measures
    assert(Retrieval.postingPartitionsFor(s, "/nonexistent/dir") == 0)
    assert(Retrieval.postingPartitionsFor(s, "/root/testdata/sf0.1") == 0,
      "the rule must be inert at bench scale")
  }

  test("the serving path honors an explicit layout override and " +
      "defaults to frozen (ADVICE r13)") {
    def withLayout[T](mode: Option[String])(f: => T): T = {
      mode.foreach(s.conf.set("spark.graft.bm25.sortedLayout", _))
      try f finally s.conf.unset("spark.graft.bm25.sortedLayout")
    }
    assert(withLayout(None)(Retrieval.servingLayoutFrozen(s)),
      "unset must freeze (the term-bucket-ordered scan default)")
    assert(withLayout(Some("auto"))(Retrieval.servingLayoutFrozen(s)),
      "auto must freeze on the serving path (no corpus-size gate)")
    assert(withLayout(Some("always"))(Retrieval.servingLayoutFrozen(s)))
    assert(!withLayout(Some("never"))(Retrieval.servingLayoutFrozen(s)),
      "the documented escape hatch must reach the serving path")
    // and the override must not change the answer (hash-identical paths)
    val frozen = withLayout(None)(
      SparkEntry.queries("q178_bm25_prebuilt")(s, "/root/testdata/sf0.01")
        .collect().toSeq)
    val plain = withLayout(Some("never"))(
      SparkEntry.queries("q178_bm25_prebuilt")(s, "/root/testdata/sf0.01")
        .collect().toSeq)
    assert(frozen == plain, "serving layout override changed the answer")
  }

  // ---------------------------------------------------------------- q131
  // RRF is pure rank arithmetic over its two source lists — so recompute
  // it exactly from the catalog's OWN q120 ranking plus an independently
  // ranked local Jaccard list, and require score-for-score equality.
  // This pins (a) the 1/(60+r) fusion formula, (b) absence-contributes-
  // nothing, and (c) the (rrf desc, doc_id) tie order, independently of
  // the DuckDB oracle (which shares SQL text with the query by design).
  test("q131 RRF equals a local fusion of q120 ranks and local Jaccard ranks") {
    val bm = SparkEntry.queries("q120_bm25_retrieval")(s, sfDir).collect()
      .map(r => (r.getAs[Long]("qid"), r.getAs[Long]("doc_id")) ->
        r.getAs[Long]("rnk")).toMap
    // local Jaccard ranks over distinct token sets
    val dt = graft.model.Tables(s, sfDir).documents
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        r.getAs[String]("text").split(" ").toSet)
    val toksById = dt.toMap
    val qids = dt.map(_._1).filter(_ % 100 == 0)
    def rnd6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val jb = qids.flatMap { q =>
      val qs = toksById(q)
      dt.filter(d => d._1 != q && (d._2 & qs).nonEmpty)
        .map { case (d, ts) =>
          val ni = (ts & qs).size
          (d, rnd6(ni.toDouble / (qs.size + ts.size - ni)))
        }
        .sortBy { case (d, j) => (-j, d) }.take(10).zipWithIndex
        .map { case ((d, _), i) => (q, d) -> (i + 1L) }
    }.toMap
    val want = (bm.keySet ++ jb.keySet).groupBy(_._1).toSeq.flatMap {
      case (q, keys) =>
        keys.toSeq.map { k =>
          val score = rnd6(bm.get(k).map(r => 1.0 / (60 + r)).getOrElse(0.0) +
            jb.get(k).map(r => 1.0 / (60 + r)).getOrElse(0.0))
          (k._2, score)
        }.sortBy { case (d, sc) => (-sc, d) }.take(10).zipWithIndex
          .map { case ((d, sc), i) => (q, i + 1L, d, sc) }
    }.sortBy(t => (t._1, t._2))
    val got = SparkEntry.queries("q131_rrf_fusion")(s, sfDir).collect()
      .map(r => (r.getAs[Long]("qid"), r.getAs[Long]("rnk"),
        r.getAs[Long]("doc_id"), r.getAs[Double]("rrf"))).toSeq
    assert(got == want)
  }
}
