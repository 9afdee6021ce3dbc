package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.queries.TextOps

/** q176 winnowing fingerprints — properties the cross-engine hash check
  * cannot express: the SIGMOD'03 detection guarantee, an independent
  * local re-derivation of the whole selection (hash family, key
  * packing, window min, full-window filter), and the short-doc
  * contract. */
class WinnowingSpec extends AnyFunSuite {
  private lazy val s = TestSpark.spark

  private val W = 4 // must mirror TextOps.WINNOW_W
  private val SHIFT = 1073741824L

  /** Local mirror of the engine hash: first 8 hex chars of md5(sh). */
  private def h32(sh: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(sh.getBytes("UTF-8"))
      .map(b => f"$b%02x").mkString
    java.lang.Long.parseLong(hex.substring(0, 8), 16)
  }

  /** Local winnowing over a token string: distinct (key-min per
    * W-window) decoded to (fp, pos). */
  private def localFps(text: String): Set[(Long, Long)] = {
    val toks = text.split(" ")
    val keys = (1 to toks.length - 2).map { i =>
      h32(s"${toks(i - 1)} ${toks(i)} ${toks(i + 1)}") * SHIFT + i
    }
    (0 to keys.length - W).map(s => keys.slice(s, s + W).min)
      .toSet.map((k: Long) => (k / SHIFT, k % SHIFT))
  }

  private def df(rows: Seq[(Long, String, String)]) = {
    import s.implicits._
    rows.toDF("doc_id", "lang", "text")
  }

  test("guarantee: a shared run of >= W + K - 1 tokens shares a fingerprint") {
    // 8 shared tokens >= 4 + 3 - 1 = 6, embedded at DIFFERENT positions
    // in two otherwise-disjoint docs.
    val shared = "alpha beta gamma delta epsilon zeta eta theta"
    val d = df(Seq(
      (1L, "en", s"unique one two three $shared tail words here"),
      (2L, "en", s"$shared wholly different suffix follows now")))
    val fps = TextOps.winnowFps(d)
    val a = fps.where(col("doc_id") === 1)
      .select("fp").collect().map(_.getLong(0)).toSet
    val b = fps.where(col("doc_id") === 2)
      .select("fp").collect().map(_.getLong(0)).toSet
    assert((a intersect b).nonEmpty,
      "no shared fingerprint despite an 8-token shared run")
  }

  test("selection matches an independent local re-derivation exactly") {
    val texts = Seq(
      (10L, "en", "the quick brown fox jumps over the lazy dog again and again"),
      (11L, "de", "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10 w11 w12 w13"),
      (12L, "en", "repeat repeat repeat repeat repeat repeat repeat repeat"))
    val got = TextOps.winnowFps(df(texts)).collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2)))).toSet
    val want = texts.flatMap { case (id, _, t) =>
      localFps(t).map(fp => (id, fp))
    }.toSet
    assert(got === want)
  }

  test("short docs (fewer than W k-grams) emit zero fingerprints") {
    // 5 tokens -> 3 k-grams < W = 4: no full window exists.
    val d = df(Seq((20L, "en", "only five tokens in here")))
    assert(TextOps.winnowFps(d).isEmpty)
  }

  test("corpus sanity at sf0.001: density and bounds") {
    val out = SparkEntry.queries("q176_winnowing_fingerprints")(
      s, "/root/testdata/sf0.001").collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val (nk, nf, nsf) = (r.getLong(2), r.getLong(3), r.getLong(4))
      assert(nf <= math.max(nk - W + 1, 0), s"more fps than windows: $r")
      assert(nsf <= nf, s"shared fps exceed fps: $r")
    }
    // expected density ~2/(W+1) = 0.4: assert the corpus-wide rate is
    // in a generous band around it (selection is working, not
    // degenerate all-or-nothing).
    val (fps, wins) = out.foldLeft((0L, 0L)) { case ((f, w), r) =>
      (f + r.getLong(3), w + math.max(r.getLong(2) - W + 1, 0L)) }
    val rate = fps.toDouble / wins
    assert(rate > 0.2 && rate < 0.7, s"fingerprint density $rate")
  }
}
