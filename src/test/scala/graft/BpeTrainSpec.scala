package graft

import scala.collection.mutable
import org.scalatest.funsuite.AnyFunSuite
import graft.queries.TextOps

/** q143's window-algebra BPE trainer against the canonical SEQUENTIAL
  * implementation (Sennrich et al.): greedy left-to-right non-overlapping
  * merge application, argmax pair by (count desc, pair asc). The
  * gaps-and-islands + even-offset recast must reproduce the sequential
  * semantics exactly, merge table row for row — including later rounds
  * whose pairs contain earlier rounds' multi-character symbols. */
class BpeTrainSpec extends AnyFunSuite {

  /** Canonical greedy merge of one word's symbol list. */
  private def applyMerge(syms: List[String], a: String,
      b: String): List[String] = {
    val out = mutable.ListBuffer[String]()
    var i = 0
    while (i < syms.length) {
      if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
        out += (a + b); i += 2
      } else { out += syms(i); i += 1 }
    }
    out.toList
  }

  test("greedy parity recast ≡ sequential BPE on the sf0.001 corpus") {
    val s = TestSpark.spark
    val sf = "/root/testdata/sf0.001"
    var vocab: Map[List[String], Long] = s.read
      .parquet(s"$sf/documents.parquet")
      .select("text").collect()
      .flatMap(_.getString(0).split(" "))
      .filter(_.length >= 2)
      .groupBy(identity).map { case (w, ws) =>
        w.toList.map(_.toString) -> ws.length.toLong
      }
    val want = (1 to TextOps.BPE_ROUNDS).map { r =>
      val counts = mutable.Map[(String, String), Long]()
      vocab.foreach { case (syms, f) =>
        syms.zip(syms.tail).foreach(p =>
          counts(p) = counts.getOrElse(p, 0L) + f)
      }
      // deterministic argmax: count desc, then (a, b) ascending
      val best = counts.toSeq.sortBy { case ((a, b), c) => (-c, a, b) }.head
      vocab = vocab.toSeq.map { case (syms, f) =>
        applyMerge(syms, best._1._1, best._1._2) -> f
      }.groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).sum }
      (r.toLong, best._1._1, best._1._2, best._2)
    }
    val got = TextOps.queries("q143_bpe_train")(s, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
      .toSeq
    assert(got === want)
    // sanity that the test corpus exercises the interesting case: some
    // later round must merge a pair involving a multi-char symbol
    assert(want.exists { case (_, a, b, _) => a.length > 1 || b.length > 1 },
      s"corpus too simple to exercise compound merges: $want")
  }

  test("parity recast handles overlapping runs: [a,a,a] merges left-first") {
    // the one case where greedy order matters — sequential reference
    assert(applyMerge(List("a", "a", "a"), "a", "a") === List("aa", "a"))
    assert(applyMerge(List("a", "a", "a", "a"), "a", "a")
      === List("aa", "aa"))
  }
}
