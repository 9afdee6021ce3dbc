package graft

import java.io.File
import org.scalatest.funsuite.AnyFunSuite

/** q184/q185 product-quantization invariants beyond the DuckDB hash:
  * code-packing range, fidelity sanity vs the q99 scalar quantizer's
  * ordering, the persisted cell-partitioned index layout (the q78
  * convention), and probe/answer structural contracts.
  */
class PqSpec extends AnyFunSuite {
  private lazy val s = TestSpark.spark
  private val sfDir = "/root/testdata/sf0.001"

  test("q184 codes pack into 32 bits and fidelity is a valid cosine") {
    val rows = SparkEntry.queries("q184_pq_encode")(s, sfDir).collect()
    assert(rows.length == 500, "one row per vector")
    rows.foreach { r =>
      val (code, cos) = (r.getLong(1), r.getDouble(2))
      assert(code >= 0L && code < (1L << 32),
        s"vec ${r.getLong(0)}: 8×4-bit code $code outside 32 bits")
      assert(cos >= -1.0 && cos <= 1.0 + 1e-9,
        s"vec ${r.getLong(0)}: cos_pq $cos outside [-1,1]")
    }
    // PQ at 16 codes/subspace must reconstruct isotropic 64-d unit-ish
    // vectors imperfectly but usefully: mean fidelity in (0.3, 0.999) —
    // below q99's int8 floor (0.999), far above random (≈0).
    val mean = rows.map(_.getDouble(2)).sum / rows.length
    assert(mean > 0.3 && mean < 0.999,
      s"mean cos_pq $mean outside the plausible PQ band")
  }

  test("q185 probes the persisted cell-partitioned codes index") {
    val out = SparkEntry.queries("q185_ann_pq")(s, sfDir).collect()
    assert(out.nonEmpty, "probe returned no neighbors")
    out.foreach { r =>
      assert(r.getLong(0) != r.getLong(1), "self-match leaked")
      assert(r.getLong(3) >= 1, "n_cand must count the scored candidates")
      assert(r.getDouble(2) >= 0.0, "squared ADC distance is non-negative")
    }
    // The build persisted a codes table partitioned by coarse cell
    // (cell=<v> directories), so a probe prunes to nprobe/K of them.
    // Scope the check to THIS JVM's index dirs via the run token — a
    // stale dir from a previous run must not mask a broken persist
    // (round-15 review finding).
    val tok = graft.queries.Sinks.runToken
    val tmp = new File(sys.props("java.io.tmpdir"))
    val idxDirs = tmp.listFiles()
      .filter(f => f.isDirectory &&
        f.getName.startsWith(s"graft_pq_index_${tok}_"))
    assert(idxDirs.nonEmpty,
      s"no persisted PQ index directory for this JVM (token $tok)")
    val cells = idxDirs.map(d =>
      Option(d.listFiles()).getOrElse(Array.empty[File])
        .count(f => f.isDirectory && f.getName.startsWith("cell="))).max
    assert(cells >= 8, s"expected >=8 cell= partitions, saw $cells")
  }

}
