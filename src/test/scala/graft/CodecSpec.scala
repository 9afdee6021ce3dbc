package graft

import java.io.File
import org.scalatest.funsuite.AnyFunSuite

/** q92's oracle proves the VALUES round-tripped; this spec proves the
  * codec actually engaged — a misspelled/ignored compression option would
  * still pass the hash check with plain files. Spark stamps the codec
  * into part-file names, so the extension is the on-disk witness. */
class CodecSpec extends AnyFunSuite {
  private lazy val s = TestSpark.spark
  private val sfDir = "/root/testdata/sf0.001"

  private def parts(dir: String): Seq[String] =
    new File(dir).listFiles().map(_.getName).filter(_.startsWith("part-")).toSeq

  test("q92 writes genuinely zstd parquet and gzip json files") {
    SparkEntry.queries("q92_codec_roundtrip")(s, sfDir).collect()
    val pz = parts(sys.props("java.io.tmpdir") +
      s"/graft_rt_zstd_${graft.queries.Sinks.runToken}")
    val pg = parts(sys.props("java.io.tmpdir") +
      s"/graft_rt_jsongz_${graft.queries.Sinks.runToken}")
    assert(pz.nonEmpty && pz.forall(_.endsWith(".zstd.parquet")),
      s"expected .zstd.parquet parts, got $pz")
    assert(pg.nonEmpty && pg.forall(_.endsWith(".json.gz")),
      s"expected .json.gz parts, got $pg")
    // gzip magic bytes in the first json part — extension plus content
    val gz = new File(sys.props("java.io.tmpdir") +
      s"/graft_rt_jsongz_${graft.queries.Sinks.runToken}", pg.head)
    val in = new java.io.FileInputStream(gz)
    val head = try { val b = new Array[Byte](2); in.read(b); b }
    finally in.close()
    assert((head(0) & 0xff) == 0x1f && (head(1) & 0xff) == 0x8b,
      "first json part lacks the gzip magic")
  }
}
