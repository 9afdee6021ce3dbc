package graft

import java.io.File
import org.scalatest.funsuite.AnyFunSuite
import graft.queries.Sinks

/** q146 small-file compaction (VERDICT r8 #6): the oracle checks content
  * identity + the bin-pack file-count arithmetic cross-engine; this spec
  * pins the part DuckDB can't see — the BEFORE state really was
  * fragmented, and compaction really shrank the physical file count. */
class CompactionSpec extends AnyFunSuite {
  private lazy val s = TestSpark.spark
  private val SF = "/root/testdata/sf0.001"

  private def parquetFiles(root: String): Seq[File] = {
    def walk(f: File): Seq[File] =
      if (f.isDirectory) f.listFiles().toSeq.flatMap(walk)
      else if (f.getName.endsWith(".parquet")) Seq(f)
      else Nil
    walk(new File(root))
  }

  test("compaction drops the file count and bin-packs to ceil(n/C) per lang") {
    val compacted = Sinks.compactedDocs(s, SF)
    val before = parquetFiles(Sinks.fragmentedPath)
    val after = parquetFiles(Sinks.compactedPath)
    assert(before.nonEmpty && after.nonEmpty)
    // the fragmented landing really is the small-file pathology: far more
    // files than the compacted layout (48-way shuffle × 5 langs vs
    // ceil(n_lang / C) per lang)
    assert(before.size > 4 * after.size,
      s"expected ≫ fragmentation: before=${before.size} after=${after.size}")
    // per-lang bin-pack invariant on the actual directories
    val perLang = compacted.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    perLang.foreach { case (lang, n) =>
      val files = parquetFiles(s"${Sinks.compactedPath}/lang=$lang")
      val want = math.ceil(n.toDouble / Sinks.COMPACT_RECS_PER_FILE).toLong
      assert(files.size.toLong === want,
        s"lang=$lang: $n rows → ${files.size} files, want $want")
    }
    // row identity: compaction must not lose or duplicate a single row
    val orig = s.read.parquet(s"$SF/documents.parquet")
    assert(compacted.count() === orig.count())
    assert(compacted.select("doc_id").except(orig.select("doc_id")).isEmpty)
    assert(orig.select("doc_id").except(compacted.select("doc_id")).isEmpty)
  }
}
