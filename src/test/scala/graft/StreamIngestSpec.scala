package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.EventStreams
import graft.streaming.EventStreams.StreamVec

/** Streaming ingest assignment (the q189/q193 maintenance loop at the
  * stream boundary): arriving vectors are homed against the frozen
  * base-trained codebook as a pure projection, and per-(window, cell)
  * arrival counts close under the watermark.
  *
  * The load-bearing pin is the FIRST test: assignLitExpr (the
  * streaming, literal-codebook projection) must agree row-for-row with
  * incAssign (the batch rankCells join) on the real delta batch — the
  * two forms implement one contract, so a drift in either rounding or
  * tie-break shows here before any correctness gate could see it. */
class StreamIngestSpec extends AnyFunSuite {
  private lazy val s = TestSpark.spark
  private val sfDir = "/root/testdata/sf0.001"
  private val mod = graft.queries.VectorOps.INC_MOD
  private val rem = graft.queries.VectorOps.INC_REM

  private def ts(hour: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 $hour%02d:00:00")

  private lazy val centsSeq: Seq[(Long, Seq[Double])] = {
    val (cents, _, _) = graft.queries.VectorOps.grownIvfIndex(s, sfDir)
    cents.collect().map(r => (r.getLong(0), r.getSeq[Double](1))).toSeq
  }

  private lazy val delta = graft.queries.VectorOps.emb(s, sfDir)
    .where(col("vec_id") % mod === rem)

  test("literal-codebook projection == batch incAssign on the delta batch") {
    val (cents, _, _) = graft.queries.VectorOps.grownIvfIndex(s, sfDir)
    val batch = graft.queries.VectorOps.incAssign(delta, cents)
      .select("vec_id", "cell").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val lit = delta
      .select(col("vec_id"),
        graft.queries.VectorOps.assignLitExpr(centsSeq).as("cell"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(lit.size == 100, s"delta batch must be 100 vectors, saw ${lit.size}")
    assert(lit == batch,
      "streaming literal-codebook assignment diverged from the batch " +
        "rankCells assignment")
  }

  test("per-(window, cell) arrival counts close under the watermark") {
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val rows = delta.select(col("vec_id"), col("e")).collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1))).sortBy(_._1)
    val (h1, h2) = rows.splitAt(rows.length / 2)

    val in = MemoryStream[StreamVec]
    val q = EventStreams.streamingCellIngest(in.toDS(), centsSeq)
      .writeStream.format("memory").queryName("vecingest")
      .outputMode("append").start()
    try {
      in.addData(h1.map { case (id, e) => StreamVec(id, ts(1), e) }.toSeq)
      q.processAllAvailable()
      in.addData(h2.map { case (id, e) => StreamVec(id, ts(2), e) }.toSeq)
      q.processAllAvailable()
      // sentinel advances the watermark past both windows' close; its
      // own (still-open) window never reaches the append-mode sink
      in.addData(StreamVec(9999L, ts(5), rows.head._2))
      q.processAllAvailable()

      val got = s.table("vecingest").collect()
        .map(r => (r.getTimestamp(0), r.getLong(1)) -> r.getLong(2)).toMap
      val lit = delta
        .select(col("vec_id"),
          graft.queries.VectorOps.assignLitExpr(centsSeq).as("cell"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val want = (h1.map(r => (ts(1), lit(r._1))) ++
          h2.map(r => (ts(2), lit(r._1))))
        .groupBy(identity).map { case (k, v) => k -> v.size.toLong }
      assert(got == want,
        s"streaming per-(window, cell) counts diverged from the batch " +
          s"assignment:\n got=$got\nwant=$want")
    } finally q.stop()
  }
}
