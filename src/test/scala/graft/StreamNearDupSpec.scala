package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.EventStreams
import graft.streaming.EventStreams.StreamDoc

/** flatMapGroupsWithState streaming near-dup filter (the q54 batch
  * SimHash twin at ingest time): verdicts per document, retained-set
  * state persisting across micro-batches, band-bucket isolation, and
  * the bucket cap. */
class StreamNearDupSpec extends AnyFunSuite {
  private lazy val s = TestSpark.spark

  private def ts(hour: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 $hour%02d:00:00")

  // 48-bit fingerprints: bucket = fp >>> 36 (top 12 of 48)
  private val A = 0x123000000000L // bucket 0x123
  private val B = 0x456000000000L // bucket 0x456

  test("near-dups flagged within and across micro-batches; buckets isolated") {
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val in = MemoryStream[StreamDoc]
    val q = EventStreams.streamingNearDup(in.toDS())
      .writeStream.format("memory").queryName("neardup")
      .outputMode("append").start()

    // batch 1: doc 10 retained; doc 11 two bits away → dup of 10;
    // doc 20 same bucket but far (hamming 12) → retained;
    // doc 30 seeds bucket B for the cross-batch exact match;
    // doc 31 is hamming-1 from A but the flipped bit is INSIDE the
    // top-12 band (A ^ 1<<40 → bucket 0x133) — without bucket
    // isolation it WOULD be flagged dup of 10, so its (-1,-1) verdict
    // is what actually pins the groupByKey(fp >>> 36) bucketing
    in.addData(
      StreamDoc(10L, ts(1), A),
      StreamDoc(11L, ts(1), A ^ 0x3L),
      StreamDoc(20L, ts(1), A ^ 0xFFFL),
      StreamDoc(30L, ts(1), B ^ 0x1L),
      StreamDoc(31L, ts(1), A ^ (1L << 40)))
    q.processAllAvailable()

    // batch 2: doc 40 one bit from doc 10's fp → dup via state carried
    // across batches; doc 50 matches doc 30's bucket-B fp exactly
    in.addData(
      StreamDoc(40L, ts(2), A ^ 0x1L),
      StreamDoc(50L, ts(2), B ^ 0x1L))
    q.processAllAvailable()

    val rows = s.table("neardup").collect()
      .map(r => r.getLong(0) -> ((r.getLong(2), r.getInt(3)))).toMap
    q.stop()

    assert(rows(10L) === ((-1L, -1)))
    assert(rows(11L) === ((10L, 2)))
    assert(rows(20L) === ((-1L, -1)))
    assert(rows(30L) === ((-1L, -1))) // far from everything: retained
    assert(rows(31L) === ((-1L, -1))) // hamming-1 from A, other band:
                                      // ONLY bucket isolation saves it
    assert(rows(40L) === ((10L, 1))) // state survived the batch boundary
    assert(rows(50L) === ((30L, 0))) // exact dup in bucket B
  }

  test("bucket cap bounds state: overflow docs are never retained") {
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val in = MemoryStream[StreamDoc]
    // cap 2, hamming 0 (exact-only) so every distinct fp wants retention
    val q = EventStreams.streamingNearDup(in.toDS(), hammingMax = 0, cap = 2)
      .writeStream.format("memory").queryName("neardup_cap")
      .outputMode("append").start()
    // four distinct fps in one bucket: docs 3, 4 fill the cap (doc_id
    // order), docs 5, 6 overflow — reported non-dup but NOT retained
    in.addData(
      StreamDoc(3L, ts(1), A),
      StreamDoc(4L, ts(1), A ^ 0x10L),
      StreamDoc(5L, ts(1), A ^ 0x20L),
      StreamDoc(6L, ts(1), A ^ 0x30L))
    q.processAllAvailable()
    // doc 7 repeats overflow doc 5's fp: state never saw it → non-dup;
    // doc 8 repeats retained doc 3's fp → dup
    in.addData(
      StreamDoc(7L, ts(2), A ^ 0x20L),
      StreamDoc(8L, ts(2), A))
    q.processAllAvailable()
    val rows = s.table("neardup_cap").collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    q.stop()
    assert(rows(5L) === -1L && rows(6L) === -1L)
    assert(rows(7L) === -1L) // cap held: fp of doc 5 was not in state
    assert(rows(8L) === 3L)
  }
}
