package graft

import java.nio.file.{Files, Paths, StandardCopyOption}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.EventStreams

/** File-source replay of the real events table through the streaming
  * tumbling-window plan (SURVEY §2.10): proves the SAME plan that the
  * MemoryStream specs drive also runs against a file source, that the
  * watermark closes exactly the windows whose end precedes
  * max(ts) − 1 h (the last day stays open — append mode emits nothing
  * for it), and that the closed-window COUNT matches the batch
  * computation of the same rule. Window-content semantics are pinned
  * separately: the batch twin q39 is oracle-checked against DuckDB.
  *
  * The result is recorded in artifacts/streaming_replay.json — a
  * committed, deterministic artifact the driver can diff round-over-
  * round (VERDICT r4 "next round" #8).
  */
class StreamReplaySpec extends AnyFunSuite {
  private lazy val s = TestSpark.spark
  private val SF_DIR = "/root/testdata/sf0.01"

  test("file-source replay closes exactly the watermark-passed windows") {
    // stage the single parquet file as a file-source directory
    val dir = Files.createTempDirectory("graft_stream_replay")
    Files.copy(Paths.get(s"$SF_DIR/events.parquet"),
      dir.resolve("part-0.parquet"), StandardCopyOption.REPLACE_EXISTING)

    // nanosAsLong (set by TestSpark): ts arrives as a nanosecond long —
    // the stream applies the same µs truncation Tables.events applies
    val fileSchema = s.read.parquet(dir.toString).schema
    val stream = s.readStream.schema(fileSchema).parquet(dir.toString)
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
      .select("event_id", "ts", "event_type")

    val q = EventStreams.tumblingCounts(stream)
      .writeStream.format("memory").queryName("replay")
      .outputMode("append").start()
    q.processAllAvailable()
    val closed = s.table("replay").count()
    q.stop()

    // batch expectation of the same closing rule: every (day, event_type)
    // window whose end <= max(ts) - 1h watermark
    val batch = s.read.parquet(s"$SF_DIR/events.parquet")
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
    val maxTs = batch.agg(max(unix_micros(col("ts")))).head().getLong(0)
    val watermarkUs = maxTs - 3600L * 1000000L
    val expected = batch
      .groupBy(window(col("ts"), "1 day"), col("event_type"))
      .agg(count(lit(1)))
      .where(unix_micros(col("window.end")) <= watermarkUs)
      .count()
    val total = batch
      .groupBy(window(col("ts"), "1 day"), col("event_type")).agg(count(lit(1)))
      .count()

    assert(closed === expected,
      s"streaming emitted $closed closed windows, batch rule expects $expected")
    assert(closed < total, "the final open window(s) must NOT be emitted")

    // committed, driver-diffable artifact (deterministic content)
    val artifactDir = Paths.get("artifacts")
    Files.createDirectories(artifactDir)
    Files.writeString(artifactDir.resolve("streaming_replay.json"),
      s"""{"source": "sf0.01/events.parquet", "plan": "tumblingCounts",
         | "closed_windows": $closed, "expected_closed": $expected,
         | "total_windows": $total, "match": ${closed == expected}}"""
        .stripMargin.replace("\n", "") + "\n")
  }
}
