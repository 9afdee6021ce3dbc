package graft.model

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Typed views of the driver-generated parquet tables (see TESTDATA.md /
  * FIXTURES.md §1). Every query receives an `sfDir` and reads through here,
  * so scan options (vectorized parquet reader, pushdown) are centralized.
  *
  * Scale note: at 100 TB the fact tables (`lineitem`, `orders`, `events`,
  * `documents`, `embeddings`) arrive partitioned; dimension tables
  * (`region`, `nation`, `customer`, `supplier`, `part`) stay broadcastable —
  * `dim()` wraps a table in an explicit broadcast hint so star joins never
  * shuffle the fact side on a dimension key.
  */
final case class Tables(spark: SparkSession, sfDir: String) {
  // The driver contract hands SparkEntry an externally-built session that
  // may lack the graft static conf (`spark.sql.extensions` is ignored by
  // getOrCreate when a session already exists in the JVM) — register the
  // native functions defensively so every catalog entry is self-contained.
  graft.functions.GraftExtensions.ensureRegistered(spark)

  private def t(name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  /** Explicit broadcast hint for dimension-sized tables (SURVEY §2.3 J6). */
  def dim(df: DataFrame): DataFrame = broadcast(df)

  def region: DataFrame     = t("region")
  def nation: DataFrame     = t("nation")
  def customer: DataFrame   = t("customer")
  def supplier: DataFrame   = t("supplier")
  def part: DataFrame       = t("part")
  def orders: DataFrame     = t("orders")
  def lineitem: DataFrame   = t("lineitem")

  /** `events.ts` is parquet timestamp[ns], which Spark 4.x refuses to read
    * natively ([PARQUET_TYPE_ILLEGAL]). The legacy conf is runtime-settable,
    * so it is (re)asserted here at use-site — an externally-built session
    * (the SparkEntry contract) works without any builder cooperation. The
    * column arrives as a raw nanosecond LONG and is truncated to a
    * microsecond TIMESTAMP — matching what DuckDB emits for the same
    * column, so oracle hashes line up. Integer `div` truncates toward zero,
    * which equals floor truncation for the all-positive (post-1970)
    * timestamps in this data; pre-epoch values would differ by 1µs. Every
    * events query inherits this conversion.
    *
    * DELIBERATE SESSION-WIDE EFFECT: the conf stays set after this call.
    * It CANNOT be scoped — parquet schema inference reads it at
    * `spark.read` time and execution snapshots it again into the scan's
    * hadoopConf at physical-planning time (there is no per-read option;
    * probed on 4.1.2: `.option("nanosAsLong", true)` still throws
    * PARQUET_TYPE_ILLEGAL), so a save/restore around this accessor would
    * break the very query being built. Consequence for a shared session:
    * any LATER parquet read of a timestamp[ns] column — graft or not —
    * gets a LongType instead of an AnalysisException. Documented as the
    * SparkEntry session contract; micro/milli/second timestamps and all
    * other types are unaffected.
    */
  def events: DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    t("events").withColumn("ts", timestamp_micros(expr("ts div 1000")))
  }

  def documents: DataFrame  = t("documents")
  def embeddings: DataFrame = t("embeddings")
}

object Tables {
  /** Case classes for the typed Dataset core model (SURVEY §1.1). */
  final case class Vertex(blobId: Long, idx: Int, x: Double, y: Double)
  final case class Edge(blobId: Long, x1: Double, y1: Double, x2: Double, y2: Double)
  final case class GridCell(y: Int, x: Int, gx: Double, gy: Double)
  final case class BlobParams(blobId: Long, radius: Double, wobble: Double,
                              cx: Double, cy: Double, depth: Double)
}
