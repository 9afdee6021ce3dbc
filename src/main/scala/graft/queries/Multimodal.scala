package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.model.Tables

/** Multimodal-column plumbing: media as opaque BINARY payloads with typed
  * metadata, flowing through real Spark schema/partitioning.
  *
  * The decode stage is a STUB by design (no image/audio codecs in this
  * environment): `fakeDecode` derives deterministic "dimensions" and a
  * "brightness" from the payload bytes, standing in for a real
  * decode-and-feature-extract. The Spark-side plumbing — binary column,
  * metadata struct, per-source partition pruning shape, flat typed feature
  * output — is real and oracle-checked.
  *
  * Scale stance: payloads stay opaque executor-side (no driver collect);
  * a production pipeline would partition by media container/source so
  * decode stages scan only the formats they handle — the `source` column
  * plays that role here. Feature extraction is a narrow map (no shuffle);
  * the only shuffle is the final bounded per-source aggregate in q44.
  */
object Multimodal {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Per-item decode: binary payload + metadata struct → flat typed
    // features. Output is one row per media item.
    "q43_media_decode" -> ((s, dir) => {
      val payload = col("text").cast("binary")
      Tables(s, dir).documents
        .select(col("doc_id"), col("source"), payload.as("payload"),
          struct(octet_length(payload).as("n_bytes"),
            md5(col("text")).as("checksum")).as("meta"))
        // ---- fakeDecode stub: deterministic stand-in for codec output ----
        .select(col("doc_id"), col("source"),
          col("meta.n_bytes").cast("long").as("n_bytes"),
          col("meta.checksum").as("checksum"),
          (col("meta.n_bytes") % 64 + 1).cast("long").as("width"),
          expr("CAST(meta.n_bytes div 64 + 1 AS BIGINT)").as("height"),
          round(ascii(substring(col("doc_id").cast("string"), 1, 1))
            .cast("double") / 255.0, 6).as("brightness"))
        .orderBy("doc_id")
    }),

    // Per-source media stats: the bounded aggregate a pipeline dashboard
    // reads (count, payload volume, dimension spread).
    "q44_media_stats" -> ((s, dir) => {
      val payload = col("text").cast("binary")
      Tables(s, dir).documents
        .select(col("source"), octet_length(payload).cast("long").as("n_bytes"))
        .groupBy("source")
        .agg(count(lit(1)).as("n_items"), sum("n_bytes").as("total_bytes"),
          min("n_bytes").as("min_bytes"), max("n_bytes").as("max_bytes"))
        .orderBy("source")
    }),
  )

  def oracles: Map[String, String] = Map(
    "q43_media_decode" ->
      """SELECT doc_id, source,
        | CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
        | md5(text) AS checksum,
        | CAST(octet_length(encode(text)) % 64 + 1 AS BIGINT) AS width,
        | CAST(octet_length(encode(text)) // 64 + 1 AS BIGINT) AS height,
        | ROUND(CAST(ascii(substr(CAST(doc_id AS VARCHAR), 1, 1)) AS DOUBLE)
        |       / 255.0, 6) AS brightness
        |FROM documents ORDER BY doc_id""".stripMargin,

    "q44_media_stats" ->
      """SELECT source, COUNT(*) AS n_items,
        | CAST(SUM(octet_length(encode(text))) AS BIGINT) AS total_bytes,
        | CAST(MIN(octet_length(encode(text))) AS BIGINT) AS min_bytes,
        | CAST(MAX(octet_length(encode(text))) AS BIGINT) AS max_bytes
        |FROM documents GROUP BY source ORDER BY source""".stripMargin,
  )
}
