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

    // Resize stage plumbing: fit each item's (width, height) into a 32×32
    // box preserving aspect ratio, never upscaling — the standard thumb-
    // nail transform. The arithmetic IS the real resize planning (scale
    // factor, output dims, pixel budget); only the pixel resample itself
    // would sit behind the codec stub. Narrow map, no shuffle.
    "q59_media_resize" -> ((s, dir) => {
      val nb = octet_length(col("text").cast("binary"))
      val w = (nb % 64 + 1).cast("double")
      val h = expr("CAST(octet_length(CAST(text AS BINARY)) div 64 + 1 AS DOUBLE)")
      val scale = least(lit(32.0) / w, lit(32.0) / h, lit(1.0))
      Tables(s, dir).documents
        .select(col("doc_id"),
          w.cast("long").as("width"), h.cast("long").as("height"),
          round(scale, 6).as("scale"),
          greatest(floor(w * scale), lit(1)).cast("long").as("out_w"),
          greatest(floor(h * scale), lit(1)).cast("long").as("out_h"))
        .withColumn("out_pixels", (col("out_w") * col("out_h")).cast("long"))
        .orderBy("doc_id")
    }),

    // Frame-sampling plumbing: treat the payload as a frame container
    // (16 bytes/frame in the stub geometry) and emit every 8th frame's
    // (index, byte offset) — the explode/sequence shape of video frame
    // extraction, one output row per SAMPLED frame (output is O(frames/k),
    // not O(payload)).
    "q60_frame_sample" -> ((s, dir) => {
      val nf = (octet_length(col("text").cast("binary"))
        .cast("long").divide(16)).cast("long") + 1
      Tables(s, dir).documents
        .select(col("doc_id"), nf.as("n_frames"))
        .select(col("doc_id"), col("n_frames"),
          explode(sequence(lit(0L), col("n_frames") - 1, lit(8L)))
            .as("frame_idx"))
        .withColumn("byte_offset", col("frame_idx") * 16)
        .orderBy("doc_id", "frame_idx")
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

    "q59_media_resize" ->
      """WITH dims AS (
        | SELECT doc_id,
        |  CAST(octet_length(encode(text)) % 64 + 1 AS DOUBLE) AS w,
        |  CAST(octet_length(encode(text)) // 64 + 1 AS DOUBLE) AS h
        | FROM documents),
        |scaled AS (
        | SELECT doc_id, w, h, LEAST(32.0 / w, 32.0 / h, 1.0) AS scale
        | FROM dims)
        |SELECT doc_id,
        | CAST(w AS BIGINT) AS width, CAST(h AS BIGINT) AS height,
        | ROUND(scale, 6) AS scale,
        | CAST(GREATEST(FLOOR(w * scale), 1) AS BIGINT) AS out_w,
        | CAST(GREATEST(FLOOR(h * scale), 1) AS BIGINT) AS out_h,
        | CAST(GREATEST(FLOOR(w * scale), 1)
        |    * GREATEST(FLOOR(h * scale), 1) AS BIGINT) AS out_pixels
        |FROM scaled ORDER BY doc_id""".stripMargin,

    "q60_frame_sample" ->
      """WITH f AS (
        | SELECT doc_id,
        |  octet_length(encode(text)) // 16 + 1 AS n_frames
        | FROM documents)
        |SELECT doc_id, CAST(n_frames AS BIGINT) AS n_frames,
        | CAST(unnest(range(0, n_frames, 8)) AS BIGINT) AS frame_idx,
        | CAST(unnest(range(0, n_frames, 8)) * 16 AS BIGINT) AS byte_offset
        |FROM f ORDER BY doc_id, frame_idx""".stripMargin,
  )
}
