package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale tier of the poster pipeline: the codegen point_in_polygon
  * expression (graft.functions.PointInPolygon) replacing the relational
  * parity join, and the full 400×400 reference-equivalent pipeline — the
  * configuration BASELINE.md measured the reference at (2.24 M cells,
  * 627 M edge tests, 2.68 s single-threaded numpy).
  *
  * q45 runs the expression at the 64 grid and is checked against the SAME
  * DuckDB oracle as the relational q17 — proving expression ≡ parity join
  * ≡ oracle bit-for-bit before the expression is trusted at scale.
  *
  * q46 is the honest Spark-vs-reference benchmark: full default-parameter
  * poster (14 blobs, 400×400, σ=6 shadow blur), mask computed cell-local
  * inside whole-stage codegen (no 280× join fan-out, no mask shuffle);
  * the only shuffles are per-blob aggregates (≤14-row outputs) and the
  * two blur regroups (~0.4 M rows). Output is one summary row per blob,
  * so result size is O(blobs) regardless of grid resolution.
  */
object PosterScale {

  /** Per-blob ordered vertex arrays: xs/ys packed for the expression.
    * array_sort on (idx, coord) structs restores vertex order after the
    * shuffle-free collect_list. */
  private def vertArrays(s: SparkSession): DataFrame =
    s.read.parquet(s"${Poster.FX}/blob_vertices.parquet")
      .groupBy("blob_id")
      .agg(
        transform(array_sort(collect_list(struct(col("idx"), col("x")))),
          v => v.getField("x")).as("xs"),
        transform(array_sort(collect_list(struct(col("idx"), col("y")))),
          v => v.getField("y")).as("ys"))

  private def grid(s: SparkSession, n: Int): DataFrame = {
    val xs = s.range(n).select(col("id").as("x"))
    val ys = s.range(n).select(col("id").as("y"))
    s.read.parquet(s"${Poster.FX}/blob_params.parquet")
      .crossJoin(broadcast(ys)).crossJoin(broadcast(xs))
      .select(col("blob_id"), col("y"), col("x"),
        col("cx_mean"), col("cy_mean"),
        col("base_r"), col("base_g"), col("base_b"), col("depth"),
        (col("xmin") + col("x").cast("double") *
          ((col("xmax") - col("xmin")) / lit((n - 1).toDouble))).as("gx"),
        (col("ymin") + col("y").cast("double") *
          ((col("ymax") - col("ymin")) / lit((n - 1).toDouble))).as("gy"))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // P18b: the codegen expression at the oracle grid — same output (and
    // same oracle) as the relational q17, zero join fan-out.
    "q45_pip_expr" -> ((s, _) =>
      grid(s, 64).join(broadcast(vertArrays(s)), "blob_id")
        .select(col("blob_id"), col("y"), col("x"),
          expr("point_in_polygon(gx, gy, xs, ys)").as("inside"))
        .orderBy("blob_id", "y", "x")),

    // The reference's full default poster at 400×400 — per-blob summary.
    // Rows-only check (a DuckDB oracle would re-run 627 M edge tests in
    // SQL); correctness is inherited from q45 ≡ q17 ≡ oracle at 64, plus
    // the golden-fixture test suite.
    "q46_poster_fullscale" -> ((s, _) => {
      val n = 400
      val g = grid(s, n)
        .withColumn("nx", col("gx") - col("cx_mean"))
        .withColumn("ny", col("gy") - col("cy_mean"))
        .withColumn("dist", sqrt(col("nx") * col("nx") + col("ny") * col("ny")))
        .withColumn("light", col("nx") * lit(-0.6) + col("ny") * lit(0.8))
      val stats = g.groupBy("blob_id").agg(
        max("dist").as("dist_max"), min("light").as("light_min"),
        max("light").as("light_max"))
      val cells = g.join(broadcast(stats), "blob_id")
        .join(broadcast(vertArrays(s)), "blob_id")
        .withColumn("inside", expr("point_in_polygon(gx, gy, xs, ys)"))
        .withColumn("radial", least(lit(1.0),
          greatest(lit(0.0), lit(1.0) - col("dist") / col("dist_max"))))
        .withColumn("lightn", (col("light") - col("light_min")) /
          (col("light_max") - col("light_min")))
        .withColumn("shade", lit(0.3) +
          lit(0.7) * (lit(0.5) * col("radial") + lit(0.5) * col("lightn")))
      val blobAgg = cells.groupBy("blob_id").agg(
        count(when(col("inside"), lit(1))).as("n_mask_cells"),
        round(sum(when(col("inside"), col("shade")).otherwise(0.0)), 3)
          .as("mask_shade_sum"),
        round(sum(when(col("inside"),
          lit(0.4) + lit(0.6) * col("depth")).otherwise(0.0)), 3)
          .as("alpha_sum"))
      // σ=6 shadow blur (37 taps) of the mask, separable two-pass.
      val k = broadcast(s.read.parquet(s"${Poster.FX}/kernel_sigma6.parquet"))
      val m = cells.where(col("inside")).select("blob_id", "y", "x")
      val p1 = m.crossJoin(k)
        .select(col("blob_id"), col("y"),
          (col("x") - col("offset").cast("long")).as("x"), col("weight"))
        .where(col("x").between(0, n - 1))
        .groupBy("blob_id", "y", "x").agg(sum("weight").as("v1"))
      val blur = p1.crossJoin(k)
        .select(col("blob_id"),
          (col("y") - col("offset").cast("long")).as("y"), col("x"),
          (col("weight") * col("v1")).as("p"))
        .where(col("y").between(0, n - 1))
        .groupBy("blob_id", "y", "x").agg(sum("p").as("v2"))
        .groupBy("blob_id").agg(round(sum("v2"), 3).as("shadow_mass"))
      blobAgg.join(blur, "blob_id").orderBy("blob_id")
    }),
  )

  def oracles: Map[String, String] = Map(
    // Deliberately the SAME oracle as the relational parity join.
    "q45_pip_expr" -> Poster.oracles("q17_point_in_polygon"),
  )
}
