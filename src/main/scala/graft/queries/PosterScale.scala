package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
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

  private def vertArrays(s: SparkSession): DataFrame = Poster.vertArrays(s)

  /** Range-streamed grid (params broadcast): the n² cell ids split across
    * all cores; streaming the 14-row params file instead would leave the
    * whole pre-shuffle pipeline on one input partition. */
  private def grid(s: SparkSession, n: Int): DataFrame = {
    graft.functions.GraftExtensions.ensureRegistered(s)
    s.range(n.toLong * n)
      .select((col("id") % n).as("x"), (col("id") / n).cast("long").as("y"))
      .join(broadcast(s.read.parquet(s"${Poster.FX}/blob_params.parquet")))
      .select(col("blob_id"), col("y"), col("x"),
        col("cx_mean"), col("cy_mean"), col("depth"),
        col("xmin"), col("xmax"), col("ymin"), col("ymax"),
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
      val R = 18 // σ=6 kernel radius
      val g = grid(s, n)
        .withColumn("nx", col("gx") - col("cx_mean"))
        .withColumn("ny", col("gy") - col("cy_mean"))
        .withColumn("dist", sqrt(col("nx") * col("nx") + col("ny") * col("ny")))
        .withColumn("light", col("nx") * lit(-0.6) + col("ny") * lit(0.8))
      // The reference normalizes dist/light over the whole padded raster —
      // but dist is convex and light linear in (gx, gy), so over the
      // sampled lattice both extremes sit at the 4 corner samples. The
      // corner coordinates evaluate with the IDENTICAL linspace formula,
      // so this 14-row computation is bit-identical to aggregating all
      // 2.24 M cells (it replaces a full-grid scan+shuffle with algebra —
      // the kind of rewrite that matters when the grid is 100 TB).
      val stats = {
        val gx0 = col("xmin")
        val gx1 = col("xmin") + lit((n - 1).toDouble) *
          ((col("xmax") - col("xmin")) / lit((n - 1).toDouble))
        val gy0 = col("ymin")
        val gy1 = col("ymin") + lit((n - 1).toDouble) *
          ((col("ymax") - col("ymin")) / lit((n - 1).toDouble))
        def d(cx: Column, cy: Column) = {
          val nx = cx - col("cx_mean"); val ny = cy - col("cy_mean")
          sqrt(nx * nx + ny * ny)
        }
        def li(cx: Column, cy: Column) =
          (cx - col("cx_mean")) * lit(-0.6) + (cy - col("cy_mean")) * lit(0.8)
        s.read.parquet(s"${Poster.FX}/blob_params.parquet")
          .select(col("blob_id"),
            greatest(d(gx0, gy0), d(gx0, gy1), d(gx1, gy0), d(gx1, gy1))
              .as("dist_max"),
            least(li(gx0, gy0), li(gx0, gy1), li(gx1, gy0), li(gx1, gy1))
              .as("light_min"),
            greatest(li(gx0, gy0), li(gx0, gy1), li(gx1, gy0), li(gx1, gy1))
              .as("light_max"))
      }
      // Per-blob polygon data in ONE broadcast: ordered vertex arrays for
      // the expression plus the vertex bbox. The mask lives inside the
      // bbox, so mask/shade/blur only ever need the bbox dilated by the
      // kernel radius — every dropped cell provably contributes 0 to
      // every output. Cuts PIP evaluations and blur rows ~3×.
      val vb = s.read.parquet(s"${Poster.FX}/blob_vertices.parquet")
        .groupBy("blob_id").agg(
          // coalesce pins double NOT NULL — see Poster.vertArrays
          transform(array_sort(collect_list(struct(col("idx"), col("x")))),
            v => coalesce(v.getField("x"), lit(Double.NaN))).as("xs"),
          transform(array_sort(collect_list(struct(col("idx"), col("y")))),
            v => coalesce(v.getField("y"), lit(Double.NaN))).as("ys"),
          min("x").as("vx_min"), max("x").as("vx_max"),
          min("y").as("vy_min"), max("y").as("vy_max"))
      // gsel keeps the padded-grid bounds so the cell-coordinate band
      // bounds derive without another join.
      val stepX = (col("xmax") - col("xmin")) / lit((n - 1).toDouble)
      val stepY = (col("ymax") - col("ymin")) / lit((n - 1).toDouble)
      val cells = g.join(broadcast(vb), "blob_id")
        .where(
          col("x") >= floor((col("vx_min") - col("xmin")) / stepX) - (R + 1)
            && col("x") <= ceil((col("vx_max") - col("xmin")) / stepX) + (R + 1)
            && col("y") >= floor((col("vy_min") - col("ymin")) / stepY) - (R + 1)
            && col("y") <= ceil((col("vy_max") - col("ymin")) / stepY) + (R + 1))
        .join(broadcast(stats), "blob_id")
        .withColumn("inside", expr("point_in_polygon(gx, gy, xs, ys)"))
        .withColumn("radial", least(lit(1.0),
          greatest(lit(0.0), lit(1.0) - col("dist") / col("dist_max"))))
        .withColumn("lightn", (col("light") - col("light_min")) /
          (col("light_max") - col("light_min")))
        .withColumn("shade", lit(0.3) +
          lit(0.7) * (lit(0.5) * col("radial") + lit(0.5) * col("lightn")))
      // Single downstream pass: shuffle the ~430k mask cells once by
      // blob, then run the separable σ=6 blur on a DENSE per-blob band
      // array inside flatMapGroups — the one place the declarative forms
      // lose badly (the 37× kernel-join fan-out costs ~4 s here; the
      // dense conv is ~100 M multiplies, milliseconds). This is the
      // documented per-partition imperative escape hatch (preference
      // order (d)) — the oracle-checked q20/q21 keep the declarative
      // join form as the semantic reference. All per-blob aggregates
      // fold into the same pass.
      val kernel = s.read.parquet(s"${Poster.FX}/kernel_sigma6.parquet")
        .orderBy("offset").collect().map(_.getDouble(1))
      val maskCells = cells.where(col("inside"))
        .select(col("blob_id"), col("y").cast("int").as("y"),
          col("x").cast("int").as("x"), col("shade"), col("depth"))
      import s.implicits._
      val perBlob = maskCells
        .as[(Long, Int, Int, Double, Double)]
        .groupByKey(_._1)
        .mapGroups { (blob, it) =>
          val cells = it.toArray
          var shadeSum = 0.0
          var xLo = n; var xHi = -1; var yLo = n; var yHi = -1
          var depth = 0.0
          cells.foreach { c =>
            shadeSum += c._4; depth = c._5
            if (c._3 < xLo) xLo = c._3; if (c._3 > xHi) xHi = c._3
            if (c._2 < yLo) yLo = c._2; if (c._2 > yHi) yHi = c._2
          }
          // dilated band, clipped to the grid — all nonzero blur lives here
          val bx0 = math.max(0, xLo - R); val bx1 = math.min(n - 1, xHi + R)
          val by0 = math.max(0, yLo - R); val by1 = math.min(n - 1, yHi + R)
          val w = bx1 - bx0 + 1; val h = by1 - by0 + 1
          val m = new Array[Double](h * w)
          cells.foreach(c => m((c._2 - by0) * w + (c._3 - bx0)) = 1.0)
          // horizontal then vertical pass, zero padding outside the band
          // (cells beyond the grid edge clip away exactly like the
          // bounded join form)
          val t = new Array[Double](h * w)
          var yy = 0
          while (yy < h) {
            var xx = 0
            while (xx < w) {
              var acc = 0.0; var o = -R
              while (o <= R) {
                val sxx = xx + o
                if (sxx >= 0 && sxx < w) acc += kernel(o + R) * m(yy * w + sxx)
                o += 1
              }
              t(yy * w + xx) = acc
              xx += 1
            }
            yy += 1
          }
          var shadowMass = 0.0
          yy = 0
          while (yy < h) {
            var xx = 0
            while (xx < w) {
              var acc = 0.0; var o = -R
              while (o <= R) {
                val syy = yy + o
                if (syy >= 0 && syy < h) acc += kernel(o + R) * t(syy * w + xx)
                o += 1
              }
              shadowMass += acc
              xx += 1
            }
            yy += 1
          }
          val nMask = cells.length.toLong
          (blob, nMask,
            BigDecimal(shadeSum).setScale(3, BigDecimal.RoundingMode.HALF_UP)
              .toDouble,
            BigDecimal(0.4 * nMask + 0.6 * depth * nMask)
              .setScale(3, BigDecimal.RoundingMode.HALF_UP).toDouble,
            BigDecimal(shadowMass).setScale(3, BigDecimal.RoundingMode.HALF_UP)
              .toDouble)
        }
      perBlob
        .toDF("blob_id", "n_mask_cells", "mask_shade_sum", "alpha_sum",
          "shadow_mass")
        .orderBy("blob_id")
    }),
  )

  def oracles: Map[String, String] = Map(
    // Deliberately the SAME oracle as the relational parity join.
    "q45_pip_expr" -> Poster.oracles("q17_point_in_polygon"),
  )
}
