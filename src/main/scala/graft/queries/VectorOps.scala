package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.model.Tables

/** Similarity search over the `embeddings` table (64-dim float vectors):
  * brute-force cosine top-k as the correctness baseline, a label-blocked
  * variant as the IVF-style scale path, and a random-hyperplane LSH
  * variant as the hash-bucketed scale path.
  *
  * Scale stance: the brute-force query bounds its QUERY SET (10 vectors) —
  * it is the oracle baseline, not the production path. The production
  * paths never do all-pairs: q35 joins only within a label block (IVF
  * cell), q37 joins only within an 8-bit hyperplane-signature bucket, so
  * join fan-out is |block|², not |corpus|². Dot products run inside
  * Catalyst HOFs (zip_with/aggregate) on the executors; nothing collects.
  *
  * Determinism: cosines are rounded to 6 decimals BEFORE ranking, so the
  * ≤1e-15 cross-engine summation-order noise cannot flip an ordering;
  * remaining ties break on vec_id.
  */
object VectorOps {

  /** Embeddings with exact float→double cast and precomputed L2 norm. */
  private def emb(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir).embeddings
      .select(col("vec_id"), col("label").cast("long").as("label"),
        transform(col("embedding"), x => x.cast("double")).as("e"))
      .withColumn("nrm", sqrt(aggregate(
        zip_with(col("e"), col("e"), (x, y) => x * y),
        lit(0.0), (acc, x) => acc + x)))

  private def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Brute-force cosine top-3 for a bounded query set (vec_id < 10) —
    // the exactness baseline every ANN variant is judged against.
    "q34_cosine_topk" -> ((s, dir) => {
      val all = emb(s, dir)
      val q = all.select(col("vec_id").as("qid"), col("e").as("qe"),
        col("nrm").as("qn")).where(col("qid") < 10)
      val scored = broadcast(q).crossJoin(all)
        .where(col("vec_id") =!= col("qid"))
        .select(col("qid"), col("vec_id"),
          round(dot(col("qe"), col("e")) / (col("qn") * col("nrm")), 6)
            .as("cos"))
      val w = Window.partitionBy("qid").orderBy(col("cos").desc, col("vec_id"))
      scored.withColumn("rank", row_number().over(w).cast("long"))
        .where(col("rank") <= 3)
        .orderBy("qid", "rank")
    }),

    // Label-blocked nearest neighbor (the IVF-style scale path): top-1
    // within each vector's label cell — |block|² pairs per cell, never
    // corpus². Oracle-checked.
    "q35_ann_blocked" -> ((s, dir) => {
      val a = emb(s, dir)
      val pairs = a.select(col("vec_id"), col("label"), col("e"), col("nrm"))
        .as("a")
        .join(a.select(col("vec_id").as("bid"), col("label"),
          col("e").as("be"), col("nrm").as("bn")).as("b"), Seq("label"))
        .where(col("vec_id") =!= col("bid"))
        .select(col("label"), col("vec_id"), col("bid"),
          round(dot(col("e"), col("be")) / (col("nrm") * col("bn")), 6)
            .as("cos"))
      val w = Window.partitionBy("vec_id").orderBy(col("cos").desc, col("bid"))
      pairs.withColumn("rn", row_number().over(w))
        .where(col("rn") === 1)
        .select(col("vec_id"), col("label"), col("bid").as("best"), col("cos"))
        .orderBy("vec_id")
    }),

    // Array/HOF family over embeddings: per-label count, mean norm, and
    // centroid norm (positional explode → per-dimension mean → L2).
    "q36_embedding_stats" -> ((s, dir) => {
      val base = emb(s, dir)
      val stats = base.groupBy("label").agg(
        count(lit(1)).as("n"), round(avg("nrm"), 6).as("avg_norm"))
      val centroid = base
        .select(col("label"), posexplode(col("e")).as(Seq("pos", "v")))
        .groupBy("label", "pos").agg(round(avg("v"), 9).as("c"))
        .groupBy("label").agg(round(sqrt(sum(col("c") * col("c"))), 6)
          .as("centroid_norm"))
      stats.join(centroid, "label").orderBy("label")
    }),

    // Random-hyperplane LSH ANN (Spark-only, rows-only check): 8
    // Rademacher hyperplanes derived from xxhash64(plane, dim) parities →
    // 8-bit signature → bucket-local cosine top-1. The bucket join is the
    // 100 TB shape: candidates share a signature, fan-out is bucket-sized.
    "q37_ann_lsh" -> ((s, dir) => {
      val base = emb(s, dir)
      val comps = base
        .select(col("vec_id"), posexplode(col("e")).as(Seq("pos", "v")))
      val projs = (0 until 8).map { p =>
        sum(col("v") * when(pmod(xxhash64(lit(p), col("pos")), lit(2)) === 1,
          lit(1.0)).otherwise(lit(-1.0))).as(s"proj$p")
      }
      val sigs = comps.groupBy("vec_id").agg(projs.head, projs.tail: _*)
        .select(col("vec_id"),
          (0 until 8).map(p =>
            when(col(s"proj$p") > 0, lit(1L << p)).otherwise(0L))
            .reduce(_ + _).as("bucket"))
      val withVec = sigs.join(base.select("vec_id", "e", "nrm"), "vec_id")
      val pairs = withVec.as("a")
        .join(withVec.select(col("bucket"), col("vec_id").as("bid"),
          col("e").as("be"), col("nrm").as("bn")).as("b"), Seq("bucket"))
        .where(col("vec_id") =!= col("bid"))
        .select(col("vec_id"), col("bucket"), col("bid"),
          round(dot(col("e"), col("be")) / (col("nrm") * col("bn")), 6)
            .as("cos"))
      val w = Window.partitionBy("vec_id").orderBy(col("cos").desc, col("bid"))
      pairs.withColumn("rn", row_number().over(w))
        .where(col("rn") === 1)
        .select(col("vec_id"), col("bucket"), col("bid").as("best"), col("cos"))
        .orderBy("vec_id")
    }),
  )

  def oracles: Map[String, String] = Map(
    "q34_cosine_topk" ->
      """WITH e AS (
        | SELECT vec_id, embedding::DOUBLE[] AS e,
        |  SQRT(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS nrm
        | FROM embeddings),
        |scored AS (
        | SELECT q.vec_id AS qid, a.vec_id,
        |  ROUND(list_dot_product(q.e, a.e) / (q.nrm * a.nrm), 6) AS cos
        | FROM e q JOIN e a ON a.vec_id != q.vec_id
        | WHERE q.vec_id < 10),
        |ranked AS (
        | SELECT qid, vec_id, cos,
        |  ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cos DESC, vec_id) AS rank
        | FROM scored)
        |SELECT qid, vec_id, cos, rank FROM ranked
        |WHERE rank <= 3 ORDER BY qid, rank""".stripMargin,

    "q35_ann_blocked" ->
      """WITH e AS (
        | SELECT vec_id, CAST(label AS BIGINT) AS label,
        |  embedding::DOUBLE[] AS e,
        |  SQRT(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS nrm
        | FROM embeddings),
        |pairs AS (
        | SELECT a.vec_id, a.label, b.vec_id AS bid,
        |  ROUND(list_dot_product(a.e, b.e) / (a.nrm * b.nrm), 6) AS cos
        | FROM e a JOIN e b ON a.label = b.label AND a.vec_id != b.vec_id),
        |ranked AS (
        | SELECT vec_id, label, bid, cos,
        |  ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY cos DESC, bid) AS rn
        | FROM pairs)
        |SELECT vec_id, label, bid AS best, cos FROM ranked
        |WHERE rn = 1 ORDER BY vec_id""".stripMargin,

    "q36_embedding_stats" ->
      """WITH e AS (
        | SELECT vec_id, CAST(label AS BIGINT) AS label,
        |  embedding::DOUBLE[] AS e,
        |  SQRT(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS nrm
        | FROM embeddings),
        |stats AS (
        | SELECT label, COUNT(*) AS n, ROUND(AVG(nrm), 6) AS avg_norm
        | FROM e GROUP BY label),
        |comps AS (
        | SELECT label, generate_subscripts(e, 1) - 1 AS pos, unnest(e) AS v
        | FROM e),
        |centroid AS (
        | SELECT label, ROUND(SQRT(SUM(c * c)), 6) AS centroid_norm FROM (
        |  SELECT label, pos, ROUND(AVG(v), 9) AS c FROM comps GROUP BY 1, 2)
        | GROUP BY label)
        |SELECT label, n, avg_norm, centroid_norm
        |FROM stats JOIN centroid USING (label) ORDER BY label""".stripMargin,
  )
}
