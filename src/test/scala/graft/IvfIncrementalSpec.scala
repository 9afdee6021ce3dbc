package graft

import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

/** q189 structural pins beyond the DuckDB hash — the three claims that
  * make it INCREMENTAL maintenance rather than a rebuild in disguise:
  *   (1) the grown index holds base + delta partition-wise (delta rows
  *       land INSIDE existing cell directories, co-located with base);
  *   (2) the append path plans NO Lloyd update — the codebook is frozen
  *       (kmCentroids' update signature is posexplode + avg per (cid,
  *       pos); rankCells against a checkpointed codebook has neither);
  *   (3) the catalog output really exercises the append: delta-truth
  *       queries are answered with nonzero recall (drop the appended
  *       rows and this craters to 0 while the build gates stay green).
  */
class IvfIncrementalSpec extends AnyFunSuite {
  private lazy val s = TestSpark.spark
  private val sfDir = "/root/testdata/sf0.001"
  private val mod = graft.queries.VectorOps.INC_MOD
  private val rem = graft.queries.VectorOps.INC_REM

  test("grown index = base + delta, delta co-located in existing cells") {
    val (_, path, _) = graft.queries.VectorOps.grownIvfIndex(s, sfDir)
    val idx = s.read
      .schema("vec_id LONG, e ARRAY<DOUBLE>, nrm DOUBLE, cell LONG")
      .parquet(path)
    val n = idx.count()
    val nDelta = idx.where(col("vec_id") % mod === rem).count()
    assert(n == 500L, s"grown index must hold the whole corpus, saw $n")
    assert(nDelta == 100L,
      s"the appended delta batch must be 20% of the corpus, saw $nDelta")
    // at least one cell holds BOTH base and delta rows: the append wrote
    // into existing cell directories (partition-wise), not a side layout
    val shared = idx
      .groupBy("cell")
      .agg(
        org.apache.spark.sql.functions.sum(
          org.apache.spark.sql.functions.when(
            col("vec_id") % mod === rem, 1).otherwise(0)).as("d"),
        org.apache.spark.sql.functions.count(
          org.apache.spark.sql.functions.lit(1)).as("t"))
      .where(col("d") > 0 && col("t") > col("d"))
      .count()
    assert(shared > 0,
      "no cell holds both base and delta rows — the append landed in a " +
        "disjoint layout instead of the existing cell partitions")
  }

  test("the append path plans no Lloyd update (frozen codebook)") {
    val (cents, _, _) = graft.queries.VectorOps.grownIvfIndex(s, sfDir)
    val delta = graft.queries.VectorOps.emb(s, sfDir)
      .where(col("vec_id") % mod === rem)
    val plan = graft.queries.VectorOps.incAssign(delta, cents)
      .queryExecution.optimizedPlan.toString
    assert(!plan.toLowerCase.contains("posexplode"),
      s"the incremental assignment re-plans the Lloyd centroid update " +
        s"(posexplode per-dimension mean) — the codebook is no longer " +
        s"frozen:\n$plan")
  }

  test("delta-truth queries are answered with nonzero recall") {
    val rows = SparkEntry.queries("q189_ivf_incremental")(s, sfDir)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(rows.keySet == Set("base", "delta"))
    val (nq, nAns, rec) = rows("delta")
    assert(nq > 0, "no query's true neighbor lives in the delta batch?")
    assert(nAns == nq, s"delta-truth queries unanswered: $nAns of $nq")
    assert(rec > 0.0,
      "recall on delta-truth queries is 0 — the appended rows are not " +
        "being served")
    assert(rows("base")._1 + nq == 200L)
  }
}
