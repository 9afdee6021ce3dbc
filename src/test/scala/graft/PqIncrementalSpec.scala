package graft

import org.apache.spark.sql.functions.{col, count, lit, sum, when}
import org.scalatest.funsuite.AnyFunSuite

/** q193 structural pins beyond the DuckDB hash — IvfIncrementalSpec's
  * trio applied to the CODES tier:
  *   (1) the grown codes table holds base + delta partition-wise (delta
  *       codes land INSIDE existing cell directories, co-located with
  *       the base codes they will be scanned with);
  *   (2) the append path plans NO Lloyd update — the subspace codebooks
  *       are frozen (pqCodebooksOf's update signature is posexplode +
  *       per-(m, cid, pos) mean; pqEncode against a checkpointed
  *       codebook has neither);
  *   (3) the catalog output really exercises the append: delta-truth
  *       queries are answered with nonzero recall (drop the appended
  *       codes and this craters to 0 while the build gates stay green).
  */
class PqIncrementalSpec extends AnyFunSuite {
  private lazy val s = TestSpark.spark
  private val sfDir = "/root/testdata/sf0.001"
  private val mod = graft.queries.VectorOps.INC_MOD
  private val rem = graft.queries.VectorOps.INC_REM

  test("grown codes table = base + delta, delta co-located in cells") {
    val (_, path) = graft.queries.VectorOps.grownPqIndex(s, sfDir)
    val idx = s.read
      .schema("vec_id LONG, codes ARRAY<INT>, cell LONG").parquet(path)
    val n = idx.count()
    val nDelta = idx.where(col("vec_id") % mod === rem).count()
    assert(n == 500L, s"grown codes table must hold the whole corpus, saw $n")
    assert(nDelta == 100L,
      s"the appended delta batch must be 20% of the corpus, saw $nDelta")
    val shared = idx
      .groupBy("cell")
      .agg(sum(when(col("vec_id") % mod === rem, 1).otherwise(0)).as("d"),
        count(lit(1)).as("t"))
      .where(col("d") > 0 && col("t") > col("d"))
      .count()
    assert(shared > 0,
      "no cell holds both base and delta codes — the append landed in a " +
        "disjoint layout instead of the existing cell partitions")
  }

  test("the append path plans no Lloyd update (frozen subspace codebooks)") {
    val (centsIdx, _) = graft.queries.VectorOps.grownPqIndex(s, sfDir)
    val delta = graft.queries.VectorOps.emb(s, sfDir)
      .where(col("vec_id") % mod === rem)
    val plan = graft.queries.VectorOps.pqEncode(delta, centsIdx)
      .queryExecution.optimizedPlan.toString
    assert(!plan.toLowerCase.contains("posexplode"),
      s"the incremental encode re-plans the subspace-Lloyd centroid " +
        s"update (posexplode per-dimension mean) — the codebooks are no " +
        s"longer frozen:\n$plan")
  }

  test("codes are 8 nibbles in range, and delta-truth recall is nonzero") {
    val (_, path) = graft.queries.VectorOps.grownPqIndex(s, sfDir)
    val bad = s.read
      .schema("vec_id LONG, codes ARRAY<INT>, cell LONG").parquet(path)
      .where(org.apache.spark.sql.functions.size(col("codes")) =!= 8 ||
        org.apache.spark.sql.functions.exists(col("codes"),
          c => c < 0 || c > 15))
      .count()
    assert(bad == 0, s"$bad rows carry malformed PQ codes")

    val rows = SparkEntry.queries("q193_pq_incremental")(s, sfDir)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(rows.keySet == Set("base", "delta"))
    val (nq, nAns, rec) = rows("delta")
    assert(nq > 0, "no query's true neighbor lives in the delta batch?")
    assert(nAns == nq, s"delta-truth queries unanswered: $nAns of $nq")
    assert(rec > 0.0,
      "recall on delta-truth queries is 0 — the appended codes are not " +
        "being served")
    assert(rows("base")._1 + nq == 200L)
  }
}
