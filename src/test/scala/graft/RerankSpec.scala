package graft

import org.apache.spark.sql.execution.joins.{BroadcastNestedLoopJoinExec,
  CartesianProductExec}
import org.scalatest.funsuite.AnyFunSuite

/** q190 structural pins beyond the DuckDB hash — what makes it a STAGED
  * retriever rather than a dense ranker with extra steps:
  *   (1) provenance: every final row's (qid, doc_id, bm25_rnk) is
  *       exactly the stage-1 BM25 ranking's row — the dense pass
  *       re-SCORES the candidate pool, it never invents candidates;
  *   (2) the dense pass earns its keep: some final rows are PROMOTED
  *       from sparse ranks beyond BM25_TOPK (if the two stages always
  *       agreed, the rerank would be dead code);
  *   (3) the plan never cross-scores the corpus: no cartesian / nested-
  *       loop join anywhere — the only way embeddings meet candidates
  *       is the keyed join, so the per-pair vector math is bounded by
  *       |queries|·RERANK_CAND at any corpus size.
  */
class RerankSpec extends AnyFunSuite {
  private lazy val s = TestSpark.spark
  private val sfDir = "/root/testdata/sf0.001"

  test("final rows carry exact stage-1 provenance and include promotions") {
    import s.implicits._
    val out = SparkEntry.queries("q190_retrieve_rerank")(s, sfDir)
      .select("qid", "doc_id", "bm25_rnk").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    // rebuild the stage-1 pool through the same factored scorer at the
    // catalog's own stage-1 rule: rank ≤ RERANK_CAND of the same scoring
    val (tf, _) = graft.queries.Retrieval.tfAndQt(s, sfDir)
    val cand = graft.queries.Retrieval.bm25Score(
        tf.localCheckpoint(),
        tf.where($"doc_id" % graft.queries.Retrieval.QMOD === 0)
          .select($"doc_id".as("qid"), $"tok"),
        tf.groupBy("doc_id")
          .agg(org.apache.spark.sql.functions.sum("tf").as("dl")),
        frozenSortedLayout = false,
        topK = graft.queries.Retrieval.RERANK_CAND)
      .select("qid", "doc_id", "rnk").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2).toLong).toMap
    assert(out.nonEmpty)
    out.foreach { case (key, brnk) =>
      assert(cand.get(key).contains(brnk),
        s"final row $key carries bm25_rnk=$brnk but stage 1 ranks it " +
          s"${cand.get(key)} — provenance broken")
    }
    assert(out.values.exists(_ > graft.queries.Retrieval.BM25_TOPK),
      "no final row was promoted from beyond the sparse top-10 — the " +
        "dense stage is not re-ordering anything")
  }

  test("the plan never cross-scores the corpus (keyed joins only)") {
    val plan = SparkEntry.queries("q190_retrieve_rerank")(s, sfDir)
      .queryExecution.sparkPlan
    val unkeyed = plan.collect {
      case j: CartesianProductExec => j
      case j: BroadcastNestedLoopJoinExec => j
    }
    assert(unkeyed.isEmpty,
      s"q190 plans an unkeyed join — the dense stage is no longer " +
        s"bounded by the candidate pool:\n$plan")
  }
}
