package graft

import org.apache.spark.sql.catalyst.expressions.Alias
import org.apache.spark.sql.catalyst.plans.LeftOuter
import org.apache.spark.sql.catalyst.plans.physical.HashPartitioning
import org.apache.spark.sql.execution.{ProjectExec, SparkPlan}
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.joins.BroadcastHashJoinExec
import org.scalatest.funsuite.AnyFunSuite

/** Pins the BM25 locality plan shape (VERDICT r11 #3).
  *
  * The round-11 A/B bisect (ScaleDebug `bm25idx`, variants E/F) proved two
  * plan properties are worth 3–4× of stage CPU at sf1 and a cliff at 100×:
  *
  *  (a) the per-posting contribution `c = idf·tfn` is computed ABOVE the
  *      dl dim join and BELOW the qt fan-out join — per POSTING (5.9 M
  *      rows at sf1), not per (query, doc) PAIR (507 M). The old shape
  *      held only while the join reorderer lacked size estimates
  *      ("LUCK" — Retrieval.scala's bisect narrative); it is now pinned
  *      by the LEFT-join ReorderJoin barrier.
  *  (b) a hash Exchange on doc_id sits between the scored postings and
  *      the fan-out, so each task's (qid, doc_id) partial-aggregate map
  *      spans ONE partition's docs, not the whole corpus. (The source's
  *      `sortWithinPartitions(doc_id)` does NOT survive: EliminateSorts
  *      drops a local sort whose order the aggregate above destroys —
  *      verified on the executed plan, round 12 — so the pinnable, and
  *      measured, property is the partition-level clustering alone.)
  *
  * Nothing in the optimizer CONTRACTUALLY preserves either property — a
  * Spark upgrade whose reorderer sees through the LEFT barrier, or an AQE
  * change that elides the user repartition, would silently undo them.
  * This spec makes that a red test instead of a silent 3–4× regression,
  * for all three catalog consumers of bm25Score (q120 fresh-built, q131
  * fused, q178 parquet-fed probe — the estimate-quality regime that
  * actually flipped the old shape). Asserted on the pre-AQE sparkPlan so
  * the shape is deterministic at test scale.
  */
class Bm25PlanShapeSpec extends AnyFunSuite {
  private lazy val s = TestSpark.spark
  private val sfDir = "/root/testdata/sf0.001"

  private def contains(root: SparkPlan, node: SparkPlan): Boolean =
    root.collectFirst { case p if p eq node => p }.isDefined

  private def aliasesC(pr: ProjectExec): Boolean =
    pr.projectList.exists { case a: Alias => a.name == "c"; case _ => false }

  private def checkShape(name: String): Unit = {
    val plan = SparkEntry.queries(name)(s, sfDir).queryExecution.sparkPlan

    // the BM25 qt fan-out join: broadcast hash join keyed on tok whose
    // build side carries qid AND whose streamed side computes c — the
    // last clause separates it from q131's Jaccard arm, which fans out
    // on (tok, qid) too but scores by set overlap, not per-posting c.
    val fanOuts = plan.collect {
      case j: BroadcastHashJoinExec
          if j.leftKeys.exists(_.references.exists(_.name == "tok")) &&
            (j.left.output.exists(_.name == "qid") ||
              j.right.output.exists(_.name == "qid")) => j
    }
    val cFanOuts = fanOuts.filter { j =>
      val st = if (j.right.output.exists(_.name == "qid")) j.left else j.right
      st.collectFirst { case pr: ProjectExec if aliasesC(pr) => pr }.isDefined
    }
    assert(cFanOuts.size == 1,
      s"$name: expected exactly one BM25 fan-out join (tok key, qid " +
        s"build, c on the streamed side); saw ${cFanOuts.size} of " +
        s"${fanOuts.size} tok/qid joins")
    val fo = cFanOuts.head
    val streamed =
      if (fo.right.output.exists(_.name == "qid")) fo.left else fo.right

    // (a) exactly ONE projection computes c in the WHOLE plan, and it
    // lives on the streamed (posting-sized) side of the fan-out —
    // nothing recomputes the arithmetic at pair granularity above it.
    val cProjsAll = plan.collect { case pr: ProjectExec if aliasesC(pr) => pr }
    val cProjs = streamed.collect { case pr: ProjectExec if aliasesC(pr) => pr }
    assert(cProjsAll.size == 1 && cProjs.size == 1,
      s"$name: c must be computed exactly once, below the fan-out " +
        s"(whole-plan=${cProjsAll.size}, streamed-side=${cProjs.size})")
    val cProj = cProjs.head

    // ... and the LEFT dim join (the ReorderJoin barrier carrying dl /
    // avgdl) sits BELOW that projection: per-posting scoring needs the
    // doc-length lookup to have already happened.
    val dimBelowC = cProj.collect {
      case j: BroadcastHashJoinExec if j.joinType == LeftOuter => j
    }
    assert(dimBelowC.nonEmpty,
      s"$name: the LEFT dl dim join must sit below the c projection")

    // (b) a doc_id hash Exchange between the c projection and the
    // fan-out (i.e. the exchange consumes the SCORED postings) ...
    val docIdExchanges = streamed.collect {
      case e: ShuffleExchangeExec => e.outputPartitioning match {
        case h: HashPartitioning
            if h.expressions.exists(_.references.exists(_.name == "doc_id"))
          => Some(e)
        case _ => None
      }
    }.flatten
    assert(docIdExchanges.exists(contains(_, cProj)),
      s"$name: a doc_id Exchange must sit between the c projection and " +
        s"the fan-out join (found ${docIdExchanges.size} doc_id exchanges)")
  }

  test("q120: per-posting scoring + doc-clustered fan-out pinned") {
    checkShape("q120_bm25_retrieval")
  }

  test("q131: the fused BM25 arm keeps the pinned shape") {
    checkShape("q131_rrf_fusion")
  }

  test("q178: the parquet-fed probe keeps the pinned shape") {
    // the estimate-quality regime that flipped the old, luck-based shape:
    // dl's true size is KNOWN here (read from parquet), which is exactly
    // when the reorderer used to sink the dim join below the fan-out.
    checkShape("q178_bm25_prebuilt")
  }
}
