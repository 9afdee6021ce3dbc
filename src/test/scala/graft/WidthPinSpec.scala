package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.physical.HashPartitioning
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec,
  AQEShuffleReadExec, QueryStageExec}
import org.apache.spark.sql.execution.exchange.{REPARTITION_BY_NUM,
  ShuffleExchangeExec}
import org.scalatest.funsuite.AnyFunSuite

/** Pins the round-15 AQE fan-out width fix in the EXECUTED plans of the
  * ANN serving paths (VERDICT r15 next-round #2).
  *
  * The mechanism (SCALE.md round-15 addendum): the candidate-pair join of
  * q78/q185/q188 fans n·nprobe thin probe rows out to ~n·nprobe·(n/K)
  * scored pairs, and every relation FEEDING the join is thin — so AQE's
  * pre-fan-out size estimate plans the whole scoring pipeline (cell join,
  * per-pair dot/ADC scoring, and the vec_id window whose requirement the
  * join output already satisfies) into whatever width the upstream stage
  * had: at sf1 that was the 2-split embeddings file scan, i.e. a 69M-dot
  * workload on TWO tasks, 158 s instead of 16.3 s (9.7×). The fix is the
  * explicit `repartition(pairWidth, key, cell)` before the cell join —
  * REPARTITION_BY_NUM is the one shuffle origin AQE's coalescer never
  * narrows, and the (key, cell) key SET is chosen so no upstream
  * partitioning satisfies it (keying on the id alone is provably elided
  * by EnsureRequirements against the probe window's exchange — the
  * "failed fix, worth recording" entry in SCALE.md).
  *
  * Nothing fails at sf0.1 if a refactor drops the pin — the failure is
  * invisible at gate scale (sf0.1 fits 2 tasks comfortably) — so this
  * spec asserts, for each serving query, on the FINAL adaptive plan of an
  * actually-executed run (collect() at sf0.001 finalizes AQE):
  *   (1) a ShuffleExchangeExec with origin REPARTITION_BY_NUM hash-keyed
  *       on exactly {key, cell} survives planning, at exactly the session
  *       shuffle width (pairWidth);
  *   (2) no AQEShuffleReadExec above that exchange narrows it below the
  *       session width (coalescing it is exactly the sf1 collapse).
  */
class WidthPinSpec extends AnyFunSuite {
  private lazy val s = TestSpark.spark
  private val sfDir = "/root/testdata/sf0.001"

  /** Every node of the final physical plan, descending through AQE query
    * stages (QueryStageExec is a LeafExecNode — a plain collect() stops
    * at stage boundaries and would miss every materialized exchange). */
  private def allNodes(p: SparkPlan): Seq[SparkPlan] = {
    val kids = p match {
      case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
      case q: QueryStageExec => Seq(q.plan)
      case other => other.children
    }
    p +: kids.flatMap(allNodes)
  }

  private def keyNames(e: ShuffleExchangeExec): Set[String] =
    e.outputPartitioning match {
      case h: HashPartitioning =>
        h.expressions.flatMap(_.references.map(_.name)).toSet
      case _ => Set.empty
    }

  private def checkPin(tag: String, df: DataFrame, key: String): Unit = {
    df.collect() // finalize the adaptive plan — the pin must survive EXECUTION
    val root = df.queryExecution.executedPlan
    val nodes = allNodes(root)
    val width = s.conf.get("spark.sql.shuffle.partitions").toInt

    val pins = nodes.collect {
      case e: ShuffleExchangeExec
          if e.shuffleOrigin == REPARTITION_BY_NUM &&
            keyNames(e) == Set(key, "cell") => e
    }
    assert(pins.nonEmpty,
      s"$tag: the explicit ($key, cell) REPARTITION_BY_NUM width pin is " +
        s"gone from the executed plan — the sf1 2-task scoring collapse " +
        s"(158 s vs 16.3 s) can silently return:\n$root")
    assert(pins.exists(_.outputPartitioning.numPartitions == width),
      s"$tag: the width pin no longer carries the session shuffle width " +
        s"$width, saw ${pins.map(_.outputPartitioning.numPartitions)}")

    // (2) AQE must not narrow the pinned exchange's own read (reads over
    // the DOWNSTREAM window/agg exchanges may legitimately coalesce —
    // only a read DIRECTLY above the pin is the sf1 collapse). isPin
    // unwraps the stage/reuse nodes AQE puts between the read and the
    // exchange.
    def isPin(p: SparkPlan): Boolean = p match {
      case e: ShuffleExchangeExec =>
        e.shuffleOrigin == REPARTITION_BY_NUM && keyNames(e) == Set(key, "cell")
      case r: org.apache.spark.sql.execution.exchange.ReusedExchangeExec =>
        isPin(r.child)
      case q: QueryStageExec => isPin(q.plan)
      case _ => false
    }
    val narrowedReads = nodes.collect {
      case r: AQEShuffleReadExec
          if isPin(r.child) && r.outputPartitioning.numPartitions < width => r
    }
    assert(narrowedReads.isEmpty,
      s"$tag: AQE narrowed the pinned ($key, cell) exchange to " +
        s"${narrowedReads.map(_.outputPartitioning.numPartitions)} " +
        s"partitions (session width $width)")
  }

  test("q78 (IVF prebuilt probe) keeps the (vec_id, cell) width pin " +
      "through execution") {
    checkPin("q78", SparkEntry.queries("q78_ann_ivf_prebuilt")(s, sfDir),
      "vec_id")
  }

  test("q185 (IVFADC probe) keeps the (qid, cell) width pin through " +
      "execution") {
    checkPin("q185", SparkEntry.queries("q185_ann_pq")(s, sfDir), "qid")
  }

  test("q188 (nprobe sweep) keeps the (vec_id, cell) width pin through " +
      "execution") {
    checkPin("q188", SparkEntry.queries("q188_ann_nprobe_sweep")(s, sfDir),
      "vec_id")
  }

  test("q189 (incremental-index probe) keeps the (vec_id, cell) width " +
      "pin through execution") {
    checkPin("q189", SparkEntry.queries("q189_ivf_incremental")(s, sfDir),
      "vec_id")
  }

  test("q193 (incremental-PQ probe) keeps the (qid, cell) width pin " +
      "through execution") {
    checkPin("q193", SparkEntry.queries("q193_pq_incremental")(s, sfDir),
      "qid")
  }
}
