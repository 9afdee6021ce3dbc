package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute,
  Expression, GenericInternalRow, JoinedRow, RowOrdering, SortOrder,
  UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan,
  ResolvedHint}
import org.apache.spark.sql.catalyst.plans.physical.{BroadcastDistribution,
  ClusteredDistribution, Distribution, IdentityBroadcastMode, Partitioning,
  UnspecifiedDistribution}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan,
  SparkStrategy}

/** Whole-operator custom plan (SURVEY §2.9 tier c): a native backward
  * AS-OF JOIN — for every left row, attach the single right row with the
  * same key and the greatest timestamp ≤ the left timestamp (LEFT OUTER:
  * unmatched left rows keep nulls). Spark has no such operator; q47
  * composes the semantics from a window over a union, which forces BOTH
  * event classes through one window sort and cannot prune the right
  * columns independently. This node gives the same answer with a
  * one-pass merge over the two co-partitioned, time-sorted sides —
  * the classic sort-merge as-of, O(|L| + |R|) per partition with O(1)
  * state (ONE buffered right row), no window buffer at all.
  *
  * Scale: the keys are the shuffle keys (ClusteredDistribution on both
  * children, exactly like SortMergeJoin), so a 100 TB event log as-of
  * joins with one exchange per side and constant per-task memory; skew
  * remedies (AQE split, salting with range-replicated right side) apply
  * unchanged.
  *
  * Keys are COMPOSITE (VERDICT r5 #8): `leftKeys`/`rightKeys` are
  * positional same-typed lists — (exchange, symbol), (tenant, user) —
  * compared lexicographically via the codegen'd key projection + the
  * natural row ordering, exactly the comparison SortMergeJoin performs.
  * Remaining restrictions (deliberate, for a compact exec): timestamps
  * long-backed (LongType / TimestampType); `rightTie` breaks ties among
  * equal (keys, ts) right rows — the row LAST in (ts, tie) ascending
  * order wins, making the match deterministic when timestamps collide.
  * NULL keys follow SQL equality: a left row with any null key component
  * emits the null-extended row, and null-keyed right rows match nothing
  * (the exec skips them explicitly — the natural row ordering would
  * otherwise compare NULL equal to NULL; AsOfJoinSpec pins this). NULL
  * timestamps follow SQL comparison: `rTs <= lTs` is unknown when either
  * side is null, so a null-ts right row never becomes a match candidate
  * and a null-ts left row emits the null-extended row — neither is read
  * as epoch 0. Floating-point keys are normalized (-0.0 → 0.0, one NaN
  * bit pattern) at the API boundary, matching what Spark's
  * NormalizeFloatingNumbers rule does for built-in join keys — without
  * it, raw UnsafeRow byte comparison would treat -0.0 and 0.0 as
  * different keys and hash them to different partitions.
  */
final case class AsOfJoinPlan(left: LogicalPlan, right: LogicalPlan,
    leftKeys: Seq[Expression], rightKeys: Seq[Expression],
    leftTs: Expression, rightTs: Expression,
    rightTie: Expression, broadcastRight: Boolean = false)
    extends BinaryNode {
  require(leftKeys.nonEmpty && leftKeys.size == rightKeys.size &&
    leftKeys.map(_.dataType) == rightKeys.map(_.dataType),
    s"as-of keys must be same-arity, same-typed: " +
      s"left=${leftKeys.map(_.dataType)} right=${rightKeys.map(_.dataType)}")
  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))
  override protected def withNewChildrenInternal(newLeft: LogicalPlan,
      newRight: LogicalPlan): AsOfJoinPlan =
    copy(left = newLeft, right = newRight)
}

/** Plans AsOfJoinPlan into AsOfJoinExec; injected via GraftExtensions
  * (and runtime-added through experimental.extraStrategies for
  * externally-built sessions). */
object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinPlan(l, r, lks, rks, lts, rts, tie, bcast) =>
      if (bcast)
        BroadcastAsOfJoinExec(lks, rks, lts, rts, tie,
          planLater(l), planLater(r)) :: Nil
      else
        AsOfJoinExec(lks, rks, lts, rts, tie,
          planLater(l), planLater(r)) :: Nil
    case _ => Nil
  }
}

/** Physical backward as-of join: children arrive hash-clustered on the
  * keys (one exchange each, same machinery as SortMergeJoin) and sorted
  * by (keys..., ts[, tie]); each partition is then a single linear merge.
  * The only retained state is the latest matching right row — the
  * operator never buffers a window, a bucket, or a group. */
final case class AsOfJoinExec(leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTs: Expression, rightTs: Expression, rightTie: Expression,
    left: SparkPlan, right: SparkPlan) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKeys) ::
      ClusteredDistribution(rightKeys) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    leftKeys.map(SortOrder(_, Ascending)) :+ SortOrder(leftTs, Ascending),
    rightKeys.map(SortOrder(_, Ascending)) ++
      Seq(SortOrder(rightTs, Ascending), SortOrder(rightTie, Ascending)))

  override def outputPartitioning: Partitioning = left.outputPartitioning

  override def outputOrdering: Seq[SortOrder] =
    leftKeys.map(SortOrder(_, Ascending)) :+ SortOrder(leftTs, Ascending)

  override protected def withNewChildrenInternal(newLeft: SparkPlan,
      newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)

  override protected def doExecute(): RDD[InternalRow] = {
    val lOut = left.output
    val rOut = right.output
    val outAttrs = output
    val keyTypes = leftKeys.map(_.dataType)
    left.execute().zipPartitions(right.execute()) { (li, ri) =>
      val lKeyProj = UnsafeProjection.create(leftKeys, lOut)
      val rKeyProj = UnsafeProjection.create(rightKeys, rOut)
      val lTsProj = UnsafeProjection.create(Seq(leftTs), lOut)
      val rTsProj = UnsafeProjection.create(Seq(rightTs), rOut)
      // lexicographic compound-key comparison; UnsafeRow.equals is a
      // byte compare, valid because both sides project identical types
      val keyOrd = RowOrdering.createNaturalAscendingOrdering(keyTypes)
      // bind against the nullability-relaxed output so the null right row
      // is written as nulls, not read through non-null fast paths
      val resultProj = UnsafeProjection.create(outAttrs, outAttrs)
      val nullRight = new GenericInternalRow(rOut.size)
      val joined = new JoinedRow
      var matchRow: UnsafeRow = null
      var matchKey: UnsafeRow = null
      var rNext: InternalRow = null
      // rNextKey ALIASES rKeyProj's reused buffer: it is only read
      // (compared) before the next advance() overwrites it, so no copy is
      // needed per right row — only a RETAINED key (matchKey, which must
      // survive later advances) is copied, at the same site the matched
      // row itself is. Keeps the merge at zero allocations per discarded
      // or non-matching right row.
      var rNextKey: UnsafeRow = null
      var rNextTs = 0L
      // SQL equality semantics: a NULL key component never equals
      // anything — right rows with a null key are skipped (they could
      // otherwise match null-keyed left rows, since the natural row
      // ordering compares nulls EQUAL), and null-keyed left rows emit
      // the null-extended row without consuming the right side. Both
      // sides sort nulls first, so the skips happen before real keys.
      def advance(): Unit = {
        rNext = null
        while (rNext == null && ri.hasNext) {
          rNext = ri.next()
          rNextKey = rKeyProj(rNext)
          if (rNextKey.anyNull) rNext = null
          else {
            val tsRow = rTsProj(rNext)
            // null ts: `rTs <= lTs` is unknown in SQL — never a candidate
            // (getLong on the null slot would read it as epoch 0)
            if (tsRow.isNullAt(0)) rNext = null
            else rNextTs = tsRow.getLong(0)
          }
        }
      }
      advance()
      li.map { l =>
        val lk = lKeyProj(l) // reused buffer; only compared this iteration
        val lTsRow = lTsProj(l)
        if (lk.anyNull || lTsRow.isNullAt(0)) {
          // null key or null ts: no right row can satisfy the match
          // predicate (SQL three-valued comparison) — null-extend without
          // touching the right-side cursor; null-ts left rows sort first
          // within their key, so the merge state is undisturbed
          resultProj(joined(l, nullRight))
        } else {
        val lts = lTsRow.getLong(0)
        if (matchRow != null && !matchKey.equals(lk)) {
          matchRow = null; matchKey = null
        }
        // consume right rows up to (keys, ts): rows of earlier keys can
        // never match again; rows of THIS key at ts ≤ lts each overwrite
        // the candidate, so the last one in (ts, tie) order wins
        var cmp = if (rNext == null) 1 else keyOrd.compare(rNextKey, lk)
        while (rNext != null && (cmp < 0 || (cmp == 0 && rNextTs <= lts))) {
          if (cmp == 0) {
            matchRow = rNext.asInstanceOf[UnsafeRow].copy()
            matchKey = rNextKey.copy()
          }
          advance()
          cmp = if (rNext == null) 1 else keyOrd.compare(rNextKey, lk)
        }
        resultProj(joined(l, if (matchRow != null) matchRow else nullRight))
        }
      }
    }
  }
}

/** Broadcast backward as-of join — the zero-shuffle physical form for a
  * SMALL right side (a reference timeline: config changes, exchange-rate
  * ticks, deploy markers) against an arbitrarily large left side. The
  * sort-merge exec above requires BOTH children hash-clustered AND
  * sorted, which at 100 TB means a full exchange + sort of the event
  * log even when the right side is kilobytes; this exec instead takes
  * the right side as a broadcast (EnsureRequirements inserts the
  * BroadcastExchange from the declared distribution), builds one
  * per-key (ts, tie)-sorted index per task, and answers each left row
  * with a hash lookup + binary search — the left side keeps its
  * partitioning AND ordering (both are passed through), so downstream
  * stages see the same properties as before the join. The selection
  * mirrors Spark's own broadcast-hash-vs-SMJ choice and is driven the
  * same way: wrap the right side in `broadcast(...)`.
  *
  * Same semantics as AsOfJoinExec (one contract, pinned by the same
  * specs): SQL null keys/timestamps, inclusive ≤, last-(ts, tie) tie
  * break, LEFT OUTER null-extension. */
final case class BroadcastAsOfJoinExec(leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTs: Expression, rightTs: Expression, rightTie: Expression,
    left: SparkPlan, right: SparkPlan) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override def requiredChildDistribution: Seq[Distribution] =
    UnspecifiedDistribution ::
      BroadcastDistribution(IdentityBroadcastMode) :: Nil

  // the big side flows through untouched — both properties survive
  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] = left.outputOrdering

  override protected def withNewChildrenInternal(newLeft: SparkPlan,
      newRight: SparkPlan): BroadcastAsOfJoinExec =
    copy(left = newLeft, right = newRight)

  override protected def doExecute(): RDD[InternalRow] = {
    val lOut = left.output
    val rOut = right.output
    val outAttrs = output
    val rightSortTypes = Seq(rightTs.dataType, rightTie.dataType)
    val bcast = right.executeBroadcast[Array[InternalRow]]()
    left.execute().mapPartitions({ li =>
      // per-task index build from the broadcast rows: key -> entries
      // sorted ascending by (ts, tie). Build cost is |R| log |R| per
      // task with |R| small by contract (it was broadcast); lookups are
      // O(log |R_key|) per left row.
      val rKeyProj = UnsafeProjection.create(rightKeys, rOut)
      val rTsProj = UnsafeProjection.create(Seq(rightTs), rOut)
      val rSortProj = UnsafeProjection.create(Seq(rightTs, rightTie), rOut)
      val sortOrd =
        RowOrdering.createNaturalAscendingOrdering(rightSortTypes)
      val grouped = new java.util.HashMap[UnsafeRow,
        scala.collection.mutable.ArrayBuffer[(UnsafeRow, Long, InternalRow)]]()
      bcast.value.foreach { r =>
        val k = rKeyProj(r)
        val tsRow = rTsProj(r)
        // SQL semantics, same as the merge exec: null-keyed and null-ts
        // right rows can never match — excluded from the index
        if (!k.anyNull && !tsRow.isNullAt(0)) {
          var buf = grouped.get(k)
          if (buf == null) {
            buf = scala.collection.mutable.ArrayBuffer
              .empty[(UnsafeRow, Long, InternalRow)]
            grouped.put(k.copy(), buf)
          }
          buf += ((rSortProj(r).copy(), tsRow.getLong(0), r))
        }
      }
      val index = new java.util.HashMap[UnsafeRow,
        (Array[Long], Array[InternalRow])](grouped.size())
      grouped.forEach { (k, buf) =>
        val sorted = buf.sortBy(_._1: InternalRow)(sortOrd)
        index.put(k, (sorted.map(_._2).toArray, sorted.map(_._3).toArray))
      }
      val lKeyProj = UnsafeProjection.create(leftKeys, lOut)
      val lTsProj = UnsafeProjection.create(Seq(leftTs), lOut)
      val resultProj = UnsafeProjection.create(outAttrs, outAttrs)
      val nullRight = new GenericInternalRow(rOut.size)
      val joined = new JoinedRow
      li.map { l =>
        val lk = lKeyProj(l) // reused buffer: probed, never stored
        val lTsRow = lTsProj(l)
        var hit: InternalRow = nullRight
        if (!lk.anyNull && !lTsRow.isNullAt(0)) {
          val entry = index.get(lk)
          if (entry != null) {
            val (tss, rws) = entry
            val lts = lTsRow.getLong(0)
            // entries sort by (ts, tie): rows with ts ≤ lts are a
            // prefix, and its LAST element is the (ts, tie)-max match
            var lo = 0; var hi = tss.length - 1; var ans = -1
            while (lo <= hi) {
              val mid = (lo + hi) >>> 1
              if (tss(mid) <= lts) { ans = mid; lo = mid + 1 }
              else hi = mid - 1
            }
            if (ans >= 0) hit = rws(ans)
          }
        }
        resultProj(joined(l, hit))
      }
    }, preservesPartitioning = true)
  }
}

/** DataFrame surface: `AsOf.join(purchases, clicks, "user_id", "user_id",
  * "ts", "click_ts", "click_id")`, or the Seq overload for composite
  * keys. Children are taken at their ANALYZED plans; name the right
  * side's columns apart from the left's before calling (the node's
  * output is the concatenation). Wrapping the right side in Spark's
  * `broadcast(...)` hint selects the zero-shuffle
  * BroadcastAsOfJoinExec, exactly as it selects broadcast-hash for
  * built-in joins. */
object AsOf {
  def join(left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String,
      leftTs: String, rightTs: String, rightTie: String): DataFrame =
    join(left, right, Seq(leftKey), Seq(rightKey), leftTs, rightTs, rightTie)

  def join(left: DataFrame, right: DataFrame,
      leftKeys: Seq[String], rightKeys: Seq[String],
      leftTs: String, rightTs: String, rightTie: String): DataFrame = {
    val spark: SparkSession = left.sparkSession
    graft.functions.GraftExtensions.ensureRegistered(spark)
    val lp = left.queryExecution.analyzed
    // `broadcast(right)` arrives as ResolvedHint(BROADCAST) at the root
    // of the analyzed plan — consume it as the physical-form selector
    // (the hint node itself must not sit under the custom operator,
    // where no rule would strip it)
    val (rp, bcast) = right.queryExecution.analyzed match {
      case h: ResolvedHint if h.hints.strategy.contains(
          org.apache.spark.sql.catalyst.plans.logical.BROADCAST) =>
        (h.child, true)
      case p => (p, false)
    }
    def attr(p: LogicalPlan, n: String, side: String): Attribute =
      p.output.find(_.name == n).getOrElse(throw new IllegalArgumentException(
        s"as-of $side column '$n' not in [${p.output.map(_.name).mkString(", ")}]"))
    // Float/double keys get the same canonicalization Spark applies to
    // built-in join keys (NormalizeFloatingNumbers): without it the
    // exec's raw byte comparison would split -0.0 from 0.0 and
    // non-canonical NaNs from NaN, and hash-cluster them apart.
    def norm(e: Expression): Expression =
      org.apache.spark.sql.graft.PlanBridge.normalizeFloats(e)
    org.apache.spark.sql.graft.PlanBridge.ofRows(spark,
      AsOfJoinPlan(lp, rp,
        leftKeys.map(n => norm(attr(lp, n, "left"))),
        rightKeys.map(n => norm(attr(rp, n, "right"))),
        attr(lp, leftTs, "left"), attr(rp, rightTs, "right"),
        attr(rp, rightTie, "right"), broadcastRight = bcast))
  }
}
