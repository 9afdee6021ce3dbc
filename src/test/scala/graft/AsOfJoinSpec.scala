package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.scalatest.funsuite.AnyFunSuite
import graft.plans.{AsOf, AsOfJoinExec, BroadcastAsOfJoinExec}

/** The custom whole-operator plan (AsOfJoinPlan → AsOfJoinStrategy →
  * AsOfJoinExec): semantics pinned against an independently-composed
  * window form, plan shape pinned to the native exec with one exchange
  * per side. */
class AsOfJoinSpec extends AnyFunSuite {
  private lazy val s = TestSpark.spark
  import s.implicits._

  // left: (key, ts, lv); covers no-match (ts before any right), exact-ts
  // tie (inclusive ≤), and a key with no right rows at all
  private lazy val left = Seq(
    (1L, 5L, "a"), (1L, 10L, "b"), (1L, 20L, "c"),
    (2L, 7L, "d"), (3L, 9L, "e")
  ).toDF("k", "ts", "lv")

  // right: (rk, rts, tie, rv); key 1 has a ts collision (10) resolved by
  // the larger tie; key 3 has no rows
  private lazy val right = Seq(
    (1L, 6L, 1L, "r1"), (1L, 10L, 2L, "r2"), (1L, 10L, 3L, "r3"),
    (2L, 7L, 4L, "r4"), (2L, 8L, 5L, "r5")
  ).toDF("rk", "rts", "tie", "rv")

  private def viaOperator: org.apache.spark.sql.DataFrame =
    viaOperator(left, right)

  private def viaOperator(l: org.apache.spark.sql.DataFrame,
      r: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
    AsOf.join(l, r, "k", "rk", "ts", "rts", "tie")
      .select("k", "ts", "lv", "rts", "tie", "rv")

  private def viaWindow: org.apache.spark.sql.DataFrame =
    viaWindow(left, right)

  /** Independent reference: union both sides, one window ordered by
    * (ts, right-before-left, tie), last right row over the preceding
    * frame — the q47 composition generalized to carry the whole row. */
  private def viaWindow(left: org.apache.spark.sql.DataFrame,
      right: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val l = left.select(col("k"), col("ts"), col("lv"),
      lit(null).cast("long").as("rts"), lit(null).cast("long").as("tie"),
      lit(null).cast("string").as("rv"), lit(1).as("side"))
    val r = right.select(col("rk").as("k"), col("rts").as("ts"),
      lit(null).cast("string").as("lv"), col("rts"), col("tie"),
      col("rv"), lit(0).as("side"))
    val w = Window.partitionBy("k")
      .orderBy(col("ts"), col("side"), col("tie"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.union(r)
      .withColumn("m_rts", last(when(col("side") === 0, col("rts")), true).over(w))
      .withColumn("m_tie", last(when(col("side") === 0, col("tie")), true).over(w))
      .withColumn("m_rv", last(when(col("side") === 0, col("rv")), true).over(w))
      .where(col("side") === 1)
      .select(col("k"), col("ts"), col("lv"), col("m_rts").as("rts"),
        col("m_tie").as("tie"), col("m_rv").as("rv"))
  }

  test("as-of operator matches the window-composed reference") {
    val a = viaOperator.collect().map(_.toSeq).toSet
    val b = viaWindow.collect().map(_.toSeq).toSet
    assert(a === b)
    // spot-pin the interesting rows: inclusive ≤ with tie → r3 at ts=10;
    // no preceding right row → nulls; key without right rows → nulls
    val m = viaOperator.collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> Option(r.getAs[String]("rv")))
      .toMap
    assert(m((1L, 5L)) === None)
    assert(m((1L, 10L)) === Some("r3"))
    assert(m((1L, 20L)) === Some("r3"))
    assert(m((2L, 7L)) === Some("r4"))
    assert(m((3L, 9L)) === None)
  }

  test("NULL keys follow SQL equality: null never matches null") {
    // left has a null-keyed row; right has an earlier null-keyed row that
    // the natural row ordering would erroneously match (nulls compare
    // equal there) — SQL equi-join semantics demand a null-extended row
    val l = Seq((Some(1L), 10L, "a"), (None, 10L, "b"), (Some(2L), 10L, "c"))
      .toDF("k", "ts", "lv")
    val r = Seq((None, 5L, 1L, "rnull"), (Some(1L), 5L, 2L, "r1"))
      .toDF("rk", "rts", "tie", "rv")
    val m = AsOf.join(l, r, "k", "rk", "ts", "rts", "tie")
      .select("lv", "rv").collect()
      .map(x => x.getString(0) -> Option(x.getString(1))).toMap
    assert(m("a") === Some("r1"))
    assert(m("b") === None, "null key must not match the null-keyed right row")
    assert(m("c") === None)
  }

  test("NULL timestamps follow SQL comparison: never read as epoch 0") {
    // right row with null rts must never become a match candidate (the
    // raw long slot would read as 0); left row with null ts null-extends
    // even though a right row of its key exists
    val l = Seq((1L, Some(10L), "a"), (1L, None, "b"), (2L, Some(10L), "c"))
      .toDF("k", "ts", "lv")
    val r = Seq((1L, None, 1L, "rnullts"), (2L, Some(5L), 2L, "r2"))
      .toDF("rk", "rts", "tie", "rv")
    val m = AsOf.join(l, r, "k", "rk", "ts", "rts", "tie")
      .select("lv", "rv").collect()
      .map(x => x.getString(0) -> Option(x.getString(1))).toMap
    assert(m("a") === None, "null-ts right row must not match as epoch 0")
    assert(m("b") === None, "null-ts left row must null-extend")
    assert(m("c") === Some("r2"))
  }

  test("floating-point keys are normalized: -0.0 matches 0.0") {
    // without NormalizeFloatingNumbers treatment the raw byte compare
    // (and the hash clustering) would split the two zeros into distinct
    // keys — Spark's built-in equi-joins match them
    val l = Seq((0.0, 10L, "a"), (1.0, 10L, "b")).toDF("k", "ts", "lv")
      .withColumn("k", col("k") * lit(-1.0)) // -0.0 computed, not literal
    val r = Seq((0.0, 5L, 1L, "rz"), (-1.0, 5L, 2L, "rm")).toDF("rk", "rts", "tie", "rv")
    val m = AsOf.join(l, r, "k", "rk", "ts", "rts", "tie")
      .select("lv", "rv").collect()
      .map(x => x.getString(0) -> Option(x.getString(1))).toMap
    assert(m("a") === Some("rz"), "-0.0 left key must match 0.0 right key")
    assert(m("b") === Some("rm"))
  }

  test("fuzz: operator matches the window reference on seeded random data") {
    // narrow key/ts domains force heavy collisions — the hard cases
    // (shared ts across sides, multi-row ties, keys missing on one side)
    for (seed <- 1 to 5) {
      val rnd = new scala.util.Random(seed)
      val lRows = Seq.fill(300)((rnd.nextInt(20).toLong,
        rnd.nextInt(50).toLong, s"l${rnd.nextInt(1000)}"))
      val rRows = Seq.tabulate(300)(i => (rnd.nextInt(20).toLong,
        rnd.nextInt(50).toLong, i.toLong, s"r${rnd.nextInt(1000)}"))
      val l = lRows.toDF("k", "ts", "lv")
      val r = rRows.toDF("rk", "rts", "tie", "rv")
      val a = viaOperator(l, r).collect().map(_.toSeq)
      val b = viaWindow(l, r).collect().map(_.toSeq)
      // multiset compare: duplicate left rows are legal and must each
      // surface with the same match
      assert(a.groupBy(identity).view.mapValues(_.size).toMap ===
        b.groupBy(identity).view.mapValues(_.size).toMap,
        s"mismatch at seed $seed")
    }
  }

  test("fuzz with nulls: operator implements SQL three-valued semantics") {
    // the window reference can't serve here (partitionBy groups null keys
    // TOGETHER and a null-ts right row would leak its tie/rv through the
    // ignore-nulls last()), so the model is an independent local replay
    // of the contract: match iff key non-null equal AND both ts non-null
    // AND rts <= lts; winner = max (rts, tie)
    for (seed <- 11 to 15) {
      val rnd = new scala.util.Random(seed)
      def maybe(n: Int): Option[Long] =
        if (rnd.nextDouble() < 0.15) None else Some(rnd.nextInt(n).toLong)
      val lRows = Seq.fill(200)((maybe(10), maybe(30), s"l${rnd.nextInt(1000)}"))
      val rRows = Seq.tabulate(200)(i => (maybe(10), maybe(30), i.toLong, s"r$i"))
      val l = lRows.toDF("k", "ts", "lv")
      val r = rRows.toDF("rk", "rts", "tie", "rv")
      val got = AsOf.join(l, r, "k", "rk", "ts", "rts", "tie")
        .select("k", "ts", "lv", "rts", "tie", "rv").collect()
        .map(x => (Option(x.get(0)), Option(x.get(1)), x.getString(2),
          Option(x.get(3)), Option(x.get(4)), Option(x.get(5))))
      val expect = lRows.map { case (k, ts, lv) =>
        val best = for {
          kk <- k; lts <- ts
          b <- rRows.filter(rr => rr._1.contains(kk) && rr._2.exists(_ <= lts))
            .sortBy(rr => (rr._2.get, rr._3)).lastOption
        } yield b
        (k.map(x => x: Any), ts.map(x => x: Any), lv,
          best.map(_._2.get: Any), best.map(_._3: Any), best.map(_._4: Any))
      }
      assert(got.groupBy(identity).view.mapValues(_.size).toMap ===
        expect.groupBy(identity).view.mapValues(_.size).toMap,
        s"mismatch at seed $seed")
    }
  }

  test("empty sides: empty right null-extends every left row; empty left emits nothing") {
    val emptyR = right.where(lit(false))
    val a = viaOperator(left, emptyR).collect()
    assert(a.length === left.count())
    assert(a.forall(r => r.isNullAt(3) && r.isNullAt(4) && r.isNullAt(5)),
      "every left row must null-extend against an empty right side")
    val emptyL = left.where(lit(false))
    assert(viaOperator(emptyL, right).collect().isEmpty)
    assert(viaOperator(emptyL, emptyR).collect().isEmpty)
  }

  test("composite keys: (long, string) as-of matches the window reference") {
    // VERDICT r5 #8: the multi-column key form a real event store hits
    // first — (tenant, user)-style compound clustering. Mixed types
    // exercise the lexicographic UnsafeRow key comparison beyond the
    // old single-long fast path.
    for (seed <- 11 to 13) {
      val rnd = new scala.util.Random(seed)
      def k2(i: Int) = s"t${i % 3}"
      val l = Seq.fill(200)((rnd.nextInt(8).toLong, k2(rnd.nextInt(9)),
        rnd.nextInt(40).toLong, s"l${rnd.nextInt(1000)}"))
        .toDF("k", "k2", "ts", "lv")
      val r = Seq.tabulate(200)(i => (rnd.nextInt(8).toLong,
        k2(rnd.nextInt(9)), rnd.nextInt(40).toLong, i.toLong,
        s"r${rnd.nextInt(1000)}"))
        .toDF("rk", "rk2", "rts", "tie", "rv")
      val a = AsOf.join(l, r, Seq("k", "k2"), Seq("rk", "rk2"),
          "ts", "rts", "tie")
        .select("k", "k2", "ts", "lv", "rts", "tie", "rv")
        .collect().map(_.toSeq)
      // reference: single-key window form on a fused key column
      val lf = l.withColumn("kk", concat_ws("\u0000",
        col("k").cast("string"), col("k2"))).drop("k", "k2")
      val rf = r.withColumn("rkk", concat_ws("\u0000",
        col("rk").cast("string"), col("rk2"))).drop("rk", "rk2")
      val b = viaWindow(
          lf.select(col("kk").as("k"), col("ts"), col("lv")),
          rf.select(col("rkk").as("rk"), col("rts"), col("tie"), col("rv")))
        .select(split(col("k"), "\u0000").getItem(0).cast("long").as("k"),
          split(col("k"), "\u0000").getItem(1).as("k2"),
          col("ts"), col("lv"), col("rts"), col("tie"), col("rv"))
        .collect().map(_.toSeq)
      assert(a.groupBy(identity).view.mapValues(_.size).toMap ===
        b.groupBy(identity).view.mapValues(_.size).toMap,
        s"composite-key mismatch at seed $seed")
    }
  }

  test("plans as the native exec: one exchange per side, no window, no join") {
    val qe = viaOperator.queryExecution
    assert(qe.sparkPlan.exists(_.isInstanceOf[AsOfJoinExec]))
    // exchanges are inserted by EnsureRequirements → inspect the
    // prepared plan, not the bare strategy output
    val plan = qe.executedPlan.toString
    assert(plan.contains("AsOfJoin"), s"native exec missing:\n$plan")
    assert(!plan.contains("SortMergeJoin") && !plan.contains("Window"),
      s"expected the native as-of exec only:\n$plan")
    assert("Exchange hashpartitioning".r.findAllIn(plan).size === 2,
      s"expected one exchange per side:\n$plan")
  }

  private def viaBroadcast(l: org.apache.spark.sql.DataFrame,
      r: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
    AsOf.join(l, broadcast(r), "k", "rk", "ts", "rts", "tie")
      .select("k", "ts", "lv", "rts", "tie", "rv")

  test("broadcast(right) plans the zero-shuffle exec: no exchange or sort on the left side") {
    val qe = viaBroadcast(left, right).queryExecution
    assert(qe.sparkPlan.exists(_.isInstanceOf[BroadcastAsOfJoinExec]),
      s"expected the broadcast exec:\n${qe.sparkPlan}")
    val plan = qe.executedPlan.toString
    assert(plan.contains("BroadcastExchange"),
      s"right side must arrive as a broadcast:\n$plan")
    assert(!plan.contains("Exchange hashpartitioning"),
      s"the left side must NOT shuffle:\n$plan")
    assert(!plan.contains("Sort "),
      s"neither side may sort — the index sorts per task:\n$plan")
  }

  test("broadcast exec matches the merge exec on every fuzz shape (incl. nulls)") {
    // same contract, two physical forms — multiset-identical output on
    // collision-heavy data and on null keys/timestamps
    for (seed <- 21 to 25) {
      val rnd = new scala.util.Random(seed)
      def maybe(n: Int): Option[Long] =
        if (rnd.nextDouble() < 0.15) None else Some(rnd.nextInt(n).toLong)
      val l = Seq.fill(250)((maybe(15), maybe(40), s"l${rnd.nextInt(1000)}"))
        .toDF("k", "ts", "lv")
      val r = Seq.tabulate(250)(i => (maybe(15), maybe(40), i.toLong, s"r$i"))
        .toDF("rk", "rts", "tie", "rv")
      val a = viaBroadcast(l, r).collect().map(_.toSeq)
      val b = viaOperator(l, r).collect().map(_.toSeq)
      assert(a.groupBy(identity).view.mapValues(_.size).toMap ===
        b.groupBy(identity).view.mapValues(_.size).toMap,
        s"broadcast/merge divergence at seed $seed")
    }
  }

  test("broadcast exec: -0.0/0.0 float keys still match (normalization upstream)") {
    val l = Seq((0.0, 10L, "a")).toDF("k", "ts", "lv")
      .withColumn("k", col("k") * lit(-1.0))
    val r = Seq((0.0, 5L, 1L, "rz")).toDF("rk", "rts", "tie", "rv")
    val m = AsOf.join(l, broadcast(r), "k", "rk", "ts", "rts", "tie")
      .select("lv", "rv").collect()
      .map(x => x.getString(0) -> Option(x.getString(1))).toMap
    assert(m("a") === Some("rz"))
  }
}
