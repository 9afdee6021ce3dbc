package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Data-selection tier (q115–q118) invariants that the DuckDB oracle
  * cannot express directly: the salted join's answer- and
  * plan-invariance claims, the contrastive-mining label contracts, and
  * DSIR's smoothing guarantee.
  */
class SelectionSpec extends AnyFunSuite {
  import graft.queries.Selection
  private lazy val s = TestSpark.spark
  private val sfDir = "/root/testdata/sf0.001"

  test("q117 salted join: answer equals the plain unsalted join") {
    import s.implicits._
    val salted = SparkEntry.queries("q117_salted_join")(s, sfDir)
    val t = graft.model.Tables(s, sfDir)
    val plain = t.events
      .select(col("user_id"), col("value").cast("decimal(12,2)").as("v"))
      .join(t.customer, col("user_id") === col("c_custkey"))
      .groupBy("c_nationkey")
      .agg(count(lit(1)).as("n_events"),
        sum("v").cast("decimal(38,6)").cast("double").as("sum_value"))
      .orderBy("c_nationkey")
    assert(salted.collect().toSeq == plain.collect().toSeq)
  }

  test("q117 plans the salted exchange, not a broadcast") {
    val plan = SparkEntry.queries("q117_salted_join")(s, sfDir)
      .queryExecution.sparkPlan.toString
    assert(plan.contains("ShuffledHashJoin"),
      "the skew demo must keep the shuffled join the hint pins")
    assert(!plan.contains("BroadcastHashJoin"),
      "auto-broadcast would erase the salted exchange under test")
    // The join key must carry the salt — that IS the remedy.
    assert(plan.contains("salt"), "join keys must include the salt column")
  }

  test("q116 roles honor the label contract and per-query arity") {
    val rows = SparkEntry.queries("q116_hard_negatives")(s, sfDir)
      .collect()
    val emb = graft.model.Tables(s, sfDir).embeddings
      .select(col("vec_id"), col("label").cast("long").as("label"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    rows.foreach { r =>
      val (qid, role, vid, lab) =
        (r.getLong(0), r.getString(1), r.getLong(3), r.getLong(4))
      assert(emb(vid) == lab, "output label must be the neighbor's own")
      if (role == "positive") assert(emb(qid) == lab,
        s"positive for q$qid must share its label")
      else assert(emb(qid) != lab,
        s"hard negative for q$qid must differ in label")
    }
    // sf0.001 has 10 well-populated labels, so every query is
    // guaranteed a positive and 2 hard negatives — exact arity, not
    // <=, or a dropped role would pass vacuously.
    val perQ = rows.groupBy(r => r.getLong(0))
    assert(perQ.size == 10, "one group per bounded-set query vector")
    perQ.foreach { case (qid, rs) =>
      assert(rs.count(_.getString(1) == "positive") == 1, s"q$qid")
      assert(rs.count(_.getString(1) == "hard_negative") == 2, s"q$qid")
    }
  }

  test("q115 smoothing keeps every weight finite and selection consistent") {
    val rows = SparkEntry.queries("q115_dsir_selection")(s, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val w = r.getDouble(3)
      assert(!w.isNaN && !w.isInfinite,
        s"doc ${r.getLong(0)}: add-1 smoothing must keep weights finite")
      assert(r.getBoolean(4) == (w > 0), "selected must mirror weight > 0")
    }
    // Target-domain docs score at least as high on average as the rest:
    // the defining property of an importance weight toward that domain.
    val (tgt, rest) = rows.partition(r =>
      Selection.DSIR_TARGET.contains(r.getString(1)))
    val avg = (xs: Array[org.apache.spark.sql.Row]) =>
      xs.map(_.getDouble(3)).sum / xs.length
    assert(avg(tgt) > avg(rest),
      "target-domain docs must out-score the rest under their own model")
  }

  test("q119 matches an independent local greedy MMR model") {
    val out = SparkEntry.queries("q119_mmr_selection")(s, sfDir).collect()
    assert(out.length == Selection.MMR_K)
    assert(out.map(_.getLong(1)).distinct.length == Selection.MMR_K,
      "MMR must never select the same vector twice")
    // Independent model: plain-Scala greedy over the collected corpus
    // with the query's exact rounding contract.
    val vecs = graft.model.Tables(s, sfDir).embeddings
      .selectExpr("vec_id", "transform(embedding, x -> cast(x as double))")
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    def dot(a: Array[Double], b: Array[Double]): Double =
      a.indices.foldLeft(0.0)((acc, i) => acc + a(i) * b(i))
    def rnd(x: Double, p: Int): Double =
      BigDecimal(x).setScale(p, BigDecimal.RoundingMode.HALF_UP).toDouble
    val dim = vecs.head._2.length
    val cent = Array.tabulate(dim) { i =>
      rnd(vecs.values.map(_(i)).sum / vecs.size, 9)
    }
    val cn = math.sqrt(dot(cent, cent))
    val nrm = vecs.map { case (id, e) => id -> math.sqrt(dot(e, e)) }
    val rel = vecs.map { case (id, e) =>
      id -> rnd(dot(e, cent) / (nrm(id) * cn), 6)
    }
    var picked = Vector.empty[Long]
    while (picked.length < Selection.MMR_K) {
      val cand = vecs.keys.filterNot(picked.contains).map { id =>
        val maxsim =
          if (picked.isEmpty) 0.0
          else picked.map(p =>
            rnd(dot(vecs(id), vecs(p)) / (nrm(id) * nrm(p)), 6)).max
        id -> rnd(Selection.MMR_LAMBDA * rel(id) - Selection.MMR_MU * maxsim, 6)
      }.toSeq
      picked = picked :+ cand.minBy { case (id, sc) => (-sc, id) }._1
    }
    assert(out.map(_.getLong(1)).toSeq == picked,
      "distributed greedy must pick the model's exact id sequence")
  }

  test("q118 top-k ordering is total and counts are consistent") {
    val rows = SparkEntry.queries("q118_merge_pairs")(s, sfDir).collect()
    assert(rows.length <= Selection.PAIR_K)
    val keys = rows.toSeq.map(r =>
      (-r.getLong(2), r.getString(0), r.getString(1)))
    assert(keys == keys.sorted,
      "output must follow the (cnt desc, a, b) total order")
    assert(rows.forall(_.getLong(2) >= 1))
  }
}
