package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Demonstrates AQE's RUNTIME skew remedy — the counterpart of
  * SaltingSpec's manual salting: when one join key carries far more
  * bytes than the median partition, AQE's OptimizeSkewedJoin splits the
  * hot shuffle partition into advisory-sized sub-reads (each joined
  * against the full matching build partition), so one straggler task
  * becomes many balanced ones WITHOUT changing the query. This is the
  * default remedy at 100 TB; salting remains for the cases AQE can't
  * touch (skew under an aggregation key, not a join key). The spec pins
  * that the final adaptive plan really took the skew path (AQEShuffleRead
  * … skewed) and that results are identical to the non-adaptive join. */
class AqeSkewJoinSpec extends AnyFunSuite {
  private lazy val s = TestSpark.spark

  test("AQE splits the hot partition of a skewed sort-merge join") {
    val confs = Seq(
      // force a shuffled join, statically and at runtime
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      // test-scale thresholds: the hot key's partition (~MBs) must
      // exceed max(factor × median, threshold) to be declared skewed
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "32KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "16KB")
    val prev = confs.map { case (k, _) => k -> s.conf.getOption(k) }
    try {
      confs.foreach { case (k, v) => s.conf.set(k, v) }
      // one hot key (7) with a fat payload, plus a uniform 100-key tail.
      // NOTE: the assertion is on the bare join — OptimizeSkewedJoin
      // declines to split when the join feeds a same-stage downstream
      // requirement (e.g. a partial aggregate), so the skew read is only
      // guaranteed on a join that ends its stage.
      val fact = s.range(200000)
        .select(lit(7L).as("k"),
          lpad(col("id").cast("string"), 64, "0").as("pay"))
        .union(s.range(4000).select((col("id") % 100).as("k"),
          col("id").cast("string").as("pay")))
      val dim = s.range(100).select(col("id").as("k"),
        concat(lit("d"), col("id")).as("name"))
      // keep the fat payload in the output — pruning it would empty the
      // shuffled bytes and dissolve the very skew being tested
      val joined = fact.join(dim, "k").select(col("name"), col("pay"))

      val names = joined.collect().map(_.getString(0))
      assert(names.length === 204000)
      assert(names.count(_ == "d7") === 200040)

      val fin = joined.queryExecution.executedPlan.toString
      assert(fin.contains("skew=true") && fin.contains("skewed"),
        s"final adaptive plan took no skew split:\n$fin")
    } finally {
      prev.foreach { case (k, vOpt) =>
        vOpt.fold(s.conf.unset(k))(v => s.conf.set(k, v))
      }
    }
  }
}
