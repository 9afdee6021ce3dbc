package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** q171's per-nation OLS against an independent in-memory recompute —
  * the hash check proves Spark ≡ DuckDB; this proves both equal the
  * REGRESSION (an agreed-on wrong formula would pass the hash). */
class RevenueTrendSpec extends AnyFunSuite {
  private lazy val s = TestSpark.spark
  private val sfDir = "/root/testdata/sf0.001"

  test("slope and intercept equal an independent scala OLS per nation") {
    val out = SparkEntry.queries("q171_revenue_trend")(s, sfDir)
      .collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), Option(r.get(2)).map(_.asInstanceOf[Double]),
          Option(r.get(3)).map(_.asInstanceOf[Double]))))
      .toMap
    assert(out.nonEmpty)
    // independent monthly aggregation + textbook OLS in Double
    val t = graft.model.Tables(s, sfDir)
    val monthly = graft.model.Tables.withUtcSession(s) {
      t.orders
        .join(t.customer.select(col("c_custkey"), col("c_nationkey")),
          col("o_custkey") === col("c_custkey"))
        .join(t.nation.select(col("n_nationkey"), col("n_name")),
          col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name"),
          (year(col("o_orderdate")) * 12 + month(col("o_orderdate")))
            .as("x"))
        .agg(sum(round(col("o_totalprice") * 100).cast("long")).as("y"))
    }.collect().map(r => (r.getString(0), r.getInt(1).toLong, r.getLong(2)))
    val byNation = monthly.groupBy(_._1)
    byNation.foreach { case (nation, rows) =>
      val n = rows.length.toDouble
      val sx = rows.map(_._2.toDouble).sum
      val sy = rows.map(_._3.toDouble).sum
      val sxy = rows.map(r => r._2.toDouble * r._3).sum
      val sxx = rows.map(r => r._2.toDouble * r._2).sum
      val den = n * sxx - sx * sx
      val (nm, slope, icept) = (out(nation)._1, out(nation)._2, out(nation)._3)
      assert(nm === rows.length.toLong)
      if (den == 0.0) {
        assert(slope.isEmpty && icept.isEmpty,
          s"$nation: degenerate den must yield NULLs")
      } else {
        val wantSlope = (n * sxy - sx * sy) / den
        val wantIcept = (sy * sxx - sx * sxy) / den
        assert(math.abs(slope.get - wantSlope) <=
          1e-9 * math.max(1.0, math.abs(wantSlope)),
          s"$nation slope ${slope.get} vs $wantSlope")
        assert(math.abs(icept.get - wantIcept) <=
          1e-9 * math.max(1.0, math.abs(wantIcept)),
          s"$nation intercept ${icept.get} vs $wantIcept")
      }
    }
  }
}
