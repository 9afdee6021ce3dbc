package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Demonstrates key-salting, the manual skew remedy the 100 TB design
  * reaches for when AQE's runtime skew split can't help (e.g. a hot key
  * inside an aggregation-after-join): the fact side appends a
  * deterministic salt ∈ [0, R) to the hot join key, the dim side
  * replicates each row R ways, and the join key becomes (key, salt) —
  * the hot key's rows spread over R reducers instead of one. The spec
  * proves result-equality with the unsalted join and that the shuffle
  * really partitions on the salted compound key. */
class SaltingSpec extends AnyFunSuite {
  private lazy val s = TestSpark.spark

  test("salted join equals plain join and shuffles on (key, salt)") {
    val prev = s.conf.get("spark.sql.autoBroadcastJoinThreshold", "10MB")
    try {
      s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val R = 8
      // skewed fact: 50k rows on one hot key + a uniform tail
      val fact = s.range(50000)
        .select(lit(7L).as("k"), col("id").as("v"))
        .union(s.range(1000).select((col("id") % 100).as("k"),
          col("id").as("v")))
      val dim = s.range(100).select(col("id").as("k"),
        concat(lit("u"), col("id")).as("name"))

      val plain = fact.join(dim, "k")
        .groupBy("name").agg(count(lit(1)).as("n"), sum("v").as("sv"))

      val salted = fact
        .withColumn("salt", pmod(xxhash64(col("v")), lit(R)).cast("int"))
      val dimR = dim
        .withColumn("salt", explode(sequence(lit(0), lit(R - 1))))
        .withColumn("salt", col("salt").cast("int"))
      val saltedJoin = salted.join(dimR, Seq("k", "salt"))
      val viaSalt = saltedJoin
        .groupBy("name").agg(count(lit(1)).as("n"), sum("v").as("sv"))

      // the join's exchange must carry the salt (R-way hot-key spread)
      val plan = saltedJoin.queryExecution.sparkPlan.toString
      assert(plan.contains("salt"), s"salt missing from plan:\n$plan")

      val a = plain.collect().map(r =>
        (r.getString(0), r.getLong(1), r.getLong(2))).toSet
      val b = viaSalt.collect().map(r =>
        (r.getString(0), r.getLong(1), r.getLong(2))).toSet
      assert(a === b)
    } finally {
      s.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    }
  }

  test("q80 catalog query plans the salted two-phase aggregate") {
    // The remedy must be visible in the PLAN: a first aggregate keyed on
    // (event_type, salt) — its exchange spreads each hot key 16 ways —
    // then a second keyed on event_type alone merging the partials.
    val df = SparkEntry.queries("q80_salted_agg")(s, "/root/testdata/sf0.001")
    // executedPlan: EnsureRequirements has inserted the exchanges
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("salt"), s"salt key missing from plan:\n$plan")
    val exchanges = "hashpartitioning".r.findAllIn(plan).size
    assert(exchanges >= 2,
      s"expected both aggregate exchanges (salted partial + final):\n$plan")
    assert("hashpartitioning\\([^)]*salt".r.findFirstIn(plan).isDefined,
      s"first exchange must carry the salt:\n$plan")
  }

  test("q145 slab width is a pure parallelism knob: any width >= gap " +
      "yields the q62 sessions (VERDICT r9 #7)") {
    // The saltedSessionize scaladoc claims correctness for EVERY slab
    // width >= the 30-min gap. Sweep the claim across the boundary
    // cases — exactly the gap (slab edges can fall INSIDE a live
    // session as often as possible), 2x gap, 1 h, and the shipped
    // 1-day default — against the native session_window answer on the
    // real events table. Equal multisets of (user_id, first_ts,
    // n_events) = the driver's q145 ≡ q62 hash check, per width.
    val dir = "/root/testdata/sf0.001"
    val gapUs = 1800L * 1000000L
    val want = SparkEntry.queries("q62_session_window")(s, dir)
      .collect().map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2)))
      .sorted.toSeq
    for (slabUs <- Seq(gapUs, 2 * gapUs, 3600L * 1000000L,
        86400L * 1000000L)) {
      val got = graft.queries.EventOps
        .saltedSessionize(graft.model.Tables(s, dir).events, slabUs)
        .collect().map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2)))
        .sorted.toSeq
      assert(got == want, s"slab width $slabUs us diverged from q62")
    }
    // width < gap must be rejected loudly, not silently mis-merge
    intercept[IllegalArgumentException] {
      graft.queries.EventOps.saltedSessionize(
        graft.model.Tables(s, dir).events, gapUs - 1)
    }
  }
}
