package graft
import org.apache.spark.sql.SparkSession

/** Dev tool: print the formatted physical plan of catalog queries.
  * Usage: runMain graft.Explain <sfDir> <q1,q2,...>
  * The brief's rule — ".explain the plan and iterate until it's the
  * plan you'd want" — needs a one-command way to see the plan the
  * driver's session would produce. */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val names = args.lift(1).map(_.split(",").toSeq)
      .getOrElse(SparkEntry.queries.keys.toSeq.sorted)
    // "exec" third arg: run the query first, then print the FINAL
    // adaptive plan — the only place AQE's runtime rewrites
    // (ReusedExchange dedup, broadcast demotion, skew splits) are
    // visible; the static plan duplicates common subtrees that
    // execution actually shares.
    val exec = args.lift(2).contains("exec")
    names.foreach { n =>
      println(s"\n========== $n ==========")
      val df = SparkEntry.queries(n)(spark, sfDir)
      if (exec) {
        df.collect()
        println(df.queryExecution.executedPlan.toString)
      } else df.explain("formatted")
    }
    spark.stop()
  }
}
