package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Dev tool: run a catalog query twice (second run = warm memos/caches)
  * and print per-stage wall time, task count, and summed executor CPU,
  * plus the final adaptive plan. This is the instrument that found the
  * round-15 q78 probe collapse (SCALE.md round-15 addendum): a plan can
  * LOOK right in `graft.Explain` output and still run its heavy stage
  * on 2 tasks — `wall≈cpuSum/tasks` with a tiny task count is the
  * signature, invisible in any plan dump.
  *
  * Usage: runMain graft.StageProbe <sfDir> <queryName> [cpus]
  */
object StageProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val qname = args.lift(1).getOrElse("q01_pricing_summary")
    val cpus = args.lift(2).getOrElse("32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    @volatile var stages = Vector.empty[(Int, Long, Int, Long)]
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
        val i = e.stageInfo
        val wall = (for {a <- i.completionTime; b <- i.submissionTime}
          yield a - b).getOrElse(-1L)
        stages :+= ((i.stageId, wall, i.numTasks,
          i.taskMetrics.executorRunTime))
      }
    })
    def run(tag: String): Unit = {
      stages = Vector.empty
      val t0 = System.nanoTime()
      SparkEntry.queries(qname)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      println(f"[probe] $qname $tag total " +
        f"${(System.nanoTime() - t0) / 1e9}%.2f s")
      Thread.sleep(500) // let the listener bus drain
      stages.sortBy(-_._2).take(12).foreach { case (id, w, t, cpu) =>
        println(f"[stage] id=$id%-4d wall=${w / 1000.0}%8.2fs " +
          f"tasks=$t%-4d cpuSum=${cpu / 1000.0}%8.2fs")
      }
    }
    run("first")
    run("second_warm")
    val df = SparkEntry.queries(qname)(spark, sfDir)
    df.write.format("noop").mode("overwrite").save()
    println(df.queryExecution.executedPlan.toString)
    spark.stop()
  }
}
