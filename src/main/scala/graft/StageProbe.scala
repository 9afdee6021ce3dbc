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
    // synchronized buffer (the listener bus delivers on its own
    // thread); drained by waiting for the event COUNT to go quiet
    // rather than a fixed sleep — on a loaded host the heaviest
    // stages' events are exactly the late ones, and losing them would
    // blind the tool to what it exists to find
    val stages =
      new java.util.concurrent.ConcurrentLinkedQueue[(Int, Long, Int, Long)]
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
        val i = e.stageInfo
        val wall = (for {a <- i.completionTime; b <- i.submissionTime}
          yield a - b).getOrElse(-1L)
        stages.add((i.stageId, wall, i.numTasks,
          i.taskMetrics.executorRunTime))
      }
    })
    def drainQuiet(): Unit = {
      val deadline = System.nanoTime() + 10e9.toLong
      var last = -1
      while (System.nanoTime() < deadline && stages.size != last) {
        last = stages.size
        Thread.sleep(500)
      }
    }
    def run(tag: String): Unit = {
      stages.clear()
      val t0 = System.nanoTime()
      SparkEntry.queries(qname)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      println(f"[probe] $qname $tag total " +
        f"${(System.nanoTime() - t0) / 1e9}%.2f s")
      drainQuiet()
      import scala.jdk.CollectionConverters._
      stages.asScala.toVector.sortBy(-_._2).take(12)
        .foreach { case (id, w, t, cpu) =>
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
