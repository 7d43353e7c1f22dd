package graft.tools

/** Dev-only: time the Bench mega-round crawl at one parallelism. */
object MegaProbe {
  def main(args: Array[String]): Unit = {
    val cpus = args(0).toInt
    val n = args(1).toInt
    if (sys.env.contains("GRAFT_STAGES")) {
      graft.Bench.stageListenerHook = Some { spark =>
        spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
          override def onStageCompleted(
              sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
            val i = sc.stageInfo
            val dur = (for {s <- i.submissionTime; e <- i.completionTime} yield e - s).getOrElse(-1L)
            if (dur > 2000) {
              val m = i.taskMetrics
              println(f"      [stage ${i.stageId}%4d] ${dur / 1000.0}%6.1fs tasks=${i.numTasks}%4d " +
                f"cpu=${m.executorCpuTime / 1e9}%7.1fs run=${m.executorRunTime / 1e3}%7.1fs " +
                f"gc=${m.jvmGCTime / 1e3}%5.1fs ${i.name.take(60)}")
            }
          }
        })
      }
    }
    val (urls, secs) = graft.Bench.crawlBenchProbe(cpus, n)
    println(f"MEGA cpus=$cpus n=$n urls=$urls secs=$secs%.1f tput=${urls / secs}%.1f")
  }
}
