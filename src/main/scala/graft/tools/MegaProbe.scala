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
            if (dur > sys.env.getOrElse("GRAFT_STAGES_MS", "2000").toLong) {
              val m = i.taskMetrics
              println(f"      [stage ${i.stageId}%4d] ${dur / 1000.0}%6.1fs tasks=${i.numTasks}%4d " +
                f"cpu=${m.executorCpuTime / 1e9}%7.1fs run=${m.executorRunTime / 1e3}%7.1fs " +
                f"gc=${m.jvmGCTime / 1e3}%5.1fs ${i.name.take(60)}")
            }
          }
        })
      }
    }
    if (sys.env.contains("GRAFT_GROWTH")) {
      // growth mode: args = cpus rounds nPerRound
      val rounds = n
      val nPer = if (args.length > 2) args(2).toInt else 100000
      val (secs, files, docsFiles, judgFiles) = graft.Bench.growthBench(cpus, rounds, nPer)
      secs.indices.foreach { i =>
        println(f"GROWTH round ${i + 1}: ${secs(i)}%.1f s files=${files(i)} " +
          f"docs=${docsFiles(i)} judg=${judgFiles(i)}") }
      // compaction-trigger rounds carry the amortized segment fold — exclude
      // them from the endpoint ratio (same rule as Bench.growthJson)
      val ce = graft.model.CrawlConfig().compactEvery
      val steady = secs.zipWithIndex
        .filterNot { case (_, i) => ce > 0 && (i + 1) % ce == 0 }.map(_._1)
      val (a, b) = (steady.headOption.getOrElse(secs.head), steady.lastOption.getOrElse(secs.last))
      println(f"GROWTH ratio_last_over_first=${b / a}%.3f (steady rounds only)")
    } else {
      val (urls, secs, alloc) = graft.Bench.crawlBenchProbe(cpus, n)
      val allocGb = if (alloc < 0) -1.0 else alloc / 1e9
      println(f"MEGA cpus=$cpus n=$n urls=$urls secs=$secs%.1f tput=${urls / secs}%.1f alloc_gb=$allocGb%.1f")
    }
  }
}
