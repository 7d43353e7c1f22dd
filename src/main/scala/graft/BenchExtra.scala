package graft

import org.apache.spark.sql.SparkSession

/** Dev/measurement-only companion to [[Bench]] (which is frozen for
  * measurement): per-query noop-sink isolation with repeats, cold-vs-warm
  * split, and `.explain("formatted")` capture for the plan evidence files
  * (guide §1.1/§1.4/§7.2). Emits one JSON line so OPTIMIZATION_r06.md can
  * cite machine-readable numbers without touching the driver contract.
  *
  * Usage: sbt "runMain graft.BenchExtra [query ...]"
  * Env:
  *   SPARK_GRAFT_SF_DIR   data dir (default /root/testdata/sf0.1)
  *   SPARK_GRAFT_CPUS     local[N] width (default 32)
  *   GRAFT_BENCHX_REPEATS timed repeats per query AFTER the cold run (default 3)
  *   GRAFT_BENCHX_PLANS   when set, write <dir>/<query>.txt explain output
  */
object BenchExtra {

  private def newSession(cpus: Int): SparkSession = {
    val s = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName(s"graft-benchx-$cpus")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.hadoop.io.file.buffer.size", (1024 * 1024).toString)
      .config("spark.sql.icu.caseMappings.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }

  private def force(df: org.apache.spark.sql.DataFrame): Unit =
    df.write.format("noop").mode("overwrite").save()

  /** Per-stage attribution (guide §7.1 without a UI): stage wall, task count,
    * and shuffle bytes, drained between queries. */
  private final class StageLog extends org.apache.spark.scheduler.SparkListener {
    final case class S(id: Int, name: String, tasks: Int, wallMs: Long,
        inBytes: Long, shRead: Long, shWrite: Long)
    private val buf = new java.util.concurrent.ConcurrentLinkedQueue[S]()
    override def onStageCompleted(
        e: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
      val si = e.stageInfo
      val wall = (for {s <- si.submissionTime; c <- si.completionTime} yield c - s).getOrElse(-1L)
      buf.add(S(si.stageId, si.name.takeWhile(_ != '\n').take(60), si.numTasks, wall,
        si.taskMetrics.inputMetrics.bytesRead,
        si.taskMetrics.shuffleReadMetrics.totalBytesRead,
        si.taskMetrics.shuffleWriteMetrics.bytesWritten))
    }
    def drain(): Seq[S] = {
      val out = Seq.newBuilder[S]
      var s = buf.poll()
      while (s != null) { out += s; s = buf.poll() }
      out.result()
    }
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val repeats = sys.env.getOrElse("GRAFT_BENCHX_REPEATS", "3").toInt
    val plansDir = sys.env.get("GRAFT_BENCHX_PLANS")
    val names =
      if (args.nonEmpty) args.toSeq
      else SparkEntry.queries.keys.toSeq.sorted
    val spark = newSession(cpus)
    val stages = if (sys.env.contains("GRAFT_BENCHX_STAGES")) {
      val l = new StageLog; spark.sparkContext.addSparkListener(l); Some(l)
    } else None

    plansDir.foreach(d => java.nio.file.Files.createDirectories(java.nio.file.Paths.get(d)))

    val rows = names.map { name =>
      val fn = SparkEntry.queries(name)
      spark.sparkContext.setJobDescription(s"benchx:$name")
      // plan capture (pre-execution initial plan; AQE final plans need the UI)
      plansDir.foreach { d =>
        val plan = fn(spark, sfDir).queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        java.nio.file.Files.write(
          java.nio.file.Paths.get(d, s"$name.txt"), plan.getBytes("UTF-8"))
      }
      // cold run: includes codegen/janino compile + parquet footer reads
      stages.foreach(_.drain())
      val t0 = System.nanoTime()
      val coldDf = fn(spark, sfDir)
      force(coldDf)
      val cold = (System.nanoTime() - t0) / 1e9
      stages.foreach { l =>
        // settle async listener delivery before draining (private API — a
        // short sleep is enough for a dev probe)
        Thread.sleep(200)
        l.drain().foreach(s => System.err.println(
          f"[benchx]   stage ${s.id}%4d tasks=${s.tasks}%3d wall=${s.wallMs}%5dms " +
          f"in=${s.inBytes / 1024}%7dK shR=${s.shRead / 1024}%7dK shW=${s.shWrite / 1024}%7dK ${s.name}"))
      }
      // final adaptive plan: drive this QueryExecution's own AQE instance to
      // completion (the noop write above ran a separate QueryExecution), then
      // print it — isFinalPlan=true with AQEShuffleRead/strategy rewrites.
      plansDir.foreach { d =>
        if (sys.env.contains("GRAFT_BENCHX_FINAL_PLANS")) {
          val qe = fn(spark, sfDir).queryExecution
          qe.executedPlan.execute().foreach(_ => ())
          java.nio.file.Files.write(java.nio.file.Paths.get(d, s"$name.final.txt"),
            qe.executedPlan.toString.getBytes("UTF-8"))
        }
      }
      val warm = (1 to repeats).map { _ =>
        val t = System.nanoTime()
        force(fn(spark, sfDir))
        (System.nanoTime() - t) / 1e9
      }
      spark.sparkContext.setJobDescription(null)
      val wmin = if (warm.nonEmpty) warm.min else cold
      System.err.println(f"[benchx] $name%-24s cold=$cold%6.2fs warm_min=$wmin%6.2fs " +
        warm.map(w => f"$w%.2f").mkString("[", ",", "]"))
      (name, cold, wmin, warm)
    }
    val json = rows.map { case (n, c, w, samples) =>
      val ss = samples.map(s => f"$s%.3f").mkString("[", ",", "]")
      f""""$n":{"cold":$c%.3f,"warm_min":$w%.3f,"samples":$ss}"""
    }.mkString("{", ",", "}")
    val totalCold = rows.map(_._2).sum
    val totalWarm = rows.map(_._3).sum
    println(f"""{"benchx":$json,"total_cold":$totalCold%.3f,"total_warm_min":$totalWarm%.3f,"sf":"$sfDir","cpus":$cpus,"repeats":$repeats}""")
    spark.stop()
  }
}
