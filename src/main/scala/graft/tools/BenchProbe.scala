package graft.tools

import graft.model.CrawlConfig
import graft.plans.Crawler
import graft.sources.SynthConfig
import org.apache.spark.sql.SparkSession

/** Dev-only: per-round crawl timing at a given parallelism. */
object BenchProbe {
  def main(args: Array[String]): Unit = {
    val cpus = if (args.nonEmpty) args(0).toInt else 8
    val scale = if (args.length > 1) args(1).toInt else 25
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", sys.env.getOrElse("PROBE_AQE", "true"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val jobCount = new java.util.concurrent.atomic.AtomicInteger()
    val jobNanos = new java.util.concurrent.atomic.AtomicLong()
    val starts = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(js: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        starts.put(js.jobId, (System.nanoTime(),
          js.stageInfos.lastOption.map(_.name).getOrElse("?")))
      override def onJobEnd(je: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
        jobCount.incrementAndGet()
        Option(starts.remove(je.jobId)).foreach { case (t, name) =>
          val d = System.nanoTime() - t
          jobNanos.addAndGet(d)
          if (d > 3e9) println(f"    slow job ${je.jobId} ${d / 1e9}%.1fs: $name")
        }
      }
    })
    val synthCfg = SynthConfig(
      courts = sys.env.getOrElse("PROBE_COURTS", "2").toInt,
      queriesPerCourt = sys.env.getOrElse("PROBE_QUERIES", "4").toInt,
      pagesPerQuery = sys.env.getOrElse("PROBE_PAGES", "2").toInt,
      rowsPerPage = scale, failRate = 0.01)
    val cfg = CrawlConfig(
      budgetPerHost = sys.env.getOrElse("PROBE_BUDGET", "4096").toInt,
      numPartitions = cpus, saltMax = 16)
    val workDir = java.nio.file.Files.createTempDirectory(s"probe").toString
    val t0 = System.nanoTime()
    import spark.implicits._
    var frontier = {
      import org.apache.spark.sql.functions._
      graft.sources.Synth.seedEntries(synthCfg).toDS().toDF()
        .withColumn("canonical_url", graft.functions.Urls.canonicalize($"url"))
        .withColumn("url_hash", graft.functions.Urls.urlHash($"canonical_url"))
        .withColumn("host", graft.functions.Urls.host($"url"))
        .select(spark.emptyDataset[graft.model.FrontierEntry].columns.map(col): _*)
        .as[graft.model.FrontierEntry]
    }
    val reports = scala.collection.mutable.ArrayBuffer.empty[graft.plans.RoundReport]
    var round = 1
    var fc = synthCfg.courts.toLong * synthCfg.queriesPerCourt
    while (fc > 0 && round <= 32) {
      val rt = System.nanoTime()
      val (r, next, nextCount) = Crawler.runRound(spark, cfg, synthCfg, workDir, round, frontier)
      frontier = next
      fc = nextCount
      reports += r
      println(f"round ${r.round}: sched=${r.scheduled} ok=${r.fetched_ok} docs=${r.new_docs} paras=${r.new_paragraphs} secs=${(System.nanoTime() - rt) / 1e9}%.1f jobs=${jobCount.getAndSet(0)} jobSecs=${jobNanos.getAndSet(0L) / 1e9}%.1f")
      round += 1
    }
    val secs = (System.nanoTime() - t0) / 1e9
    val urls = reports.map(r => r.fetched_ok + r.fetch_failed + r.dup_url).sum
    println(f"TOTAL urls=$urls secs=$secs%.1f tput=${urls / secs}%.1f urls/s rounds=${reports.size}")
    spark.stop()
  }
}
