package graft

import graft.model.CrawlConfig
import graft.plans.Crawler
import graft.sources.SynthConfig

import org.apache.spark.sql.SparkSession

/** Benchmark main (driver contract): headline query timings on
  * SPARK_GRAFT_SF_DIR at SPARK_GRAFT_CPUS, plus the north-rule scaling
  * protocol — the same crawl job on the same input at local[8] and local[32]
  * (the sandbox evidence for N → 4N executors; BASELINE.md §"Two-cluster-size
  * evidence protocol"). Prints ONE JSON line.
  */
object Bench {

  /** Heavier queries across operator families (shuffle/join/window/sketch). */
  private val Headline = Seq(
    "q_pricing_summary", "q_stats_rollup", "q_top_revenue", "q_daily_rollup",
    "q_window_running", "q_sessionize", "q_keepfirst", "q_dedup_exact",
    "q_merge_multimap", "q_token_stats", "q_simhash", "q_minhash_candidates",
    "q_ann_bruteforce", "q_ann_srp", "q_segregate", "q_rendering_dedup",
    "q_ngram_jaccard", "q_w1_relational", "q_merge_judgments", "q_stats_full")

  /** Scratch root for bench state (work dirs, shuffle files). Defaults to
    * tmpfs (/dev/shm) when available: per-node local storage on a real
    * cluster is node-local NVMe + page cache whose bandwidth scales with
    * node count — a single shared virtual disk does not, so running the
    * scaling protocol against it measures the VM's one disk, not the
    * engine. Overridable via GRAFT_TMPDIR. */
  private[graft] def tmpRoot: java.nio.file.Path = {
    val shm = java.nio.file.Paths.get("/dev/shm")
    val default =
      if (java.nio.file.Files.isDirectory(shm) && java.nio.file.Files.isWritable(shm))
        shm.resolve("graft-bench").toString
      else System.getProperty("java.io.tmpdir")
    val p = java.nio.file.Paths.get(sys.env.getOrElse("GRAFT_TMPDIR", default))
    java.nio.file.Files.createDirectories(p)
    p
  }

  private def newSession(cpus: Int): SparkSession = {
    val s = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName(s"graft-bench-$cpus")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.local.dir", tmpRoot.toString)
      .config("spark.ui.enabled", "false")
      // 1 MB local-FS write buffer (default 4 KB): every buffer flush rides
      // Hadoop's IOStatistics counter — boxed-Long churn measured at 5 GB
      // per mega-wave plus 256× the flush syscalls (JFR, round 4). Must be
      // set at session build (hadoop conf, not runtime-settable).
      .config("spark.hadoop.io.file.buffer.size", (1024 * 1024).toString)
      // JVM case mappings instead of ICU (Spark 4 defaults to ICU for
      // UTF8_BINARY lower/upper): the crawl's only hot lower() is host
      // canonicalization (Urls.host) and hosts are case-insensitive ASCII by
      // RFC; ICU's UCharacter path measured 3.1 GB/wave of BreakIterator and
      // CaseMapImpl allocations (JFR, round 5) for byte-identical output on
      // ASCII. Identical results for all ASCII inputs (synth vocab and the
      // driver testdata are pure ASCII — verified).
      .config("spark.sql.icu.caseMappings.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    trimHadoopConf(s)
    s
  }

  /** Strip the session's Hadoop configuration to the entries local-FS parquet
    * jobs actually consult. Spark ships a `SerializableConfiguration` inside
    * EVERY write task's closure (`WriteFilesExec` → `WriteJobDescription`),
    * and Hadoop's `Configuration.write/readFields` round-trips EACH property
    * through its own GZIP stream — with ~700 `core-default.xml` entries that
    * measured 7.8 GB/wave of inflater buffers plus IOException-based EOF
    * probing (JFR, round 5; the 3.3 GB "exception stack trace" item was this).
    * Every surviving key falls back to the identical code-side default when
    * absent, so behavior is unchanged; on a REAL cluster the cluster conf
    * carries required site entries and this trim must not run — it is bench-
    * session tuning (local[N] protocol + headline queries), not library code.
    * Opt-out via GRAFT_TRIM_HADOOP_CONF=0 for A/B. */
  private def trimHadoopConf(s: SparkSession): Unit = {
    if (sys.env.get("GRAFT_TRIM_HADOOP_CONF").contains("0")) return
    // Force SharedState/SessionState init FIRST: its constructor may
    // addResource() on the context conf, which nulls the materialized
    // property table and the next getProps() reloads every default —
    // silently undoing a too-early trim.
    s.sessionState
    val hc = s.sparkContext.hadoopConfiguration
    val keep = Seq("io.file.buffer.size", "fs.defaultFS", "hadoop.tmp.dir",
      "fs.permissions.umask-mode", "hadoop.security.authentication")
      .flatMap(k => Option(hc.get(k)).map(k -> _))
    hc.clear()
    keep.foreach { case (k, v) => hc.set(k, v) }
    System.err.println(s"[bench] hadoop conf trimmed: context=${hc.size()} " +
      s"write-task=${s.sessionState.newHadoopConf().size()} entries")
  }

  /** Force full plan execution (count() would let Catalyst prune the
    * projections away). */
  private def force(df: org.apache.spark.sql.DataFrame): Unit =
    df.write.format("noop").mode("overwrite").save()

  /** The crawl workload for the scaling protocol: ONE mega-round over an
    * identical synthetic frontier of `n` PDF URLs — the sandbox stand-in for
    * a 10^10-frontier crawl wave, where per-round fixed costs amortize and
    * throughput is dominated by the scalable dataflow (D1 probe → politeness
    * → fetch → D2/D3 dedup → segregation → snapshot commit). Host skew and
    * planted duplicates are the same at every parallelism (seed-determined).
    * Returns (urls processed, wall seconds). */
  /** dev-only visibility for tools.MegaProbe */
  private[graft] def crawlBenchProbe(cpus: Int, n: Int): (Long, Double, Long) = crawlBench(cpus, n)

  /** Total bytes allocated by all live JVM threads (HotSpot TLAB counters) —
    * the in-run attribution for the memory-bandwidth ceiling choice (ADVICE
    * r3: the binding-ceiling claim needs a measurement, not an assertion).
    * Local-mode task threads are pooled and long-lived, so start/end deltas
    * over live threads are a tight lower bound on timed-section allocation.
    * Allocation traffic understates true bus traffic (GC copy ≥1×, parquet
    * and shuffle I/O on tmpfs, cache misses), so alloc-GB/s alone nearing the
    * measured DRAM bandwidth is sufficient evidence of bandwidth-bound. */
  private def allocatedBytes(): Long =
    try {
      val tmx = java.lang.management.ManagementFactory.getThreadMXBean
        .asInstanceOf[com.sun.management.ThreadMXBean]
      tmx.getThreadAllocatedBytes(tmx.getAllThreadIds).filter(_ > 0).sum
    } catch { case _: Throwable => -1L }

  /** Run one crawl-bench level in a CPU-confined subprocess: `taskset` pins
    * the JVM to exactly `cpus` cores so GC/JIT/writeback threads cannot
    * borrow the host's other cores — the honest simulation of an
    * N-core cluster node (in-process local[N] still gets 32-wide GC). */
  private def crawlBenchIsolated(cpus: Int, n: Int): (Long, Double, Double) = {
    val java = System.getProperty("java.home") + "/bin/java"
    val cp = System.getProperty("java.class.path")
    val addOpens = Seq(
      "java.base/java.lang", "java.base/java.lang.invoke",
      "java.base/java.lang.reflect", "java.base/java.io",
      "java.base/java.net", "java.base/java.nio",
      "java.base/java.util", "java.base/java.util.concurrent",
      "java.base/java.util.concurrent.atomic",
      "java.base/sun.nio.ch", "java.base/sun.nio.cs",
      "java.base/sun.security.action", "java.base/sun.util.calendar"
    ).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))
    // NEVER inherit SPARK_DRIVER_MEM: the parent sbt-forked JVM already holds
    // a pinned heap sized from it, and a same-size child heap alongside it is
    // exactly the round-1 OOM kill (BENCH_r01.json rc=137). The crawl wave at
    // bench N fits comfortably in 12 GiB per subprocess.
    // 20g: the doc-hash/segregation kernels are allocation-heavy; at 12g the
    // 32-thread level spent ~25% of run time in GC (stage metrics), which
    // taxes exactly the level the scaling ratio needs. 28g/19g-young was
    // MEASURED WORSE (2.5× on the fetch stage, same weather window, round
    // 4): past ~14g eden the scavenge's card/root scan and page-fault
    // footprint outgrow the saved collection count on this VM.
    val mem = sys.env.getOrElse("SPARK_GRAFT_BENCH_MEM", "20g")
    // ~70% young gen: the crawl wave's allocations are overwhelmingly
    // short-lived (row encode/decode churn); a big eden cuts ParallelGC
    // collection frequency at the 32-thread allocation rate
    val xmn = scala.util.Try(mem.toLowerCase.stripSuffix("g").toInt)
      .map(g => s"${math.max(1, g * 7 / 10)}g").getOrElse("14g")
    val cmd = Seq("taskset", "-c", s"0-${cpus - 1}", java) ++ addOpens ++ Seq(
      s"-Xmx$mem", s"-Xms$mem", s"-Xmn$xmn", "-XX:+UseParallelGC",
      "-XX:-DontCompileHugeMethods", // wide-row serializers exceed the JIT's 8k-bytecode refusal limit (build.sbt note)
      "-Dspark.ui.enabled=false", "-Dspark.sql.session.timeZone=UTC",
      "-cp", cp, "graft.tools.MegaProbe", cpus.toString, n.toString)
    val pb = new ProcessBuilder(cmd: _*).redirectErrorStream(true)
    val proc = pb.start()
    val out = new String(proc.getInputStream.readAllBytes())
    proc.waitFor()
    val line = out.linesIterator.find(_.startsWith("MEGA")).getOrElse {
      System.err.println(out.takeRight(2000))
      throw new IllegalStateException(s"crawl bench subprocess (cpus=$cpus) produced no MEGA line")
    }
    System.err.println(s"[bench] ${_root_.java.time.Instant.now()} $line") // per-run diagnostic
    // MEGA cpus=8 n=400000 urls=307729 secs=89.8 tput=3426.7 alloc_gb=120.3
    val kv = line.split("\\s+").flatMap(_.split("=") match {
      case Array(k, v) => Some(k -> v); case _ => None
    }).toMap
    (kv("urls").toLong, kv("secs").toDouble,
      kv.get("alloc_gb").map(_.toDouble).getOrElse(-1.0))
  }

  /** dev-only: MegaProbe installs a stage listener through this hook */
  @volatile private[graft] var stageListenerHook: Option[SparkSession => Unit] = None

  /** Pure-CPU calibration: total LCG (dependent-chain) throughput with `cpus`
    * threads. Measures what the SANDBOX ITSELF allows when N cores are
    * active: on this Firecracker VM, per-core throughput at 32 active cores
    * is ~0.6× that at 8 active cores (host frequency/contention), so even an
    * embarrassingly parallel register-only loop scales ~2.4× from 8→32 —
    * a hardware ceiling of ~0.6 on the 4×-core efficiency metric. The crawl's
    * scaling efficiency is therefore reported both raw and normalized by this
    * ceiling (a real 4N-executor cluster adds nodes, not SMT-or-thermal-
    * shared cores, so the normalized number is the cluster-relevant one). */
  private[graft] def lcgThroughput(cpus: Int): Double = {
    val itersPerThread = 2000000000L / cpus
    val threads = (0 until cpus).map { _ =>
      new Thread(() => {
        var h = 1234567L
        var j = 0L
        // dependent-chain LCG; multiplier/increment are Knuth's public MMIX
        // constants (TAOCP Vol. 2) — any full-period pair would do
        while (j < itersPerThread) { h = h * 6364136223846793005L + 1442695040888963407L; j += 1 }
        if (h == 42L) print("")
      })
    }
    val t0 = System.nanoTime()
    threads.foreach(_.start())
    threads.foreach(_.join())
    cpus * itersPerThread / ((System.nanoTime() - t0) / 1e9)
  }

  private def crawlBench(cpus: Int, n: Int): (Long, Double, Long) = {
    val spark = newSession(cpus)
    stageListenerHook.foreach(_(spark))
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val synthCfg = SynthConfig(
      courts = 4, queriesPerCourt = 8, pagesPerQuery = 4,
      rowsPerPage = math.max(1, n / (4 * 8 * 4)), failRate = 0.0)
    // saltMax 64: the dominant court hosts must split into enough buckets
    // that no politeness bucket dominates a task (skew control); 8×cpus
    // partitions give ~one bucket per task (at 4×cpus, 152 buckets over 128
    // partitions put TWO buckets on some tasks — a built-in 2× straggler in
    // every fetch wave's last task wave)
    val cfg = CrawlConfig(
      budgetPerHost = Int.MaxValue / 2, maxRetries = 3,
      numPartitions = cpus * sys.env.getOrElse("GRAFT_BENCH_PARTS_MULT", "8").toInt,
      saltMax = 64,
      // cluster-mode probe routing, measurable in the bench since the r5
      // narrow-key markDupes (the probe shuffle now moves ~70 B/row keys,
      // not frontier rows); default stays off in local mode (shared JVM
      // filter cache — the shuffle buys no locality here)
      probeRepartition = sys.env.get("GRAFT_PROBE_REPARTITION").contains("1"))
    val workDir = java.nio.file.Files.createTempDirectory(tmpRoot, s"graft-bench-$cpus").toString

    // frontier of n pdf URLs (dup plants via Synth's content arithmetic)
    // JIT/codegen warmup: one tiny untimed round in a scratch dir (at real
    // crawl scale, first-round warmup is noise; here it would be ~10% of F)
    val warmDir = java.nio.file.Files.createTempDirectory(tmpRoot, s"graft-warm-$cpus").toString
    Crawler.runRound(spark, cfg, synthCfg, warmDir, 1, megaFrontier(spark, synthCfg, 4096, cpus))

    // the frontier enters the round FROM PARQUET, exactly as a real round
    // receives the previous round's committed frontier table (written
    // untimed — it models state that already exists at round start). The
    // in-flight synthetic Dataset would otherwise be recomputed by every
    // consumer (host-count aggregate + the politeness shuffle), billing the
    // wave for generating its own input twice.
    val frontierPath = s"$workDir/frontier_input"
    megaFrontier(spark, synthCfg, n, cpus).write.parquet(frontierPath)
    val frontier = {
      import spark.implicits._
      spark.read.parquet(frontierPath).as[graft.model.FrontierEntry]
    }

    val alloc0 = allocatedBytes()
    val t0 = System.nanoTime()
    val (report, _, _) = Crawler.runRound(spark, cfg, synthCfg, workDir, 1, frontier)
    val secs = (System.nanoTime() - t0) / 1e9
    val alloc = if (alloc0 < 0) -1L else allocatedBytes() - alloc0
    val urls = report.fetched_ok + report.fetch_failed + report.dup_url
    spark.stop()
    // clean up the work dirs (bench temp state only); keep for dev byte-audit
    if (sys.env.contains("GRAFT_KEEP_WORKDIR")) System.err.println(s"[bench] workDir kept: $workDir")
    else Seq(workDir, warmDir).foreach(cleanupDir)
    (urls, secs, alloc)
  }

  private def megaFrontier(spark: SparkSession, synthCfg: SynthConfig, n: Int, cpus: Int) = {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val total = synthCfg.totalRows
    spark.range(0L, math.min(n.toLong, total), 1L, cpus * 4).as[Long]
      .map { i =>
        // mixed-radix bijection i → (court, query, page, rank); URL-level
        // duplicates then come only from Synth's planted case/file collisions
        var k = i
        val c = (k % synthCfg.courts).toInt; k /= synthCfg.courts
        val q = (k % synthCfg.queriesPerCourt).toInt; k /= synthCfg.queriesPerCourt
        val page = 1 + (k % synthCfg.pagesPerQuery).toInt; k /= synthCfg.pagesPerQuery
        val rank = k.toInt
        val caseId = graft.sources.Synth.caseIdOf(synthCfg, c, q, page, rank)
        val fid = graft.sources.Synth.fileIdOf(synthCfg, c, caseId)
        val url = graft.sources.Synth.pdfUrl(synthCfg, c, fid)
        graft.model.FrontierEntry(url, url, 0L, "", graft.sources.Synth.courtName(c),
          null, 1, 2, i, "pending", 0, 0)
      }.toDF()
      .withColumn("canonical_url", graft.functions.Urls.canonicalize($"url"))
      .withColumn("url_hash", graft.functions.Urls.urlHash($"canonical_url"))
      .withColumn("host", graft.functions.Urls.host($"url"))
      .select(spark.emptyDataset[graft.model.FrontierEntry].columns.map(col): _*)
      .as[graft.model.FrontierEntry]
  }

  /** One scaling-protocol window: PAIRED sampling — this shared-host VM's
    * throughput swings ±50% on a minutes scale (adjacent identical 32-core
    * runs measured 73 s and 136 s), so a ratio of two independently-sampled
    * levels is mostly host weather. Each (8-core, 32-core, lcg8, lcg32,
    * mem8, mem32, wrt8, wrt32) PAIR runs back-to-back in one weather window;
    * the reported efficiency is a valid pair's. The hardware ceiling is
    * deliberately CROSS-WINDOW: each level's best LCG probe over all windows
    * (max lcg8 / max lcg32) — a per-width upper bound on what the VM allows,
    * stabler than any single window's probe pair.
    * Formula: hw_ceiling_efficiency = max(lcg32) / (4 × max(lcg8)). */
  final case class Sample(u8: Long, s8: Double, u32: Long, s32: Double,
      lcg8: Double, lcg32: Double, mem8: Double, mem32: Double,
      wrt8: Double, wrt32: Double, alloc8: Double, alloc32: Double) {
    def eff: Double = (u32 / s32) / (4.0 * (u8 / s8))
    def hwEff: Double = lcg32 / (4.0 * lcg8)
    /** This pair's OWN binding ceiling — numerator and denominator from
      * the same weather window across all three resources (compute, read
      * bandwidth, durable-write bandwidth). Clamped like the global ones. */
    def windowCeiling: Double = math.min(1.0, List(
      lcg32 / (4.0 * lcg8), mem32 / (4.0 * mem8), wrt32 / (4.0 * wrt8)).min)
    /** Clamped at 1.0: raw efficiency at/above the pair's binding-resource
      * ceiling means the engine achieved all the scaling the window
      * offered — a >1 readout would be a looseness artifact of the bound,
      * not superlinear engine scaling. */
    def effNormalizedWindow: Double = math.min(1.0, eff / windowCeiling)
    /** In-run VALIDITY rule (VERDICT r4 Next #1): a window is congestion-
      * unmeasurable — and must not become the number of record — when
      *  (a) the pair is INVERTED (secs_32 >= secs_8: a healthy 8→32 step on
      *      real hardware cannot run slower with 4× cores on identical
      *      work; observed only under sustained host congestion), or
      *  (b) the window's own binding hardware ceiling is below 0.2 (the
      *      probes themselves certify the window offered <0.2 of the 4×
      *      step — whatever the crawl reads there is weather, not engine).
      * Rejected pairs stay in the artifact (transparency) but are excluded
      * from pair-of-record selection. */
    def rejectReason: String =
      if (s32 >= s8) "inverted"
      else if (windowCeiling < 0.2) "congested_window"
      else null
    def valid: Boolean = rejectReason == null
  }

  /** The pair of record is the one from the CLEANEST weather window (fastest
    * combined wall time) AMONG VALID PAIRS — not max-efficiency, which is
    * upward-biased by noise that happens to crush a pair's 8-core member.
    * Only when every window failed the validity rule (the caller then flags
    * pair_valid=false in the artifact) does the cleanest invalid pair stand
    * in. */
  private[graft] def pairOfRecord(samples: Seq[Sample]): Sample = {
    val pool = if (samples.exists(_.valid)) samples.filter(_.valid) else samples
    pool.minBy(s => s.s8 + s.s32)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt

    // ---- headline query timings at the requested parallelism ----
    // Failures are LOUD AND VISIBLE IN THE ARTIFACT: a query that starts
    // failing must surface as an `err` entry in the JSON, not contribute ~0 s
    // and silently *improve* the headline total (VERDICT r4 Missing #3).
    val queryErrors = scala.collection.mutable.LinkedHashMap.empty[String, String]
    val results = if (sys.env.contains("SPARK_GRAFT_SKIP_HEADLINE")) Nil else {
      val spark = newSession(cpus)
      // warmup: JIT + codegen + parquet footer caches on an untimed pass
      try force(SparkEntry.queries("q_pricing_summary")(spark, sfDir))
      catch { case e: Throwable =>
        System.err.println(s"[bench] WARNING: warmup query failed: $e") }
      val rs = Headline.map { name =>
        val fn = SparkEntry.queries(name)
        val t0 = System.nanoTime()
        try { force(fn(spark, sfDir)) } catch { case e: Throwable =>
          queryErrors(name) = e.toString.linesIterator.next().take(200)
          System.err.println(s"[bench] ERROR: query $name FAILED: $e")
        }
        name -> (System.nanoTime() - t0) / 1e9
      }
      spark.stop()
      rs
    }

    // ---- scaling protocol: same crawl, CPU-confined, N=8 vs 4N=32 cores ----
    val n = sys.env.getOrElse("SPARK_GRAFT_CRAWL_N", "800000").toInt
    val pairs = sys.env.getOrElse("SPARK_GRAFT_CRAWL_PAIRS", "3").toInt
    // Budget-bounded extension: when none of the initial `pairs` windows is
    // measurable (see validity rule below), keep sampling until one is.
    // 8 windows (~35 min worst case): the 2026-08-18 morning run burned 4
    // consecutive inverted windows before the first valid one — 6 was nearly
    // exhausted by one sustained-congestion hour.
    val maxPairs = math.max(pairs, sys.env.getOrElse("SPARK_GRAFT_CRAWL_MAX_PAIRS", "8").toInt)
    // ALL probes ride inside each pair's weather window (a ceiling whose two
    // levels sample different windows is meaningless — one driver run
    // measured a "bandwidth ratio" of 2.2 that way); per-level MAX across
    // windows then estimates true capacity at each width.
    def samplePair(): Sample = {
      val (u8, s8, a8) = crawlBenchIsolated(8, n)
      val (u32, s32, a32) = crawlBenchIsolated(32, n)
      Sample(u8, s8, u32, s32, lcgIsolated(8), lcgIsolated(32),
        memIsolated(8), memIsolated(32),
        writeIsolated(8), writeIsolated(32), a8, a32)
    }
    val sampleBuf = scala.collection.mutable.ArrayBuffer.empty[Sample]
    (1 to pairs).foreach(_ => sampleBuf += samplePair())
    while (!sampleBuf.exists(_.valid) && sampleBuf.length < maxPairs) {
      System.err.println(s"[bench] no valid pair after ${sampleBuf.length} windows " +
        s"(${sampleBuf.map(_.rejectReason).mkString(", ")}) — sampling another")
      sampleBuf += samplePair()
    }
    val samples = sampleBuf.toSeq
    val pairValid = samples.exists(_.valid)
    if (!pairValid) System.err.println(
      s"[bench] WARNING: all $maxPairs windows congestion-unmeasurable — " +
        "reporting cleanest pair with pair_valid=false")
    val (mem8, mem32) = (samples.map(_.mem8).max, samples.map(_.mem32).max)
    val best = pairOfRecord(samples)
    val (urls8, secs8, urls32, secs32) = (best.u8, best.s8, best.u32, best.s32)
    val tput8 = urls8 / secs8
    val tput32 = urls32 / secs32
    val efficiency = best.eff
    // Two hardware ceilings bracket what this single VM allows at 4× active
    // cores (a real N→4N step adds whole nodes — sockets, memory channels,
    // page caches — which is precisely what one VM cannot emulate):
    //  - compute ceiling: register-only LCG, best probe per level across all
    //    windows (max lcg32 / (4 × max lcg8));
    //  - bandwidth ceiling: STREAM-like read sweep, same formula.
    // The crawl's work (row codecs, parquet, shuffle, GC copying) is
    // memory-traffic-bound, so the BINDING ceiling is the smaller of the
    // two; scaling_efficiency_normalized divides by it.
    // clamped at 1.0: a >1 "ceiling" is a superlinear measurement artifact
    // (weather aliasing between the two levels), and dividing by it would
    // nonsensically report normalized < raw
    val hwCpu = math.min(1.0, samples.map(_.lcg32).max / (4.0 * samples.map(_.lcg8).max))
    val hwMem = math.min(1.0, mem32 / (4.0 * mem8))
    // The BINDING ceiling is min(compute, bandwidth) — and the bandwidth-
    // bound claim is MEASURED in-run, not asserted (ADVICE r3): the crawl's
    // own allocation traffic (TLAB counters, best window per level) is
    // reported below; allocation alone reaching a large fraction of the
    // probed DRAM bandwidth — before GC copy, shuffle, parquet I/O and cache
    // misses — is the attribution. Both per-ceiling normalizations are
    // emitted so cross-round consumers always compare like quantities
    // (scaling_efficiency_normalized_cpu is r2's definition, continuity).
    val hwEff = math.min(hwCpu, hwMem)
    val normalized = efficiency / hwEff
    val normalizedCpu = efficiency / hwCpu
    // Durable-write ceiling (WriteProbe: file create+fill+delete on the same
    // scratch the crawl commits to — tmpfs page-dirtying bandwidth, the one
    // resource the other two probes cannot see and the fetch wave's commit
    // path rides hardest). Cross-window max like the others.
    val (wrt8, wrt32) = (samples.map(_.wrt8).max, samples.map(_.wrt32).max)
    val hwWrt = math.min(1.0, wrt32 / (4.0 * wrt8))
    // The same-window normalization: the chosen (cleanest) pair's raw
    // efficiency over that PAIR's own min(compute, read-bw, write-bw)
    // ceiling — numerator and denominator sample identical host weather, so
    // congested windows don't get divided by a clear-window ceiling. Emitted
    // alongside the cross-window fields; the continuity fields keep their
    // r2/r3 definitions (ADVICE r3).
    val normalizedWindow = best.effNormalizedWindow
    // alloc GB/s at each width, from the cleanest-window pair (same pair as
    // the headline efficiency)
    val allocG8 = if (best.alloc8 < 0) -1.0 else best.alloc8 / best.s8
    val allocG32 = if (best.alloc32 < 0) -1.0 else best.alloc32 / best.s32
    samples.foreach(s => System.err.println(
      f"[bench] pair: secs8=${s.s8}%.1f secs32=${s.s32}%.1f eff=${s.eff}%.3f hw=${s.hwEff}%.3f " +
      f"win_ceiling=${s.windowCeiling}%.3f (mem ${s.mem8}%.1f/${s.mem32}%.1f wrt ${s.wrt8}%.1f/${s.wrt32}%.1f)"))
    System.err.println(
      f"[bench] ceilings: cpu=$hwCpu%.3f mem=$hwMem%.3f wrt=$hwWrt%.3f (mem8=$mem8%.1f GB/s mem32=$mem32%.1f GB/s wrt8=$wrt8%.1f wrt32=$wrt32%.1f)")
    System.err.println(
      f"[bench] crawl alloc traffic: ${allocG8}%.1f GB/s at 8 cores, ${allocG32}%.1f GB/s at 32 (vs probed DRAM bw $mem8%.1f / $mem32%.1f)")

    val qs = results.map { case (k, v) => "\"" + k + f"\":$v%.3f" }
      .mkString("{", ",", "}")
    val qErrs = queryErrors
      .map { case (k, e) => "\"" + k + "\":\"" + e.replace("\\", "\\\\").replace("\"", "\\\"") + "\"" }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    val growth = growthJson
    // Full per-window transparency: every sampled pair, its own-window
    // ceiling, and its validity verdict ride the artifact — the pair of
    // record is auditable against the windows that were rejected.
    val pairsJson = samples.map { s =>
      val rej = Option(s.rejectReason).map(r => "\"" + r + "\"").getOrElse("null")
      f"""{"secs_8":${s.s8}%.2f,"secs_32":${s.s32}%.2f,"eff":${s.eff}%.3f,"window_ceiling":${s.windowCeiling}%.3f,"valid":${s.valid},"reject":$rej}"""
    }.mkString("[", ",", "]")
    // BENCH schema self-description (ADVICE/VERDICT r4 #7): the overloaded
    // `hw_ceiling_efficiency` name changed meaning r2→r3; consumers should
    // read the explicitly-named fields.
    val ceilingSchema = "hw_ceiling_efficiency == hw_ceiling_min_cpu_mem = " +
      "min(hw_ceiling_cpu, hw_ceiling_mem) from cross-window per-level maxima " +
      "(r3..r5 definition; r2 emitted the cpu-only ceiling under this name). " +
      "hw_ceiling_write is measured but kept OUT of that min for cross-round " +
      "continuity. scaling_efficiency_normalized = raw/min(cpu,mem); " +
      "_normalized_cpu = raw/cpu (r2 continuity); _normalized_window = the " +
      "reported pair's raw over that SAME pair's min(cpu,mem,write) ceiling, " +
      "clamped at 1. pair_valid=false means every sampled window failed the " +
      "in-run validity rule (inverted pair or window ceiling < 0.2)."
    val json =
      f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs,"query_errors":$qErrs,"sf":"$sfDir","crawl":{"urls":$urls32,"urls_per_sec_8":$tput8%.1f,"urls_per_sec_32":$tput32%.1f,"secs_8":$secs8%.2f,"secs_32":$secs32%.2f,"scaling_efficiency":$efficiency%.3f,"pair_valid":$pairValid,"pairs_sampled":${samples.length},"pairs":$pairsJson,"hw_ceiling_efficiency":$hwEff%.3f,"hw_ceiling_min_cpu_mem":$hwEff%.3f,"hw_ceiling_cpu":$hwCpu%.3f,"hw_ceiling_mem":$hwMem%.3f,"mem_gbps_8":$mem8%.1f,"mem_gbps_32":$mem32%.1f,"alloc_gbps_8":$allocG8%.1f,"alloc_gbps_32":$allocG32%.1f,"wrt_gbps_8":$wrt8%.1f,"wrt_gbps_32":$wrt32%.1f,"hw_ceiling_write":$hwWrt%.3f,"scaling_efficiency_normalized":$normalized%.3f,"scaling_efficiency_normalized_cpu":$normalizedCpu%.3f,"scaling_efficiency_normalized_window":$normalizedWindow%.3f,"ceiling_schema":"$ceilingSchema"$growth}}"""
    println(json)
    // Belt-and-braces for the driver: the same line as a bare file (stdout
    // arrives through sbt, which has mangled it in past rounds). Path is
    // cwd-relative by default (the repo root when the driver runs sbt) and
    // failures are LOUD — a silently stale artifact is the exact failure
    // mode this file exists to prevent (ADVICE r3).
    val outPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT",
      java.nio.file.Paths.get(System.getProperty("user.dir"), "bench_summary.json").toString)
    try java.nio.file.Files.write(java.nio.file.Paths.get(outPath),
      (json + "\n").getBytes("UTF-8"))
    catch { case e: Throwable =>
      System.err.println(s"[bench] ERROR: could not write $outPath: $e")
    }
    // Headline == artifact, by construction (VERDICT r2/r3/r4 carried item):
    // the BASELINE.md headline block is REGENERATED from this very JSON's
    // values on every protocol run — a diff-able equality with the committed
    // BENCH_r{N}.json, not a builder-transcribed number.
    syncBaselineHeadline(pairValid, samples.length, urls32, tput8, tput32, secs8, secs32,
      efficiency, normalizedWindow, best.windowCeiling, hwCpu, hwMem, hwWrt, total,
      queryErrors.size)
  }

  /** Rewrite the auto-generated headline block in BASELINE.md (between the
    * BENCH_HEADLINE_AUTO markers) from the numbers just emitted to
    * bench_summary.json. Loud on failure, never fatal. */
  private def syncBaselineHeadline(pairValid: Boolean, pairsSampled: Int, urls: Long,
      tput8: Double, tput32: Double, secs8: Double, secs32: Double, eff: Double,
      effWindow: Double, windowCeiling: Double, hwCpu: Double, hwMem: Double,
      hwWrt: Double, queryTotal: Double, queryErrors: Int): Unit = {
    val path = java.nio.file.Paths.get(sys.env.getOrElse("GRAFT_BASELINE_MD",
      java.nio.file.Paths.get(System.getProperty("user.dir"), "BASELINE.md").toString))
    val begin = "<!-- BENCH_HEADLINE_AUTO_BEGIN -->"
    val end = "<!-- BENCH_HEADLINE_AUTO_END -->"
    try {
      if (!java.nio.file.Files.exists(path)) {
        System.err.println(s"[bench] WARNING: $path missing — headline not synced"); return
      }
      val text = java.nio.file.Files.readString(path)
      val (i, j) = (text.indexOf(begin), text.indexOf(end))
      if (i < 0 || j < 0 || j < i) {
        System.err.println(s"[bench] WARNING: headline markers missing in $path"); return
      }
      val validNote =
        if (pairValid) s"pair of record passed the in-run validity rule ($pairsSampled windows sampled)"
        else s"NO valid window in $pairsSampled samples — cleanest rejected pair shown, gate evidence UNUSABLE this run"
      val qErrNote = if (queryErrors == 0) "" else s" — **$queryErrors queries FAILED (see query_errors)**"
      val block =
        f"""$begin
*(regenerated by `graft.Bench` on every protocol run — these numbers ARE
`bench_summary.json` / the round's `BENCH_r{N}.json` `parsed.crawl`, not a
transcription)*

| Metric | Value |
|---|---|
| crawl mega-wave size | $urls%,d urls (after within-wave URL dedup) |
| throughput, local[8] (taskset 0-7) | **${tput8}%,.1f urls fetched+deduped/sec** ($secs8%.1f s) |
| throughput, local[32] (taskset 0-31) | **${tput32}%,.1f urls fetched+deduped/sec** ($secs32%.1f s) |
| raw scaling efficiency (8→32, ÷4) | **$eff%.3f** |
| pair validity | $validNote |
| pair's own-window binding ceiling (min of cpu/read-bw/write-bw probes) | $windowCeiling%.3f |
| **normalized, same-window** (raw ÷ pair's own binding ceiling, clamped at 1) | **$effWindow%.3f** |
| hw ceilings, cross-window maxima — compute / read-bw / write-bw | $hwCpu%.3f / $hwMem%.3f / $hwWrt%.3f |
| 20-query headline total, sf0.1 local[32] | **$queryTotal%.1f s**$qErrNote |
$end"""
      java.nio.file.Files.writeString(path,
        text.substring(0, i) + block + text.substring(j + end.length))
      System.err.println(s"[bench] synced headline block in $path")
    } catch { case e: Throwable =>
      System.err.println(s"[bench] ERROR: could not sync $path headline: $e")
    }
  }

  /** Multi-round history-growth evidence (VERDICT r2 item 6): the per-round
    * costs that scale with accumulated crawl history — seen-set probe, D2/D3
    * history anti-joins, snapshot delta unions — measured at round ≫ 1.
    * Runs `SPARK_GRAFT_GROWTH_ROUNDS` consecutive rounds (fresh URLs each
    * round, shared work dir, accumulating history) at 32 cores and reports
    * first-round vs last-round wall seconds. Skipped when rounds < 2. */
  private def growthJson: String = {
    // 48 × 20k (same total wall as r4's 24 × 40k): a longer horizon averages
    // the host weather out, exercises SIX compaction cycles
    // (compactEvery=8) — ≥5 cycles per VERDICT r4 Next #6 — and admits a
    // per-round REGRESSION SLOPE instead of a noisy two-endpoint ratio.
    val rounds = sys.env.getOrElse("SPARK_GRAFT_GROWTH_ROUNDS", "48").toInt
    val nPerRound = sys.env.getOrElse("SPARK_GRAFT_GROWTH_N", "20000").toInt
    if (rounds < 2) return ""
    val (secs, files, docsFiles, judgFiles) = growthBench(32, rounds, nPerRound)
    secs.zip(files).zipWithIndex.foreach { case ((s, f), i) =>
      System.err.println(f"[bench] growth round ${i + 1}: $s%.1f s, seen-scan files=$f") }
    // Weather-robust statistics over the STEADY rounds (compaction-trigger
    // rounds carry the amortized segment-fold work and are reported
    // separately — including them in a two-endpoint ratio misreads a
    // scheduled maintenance spike as growth): best-of-first-two vs
    // best-of-last-two, PLUS the OLS slope (sec/round; weather is zero-mean
    // across 24 rounds, so a flat structural cost shows slope ≈ 0).
    val compactEvery = graft.model.CrawlConfig().compactEvery
    val isCompact = (i: Int) => compactEvery > 0 && (i + 1) % compactEvery == 0
    val steady = secs.zipWithIndex.filterNot { case (_, i) => isCompact(i) }.map(_._1)
    val compactSecs = secs.zipWithIndex.filter { case (_, i) => isCompact(i) }.map(_._1)
    val early = steady.take(2).min
    val late = steady.takeRight(2).min
    // The first compaction cycle is an empty-history RAMP (round 1 scans no
    // seen/docs history at all), so late/early overstates growth; the
    // steady-state comparison starts after the first compaction has folded
    // that ramp into a base.
    val steadyPost = secs.zipWithIndex
      .filter { case (_, i) => i >= compactEvery && !isCompact(i) }.map(_._1)
    val earlyPost = (if (steadyPost.length >= 2) steadyPost.take(2) else steady.take(2)).min
    val n = steady.length
    val xbar = (n - 1) / 2.0
    val ybar = steady.sum / n
    val slope = steady.zipWithIndex.map { case (y, x) => (x - xbar) * (y - ybar) }.sum /
      steady.indices.map(x => (x - xbar) * (x - xbar)).sum
    // Theil–Sen estimator — median of all pairwise slopes. The OLS slope is
    // dominated by single weather spikes (one 3× round near an endpoint
    // swings it by whole percents of the mean); the median-of-slopes is the
    // standard robust alternative (up to ~29% outliers tolerated) and is the
    // number to read when the two disagree.
    val tsSlope = {
      val ys = steady.toArray
      val ps = for {
        j <- ys.indices.iterator
        i <- 0 until j
      } yield (ys(j) - ys(i)) / (j - i)
      val sorted = ps.toArray.sorted
      if (sorted.isEmpty) 0.0
      else if (sorted.length % 2 == 1) sorted(sorted.length / 2)
      else (sorted(sorted.length / 2 - 1) + sorted(sorted.length / 2)) / 2.0
    }
    val all = secs.map(s => f"$s%.2f").mkString("[", ",", "]")
    val fl = files.mkString("[", ",", "]")
    // Files-per-scan for ALL THREE history tables (VERDICT r4 Next #6): the
    // docs/judgments histories ride the same compaction cadence as seen; a
    // flat cycle in each is the structural no-unbounded-growth evidence.
    val dfl = docsFiles.mkString("[", ",", "]")
    val jfl = judgFiles.mkString("[", ",", "]")
    val cs = compactSecs.map(s => f"$s%.2f").mkString("[", ",", "]")
    f""","growth":{"rounds":$rounds,"n_per_round":$nPerRound,"secs_first":${secs.head}%.2f,"secs_last":${secs.last}%.2f,"secs_per_round":$all,"seen_scan_files":$fl,"docs_scan_files":$dfl,"judgments_scan_files":$jfl,"compact_every":$compactEvery,"compact_round_secs":$cs,"ratio_late_over_early":${late / early}%.3f,"ratio_late_over_steady":${late / earlyPost}%.3f,"slope_sec_per_round":$slope%.4f,"slope_pct_of_mean":${100.0 * slope / ybar}%.2f,"slope_theil_sen_sec_per_round":$tsSlope%.4f,"slope_theil_sen_pct_of_mean":${100.0 * tsSlope / ybar}%.2f}"""
  }

  /** Run `rounds` consecutive crawl rounds in ONE work dir so history
    * (seen set, docs hash frames, snapshot deltas) accumulates; each round's
    * frontier is a fresh, disjoint slice of the mega-frontier. Compaction
    * runs on the CrawlConfig default cadence. Returns per-round (wall
    * seconds, seen / docs / judgments files-per-scan). */
  private[graft] def growthBench(cpus: Int, rounds: Int, nPerRound: Int)
      : (Seq[Double], Seq[Long], Seq[Long], Seq[Long]) = {
    val spark = newSession(cpus)
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // pagesPerQuery = rounds so every round can fetch a FRESH page of
    // listings per (court, query): pdf-only growth waves left the judgments
    // history vacuously empty (judgments_scan_files all zero through r4's
    // artifact) — with 32 listing fetches per round the judgments table
    // accrues real deltas and rides the same compaction cadence as seen/docs.
    val synthCfg = SynthConfig(
      courts = 4, queriesPerCourt = 8, pagesPerQuery = math.max(4, rounds),
      rowsPerPage = math.max(1, nPerRound / (4 * 8)), failRate = 0.0)
    def listings(page: Int) =
      graft.sources.Synth.listingEntries(synthCfg, page).toDS().toDF()
        .withColumn("canonical_url", graft.functions.Urls.canonicalize($"url"))
        .withColumn("url_hash", graft.functions.Urls.urlHash($"canonical_url"))
        .select(spark.emptyDataset[graft.model.FrontierEntry].columns.map(col): _*)
        .as[graft.model.FrontierEntry]
    val cfg = CrawlConfig(
      budgetPerHost = Int.MaxValue / 2, maxRetries = 3,
      numPartitions = cpus * 4, saltMax = 64)
    val workDir = java.nio.file.Files.createTempDirectory(tmpRoot, s"graft-growth-$cpus").toString
    // warmup round in a scratch dir (JIT/codegen, untimed; listings included
    // so the listing-parse + judgments-write path is warm too)
    val warmDir = java.nio.file.Files.createTempDirectory(tmpRoot, "graft-growth-warm").toString
    Crawler.runRound(spark, cfg, synthCfg, warmDir, 1,
      megaFrontier(spark, synthCfg, 4096, cpus).union(listings(1)))
    // frontier slices enter each round from parquet (see crawlBench note);
    // per-round slices prune on the priority column's min/max stats
    val frontierPath = s"$workDir/frontier_input"
    megaFrontier(spark, synthCfg, nPerRound * rounds, cpus)
      .write.parquet(frontierPath)
    val all = spark.read.parquet(frontierPath).as[graft.model.FrontierEntry]
    val out = (1 to rounds).map { r =>
      val slice = all.filter(col("priority") >= (r - 1).toLong * nPerRound &&
        col("priority") < r.toLong * nPerRound).union(listings(r))
      val t0 = System.nanoTime()
      Crawler.runRound(spark, cfg, synthCfg, workDir, r, slice)
      val secs = (System.nanoTime() - t0) / 1e9
      (secs,
        graft.sources.Snapshots.scanFileCount(workDir, Crawler.SeenTable),
        graft.sources.Snapshots.scanFileCount(workDir, Crawler.DocsTable),
        graft.sources.Snapshots.scanFileCount(workDir, Crawler.JudgmentsTable))
    }
    spark.stop()
    Seq(workDir, warmDir).foreach(cleanupDir)
    (out.map(_._1), out.map(_._2), out.map(_._3), out.map(_._4))
  }

  /** Best-effort bench scratch cleanup — failure is non-fatal but LOUD (a
    * silently full /dev/shm degrades every later window in the run). */
  private def cleanupDir(d: String): Unit =
    try {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(java.nio.file.Paths.get(d)).iterator.asScala
        .toSeq.reverse.foreach(java.nio.file.Files.deleteIfExists(_))
    } catch { case e: Throwable =>
      System.err.println(s"[bench] WARNING: could not clean scratch $d: $e")
    }

  /** The LCG probe in a taskset-confined subprocess (same confinement as the
    * crawl levels). Returns total iters/sec. */
  private def lcgIsolated(cpus: Int): Double =
    probeIsolated(cpus, "graft.tools.LcgProbe", "LCG", "1g")

  /** The memory-bandwidth probe (STREAM-like read sweep, [[tools.MemProbe]]),
    * taskset-confined. Returns total GB/s. The crawl's dominant work (row
    * encode/decode, parquet, shuffle, GC copying) is memory-traffic-bound,
    * and this VM's memory controllers are shared across active cores — the
    * measured 8→32 bandwidth step is ~2.1× (ceiling ≈ 0.53 on the 4×
    * efficiency metric), even lower than the register-only LCG step. A real
    * N→4N executor step adds whole nodes with their own memory systems. */
  private def memIsolated(cpus: Int): Double =
    probeIsolated(cpus, "graft.tools.MemProbe", "MEM", "6g")

  private def writeIsolated(cpus: Int): Double =
    probeIsolated(cpus, "graft.tools.WriteProbe", "WRT", "2g")

  private def probeIsolated(cpus: Int, mainCls: String, tag: String, mem: String): Double = {
    val java = System.getProperty("java.home") + "/bin/java"
    val cp = System.getProperty("java.class.path")
    val cmd = Seq("taskset", "-c", s"0-${cpus - 1}", java, s"-Xmx$mem",
      "-cp", cp, mainCls, cpus.toString)
    val pb = new ProcessBuilder(cmd: _*).redirectErrorStream(true)
    val proc = pb.start()
    val out = new String(proc.getInputStream.readAllBytes())
    proc.waitFor()
    out.linesIterator.find(_.startsWith(tag)).map(_.split("=")(1).toDouble)
      .getOrElse(throw new IllegalStateException(s"no $tag line: ${out.takeRight(500)}"))
  }
}
