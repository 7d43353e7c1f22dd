package graft.plans

import graft.functions.Urls
import graft.model._
import graft.operators.{Dedup, Politeness, Sched, SeenSet, Segregate}
import graft.sources.{Snapshots, Synth, SynthConfig}

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** One fetch-event discovery joined with the parent entry's ordering state. */
final case class RawDiscovery(
    parent_priority: Long,
    parent_court: String,
    parent_query: String,
    parent_page: Int,
    url: String,
    court: String,
    query: String,
    page: Int,
    depth: Int,
    priority: Long,
    case_number: String,
    title: String,
    date: String,
    rank: Int)

final case class RoundReport(
    round: Int,
    scheduled: Long,
    fetched_ok: Long,
    fetch_failed: Long,
    dup_url: Long,
    deferred: Long,
    new_docs: Long,
    dup_docs: Long,
    new_judgments: Long,
    merge_requests: Long,
    new_paragraphs: Long)

/** The crawl driver loop — the Spark re-architecture of the reference's
  * `search_and_scrape → extract → process → segregate → merge` pipeline
  * (`/root/reference/paracurate.py:96-110`), as an iterative batch fold over a
  * `Dataset[FrontierEntry]` (SURVEY.md §3.1, §7).
  *
  * Per round:
  *  1. D1 URL dedup of the pending frontier via bloom+cuckoo+exact
  *     ([[SeenSet.filterNovel]]);
  *  2. politeness scheduling: salted host buckets + bounded per-bucket
  *     priority queues ([[Politeness.schedule]]) — overflow is *deferred*, not
  *     dropped;
  *  3. deterministic fetch ([[Politeness.fetchAll]]); transient failures are
  *     re-enqueued with `retry_count+1` up to `maxRetries`
  *     (reference retry loop, `src/extractors/adobe.py:111-138`);
  *  4. discoveries → new frontier entries (canonicalized/hashed in one
  *     columnar pass); listing rows → judgment metadata with D1 case/URL
  *     routing (drop same-case, merge-request same-URL-different-case,
  *     `search_and_scrape.py:52-94`);
  *  5. fetched PDFs → docs; D2 staged content dedup + D3 chained rendering
  *     dedup vs within-round and historical hashes ([[Dedup]]);
  *  6. kept docs → paragraph segregation + sentence/word filter ([[Segregate]]);
  *  7. snapshot commit (frontier rewrite + per-table deltas + per-partition
  *     metrics manifest) — crash-resumable at round granularity
  *     ([[Snapshots]]), then cuckoo-filter update.
  *
  * Every keep-first order is an explicit total order (priority, url) so the
  * whole crawl — fetch order, final seen set, kept docs — is invariant to
  * partition count and parallelism (CrawlSpec asserts local[2] ≡ local[8+]).
  */
object Crawler {

  val FrontierTable = "frontier"
  val SeenTable = "seen"
  val DocsTable = "docs"
  val ContentHashTable = "content_hashes"
  val RenderHashTable = "render_hashes"
  val JudgmentsTable = "judgments"
  val MergeRequestsTable = "merge_requests"
  val ParagraphsTable = "paragraphs"
  val MetricsTable = "metrics"
  val FetchLogTable = "fetch_log"

  def filterDir(workDir: String): String = s"$workDir/filters"

  private def emptyFrontier(spark: SparkSession): Dataset[FrontierEntry] = {
    import spark.implicits._
    spark.emptyDataset[FrontierEntry]
  }

  /** Seen table across all committed rounds (exact side of D1). */
  def seenAll(spark: SparkSession, workDir: String): DataFrame =
    Snapshots.readDeltas(spark, workDir, SeenTable)
      .getOrElse(spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("url_hash", org.apache.spark.sql.types.LongType),
          org.apache.spark.sql.types.StructField("canonical_url", org.apache.spark.sql.types.StringType)))))

  /** Run (or resume) the crawl until the frontier drains or maxRounds. */
  def run(
      spark: SparkSession,
      cfg: CrawlConfig,
      synthCfg: SynthConfig,
      workDir: String,
      maxRounds: Int = 64): Seq[RoundReport] = {
    import spark.implicits._

    val startRound = Snapshots.latestRound(workDir).map(_ + 1).getOrElse(1)
    if (startRound > 1) {
      // resume: filters may be stale or ahead — rebuild from the exact table
      // (the table is the source of truth; reference analog preprocess.py:290-356)
      SeenSet.rebuildFilters(seenAll(spark, workDir), filterDir(workDir))
    }
    var frontier: Dataset[FrontierEntry] =
      Snapshots.readLatest(spark, workDir, FrontierTable)
        .map(_.as[FrontierEntry])
        .getOrElse {
          // seeds go through the same canonicalize/hash pass as discoveries
          Synth.seedEntries(synthCfg).toDS().toDF()
            .withColumn("canonical_url", Urls.canonicalize($"url"))
            .withColumn("url_hash", Urls.urlHash($"canonical_url"))
            .withColumn("host", Urls.host($"url"))
            .select(spark.emptyDataset[FrontierEntry].columns.map(col): _*)
            .as[FrontierEntry]
        }

    val reports = Seq.newBuilder[RoundReport]
    var round = startRound
    var continue = true
    while (continue && round < startRound + maxRounds) {
      frontier.persist()
      val n = frontier.count()
      if (n == 0) { continue = false; frontier.unpersist() }
      else {
        val (report, next) = runRound(spark, cfg, synthCfg, workDir, round, frontier)
        reports += report
        frontier.unpersist()
        frontier = next
        round += 1
      }
    }
    reports.result()
  }

  /** One crawl round. Returns (report, next frontier). */
  def runRound(
      spark: SparkSession,
      cfg: CrawlConfig,
      synthCfg: SynthConfig,
      workDir: String,
      round: Int,
      frontier: Dataset[FrontierEntry]): (RoundReport, Dataset[FrontierEntry]) = {
    import spark.implicits._

    val seen = seenAll(spark, workDir)

    // within-frontier keep-first per canonical URL (deferred entries can
    // coexist with re-discoveries of the same URL; the reference's D1 dedups
    // within batch as well — two entries per URL would double-fetch)
    val wFrontier = Window.partitionBy($"canonical_url").orderBy($"priority", $"url")
    val pending = frontier.toDF()
      .withColumn("__rn", row_number().over(wFrontier))
      .filter($"__rn" === 1).drop("__rn")

    // ---- D1: URL-seen dedup (bloom → cuckoo → exact) ----
    val (novelDF, dupDF) = SeenSet.filterNovel(pending, seen, filterDir(workDir))
    val novel = novelDF.select(frontier.columns.map(col): _*).as[FrontierEntry]
    val dupUrlCount = dupDF.count()

    // ---- politeness scheduling + fetch ----
    val sched = Politeness.schedule(novel, cfg).persist()
    val deferred = sched.filter(!_.scheduled).map(_.entry.copy(status = "pending"))
    val events = Politeness.fetchAll(sched, synthCfg)
      .withColumn("partition_id", spark_partition_id())
      .persist()

    val okEvents = events.filter($"status" === "ok")
    val failedEvents = events.filter($"status" =!= "ok")

    // per-partition / per-host lineage metrics (north rule)
    val metrics = events.groupBy($"partition_id", $"entry.host".as("host"))
      .agg(
        count(when($"status" === "ok", 1)).as("fetched"),
        count(when($"status" =!= "ok", 1)).as("failed"),
        sum($"bytes").as("bytes"),
        sum($"latencyMicros").as("latency_micros"))
      .withColumn("round", lit(round))

    // retries: transient failures re-enqueued up to maxRetries (C3)
    val retries = failedEvents.select($"entry.*")
      .as[FrontierEntry]
      .filter(_.retry_count + 1 < cfg.maxRetries)
      .map(e => e.copy(retry_count = e.retry_count + 1, status = "pending"))

    // newly seen URLs: everything successfully fetched this round
    val seenDelta = okEvents
      .select($"entry.url_hash".as("url_hash"), $"entry.canonical_url".as("canonical_url"))
      .distinct()

    // ---- discoveries → next frontier + judgment metadata ----
    val discovered: Dataset[RawDiscovery] = okEvents
      .select($"entry.priority".as("parent_priority"), $"entry.court".as("parent_court"),
        $"entry.query".as("parent_query"), $"entry.page".as("parent_page"), $"discovered")
      .as[(Long, String, String, Int, Seq[Synth.Discovered])]
      .flatMap { case (pprio, pcourt, pquery, ppage, ds) =>
        ds.map(d => RawDiscovery(pprio, pcourt, pquery, ppage, d.url, d.court, d.query,
          d.page, d.depth, d.priority, d.caseNumber, d.title, d.date, d.rank))
      }

    val discoveredDF = discovered.toDF()
      .withColumn("priority",
        when($"priority" === -1L,
          // inherit the parent's total order, bump the depth byte (Synth doc)
          $"parent_priority".bitwiseAND(lit(~0xFFL)) + $"depth")
          .otherwise($"priority"))
      .withColumn("court", coalesce($"court", $"parent_court"))
      .withColumn("query", coalesce($"query", $"parent_query"))
      .withColumn("page", when($"page" === -1, $"parent_page").otherwise($"page"))
      .withColumn("canonical_url", Urls.canonicalize($"url"))
      .withColumn("url_hash", Urls.urlHash($"canonical_url"))
      .withColumn("host", Urls.host($"url"))
      .persist()

    // judgment rows (listing discoveries carry case metadata)
    val judgRaw = discoveredDF.filter($"case_number".isNotNull)
      .select($"court", $"query", $"page", $"rank", $"case_number", $"title", $"date",
        $"url".as("document_href"), $"canonical_url", $"url_hash", $"priority")

    // D1-case routing (search_and_scrape.py:52-94):
    //   same case_number (in batch or history)        → drop
    //   novel case but same canonical URL             → merge request
    //   else                                          → kept judgment
    val caseSeen = Snapshots.readDeltas(spark, workDir, JudgmentsTable)
      .map(_.select("case_number").distinct())
    val wCase = Window.partitionBy($"case_number").orderBy($"priority", $"canonical_url")
    val caseFirst = judgRaw.withColumn("__rn", row_number().over(wCase))
      .filter($"__rn" === 1).drop("__rn")
    val caseNovel = caseSeen match {
      case Some(cs) => caseFirst.join(cs, Seq("case_number"), "left_anti")
      case None     => caseFirst
    }
    // URL uniqueness among case-novel judgments: first case per URL wins; the
    // rest become merge requests (routed to the kept judgment's URL). History:
    // a URL already in the seen set or judgments table also routes to merge.
    val wUrl = Window.partitionBy($"canonical_url").orderBy($"priority", $"case_number")
    val urlRanked = caseNovel.withColumn("__rn", row_number().over(wUrl))
    val urlFirst = urlRanked.filter($"__rn" === 1).drop("__rn")
    val urlDupBatch = urlRanked.filter($"__rn" > 1).drop("__rn")
    val judgSeenUrls = Snapshots.readDeltas(spark, workDir, JudgmentsTable)
      .map(_.select("canonical_url").distinct())
    val (judgKept, urlDupHist) = judgSeenUrls match {
      case Some(su) =>
        (urlFirst.join(su, Seq("canonical_url"), "left_anti"),
          urlFirst.join(su, Seq("canonical_url"), "left_semi"))
      case None => (urlFirst, urlFirst.limit(0))
    }
    val mergeRequests = urlDupBatch.unionByName(urlDupHist)
      .withColumn("round", lit(round))
    val judgmentsDelta = judgKept.withColumn("round", lit(round)).persist()

    // next-frontier candidates: kept judgments' hrefs + non-judgment
    // discoveries (next listing pages, resolved pdf urls)
    val frontierCols = Seq("url", "canonical_url", "url_hash", "host", "court",
      "query", "page", "depth", "priority", "status", "retry_count", "discovered_round")
    val fromJudg = judgmentsDelta
      .select($"document_href".as("url"), $"canonical_url", $"url_hash", $"court",
        $"query", $"page", $"priority")
      .withColumn("host", Urls.host($"url"))
      .withColumn("depth", lit(1))
    val fromOther = discoveredDF.filter($"case_number".isNull)
      .select($"url", $"canonical_url", $"url_hash", $"court", $"query", $"page",
        $"priority", $"host", $"depth")
    val newEntries = fromJudg.unionByName(fromOther)
      .withColumn("status", lit("pending"))
      .withColumn("retry_count", lit(0))
      .withColumn("discovered_round", lit(round))
      .select(frontierCols.map(col): _*)

    // within-round frontier dedup: keep-first per canonical URL (total order)
    val wFront = Window.partitionBy($"canonical_url").orderBy($"priority", $"url")
    val nextNew = newEntries.withColumn("__rn", row_number().over(wFront))
      .filter($"__rn" === 1).drop("__rn").as[FrontierEntry]

    val nextFrontier = deferred.unionByName(retries).unionByName(nextNew)

    // ---- docs: D2 + D3 + segregation ----
    val docsRaw = okEvents.filter($"doc".isNotNull)
      .select($"doc.doc_id".as("doc_id"), $"doc.spans".as("spans"),
        $"entry.priority".as("priority"), $"entry.court".as("court"))
    val hashed = Dedup.withStagedHashes(docsRaw)
    val contentHist = Snapshots.readDeltas(spark, workDir, ContentHashTable)
    val arrival = Seq($"priority", $"doc_id")
    val (d2Kept, d2Dupes) = Dedup.contentDedup(hashed, contentHist, arrival)
    val renderHist = Snapshots.readDeltas(spark, workDir, RenderHashTable)
    val (d3Kept, d3Dupes) = Dedup.renderingDedup(
      d2Kept, Segregate.RenderingNames, renderHist, arrival)
    val docsDelta = d3Kept.withColumn("round", lit(round)).persist()

    val contentHashDelta = docsDelta.select($"sz", $"prefix_hash", $"content_hash")
      .withColumn("round", lit(round))
    val renderHashDelta = Segregate.RenderingNames
      .map(r => docsDelta.select(
        lit(r).as("rendering"),
        xxhash64(Segregate.rendering(r, $"spans")).as("render_hash")))
      .reduce(_.unionByName(_))
      .withColumn("round", lit(round))

    val paras = Segregate.sentCountFilter(
      Segregate.paragraphs(docsDelta.select($"doc_id", $"spans").as[Doc]).toDF())
      .withColumn("round", lit(round))

    // ---- snapshot commit ----
    val dupDocsCount = d2Dupes.count() + d3Dupes.count()
    val report = RoundReport(
      round = round,
      scheduled = sched.filter(_.scheduled).count(),
      fetched_ok = okEvents.count(),
      fetch_failed = failedEvents.count(),
      dup_url = dupUrlCount,
      deferred = deferred.count(),
      new_docs = docsDelta.count(),
      dup_docs = dupDocsCount,
      new_judgments = judgmentsDelta.count(),
      merge_requests = mergeRequests.count(),
      new_paragraphs = paras.count())

    Snapshots.commit(workDir, round,
      Map(
        FrontierTable -> nextFrontier.toDF(),
        SeenTable -> seenDelta,
        DocsTable -> docsDelta.drop("priority"),
        ContentHashTable -> contentHashDelta,
        RenderHashTable -> renderHashDelta,
        JudgmentsTable -> judgmentsDelta.drop("priority"),
        MergeRequestsTable -> mergeRequests.drop("priority"),
        ParagraphsTable -> paras,
        MetricsTable -> metrics,
        // crawl-order evidence: the per-bucket fetch sequence (north rule —
        // ordering must match the sequential oracle; asserted in CrawlSpec)
        FetchLogTable -> events.select(
          lit(round).as("round"), $"entry.host".as("host"), $"salt", $"fetchSeq",
          $"entry.canonical_url".as("canonical_url"),
          $"entry.url_hash".as("url_hash"), $"status", $"kind")),
      lineage = Map(
        "report" ->
          s"""{"scheduled": ${report.scheduled}, "ok": ${report.fetched_ok}, "failed": ${report.fetch_failed}, "dup_url": ${report.dup_url}, "deferred": ${report.deferred}}"""))

    // bloom + cuckoo filters track the just-committed seen delta
    val committedSeenDelta =
      spark.read.parquet(Snapshots.tablePath(workDir, round, SeenTable))
    SeenSet.addToFilters(committedSeenDelta, filterDir(workDir))
    SeenSet.addToBloom(committedSeenDelta, filterDir(workDir))

    val committedFrontier = spark.read
      .parquet(Snapshots.tablePath(workDir, round, FrontierTable)).as[FrontierEntry]

    sched.unpersist(); events.unpersist(); discoveredDF.unpersist()
    judgmentsDelta.unpersist(); docsDelta.unpersist()
    (report, committedFrontier)
  }

  /** A1-A3 merge postprocess (`/root/reference/src/pipeline/postprocess.py:28-99`):
    * cluster merge requests onto the kept judgment by canonical URL and
    * promote clashing scalars to sorted arrays (the reference's
    * scalar→list widening, `utils.as_list`). */
  def mergedJudgments(spark: SparkSession, workDir: String): DataFrame = {
    val judgments = Snapshots.readDeltas(spark, workDir, JudgmentsTable).get
    val merges = Snapshots.readDeltas(spark, workDir, MergeRequestsTable)
      .getOrElse(judgments.limit(0))
    val all = judgments.select("canonical_url", "case_number", "title", "date")
      .unionByName(merges.select("canonical_url", "case_number", "title", "date"))
    all.groupBy(col("canonical_url"))
      .agg(
        array_sort(collect_set(col("case_number"))).as("case_numbers"),
        array_sort(collect_set(col("title"))).as("titles"),
        array_sort(collect_set(col("date"))).as("dates"),
        count(lit(1)).as("n_merged"))
  }
}
