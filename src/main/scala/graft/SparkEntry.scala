package graft

import graft.functions.{TextFunctions => TF, Urls}
import graft.model.Doc
import graft.operators.{Dedup, Multimodal, Segregate, Similarity}
import graft.sources.{Synth, SynthConfig}

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Driver contract — one `queries` entry per operator family (SURVEY.md §2),
  * with a DuckDB oracle for every SQL-expressible one (`oracleSql`). Column
  * names are aligned 1:1 between the Spark plan and the oracle SQL; float
  * aggregates are computed exactly in decimal and cast to double at the end
  * so both engines produce bit-identical values.
  */
object SparkEntry {

  private def t(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** Synthetic interleaved-span docs (the input-hint shape) — deterministic,
    * derived per-row from Synth arithmetic; used by span/crawl operators that
    * have no parquet counterpart for the oracle. */
  private def synthDocs(spark: SparkSession, n: Int = 200): DataFrame = {
    import spark.implicits._
    val cfg = SynthConfig()
    spark.range(n.toLong).as[Long]
      .map(i => Doc(s"SYN/$i", Synth.spansOf(cfg, i)))
      .toDF("doc_id", "spans")
  }

  /** Flagship query on sf=0.001 (driver smoke-checks rows>0): the A4 stats
    * rollup (`get_data_stats.py:45-105` analog) on orders. */
  def entry(spark: SparkSession): DataFrame =
    queries("q_stats_rollup")(spark, "/root/testdata/sf0.001")

  // exact-in-decimal, double-out aggregation helper
  private def dsum(c: Column): Column = sum(c.cast("decimal(18,2)")).cast("double")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // ---- A4 / aggregation family ----
    "q_pricing_summary" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .filter(col("l_shipdate") <= lit("1998-09-01").cast("timestamp"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          dsum(col("l_quantity")).as("sum_qty"),
          dsum(col("l_extendedprice")).as("sum_base_price"),
          sum(col("l_extendedprice").cast("decimal(18,2)") *
            (lit(1).cast("decimal(18,2)") - col("l_discount").cast("decimal(18,2)")))
            .cast("double").as("sum_disc_price"),
          count(lit(1)).as("count_order"),
          countDistinct(col("l_orderkey")).as("n_orders"))
    }),

    "q_stats_rollup" -> ((s, dir) => {
      t(s, dir, "orders")
        .rollup(col("o_orderpriority"), col("o_orderstatus"))
        .agg(
          count(lit(1)).as("n_orders"),
          dsum(col("o_totalprice")).as("sum_price"),
          max(col("o_totalprice")).as("max_price"),
          countDistinct(col("o_custkey")).as("n_customers"))
    }),

    "q_daily_rollup" -> ((s, dir) => {
      t(s, dir, "events")
        .groupBy(date_trunc("DAY", col("ts")).cast("date").as("day"),
          col("event_type"))
        .agg(count(lit(1)).as("n_events"),
          dsum(col("value")).as("sum_value"))
    }),

    // ---- joins (broadcast-able dims; D1 anti/semi shapes) ----
    "q_top_revenue" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
      val o = t(s, dir, "orders")
      val c = t(s, dir, "customer")
      li.join(o, li("l_orderkey") === o("o_orderkey"))
        .join(broadcast(c), o("o_custkey") === c("c_custkey"))
        .groupBy(col("c_custkey"), col("c_name"))
        .agg(sum(col("l_extendedprice").cast("decimal(18,2)") *
          (lit(1).cast("decimal(18,2)") - col("l_discount").cast("decimal(18,2)")))
          .cast("double").as("revenue"))
        .orderBy(col("revenue").desc, col("c_custkey"))
        .limit(10)
    }),

    "q_anti_join" -> ((s, dir) => {
      // L4 validation shape: customers with no open ('O') orders
      val c = t(s, dir, "customer")
      val o = t(s, dir, "orders").filter(col("o_orderstatus") === "O")
      c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
        .select(col("c_custkey"), col("c_name"))
    }),

    "q_semi_join" -> ((s, dir) => {
      val o = t(s, dir, "orders")
      val li = t(s, dir, "lineitem").filter(col("l_quantity") >= 45)
      o.join(li, o("o_orderkey") === li("l_orderkey"), "left_semi")
        .select(col("o_orderkey"), col("o_totalprice"))
    }),

    // ---- dedup family ----
    "q_keepfirst" -> ((s, dir) => {
      // L5 keep-first distinct: first doc per (lang, source) by doc_id —
      // row_number, NOT dropDuplicates (deterministic survivor)
      val w = Window.partitionBy(col("lang"), col("source")).orderBy(col("doc_id"))
      t(s, dir, "documents")
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("doc_id"), col("lang"), col("source"))
    }),

    "q_dedup_exact" -> ((s, dir) => {
      // D2 exact-content dedup shape: per distinct text, survivor + copies
      t(s, dir, "documents")
        .groupBy(col("text"))
        .agg(min(col("doc_id")).as("keeper"), count(lit(1)).as("copies"))
        .select(col("keeper"), col("copies"))
    }),

    "q_merge_multimap" -> ((s, dir) => {
      // A1 multimap union: per user, sorted distinct event types
      t(s, dir, "events")
        .groupBy(col("user_id"))
        .agg(
          array_join(array_sort(collect_set(col("event_type"))), ",").as("types"),
          count(lit(1)).as("n_events"))
    }),

    // ---- window family (W1-W3 relational analogs) ----
    "q_window_running" -> ((s, dir) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      t(s, dir, "events")
        .withColumn("seq", row_number().over(w))
        .withColumn("running_events",
          count(lit(1)).over(w.rowsBetween(Window.unboundedPreceding, 0)))
        .select(col("event_id"), col("user_id"), col("seq"), col("running_events"))
    }),

    "q_sessionize" -> ((s, dir) => {
      // session id = running count of >30-min gaps (the reference's
      // running-sum-of-markers pattern, W2)
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      t(s, dir, "events")
        .withColumn("prev_ts", lag(col("ts"), 1).over(w))
        .withColumn("gap",
          when(col("prev_ts").isNull, lit(1))
            .when(unix_timestamp(col("ts")) - unix_timestamp(col("prev_ts")) > 1800, lit(1))
            .otherwise(lit(0)))
        .withColumn("session_id",
          sum(col("gap")).over(w.rowsBetween(Window.unboundedPreceding, 0)))
        .select(col("event_id"), col("user_id"), col("session_id"))
    }),

    "q_rank_in_order" -> ((s, dir) => {
      val w = Window.partitionBy(col("l_orderkey"))
        .orderBy(col("l_shipdate"), col("l_linenumber"))
      t(s, dir, "lineitem")
        .withColumn("ship_rank", row_number().over(w))
        .select(col("l_orderkey"), col("l_linenumber"), col("ship_rank"))
    }),

    // ---- projections / scalar functions (P1-P4, P7) ----
    "q_url_canonicalize" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
        .withColumn("url",
          concat(lit("https://"), col("source"), lit(".example.org/doc/"),
            col("doc_id"), lit("?ID="), col("n_chars")))
      docs.select(
        col("doc_id"),
        col("url"),
        Urls.canonicalize(col("url")).as("canonical_url"),
        Urls.host(col("url")).as("host"))
    }),

    "q_date_format" -> ((s, dir) => {
      t(s, dir, "orders")
        .select(col("o_orderkey"),
          date_format(col("o_orderdate"), "dd-MM-yyyy").as("formatted_date"))
    }),

    "q_json_extract" -> ((s, dir) => {
      t(s, dir, "events")
        .select(col("event_id"),
          get_json_object(col("props"), "$.k").cast("int").as("k"))
    }),

    "q_token_stats" -> ((s, dir) => {
      val d = t(s, dir, "documents")
      d.select(
        col("doc_id"),
        TF.tokenCountFast(col("text")).as("n_tokens"),
        length(col("text")).as("n_chars_actual"),
        TF.punctCount(col("text")).as("n_punct"),
        TF.digitCount(col("text")).as("n_digits"))
    }),

    "q_quality" -> ((s, dir) => {
      val d = t(s, dir, "documents")
      d.select(
        col("doc_id"),
        TF.tokenCountFast(col("text")).as("n_tokens"),
        TF.stopwordCount(col("text")).as("n_stopwords"),
        TF.qualityKeep(col("text")).as("keep"))
    }),

    "q_lang_stats" -> ((s, dir) => {
      t(s, dir, "documents")
        .groupBy(col("lang"))
        .agg(
          count(lit(1)).as("n_docs"),
          sum(col("n_chars")).as("sum_chars"),
          min(col("n_chars")).as("min_chars"),
          max(col("n_chars")).as("max_chars"))
    }),

    "q_grouping_sets" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .cube(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n"), dsum(col("l_quantity")).as("sum_qty"))
    }),

    // ---- text-dedup sketches (Spark-only: hash functions differ by engine) ----
    "q_minhash_candidates" -> ((s, dir) => {
      val d = t(s, dir, "documents")
      val pairs = Similarity.minhashNearDupPairs(d, "doc_id", "text",
        shingleK = 3, numHashes = 32, bands = 16, threshold = 0.25)
      // per-doc candidate count (left join keeps all docs → rows>0 always)
      d.select(col("doc_id"))
        .join(pairs.groupBy(col("id_a").as("doc_id"))
          .agg(count(lit(1)).as("n_candidates")), Seq("doc_id"), "left")
        .withColumn("n_candidates", coalesce(col("n_candidates"), lit(0L)))
    }),

    "q_simhash" -> ((s, dir) => {
      t(s, dir, "documents")
        .select(col("doc_id"), TF.simhash64(col("text")).as("simhash"))
        .withColumn("bucket", shiftrightunsigned(col("simhash"), 52))
    }),

    "q_ngram_jaccard" -> ((s, dir) => {
      // exact 3-gram jaccard of each doc vs the next doc in id order —
      // a deterministic pair sample exercising the verification kernel
      val d = t(s, dir, "documents")
      val a = d.select(col("doc_id").as("id_a"), col("text").as("text_a"))
      val b = d.select((col("doc_id") - 1).as("id_a"), col("text").as("text_b"))
      a.join(b, "id_a")
        .select(col("id_a").as("doc_id"),
          TF.ngramJaccard(col("text_a"), col("text_b"), 3).as("jaccard_next"))
    }),

    "q_fingerprint" -> ((s, dir) => {
      t(s, dir, "documents")
        .select(col("doc_id"),
          TF.fingerprint(col("text"), 5, 8).as("fp"))
        .select(col("doc_id"), size(col("fp")).as("fp_size"),
          element_at(col("fp"), 1).as("fp_min"))
    }),

    "q_lang_id" -> ((s, dir) => {
      val d = t(s, dir, "documents")
      d.select(col("doc_id"), col("lang"),
        TF.langId(col("text")).as("predicted_lang"))
    }),

    // ---- similarity search ----
    "q_ann_bruteforce" -> ((s, dir) => {
      val e = t(s, dir, "embeddings")
      val q = e.filter(col("vec_id") < 10)
      Similarity.bruteForceTopK(e, q, "vec_id", "embedding", k = 5)
        .select(col("query_id"), col("corpus_id"), col("rank"))
    }),

    "q_ann_srp" -> ((s, dir) => {
      val e = t(s, dir, "embeddings")
      val q = e.filter(col("vec_id") < 10)
      Similarity.srpTopK(e, q, "vec_id", "embedding", dim = 64, planes = 4, k = 5)
        .select(col("query_id"), col("corpus_id"), col("rank"))
    }),

    "q_embedding_norms" -> ((s, dir) => {
      t(s, dir, "embeddings")
        .select(col("vec_id"), col("label"),
          TF.l2norm(col("embedding")).as("l2"),
          size(col("embedding")).as("dim"))
        .select(col("vec_id"), col("label"), col("dim"),
          (col("l2") > 0).as("nonzero"))
    }),

    // ---- interleaved-span operators (input-hint shape; Spark-only) ----
    "q_span_render" -> ((s, dir) => {
      synthDocs(s).select(col("doc_id"),
        length(Segregate.renderPlain(col("spans"))).as("plain_len"),
        length(Segregate.renderNoDigits(col("spans"))).as("nodigits_len"),
        length(Segregate.renderMarked(col("spans"))).as("marked_len"))
    }),

    "q_segregate" -> ((s, dir) => {
      import s.implicits._
      Segregate.paragraphs(synthDocs(s).as[Doc]).toDF()
    }),

    "q_rendering_dedup" -> ((s, dir) => {
      val docs = synthDocs(s)
      val hashed = Dedup.withStagedHashes(docs)
      val kept = Dedup.contentDedup(hashed, None, Seq(col("doc_id")))
      val survivors = Dedup.renderingDedup(
        kept, Segregate.RenderingNames, None, Seq(col("doc_id")))
      survivors.select(col("doc_id"), col("sz"), col("content_hash"))
    }),

    "q_media_features" -> ((s, dir) => {
      val media = Multimodal.mediaTable(synthDocs(s))
      Multimodal.decodeFeatures(media, partitions = 8)
        .select(col("doc_id"), col("media_ref"), col("width"), col("height"),
          size(col("feature")).as("feat_dim"))
    }),

    "q_frame_sample" -> ((s, dir) => {
      Multimodal.sampleFrames(Multimodal.mediaTable(synthDocs(s)), 4, 30)
    })
  )

  /** DuckDB-equivalent SQL per query (same column names; same
    * exact-decimal-then-double arithmetic). Spark-only entries (hash
    * sketches, span operators) are intentionally absent → rows-only check. */
  def oracleSql: Map[String, String] = Map(
    "q_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
        |  COUNT(*) AS count_order,
        |  COUNT(DISTINCT l_orderkey) AS n_orders
        |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-01'
        |GROUP BY l_returnflag, l_linestatus""".stripMargin,

    "q_stats_rollup" ->
      """SELECT o_orderpriority, o_orderstatus,
        |  COUNT(*) AS n_orders,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
        |  MAX(o_totalprice) AS max_price,
        |  COUNT(DISTINCT o_custkey) AS n_customers
        |FROM orders GROUP BY ROLLUP(o_orderpriority, o_orderstatus)""".stripMargin,

    "q_daily_rollup" ->
      """SELECT CAST(date_trunc('day', ts) AS DATE) AS day, event_type,
        |  COUNT(*) AS n_events,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM events GROUP BY 1, 2""".stripMargin,

    "q_top_revenue" ->
      """SELECT c_custkey, c_name,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_custkey, c_name
        |ORDER BY revenue DESC, c_custkey LIMIT 10""".stripMargin,

    "q_anti_join" ->
      """SELECT c_custkey, c_name FROM customer c
        |WHERE NOT EXISTS (SELECT 1 FROM orders o
        |  WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'O')""".stripMargin,

    "q_semi_join" ->
      """SELECT o_orderkey, o_totalprice FROM orders o
        |WHERE EXISTS (SELECT 1 FROM lineitem l
        |  WHERE l.l_orderkey = o.o_orderkey AND l.l_quantity >= 45)""".stripMargin,

    "q_keepfirst" ->
      """SELECT doc_id, lang, source FROM (
        |  SELECT doc_id, lang, source,
        |    ROW_NUMBER() OVER (PARTITION BY lang, source ORDER BY doc_id) AS rn
        |  FROM documents) WHERE rn = 1""".stripMargin,

    "q_dedup_exact" ->
      """SELECT MIN(doc_id) AS keeper, COUNT(*) AS copies
        |FROM documents GROUP BY text""".stripMargin,

    "q_merge_multimap" ->
      """SELECT user_id,
        |  array_to_string(list_sort(list(DISTINCT event_type)), ',') AS types,
        |  COUNT(*) AS n_events
        |FROM events GROUP BY user_id""".stripMargin,

    "q_window_running" ->
      """SELECT event_id, user_id,
        |  ROW_NUMBER() OVER w AS seq,
        |  COUNT(*) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS running_events
        |FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)""".stripMargin,

    "q_sessionize" ->
      """SELECT event_id, user_id,
        |  CAST(SUM(gap) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
        |FROM (
        |  SELECT event_id, user_id, ts,
        |    CASE WHEN LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL THEN 1
        |         WHEN epoch(ts) - epoch(LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)) > 1800 THEN 1
        |         ELSE 0 END AS gap
        |  FROM events)""".stripMargin,

    "q_rank_in_order" ->
      """SELECT l_orderkey, l_linenumber,
        |  ROW_NUMBER() OVER (PARTITION BY l_orderkey ORDER BY l_shipdate, l_linenumber) AS ship_rank
        |FROM lineitem""".stripMargin,

    "q_url_canonicalize" ->
      """SELECT doc_id,
        |  'https://' || source || '.example.org/doc/' || doc_id || '?ID=' || n_chars AS url,
        |  'https://' || source || '.example.org/doc/' || doc_id AS canonical_url,
        |  source || '.example.org' AS host
        |FROM documents""".stripMargin,

    "q_date_format" ->
      """SELECT o_orderkey, strftime(o_orderdate, '%d-%m-%Y') AS formatted_date
        |FROM orders""".stripMargin,

    "q_json_extract" ->
      """SELECT event_id, CAST(json_extract_string(props, '$.k') AS INT) AS k
        |FROM events""".stripMargin,

    "q_token_stats" ->
      """SELECT doc_id,
        |  CASE WHEN length(text) = 0 THEN 0
        |       ELSE length(text) - length(replace(text, ' ', '')) + 1 END AS n_tokens,
        |  length(text) AS n_chars_actual,
        |  length(text) - length(regexp_replace(text, '[.!?,;:]', '', 'g')) AS n_punct,
        |  length(text) - length(regexp_replace(text, '[0-9]', '', 'g')) AS n_digits
        |FROM documents""".stripMargin,

    "q_lang_stats" ->
      """SELECT lang, COUNT(*) AS n_docs, CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
        |  MIN(n_chars) AS min_chars, MAX(n_chars) AS max_chars
        |FROM documents GROUP BY lang""".stripMargin,

    "q_grouping_sets" ->
      """SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
        |FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus)""".stripMargin
  )
}
