package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The reference's three-step dedup cascade as relational operators
  * (SURVEY.md §2.3). Step 1 (URL/case) lives in [[SeenSet]] and the crawler;
  * this module is step 2 (file-content, staged cheap-to-expensive,
  * `/root/reference/src/pipeline/search_and_scrape.py:97-134`,
  * `preprocess.py:173-203`) and step 3 (per-rendering content hash, chained in
  * rendering order, `src/pipeline/process.py:29-165`).
  *
  * Everything is expressed as window keep-first / anti-join — NOT
  * `dropDuplicates`, which does not guarantee which row survives (SURVEY.md
  * L5). Keep-first order must be a total order supplied by the caller
  * (`arrivalCols`), making results partition-count invariant.
  */
object Dedup {

  /** Staged content-identity columns (cheap → expensive), the scaled analog of
    * size → 1 KiB-prefix SHA-1 → full SHA-1 (`preprocess.py:66-84,186-197`).
    * At 100 TB the win is that `sz`+`prefix_hash` come from tiny reads while
    * `content_hash` needs the full payload; Spark computes all three per row
    * in one pass here, but grouping on (sz, prefix_hash, content_hash)
    * preserves the short-circuit semantics: rows differing in a cheap column
    * can never be content-dupes. */
  def withStagedHashes(docs: DataFrame, spansCol: String = "spans"): DataFrame = {
    val spans = col(spansCol)
    docs
      .withColumn("sz",
        aggregate(spans, lit(0L), (acc, s) =>
          acc + coalesce(length(s("text")).cast("long"), lit(256L))))
      .withColumn("prefix_hash", xxhash64(to_json(element_at(spans, 1))))
      .withColumn("content_hash", xxhash64(to_json(spans)))
  }

  /** Keep-first distinct by `key` under the total order `arrival`. */
  def keepFirst(df: DataFrame, key: Seq[Column], arrival: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(key: _*).orderBy(arrival: _*)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** D2: within-batch keep-first by full content identity, then anti-join
    * against the historical content-hash table (if any). Returns
    * (kept, dupes). `arrival` must be a total order (e.g. priority, doc_id). */
  def contentDedup(
      docsWithHashes: DataFrame,
      history: Option[DataFrame], // columns: sz, prefix_hash, content_hash
      arrival: Seq[Column]): (DataFrame, DataFrame) = {
    val key = Seq(col("sz"), col("prefix_hash"), col("content_hash"))
    val w = Window.partitionBy(key: _*).orderBy(arrival: _*)
    val ranked = docsWithHashes.withColumn("__rn", row_number().over(w))
    val firsts = ranked.filter(col("__rn") === 1).drop("__rn")
    val batchDupes = ranked.filter(col("__rn") > 1).drop("__rn")
    history match {
      case Some(h) =>
        val hh = h.select("sz", "prefix_hash", "content_hash").distinct()
        val kept = firsts.join(hh, Seq("sz", "prefix_hash", "content_hash"), "left_anti")
        val histDupes = firsts.join(hh, Seq("sz", "prefix_hash", "content_hash"), "left_semi")
        (kept, batchDupes.unionByName(histDupes))
      case None => (firsts, batchDupes)
    }
  }

  /** D3: chained per-rendering dedup. For each rendering name (in declared
    * order — order-sensitivity is golden-tested against the reference,
    * `process.py:114-122`, `tests/test_process.py:46-135`): hash the rendering,
    * drop rows whose hash collides with an earlier row (within the surviving
    * batch) or with history for that rendering. Survivors of rendering k feed
    * rendering k+1. Returns (kept, dupes-with-rendering-column).
    *
    * `docs` must carry a `spans` column; `arrival` is the keep-first order.
    */
  def renderingDedup(
      docs: DataFrame,
      renderings: Seq[String],
      history: Option[DataFrame], // columns: rendering, render_hash
      arrival: Seq[Column]): (DataFrame, DataFrame) = {
    val spark = docs.sparkSession
    var kept = docs
    var dupes: Option[DataFrame] = None
    renderings.foreach { r =>
      val hashed = kept.withColumn("render_hash", xxhash64(Segregate.rendering(r, col("spans"))))
      val w = Window.partitionBy(col("render_hash")).orderBy(arrival: _*)
      val ranked = hashed.withColumn("__rn", row_number().over(w))
      val firsts = ranked.filter(col("__rn") === 1).drop("__rn")
      val batchD = ranked.filter(col("__rn") > 1).drop("__rn")
      val (survivors, histD) = history match {
        case Some(h) =>
          val hr = h.filter(col("rendering") === r).select("render_hash").distinct()
          (firsts.join(hr, Seq("render_hash"), "left_anti"),
            firsts.join(hr, Seq("render_hash"), "left_semi"))
        case None => (firsts, spark.emptyDataFrame)
      }
      val roundDupes =
        (if (histD.columns.isEmpty) batchD else batchD.unionByName(histD))
          .withColumn("rendering", lit(r))
      dupes = dupes match {
        case Some(d) => Some(d.unionByName(roundDupes))
        case None    => Some(roundDupes)
      }
      kept = survivors.drop("render_hash")
    }
    (kept, dupes.get.drop("render_hash"))
  }
}
