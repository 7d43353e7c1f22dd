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
    * against the historical content hashes (any frame carrying the staged
    * columns — the docs table itself). Returns the kept rows; the dup count
    * is `input count - kept count` (derived arithmetically by callers, no
    * second evaluation of the window chain). `arrival` must be a total order
    * (e.g. priority, doc_id). */
  def contentDedup(
      docsWithHashes: DataFrame,
      history: Option[DataFrame], // columns: sz, prefix_hash, content_hash
      arrival: Seq[Column]): DataFrame = {
    val key = Seq(col("sz"), col("prefix_hash"), col("content_hash"))
    val w = Window.partitionBy(key: _*).orderBy(arrival: _*)
    val firsts = docsWithHashes.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn")
    history match {
      case Some(h) =>
        val hh = h.select("sz", "prefix_hash", "content_hash").distinct()
        firsts.join(hh, Seq("sz", "prefix_hash", "content_hash"), "left_anti")
      case None => firsts
    }
  }

  /** Per-rendering hash column name in the docs table. */
  def renderHashCol(rendering: String): String = s"render_hash_$rendering"

  /** Narrow per-doc identity row — everything D2/D3 needs, ~100 B/row.
    * Field names match the staged/render hash column names. */
  final case class DocHashes(
      doc_id: String,
      priority: Long,
      court: String,
      sz: Long,
      prefix_hash: Long,
      content_hash: Long,
      render_hash_plain: Long,
      render_hash_nodigits: Long,
      render_hash_marked: Long)

  /** Typed hash kernel: one pass over the spans in plain Scala. This replaces
    * the Column HOF projection in the crawler's hot path (interpreted
    * CodegenFallback eval measured ~10 ms/doc + 25% GC at local[32]; this
    * kernel is ~50 µs/doc). Hash definitions:
    *   sz           = Σ len(text) (256 for media spans) — the cheap stage
    *   prefix_hash  = xxhash64 over the first span's fields — the 1 KiB-
    *                  prefix analog (`preprocess.py:66-84`)
    *   content_hash = xxhash64 chained over all span fields in offset order
    *   render_hash_<r> = xxhash64 of the rendering string
    */
  def docHashes(docId: String, priority: Long, court: String, spans: Seq[graft.model.Span]): DocHashes = {
    import graft.functions.Hashing.{xxhash64Long, xxhash64Str}
    val sorted = spans.sortBy(_.offset)
    var sz = 0L
    var h = Hashing42
    sorted.foreach { s =>
      sz += (if (s.text != null) s.text.length.toLong else 256L)
      h = xxhash64Str(s.kind, h)
      if (s.text != null) h = xxhash64Str(s.text, h)
      if (s.media_ref != null) h = xxhash64Str(s.media_ref, h)
      h = xxhash64Long(s.offset.toLong, h)
    }
    val first = sorted.headOption
    val prefix = first.map { s =>
      var p = Hashing42
      p = xxhash64Str(s.kind, p)
      if (s.text != null) p = xxhash64Str(s.text, p)
      if (s.media_ref != null) p = xxhash64Str(s.media_ref, p)
      xxhash64Long(s.offset.toLong, p)
    }.getOrElse(0L)
    DocHashes(docId, priority, court, sz, prefix, h,
      xxhash64Str(Segregate.renderPlainStr(sorted)),
      xxhash64Str(Segregate.renderNoDigitsStr(sorted)),
      xxhash64Str(Segregate.renderMarkedStr(sorted)))
  }

  private val Hashing42 = 42L

  /** Add one hash column per rendering (computed in a single projection —
    * these are the D3 history the docs table carries). */
  def withRenderHashes(docs: DataFrame, renderings: Seq[String]): DataFrame =
    renderings.foldLeft(docs)((d, r) =>
      d.withColumn(renderHashCol(r), xxhash64(Segregate.rendering(r, col("spans")))))

  /** D3: chained per-rendering dedup. For each rendering name (in declared
    * order — order-sensitivity is golden-tested against the reference,
    * `process.py:114-122`, `tests/test_process.py:46-135`): drop rows whose
    * rendering hash collides with an earlier row (within the surviving batch)
    * or with history for that rendering. Survivors of rendering k feed
    * rendering k+1. Returns the kept rows, with the render-hash columns
    * retained (they ARE the history the caller persists).
    *
    * `docs` must carry a `spans` column; `history` (if any) must carry the
    * [[renderHashCol]] columns; `arrival` is the keep-first total order.
    */
  def renderingDedup(
      docs: DataFrame,
      renderings: Seq[String],
      history: Option[DataFrame],
      arrival: Seq[Column]): DataFrame = {
    // reuse precomputed hash columns (narrow-frame path: spans were dropped)
    var kept =
      if (renderings.forall(r => docs.columns.contains(renderHashCol(r)))) docs
      else withRenderHashes(docs, renderings)
    renderings.foreach { r =>
      val hc = renderHashCol(r)
      val w = Window.partitionBy(col(hc)).orderBy(arrival: _*)
      val firsts = kept.withColumn("__rn", row_number().over(w))
        .filter(col("__rn") === 1).drop("__rn")
      kept = history match {
        case Some(h) =>
          firsts.join(h.select(col(hc)).distinct(), Seq(hc), "left_anti")
        case None => firsts
      }
    }
    kept
  }
}
