package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** URL column expressions (all built-in Catalyst functions — codegen'd, no UDFs).
  *
  * Canonicalization reproduces the reference's `canonicalize_url`
  * (`/root/reference/src/pipeline/preprocess.py:34-48`): parse the URL, drop the
  * volatile `ID` query parameter (a per-session token the court site appends —
  * two URLs differing only in `ID` are the same document), re-assemble. Also
  * strips any `#fragment`. Everything else (param order, case) is preserved,
  * exactly like the reference's urlencode round-trip.
  */
object Urls {

  /** Drop the `#fragment`, if any. */
  private def noFragment(url: Column): Column = substring_index(url, "#", 1)

  /** Canonical URL: fragment stripped, `ID` query param removed. */
  def canonicalize(url: Column): Column = {
    val u = noFragment(url)
    val base = substring_index(u, "?", 1)
    // everything after the first '?' ('' when there is no query string)
    val qs = when(instr(u, "?") > 0, u.substr(instr(u, "?") + 1, length(u)))
      .otherwise(lit(""))
    val kept = filter(split(qs, "&"), p => !(p.startsWith("ID=") || p === "ID"))
    val keptQs = array_join(kept, "&")
    when(length(keptQs) > 0, concat(base, lit("?"), keptQs)).otherwise(base)
  }

  /** Stable 64-bit key for the URL-seen set (bloom/cuckoo + exact table). */
  def urlHash(canonicalUrl: Column): Column = xxhash64(canonicalUrl)

  /** Host (netloc without port), lowercased. Empty string for scheme-less URLs. */
  def host(url: Column): Column =
    lower(coalesce(parse_url(noFragment(url), lit("HOST")), lit("")))

  /** Path-safe filename (`/root/reference/src/utils/fs.py:18-20`): the two
    * regex substitutions the reference applies to build filenames. */
  def pathSafeName(name: Column): Column =
    regexp_replace(regexp_replace(name, "[\\\\/:*?\"<>|]+", "_"), "\\s+", " ")

  /** P4 (`/root/reference/src/retrievers/utils.py:37-41`): download filename —
    * the Content-Disposition `filename=` value when the header is present,
    * else the basename of the URL path. */
  def fileName(contentDisposition: Column, url: Column): Column = {
    val fromHeader = regexp_extract(contentDisposition, "filename=(.+)", 1)
    val path = coalesce(parse_url(noFragment(url), lit("PATH")), lit(""))
    val base = element_at(split(path, "/"), -1)
    when(contentDisposition.isNotNull && fromHeader =!= "", fromHeader).otherwise(base)
  }
}
