package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** A2/A3: the reference's merge postprocess
  * (`/root/reference/src/pipeline/postprocess.py:28-99`) as a relational
  * operator.
  *
  * Reference semantics, mirrored exactly:
  *  - merge requests CLUSTER onto the kept entry they duplicate
  *    (`clustered_requests[file][index]`, postprocess.py:75-80) — here the
  *    cluster key is a column (canonical URL);
  *  - only keys COMMON to the kept entry and every request merge
  *    (`common_keys &= ...`, postprocess.py:40-42) — relationally, the caller
  *    names the value columns shared by both frames;
  *  - `document_path` / `paragraphs` are EXCLUDED from merging
  *    (postprocess.py:43) — the caller simply leaves payload columns out of
  *    `valueCols`; they stay scalar on the kept side;
  *  - each merged key widens scalar → LIST: the kept entry's value first,
  *    then the request values in arrival order (`utils.as_list` extend,
  *    postprocess.py:45-51) — order-preserving, duplicates kept, NOT a set.
  *
  * Scale shape: one groupBy of the requests on the cluster key (requests per
  * key are politeness-bounded), then a key equi-join onto the kept entries —
  * no window over the kept table, which stays untouched/streamable.
  */
object Merge {

  /** Widen `valueCols` of `kept` into `<col>s` arrays: kept value first, then
    * the matching `requests` values ordered by `arrival` (a total order over
    * request rows). Non-matching kept rows get single-element arrays (a
    * judgment with no merge requests keeps its scalar, as a 1-list). */
  def mergeEntries(
      kept: DataFrame,
      requests: DataFrame,
      key: String,
      valueCols: Seq[String],
      arrival: Seq[String]): DataFrame = {
    val orderStruct = struct((arrival ++ valueCols).distinct.map(col): _*)
    val reqAgg = requests.groupBy(col(key))
      .agg(array_sort(collect_list(orderStruct)).as("__reqs"))
    val joined = kept.join(reqAgg, Seq(key), "left")
    val widened = valueCols.foldLeft(joined) { (df, c) =>
      df.withColumn(s"${c}s",
        when(col("__reqs").isNull, array(col(c)))
          .otherwise(concat(array(col(c)), transform(col("__reqs"), r => r(c)))))
    }
    widened
      .withColumn("n_merged", lit(1) + coalesce(size(col("__reqs")), lit(0)))
      .drop("__reqs")
      .drop(valueCols: _*)
  }
}
