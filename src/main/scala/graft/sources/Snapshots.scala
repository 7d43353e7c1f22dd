package graft.sources

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Iceberg-style snapshot layout emulated on parquet + a manifest commit (no
  * Iceberg jar ships in this sandbox — SURVEY.md §4). Semantics kept so a real
  * Iceberg catalog could be swapped in:
  *
  *  - every table write lands under `dir/round=<n>/<table>/` (parquet);
  *  - a round becomes visible only when `dir/round=<n>/manifest.json` exists —
  *    the manifest is written to a temp file and atomically renamed, so a
  *    crash mid-round leaves the previous snapshot intact (resume = read the
  *    max committed round, exactly the reference's skip-existing/resume
  *    behavior, `/root/reference/src/pipeline/search_and_scrape.py:177-187`);
  *  - delta tables (seen/docs/judgments) append one delta per round and are
  *    read as the union of committed deltas — partition pruning over the
  *    `round=` directory does the incremental-read work;
  *  - full tables (frontier) are rewritten each round and read from the
  *    latest committed round only.
  */
object Snapshots {

  def roundDir(dir: String, round: Int): Path = Paths.get(dir, f"round=$round%06d")

  def manifestPath(dir: String, round: Int): Path = roundDir(dir, round).resolve("manifest.json")

  def committedRounds(dir: String): Seq[Int] = {
    val root = Paths.get(dir)
    if (!Files.exists(root)) return Nil
    Files.list(root).iterator.asScala
      .filter(p => p.getFileName.toString.startsWith("round="))
      .map(p => p.getFileName.toString.stripPrefix("round=").toInt)
      .filter(r => Files.exists(manifestPath(dir, r)))
      .toSeq.sorted
  }

  def latestRound(dir: String): Option[Int] = committedRounds(dir).lastOption

  def tablePath(dir: String, round: Int, table: String): String =
    roundDir(dir, round).resolve(table).toString

  /** Write the round's tables, then commit atomically via manifest rename.
    * `lineage` carries per-partition/per-host metrics rendered into the
    * manifest (north rule: per-partition lineage + metrics). */
  def commit(
      dir: String,
      round: Int,
      tables: Map[String, DataFrame],
      lineage: Map[String, String]): Unit = {
    val rd = roundDir(dir, round)
    Files.createDirectories(rd)
    val counts = tables.map { case (name, df) =>
      df.write.mode("overwrite").parquet(tablePath(dir, round, name))
      name -> df.sparkSession.read.parquet(tablePath(dir, round, name)).count()
    }
    val fields =
      Seq(s""""round": $round""",
        s""""tables": {${counts.map { case (n, c) => s""""$n": $c""" }.mkString(", ")}}""") ++
        lineage.map { case (k, v) => s""""$k": $v""" }
    val json = fields.mkString("{", ", ", "}")
    val tmp = Files.createTempFile(rd, "manifest", ".tmp")
    Files.writeString(tmp, json)
    Files.move(tmp, manifestPath(dir, round), StandardCopyOption.ATOMIC_MOVE)
  }

  /** Latest committed version of a full (rewritten-per-round) table. */
  def readLatest(spark: SparkSession, dir: String, table: String): Option[DataFrame] =
    committedRounds(dir).reverse
      .find(r => Files.exists(roundDir(dir, r).resolve(table)))
      .map(r => spark.read.parquet(tablePath(dir, r, table)))

  /** Union of all committed deltas of a table (empty → None). */
  def readDeltas(spark: SparkSession, dir: String, table: String): Option[DataFrame] = {
    val paths = committedRounds(dir)
      .filter(r => Files.exists(roundDir(dir, r).resolve(table)))
      .map(r => tablePath(dir, r, table))
    if (paths.isEmpty) None else Some(spark.read.parquet(paths: _*))
  }
}
