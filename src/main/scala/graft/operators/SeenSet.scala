package graft.operators

import java.io.{BufferedInputStream, BufferedOutputStream, DataInputStream, DataOutputStream}
import java.nio.file.{Files, Path, Paths, StandardCopyOption}

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.util.sketch.BloomFilter

/** The URL-seen set (dedup step D1 of the reference,
  * `/root/reference/src/pipeline/search_and_scrape.py:52-94` probing
  * `JudgmentIndexStore`, `preprocess.py:226-280`), re-architected for 10^10 URLs:
  *
  *  - **source of truth**: an exact parquet table `(url_hash long, canonical_url
  *    string)`, append-only, snapshot-versioned by the caller;
  *  - **broadcast bloom** (built-in `spark.util.sketch.BloomFilter`): coarse
  *    whole-set prefilter — bloom-negative rows are *definitely novel* and skip
  *    every downstream probe (at a mostly-novel frontier this removes ~99% of
  *    rows from the probe path);
  *  - **partitioned cuckoo filters** (one per `pmod(url_hash, P)` bucket,
  *    [[CuckooFilter]]): fine-grained (≈1e-4 FPR), deletable, serialized next to
  *    each snapshot; cuckoo-negative rows are definitely novel; only
  *    cuckoo-positive rows reach the exact anti-join, whose probe side is then
  *    tiny (true dupes + 1e-4 false positives) and broadcastable.
  *
  * Filters are an acceleration structure only — always rebuildable from the
  * exact table (mirrors the reference rebuilding indexes from JSON on every
  * run, `preprocess.py:290-356`).
  *
  * Files are written via java.nio against a shared filesystem path; on a real
  * cluster the same layout maps 1:1 onto a Hadoop-FS/S3 prefix.
  */
object SeenSet {

  /** Number of cuckoo buckets. Fixed per store (must match between build and
    * probe); at cluster scale this is O(number of seen-table partitions). */
  val DefaultBuckets = 32

  /** Fixed bloom sizing so per-round delta blooms are `mergeInPlace`-compatible
    * with the stored one (spark BloomFilters only merge when bit-identical in
    * shape). 4M expected items @ 1% fpp ≈ 4.8 MB broadcast. Past 4M inserts the
    * fpp degrades gracefully (more rows take the cuckoo/exact path — never a
    * correctness issue). At true 10^10 scale this becomes a bloom *per key
    * range* with the same fixed shape per shard. */
  val BloomExpectedItems: Long = 1L << 22
  val BloomFpp: Double = 0.01

  private def bucketFile(dir: String, b: Int): Path = Paths.get(dir, f"bucket-$b%05d.cuckoo")
  private def bloomFile(dir: String): Path = Paths.get(dir, "seen.bloom")

  /** Build/refresh all per-bucket cuckoo filters and the bloom from the exact
    * seen table. Deterministic layout: bucket = pmod(url_hash, buckets); hash
    * repartitioning sends every row of a bucket to one task, so each bucket
    * file has exactly one writer. */
  def rebuildFilters(seen: DataFrame, dir: String, buckets: Int = DefaultBuckets): Unit = {
    Files.createDirectories(Paths.get(dir))
    val spark = seen.sparkSession
    import spark.implicits._
    val total = math.max(1L, seen.count())
    val perBucket = math.max(64L, total / buckets * 2)
    seen.select(col("url_hash").cast("long"))
      .repartition(buckets, pmod(col("url_hash"), lit(buckets)))
      .as[Long]
      .foreachPartition { (it: Iterator[Long]) =>
        val byBucket = scala.collection.mutable.Map.empty[Int, CuckooFilter]
        it.foreach { h =>
          val b = (((h % buckets) + buckets) % buckets).toInt
          val f = byBucket.getOrElseUpdate(b, CuckooFilter.create(perBucket))
          if (!f.add(h)) throw new IllegalStateException(s"cuckoo bucket $b saturated")
        }
        byBucket.foreach { case (b, f) => atomicWrite(bucketFile(dir, b), f) }
      }
    // bloom over the full set (broadcast side) — fixed shape for mergeability.
    // stat.bloomFilter NPEs on empty input; an absent bloom file is the
    // correct representation of "nothing seen" (filterNovel falls back to the
    // cuckoo/exact path, which is exact on empty state).
    if (total > 0 && !seen.isEmpty) {
      val bloom = seen.stat.bloomFilter("url_hash", BloomExpectedItems, BloomFpp)
      writeBloom(dir, bloom)
    }
  }

  private def writeBloom(dir: String, bloom: BloomFilter): Unit = {
    val tmp = Files.createTempFile(Paths.get(dir), "bloom", ".tmp")
    val out = new BufferedOutputStream(Files.newOutputStream(tmp))
    try bloom.writeTo(out) finally out.close()
    Files.move(tmp, bloomFile(dir), StandardCopyOption.REPLACE_EXISTING,
      StandardCopyOption.ATOMIC_MOVE)
  }

  /** Fold a round's newly-seen keys into the stored bloom. MANDATORY after
    * every seen-table append: a bloom-negative row is classified *definitely
    * novel* and bypasses the cuckoo/exact path, so a stale bloom would cause
    * re-fetches. Delta blooms are built distributed (`stat.bloomFilter`) with
    * the fixed shape above and merged in the driver. */
  def addToBloom(newKeys: DataFrame, dir: String): Unit = {
    if (newKeys.isEmpty) return // stat.bloomFilter NPEs on empty input
    Files.createDirectories(Paths.get(dir))
    val delta = newKeys.stat.bloomFilter("url_hash", BloomExpectedItems, BloomFpp)
    val merged = loadBloom(dir) match {
      case Some(existing) => existing.mergeInPlace(delta)
      case None           => delta
    }
    writeBloom(dir, merged)
  }

  /** Add newly-seen hashes into the bucket filters (read-modify-write per
    * bucket; single writer per bucket by the same repartition argument).
    * Callers must ALSO call [[addToBloom]] with the same keys — see its doc. */
  def addToFilters(newKeys: DataFrame, dir: String, buckets: Int = DefaultBuckets): Unit = {
    val spark = newKeys.sparkSession
    import spark.implicits._
    val perBucket = 1 << 16
    newKeys.select(col("url_hash").cast("long"))
      .repartition(buckets, pmod(col("url_hash"), lit(buckets)))
      .as[Long]
      .foreachPartition { (it: Iterator[Long]) =>
        val byBucket = scala.collection.mutable.Map.empty[Int, CuckooFilter]
        it.foreach { h =>
          val b = (((h % buckets) + buckets) % buckets).toInt
          val f = byBucket.getOrElseUpdate(b, loadBucket(dir, b).getOrElse(CuckooFilter.create(perBucket)))
          if (!f.add(h)) throw new IllegalStateException(s"cuckoo bucket $b saturated")
        }
        byBucket.foreach { case (b, f) => atomicWrite(bucketFile(dir, b), f) }
      }
  }

  private def atomicWrite(p: Path, f: CuckooFilter): Unit = {
    Files.createDirectories(p.getParent)
    val tmp = Files.createTempFile(p.getParent, p.getFileName.toString, ".tmp")
    val out = new DataOutputStream(new BufferedOutputStream(Files.newOutputStream(tmp)))
    try f.serialize(out) finally out.close()
    Files.move(tmp, p, StandardCopyOption.REPLACE_EXISTING, StandardCopyOption.ATOMIC_MOVE)
  }

  private def loadBucket(dir: String, b: Int): Option[CuckooFilter] = {
    val p = bucketFile(dir, b)
    if (!Files.exists(p)) None
    else {
      val in = new DataInputStream(new BufferedInputStream(Files.newInputStream(p)))
      try Some(CuckooFilter.deserialize(in)) finally in.close()
    }
  }

  def loadBloom(dir: String): Option[BloomFilter] = {
    val p = bloomFile(dir)
    if (!Files.exists(p)) None
    else {
      val in = new BufferedInputStream(Files.newInputStream(p))
      try Some(BloomFilter.readFrom(in)) finally in.close()
    }
  }

  /** Split `incoming` (must carry `url_hash` and `canonical_url` columns) into
    * (novel, dupes) against the seen store.
    *
    * Plan shape (scale rationale in the class doc):
    * {{{
    *   incoming ──bloom─┬─ negative ──────────────────────────┐
    *                    └─ positive ──cuckoo─┬─ negative ──────┤→ novel
    *                                         └─ positive ──exact anti-join─┬→ novel (FP)
    *                                                          └─ semi-join ┴→ dupes
    * }}}
    */
  def filterNovel(
      incoming: DataFrame,
      seen: DataFrame,
      filterDir: String,
      buckets: Int = DefaultBuckets): (DataFrame, DataFrame) = {
    val spark = incoming.sparkSession

    // Stage 1: broadcast bloom. Negative → definitely novel.
    val bloomOpt = loadBloom(filterDir)
    val (bloomNeg, bloomPos) = bloomOpt match {
      case Some(bloom) =>
        val bc = spark.sparkContext.broadcast(bloom)
        val might = udf((h: Long) => bc.value.mightContainLong(h))
        (incoming.filter(!might(col("url_hash"))), incoming.filter(might(col("url_hash"))))
      case None =>
        (incoming.limit(0), incoming)
    }

    // Stage 2: partitioned cuckoo over bloom positives. Negative → novel.
    val withFlag = bloomPos
      .repartition(buckets, pmod(col("url_hash"), lit(buckets)))
      .withColumn("__maybe_seen", cuckooMightContain(filterDir, buckets)(col("url_hash")))
    val cuckooNeg = withFlag.filter(!col("__maybe_seen")).drop("__maybe_seen")
    val cuckooPos = withFlag.filter(col("__maybe_seen")).drop("__maybe_seen")

    // Stage 3: exact verification of the (tiny) cuckoo-positive set.
    val dupes = cuckooPos.join(seen.select("url_hash").distinct(), Seq("url_hash"), "left_semi")
    val novelFp = cuckooPos.join(seen.select("url_hash").distinct(), Seq("url_hash"), "left_anti")

    (bloomNeg.unionByName(cuckooNeg).unionByName(novelFp), dupes)
  }

  /** Per-row cuckoo probe as a UDF with task-local filter cache. A plain
    * Scala closure (not codegen) is acceptable here: it runs only on the
    * bloom-positive slice. */
  private def cuckooMightContain(dir: String, buckets: Int) = {
    udf(new CuckooProbe(dir, buckets))
  }

  /** Serializable probe with a lazy per-JVM bucket cache. */
  private final class CuckooProbe(dir: String, buckets: Int)
      extends (Long => Boolean) with Serializable {
    @transient private lazy val cache =
      new java.util.concurrent.ConcurrentHashMap[Int, Option[CuckooFilter]]()
    def apply(h: Long): Boolean = {
      val b = (((h % buckets) + buckets) % buckets).toInt
      val f = cache.computeIfAbsent(b, bb => loadBucket(dir, bb))
      // missing filter file ⇒ cannot prove novelty ⇒ treat as maybe-seen
      f.forall(_.mightContain(h))
    }
  }
}
