package graft

import graft.model.{CrawlConfig, FrontierEntry}
import graft.operators.Politeness
import org.scalatest.funsuite.AnyFunSuite

/** L3/C4: bounded politeness selection on a frontier FAR larger than the
  * budget — the overflow is streamed, never buffered (task memory is
  * O(buckets × budget); a buffered implementation at this ratio would hold
  * ~100k rows per task). */
class PolitenessSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  test("frontier >> budget: exactly top-budget per bucket scheduled, rest deferred, order exact") {
    val n = 100000
    val cfg = CrawlConfig(budgetPerHost = 8, numPartitions = 4, saltMax = 2,
      maxBucketRows = Int.MaxValue)
    // one dominant host; url_hash spread over both salt buckets
    val frontier = spark.range(n.toLong).map { i =>
      FrontierEntry(s"https://big.example.org/u/$i", s"https://big.example.org/u/$i",
        i * 2654435761L, "big.example.org", "DHC", "q", 1, 0,
        priority = i, status = "pending", retry_count = 0, discovered_round = 0)
    }
    val sched = Politeness.schedule(frontier, cfg).collect()
    val scheduled = sched.filter(_.scheduled)
    val deferred = sched.filter(!_.scheduled)
    // salt_factor = min(saltMax=2, ceil(n/8)) = 2 buckets × budget 4 each
    assert(scheduled.length === 8)
    assert(deferred.length === n - 8)
    // the scheduled set is exactly the smallest (priority, canonical) per bucket
    val expected = (0 until n)
      .map(i => (i, java.lang.Math.floorMod(i * 2654435761L, 2L).toInt))
      .groupBy(_._2)
      .flatMap { case (_, xs) => xs.map(_._1).sorted.take(4) }
      .toSet
    assert(scheduled.map(_.entry.priority.toInt).toSet === expected)
    // in-bucket fetch order follows priority
    scheduled.groupBy(s => (s.entry.host, s.salt)).foreach { case (_, bucket) =>
      val bySeq = bucket.sortBy(_.fetchSeq).map(_.entry.priority)
      assert(bySeq.toSeq === bySeq.sorted.toSeq)
    }
    // deferred rows keep their identity and are marked for the next round
    assert(deferred.forall(_.entry.status == "deferred"))
  }
}
