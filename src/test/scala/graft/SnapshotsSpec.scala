package graft

import java.nio.file.{Files, Paths}

import graft.sources.Snapshots
import org.scalatest.funsuite.AnyFunSuite

class SnapshotsSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  test("commit → latestRound; uncommitted rounds are invisible") {
    val dir = Files.createTempDirectory("snap").toString
    assert(Snapshots.latestRound(dir) === None)
    Snapshots.commit(dir, 1, Map("t" -> Seq(1, 2, 3).toDF("x")), Map.empty)
    assert(Snapshots.latestRound(dir) === Some(1))
    // simulate a crash mid-round-2: table written, manifest missing
    Seq(4, 5).toDF("x").write.parquet(Snapshots.tablePath(dir, 2, "t"))
    assert(Snapshots.latestRound(dir) === Some(1), "uncommitted round must stay invisible")
    // readDeltas must also ignore the uncommitted delta
    assert(Snapshots.readDeltas(spark, dir, "t").get.count() === 3)
  }

  test("readDeltas unions committed deltas; readLatest picks newest full table") {
    val dir = Files.createTempDirectory("snap2").toString
    Snapshots.commit(dir, 1, Map("delta" -> Seq(1).toDF("x"), "full" -> Seq(10).toDF("y")), Map.empty)
    Snapshots.commit(dir, 2, Map("delta" -> Seq(2, 3).toDF("x"), "full" -> Seq(20, 30).toDF("y")), Map.empty)
    // readDeltas adds the `round` partition column — select the data column
    val deltas = Snapshots.readDeltas(spark, dir, "delta").get
    assert(deltas.columns.toSet === Set("x", "round"), "round column exposed by partition inference")
    assert(deltas.select("x").as[Int].collect().sorted.toSeq === Seq(1, 2, 3))
    assert(Snapshots.readLatest(spark, dir, "full").get.as[Int].collect().sorted.toSeq === Seq(20, 30))
  }

  test("manifest records table counts and lineage fields as json") {
    val dir = Files.createTempDirectory("snap3").toString
    Snapshots.commit(dir, 7, Map("t" -> Seq(1, 2).toDF("x")),
      Map("report" -> """{"ok": 2}"""))
    val json = Files.readString(Snapshots.manifestPath(dir, 7))
    assert(json.contains(""""round": 7"""))
    assert(json.contains(""""t": 2"""))
    assert(json.contains(""""report": {"ok": 2}"""))
  }
}
