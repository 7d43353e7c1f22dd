package graft

import graft.model.{Doc, Span}
import graft.operators.Multimodal
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class MultimodalSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private lazy val docs = Seq(
    Doc("d1", Seq(
      Span("text", "1. hello", null, 0),
      Span("image", null, "fig_a", 1),
      Span("image", null, "fig_b", 2))),
    Doc("d2", Seq(
      Span("heading", "T", null, 0),
      Span("image", null, "fig_c", 1)))).toDS.toDF

  test("mediaTable: one row per image span, binary payload, typed metadata") {
    val m = Multimodal.mediaTable(docs)
    assert(m.schema("payload").dataType.typeName === "binary")
    val rows = m.select($"doc_id", $"media_ref", $"span_offset")
      .as[(String, String, Int)].collect().toSet
    assert(rows === Set(("d1", "fig_a", 1), ("d1", "fig_b", 2), ("d2", "fig_c", 1)))
  }

  test("decodeFeatures: deterministic stub features, stable across runs") {
    val m = Multimodal.mediaTable(docs)
    val f1 = Multimodal.decodeFeatures(m, 2).orderBy($"media_ref").collect()
    val f2 = Multimodal.decodeFeatures(m, 4).orderBy($"media_ref").collect()
    assert(f1.toSeq === f2.toSeq, "stub decode must be partition-invariant")
    val dims = Multimodal.decodeFeatures(m, 2).select(size($"feature")).as[Int].collect()
    assert(dims.forall(_ === 8))
    val wh = Multimodal.decodeFeatures(m, 2).select($"width", $"height").as[(Int, Int)].collect()
    assert(wh.forall { case (w, h) => w >= 64 && h >= 64 })
  }

  test("sampleFrames: stride grid per media row") {
    val m = Multimodal.mediaTable(docs)
    val frames = Multimodal.sampleFrames(m, nFrames = 3, stride = 10)
      .filter($"media_ref" === "fig_a")
      .select($"frame_idx").as[Int].collect().sorted.toSeq
    assert(frames === Seq(0, 10, 20))
  }
}
