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

  test("decodeFeatures batch contract: schema, doc_id partitioning, one codec per partition") {
    import org.apache.spark.sql.types._
    val m = Multimodal.mediaTable(docs)
    val nPart = 3
    val counter = spark.sparkContext.longAccumulator("codec-instantiations")
    val out = Multimodal.decodeFeatures(m, nPart, () => {
      counter.add(1)
      new Multimodal.MediaCodecStub
    })
    // (a) output schema is pinned — a codec drop-in must not change it
    assert(out.schema === StructType(Seq(
      StructField("doc_id", StringType, nullable = true),
      StructField("media_ref", StringType, nullable = true),
      StructField("width", IntegerType, nullable = false),
      StructField("height", IntegerType, nullable = false),
      StructField("feature", ArrayType(FloatType, containsNull = false), nullable = true))))
    // (b) partitioning: the transform runs downstream of a hash exchange on
    // doc_id at the requested partition count (a doc's media stays colocated)
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("hashpartitioning(doc_id"), s"expected doc_id exchange in:\n$plan")
    assert(plan.contains(s", $nPart)"), s"expected $nPart-partition exchange in:\n$plan")
    // (c) codec constructed once per partition, not per row
    counter.reset()
    val rows = out.count()
    assert(rows === 3)
    assert(counter.value === nPart.toLong,
      s"codec must be instantiated once per partition ($nPart), saw ${counter.value}")
  }

  test("sampleFrames: stride grid per media row") {
    val m = Multimodal.mediaTable(docs)
    val frames = Multimodal.sampleFrames(m, nFrames = 3, stride = 10)
      .filter($"media_ref" === "fig_a")
      .select($"frame_idx").as[Int].collect().sorted.toSeq
    assert(frames === Seq(0, 10, 20))
  }
}
