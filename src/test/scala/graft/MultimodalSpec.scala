package graft

import graft.operators.Multimodal
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private val payloads = Seq(
    (1L, "0123456789abcdef" * 4),   // 64 bytes -> 4 frames
    (2L, "short"),                  // < 1 frame
    (3L, "")).toDF("id", "t")       // empty
    .select(col("id"), col("t").cast("binary").as("b"))

  test("metaExtract reports byte length, digest, and magic") {
    val out = Multimodal.metaExtract(payloads, "id", "b")
      .as[(Long, Long, String, String)].collect()
      .map(r => r._1 -> ((r._2, r._4))).toMap
    assert(out(1L) === ((64L, "30313233"))) // '0','1','2','3'
    assert(out(2L)._1 === 5L)
    assert(out(3L)._1 === 0L)
  }

  test("frameSample keeps every stride-th frame, short payloads yield none") {
    val out = Multimodal.frameSample(payloads, "id", "b", frameBytes = 16, stride = 2)
      .select("id", "frame_idx").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted.toSeq).toMap
    assert(out(1L) === Seq(0L, 2L)) // frames 0..3, stride 2
    assert(!out.contains(2L) && !out.contains(3L))
  }

  test("decodeFeaturesStub is deterministic and schema-stable") {
    val f = payloads.select(Multimodal.decodeFeaturesStub(col("b")).as("f"))
    val twice = payloads.select(Multimodal.decodeFeaturesStub(col("b")).as("f"))
    assert(f.as[Seq[Double]].collect().toSeq === twice.as[Seq[Double]].collect().toSeq)
    assert(f.schema("f").dataType.simpleString === "array<double>")
  }

  test("resizePlan fits the long side, preserves aspect, counts tiles") {
    val dims = Seq((1L, 1280L, 720L), (2L, 224L, 224L), (3L, 100L, 400L))
      .toDF("id", "w", "h")
    val out = Multimodal.resizePlan(dims, "id", "w", "h", target = 224, tile = 16)
      .select("id", "new_w", "new_h", "n_tiles")
      .as[(Long, Long, Long, Long)].collect()
      .map(t => t._1 -> ((t._2, t._3, t._4))).toMap
    // 1280x720 -> long side 1280 -> 224x126; tiles 14x8=112
    assert(out(1L) === ((224L, 126L, 112L)))
    // already target-sized: unchanged, 14x14 tiles
    assert(out(2L) === ((224L, 224L, 196L)))
    // portrait: 100x400 -> 56x224; tiles 4x14=56
    assert(out(3L) === ((56L, 224L, 56L)))
  }
}
