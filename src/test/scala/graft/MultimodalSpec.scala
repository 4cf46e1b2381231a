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

  test("image_header decodes PNG IHDR and walks JPEG markers to the SOF") {
    def hx(s: String): Array[Byte] =
      s.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray
    // a real 3x2 PNG header (signature + IHDR), as libpng would emit it
    val png = hx("89504E470D0A1A0A0000000D49484452" +
      "0000000300000002080600000099819AAB")
    // JPEG: SOI, APP0/JFIF (len 16), DQT (len 5 dummy), then SOF2
    // (progressive, 0xC2) with height 2, width 3 — the walk must skip
    // two variable segments and accept a non-baseline SOF
    val jpg = hx("FFD8" + "FFE00010" + "4A46494600010100000100010000" +
      "FFDB0006" + "00010203" + "FFC2000B" + "08" + "0002" + "0003" +
      "01011100" + "FFD9")
    // corrupt family: empty, bad signature, PNG cut before IHDR dims,
    // JPEG whose scan data starts before any SOF
    val noSof = hx("FFD8" + "FFDA0002")
    val rows = Seq(1L -> png, 2L -> jpg, 3L -> Array.empty[Byte],
      4L -> "not an image".getBytes("UTF-8"), 5L -> png.take(20),
      6L -> noSof)
      .toDF("id", "b")
      .select(col("id"), graft.plans.ImageHeaderDecode(col("b")).as("h"))
      .select(col("id"), col("h.fmt"), col("h.width"), col("h.height"))
      .as[(Long, String, Option[Long], Option[Long])].collect()
      .map(t => t._1 -> ((t._2, t._3, t._4))).toMap
    assert(rows(1L) === (("png", Some(3L), Some(2L))))
    assert(rows(2L) === (("jpeg", Some(3L), Some(2L))))
    for (k <- Seq(3L, 4L, 5L, 6L))
      assert(rows(k) === (("unknown", None, None)), s"payload $k")
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
