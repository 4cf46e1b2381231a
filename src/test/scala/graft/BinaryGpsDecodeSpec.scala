package graft

import graft.plans.{BinaryGpsDecode, SimHash64}
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import java.nio.{ByteBuffer, ByteOrder}

class BinaryGpsDecodeSpec extends SparkSpec {
  import spark.implicits._

  private def encode(pairs: (Long, Long)*): Array[Byte] = {
    val bb = ByteBuffer.allocate(pairs.length * 8).order(ByteOrder.LITTLE_ENDIAN)
    pairs.foreach { case (lng, lat) => bb.putInt(lng.toInt); bb.putInt(lat.toInt) }
    bb.array()
  }

  private def decodeOne(bytes: Array[Byte]): Seq[Row] =
    Seq(Tuple1(bytes)).toDF("b")
      .select(BinaryGpsDecode(col("b")).as("d"))
      .selectExpr("explode(d) AS c").select("c.off", "c.lon", "c.lat")
      .collect().toSeq

  test("decodes LE uint32 (lng,lat) pairs at 1e8 scale with offsets") {
    val out = decodeOne(encode((3050000000L, 3550000000L), (123L, 456L)))
    assert(out === Seq(Row(0, 30.5, 35.5), Row(8, 1.23e-6, 4.56e-6)))
  }

  test("uint32 semantics: values past Int.MaxValue stay positive") {
    val out = decodeOne(encode((4294967295L, 0L))) // 0xFFFFFFFF
    assert(out.head.getDouble(1) === 42.94967295)
  }

  test("trailing partial record is ignored; empty binary yields empty array") {
    val partial = encode((3000000000L, 3000000000L)) ++ Array[Byte](1, 2, 3)
    assert(decodeOne(partial).length === 1)
    assert(decodeOne(Array.emptyByteArray).isEmpty)
  }

  test("expression survives both codegen and interpreted eval") {
    val df = Seq(Tuple1(encode((3000000000L, 3100000000L)))).toDF("b")
      .select(BinaryGpsDecode(col("b")).as("d"))
    // force interpreted path too
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    try assert(df.selectExpr("size(d)").as[Int].head() === 1)
    finally spark.conf.set("spark.sql.codegen.wholeStage", "true")
  }

  test("base64 envelope: unpadded frames decode, mangled frames quarantine") {
    // ing_base64_gps at sf0.001: every 97th event is a corrupt frame
    val out = SparkEntry.queries("ing_base64_gps")(spark, "/root/testdata/sf0.001")
    val rows = out.collect()
    val quarantined = rows.filter(_.getInt(1) == -1)
    val decoded = rows.filter(_.getInt(1) >= 0)
    // every corrupt frame surfaces exactly once, with null coordinates
    assert(quarantined.nonEmpty)
    assert(quarantined.forall(r => r.getLong(0) % 97 == 0 && r.isNullAt(2) && r.isNullAt(3)))
    // every intact frame yields its two records (offsets 0 and 8),
    // proving the stripped '=' padding was restored before decode
    assert(decoded.nonEmpty)
    assert(decoded.forall(_.getLong(0) % 97 != 0))
    assert(decoded.count(_.getInt(1) == 0) === decoded.count(_.getInt(1) == 8))
  }

  test("simhash64: identical feature arrays agree, disjoint ones differ") {
    val df = Seq(
      (1L, Seq("a b c", "b c d", "c d e")),
      (2L, Seq("a b c", "b c d", "c d e")),
      (3L, Seq("x y z", "y z w", "z w v"))).toDF("id", "f")
      .select(col("id"), SimHash64(col("f")).as("sig"))
    val sigs = df.as[(Long, Long)].collect().toMap
    assert(sigs(1L) === sigs(2L))
    assert(sigs(1L) !== sigs(3L))
  }
}
