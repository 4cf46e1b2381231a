package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types._

/** Custom Catalyst expression decoding the EWAY binary GPS wire format:
  * consecutive 8-byte records of little-endian UNSIGNED int32 pairs
  * (longitude, latitude), each scaled by 1e8, with out-of-range
  * coordinates skipped (reference: eway/pipeline/ws_interceptor.py:22-23
  * GPS_COORDINATE_SCALE_FACTOR/COORDINATE_STRUCT_SIZE, :109-139
  * extract_coordinates_from_binary, :86-87 is_valid_coordinate).
  *
  * binary -> array<struct<off:int, lon:double, lat:double>>.
  *
  * Codegen-capable: doGenCode emits a single static call, so the
  * expression stays inside whole-stage codegen (no UDF serialization,
  * no fallback to interpreted projection).
  */
case class BinaryGpsDecode(child: Expression)
  extends UnaryExpression with ImplicitCastInputTypes {
  override def dataType: DataType = BinaryGpsDecode.resultType
  override def prettyName: String = "binary_gps_decode"
  override def inputTypes = Seq(BinaryType)

  override def nullSafeEval(input: Any): Any =
    BinaryGpsDecode.decode(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.BinaryGpsDecode.decode($c)")

  override protected def withNewChildInternal(newChild: Expression): BinaryGpsDecode =
    copy(child = newChild)
}

object BinaryGpsDecode {
  /** ws_interceptor.py:22 */
  val ScaleFactor: Double = 1e8
  /** ws_interceptor.py:23 */
  val RecordSize: Int = 8

  val resultType: DataType = ArrayType(StructType(Seq(
    StructField("off", IntegerType, nullable = false),
    StructField("lon", DoubleType, nullable = false),
    StructField("lat", DoubleType, nullable = false))), containsNull = false)

  /** Column-API entry point — resolves through the session's function
    * registry, populated by [[graft.GraftExtensions]]. */
  def apply(c: Column): Column = call_function("binary_gps_decode", c)

  /** Called from generated code — must stay a static-forwardable method
    * returning a catalyst ArrayData. */
  def decode(data: Array[Byte]): ArrayData = {
    val buf = scala.collection.mutable.ArrayBuffer.empty[Any]
    var off = 0
    // mirror of `range(0, len - (size-1), size)`: only full records
    while (off + RecordSize <= data.length) {
      val lon = readUIntLE(data, off) / ScaleFactor
      val lat = readUIntLE(data, off + 4) / ScaleFactor
      // is_valid_coordinate (ws_interceptor.py:86-87)
      if (lat >= -90 && lat <= 90 && lon >= -180 && lon <= 180) {
        buf += InternalRow(off, lon, lat)
      }
      off += RecordSize
    }
    new GenericArrayData(buf.toArray)
  }

  private def readUIntLE(d: Array[Byte], i: Int): Long =
    (d(i) & 0xffL) | ((d(i + 1) & 0xffL) << 8) |
      ((d(i + 2) & 0xffL) << 16) | ((d(i + 3) & 0xffL) << 24)
}
