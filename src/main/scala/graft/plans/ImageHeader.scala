package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Image HEADER decode — the byte-plumbing slice of media handling the
  * engine owns outright (actual pixel/sample decode stays behind the
  * documented stub swap-in point, operators/Multimodal.scala): sniffs
  * the container and extracts pixel dimensions from
  *
  *   - PNG: 8-byte signature, then the IHDR chunk's big-endian
  *     width/height at fixed offsets 16/20 (IHDR is required first by
  *     the PNG spec);
  *   - JPEG: SOI then a real MARKER WALK — variable-length segments
  *     (APPn/COM/DQT/...) are skipped via their 2-byte big-endian
  *     length fields, standalone markers (TEM, RSTn) and fill bytes
  *     are stepped over, until a frame header (SOFn except the
  *     DHT/JPG/DAC exclusions C4/C8/CC) yields height/width, or scan
  *     data / EOI ends the walk.
  *
  * binary -> struct<fmt:string, width:bigint, height:bigint>;
  * fmt='unknown' with null dims for anything unparseable (too short,
  * bad signature, truncated segment, SOS before SOF). Never throws:
  * corrupt bytes are data, not errors — quarantine is a filter on fmt.
  *
  * Codegen-capable: doGenCode emits one static call, so the decode
  * stays inside whole-stage codegen exactly like [[BinaryGpsDecode]].
  */
case class ImageHeaderDecode(child: Expression)
  extends UnaryExpression with ImplicitCastInputTypes {
  override def dataType: DataType = ImageHeaderDecode.resultType
  override def prettyName: String = "image_header"
  override def inputTypes = Seq(BinaryType)

  override def nullSafeEval(input: Any): Any =
    ImageHeaderDecode.decode(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.ImageHeaderDecode.decode($c)")

  override protected def withNewChildInternal(newChild: Expression): ImageHeaderDecode =
    copy(child = newChild)
}

object ImageHeaderDecode {

  val resultType: DataType = StructType(Seq(
    StructField("fmt", StringType, nullable = false),
    StructField("width", LongType, nullable = true),
    StructField("height", LongType, nullable = true)))

  /** Column-API entry point — resolves through the session's function
    * registry, populated by [[graft.GraftExtensions]]. */
  def apply(c: Column): Column = call_function("image_header", c)

  private val PngSig =
    Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)

  private val Unknown: InternalRow =
    InternalRow(UTF8String.fromString("unknown"), null, null)

  /** Called from generated code — static-forwardable, returns the
    * catalyst struct row. */
  def decode(d: Array[Byte]): InternalRow = {
    if (isPng(d)) {
      // IHDR: length(4) 'IHDR'(4) at 8, width/height big-endian at 16/20
      if (d.length >= 24 &&
          d(12) == 'I' && d(13) == 'H' && d(14) == 'D' && d(15) == 'R')
        InternalRow(UTF8String.fromString("png"), be32(d, 16), be32(d, 20))
      else Unknown
    } else if (d.length >= 2 && (d(0) & 0xff) == 0xff && (d(1) & 0xff) == 0xd8) {
      jpegSof(d)
    } else Unknown
  }

  private def isPng(d: Array[Byte]): Boolean = {
    if (d.length < PngSig.length) return false
    var i = 0
    while (i < PngSig.length) { if (d(i) != PngSig(i)) return false; i += 1 }
    true
  }

  private def jpegSof(d: Array[Byte]): InternalRow = {
    var pos = 2
    while (pos + 1 < d.length) {
      if ((d(pos) & 0xff) != 0xff) return Unknown // desynced: not a marker
      val m = d(pos + 1) & 0xff
      if (m == 0xff) { pos += 1 } // fill byte before a marker
      else if (m == 0x01 || (m >= 0xd0 && m <= 0xd7)) { pos += 2 } // TEM/RSTn: no payload
      else if (m == 0xd9 || m == 0xda) return Unknown // EOI / scan data before any SOF
      else if (m >= 0xc0 && m <= 0xcf && m != 0xc4 && m != 0xc8 && m != 0xcc) {
        // SOFn payload: len(2) precision(1) height(2) width(2)
        if (pos + 8 < d.length)
          return InternalRow(UTF8String.fromString("jpeg"),
            be16(d, pos + 7), be16(d, pos + 5))
        return Unknown
      } else {
        if (pos + 3 >= d.length) return Unknown
        val segLen = (be16(d, pos + 2)).toInt
        if (segLen < 2) return Unknown // length covers itself; <2 is corrupt
        pos += 2 + segLen
      }
    }
    Unknown
  }

  private def be16(d: Array[Byte], i: Int): Long =
    ((d(i) & 0xffL) << 8) | (d(i + 1) & 0xffL)

  private def be32(d: Array[Byte], i: Int): Long =
    ((d(i) & 0xffL) << 24) | ((d(i + 1) & 0xffL) << 16) |
      ((d(i + 2) & 0xffL) << 8) | (d(i + 3) & 0xffL)
}
