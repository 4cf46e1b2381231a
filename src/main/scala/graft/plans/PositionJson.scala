package graft.plans

import com.fasterxml.jackson.core.{JsonFactory, JsonParser, JsonToken}
import com.fasterxml.jackson.core.json.JsonReadFeature

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native single-pass parsers for the reference's two JSONL envelopes
  * (kpt/poller/writer.py:85-92 position records, models.py:40-57 route
  * records). `from_json` is CodegenFallback — it splits the
  * whole-stage-codegen span, boxes every row, and walks a generic
  * schema converter; these expressions parse the FIXED schema with a
  * Jackson streaming parser straight into unsafe-compatible rows and
  * stay inside the codegen span (same design as the OsmXml parses).
  *
  * Contract: on the writer's canonical output, field-identical to
  * `from_json(line, schema)` (asserted in PositionJsonSpec, including
  * unknown-field skipping and field-order independence). A MALFORMED
  * line yields a NULL struct, where PERMISSIVE from_json yields an
  * all-null-fields struct — indistinguishable to every consumer
  * (field projections are null either way and posexplode drops both);
  * corrupt-line routing (ing_corrupt_quarantine) keeps from_json.
  * Numeric widening matches from_json: ints read as long, int fields
  * narrow from long, doubles accept integer tokens. */
private[plans] object PositionJsonCommon {
  // Spark's JSON reader defaults allowNonNumericNumbers=true: unquoted
  // NaN/Infinity number tokens parse as doubles instead of failing the
  // record. Mirror it so these parsers stay from_json-identical beyond
  // the documented null-struct divergence (round-12 ADVICE).
  val Factory: JsonFactory = new com.fasterxml.jackson.core.JsonFactoryBuilder()
    .enable(JsonReadFeature.ALLOW_NON_NUMERIC_NUMBERS)
    .build()

  /** Skips the value the parser is positioned ON (after nextToken). */
  def skipValue(p: JsonParser): Unit = {
    val t = p.currentToken()
    if (t == JsonToken.START_OBJECT || t == JsonToken.START_ARRAY) p.skipChildren()
    ()
  }

  def readLong(p: JsonParser): Any = p.currentToken() match {
    case JsonToken.VALUE_NUMBER_INT => p.getLongValue
    case JsonToken.VALUE_NULL => null
    case _ => throw MalformedField
  }

  def readInt(p: JsonParser): Any = p.currentToken() match {
    case JsonToken.VALUE_NUMBER_INT => p.getIntValue
    case JsonToken.VALUE_NULL => null
    case _ => throw MalformedField
  }

  def readDouble(p: JsonParser): Any = p.currentToken() match {
    case JsonToken.VALUE_NUMBER_FLOAT | JsonToken.VALUE_NUMBER_INT => p.getDoubleValue
    case JsonToken.VALUE_NULL => null
    // Spark's JacksonParser additionally admits the quoted special
    // doubles when allowNonNumericNumbers is on — mirror the exact set
    case JsonToken.VALUE_STRING => p.getText match {
      case "NaN" => Double.NaN
      case "+INF" | "+Infinity" | "Infinity" => Double.PositiveInfinity
      case "-INF" | "-Infinity" => Double.NegativeInfinity
      case _ => throw MalformedField
    }
    case _ => throw MalformedField
  }

  def readString(p: JsonParser): Any = p.currentToken() match {
    case JsonToken.VALUE_STRING => UTF8String.fromString(p.getText)
    case JsonToken.VALUE_NULL => null
    case _ => throw MalformedField
  }

  /** Control-flow sentinel: any structural surprise aborts to the
    * null-struct result (stackless — thrown per malformed LINE, not in
    * the hot path). */
  object MalformedField extends RuntimeException {
    override def fillInStackTrace(): Throwable = this
  }
}

/** positions envelope: struct<collected_by:string, timestamp:string,
  * count:int, positions:array<struct<vehicle_id:long, route_id:long,
  * lat:double, lon:double, direction:long, flag:long, timestamp:long>>>. */
case class PositionRecordParse(child: Expression)
  extends UnaryExpression with ImplicitCastInputTypes {
  override def dataType: DataType = graft.sources.PositionLog.RecordSchema
  override def prettyName: String = "position_record_parse"
  override def inputTypes = Seq(StringType)

  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any =
    PositionRecordParse.compute(input.asInstanceOf[UTF8String])

  // explicit isNull re-check: compute() returns null for a MALFORMED
  // line (non-null input), which defineCodeGen's child-derived isNull
  // would miss — a downstream GetStructField would NPE on the null row
  // (caught in r16 by SocketIoFrame's corrupt-routing query; this
  // parser had the same latent defect, masked only because its
  // registered inputs are writer-canonical)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.plans.PositionRecordParse.compute($c);
      ${ev.isNull} = ${ev.value} == null;
    """)

  override protected def withNewChildInternal(newChild: Expression): PositionRecordParse =
    copy(child = newChild)
}

object PositionRecordParse {
  import PositionJsonCommon._

  def apply(c: Column): Column = call_function("position_record_parse", c)

  private def parsePosition(p: JsonParser): InternalRow = {
    // fields: vehicle_id, route_id, lat, lon, direction, flag, timestamp
    val r = new GenericInternalRow(7)
    var t = p.nextToken()
    while (t == JsonToken.FIELD_NAME) {
      val name = p.currentName()
      p.nextToken()
      name match {
        case "vehicle_id" => r.update(0, readLong(p))
        case "route_id" => r.update(1, readLong(p))
        case "lat" => r.update(2, readDouble(p))
        case "lon" => r.update(3, readDouble(p))
        case "direction" => r.update(4, readLong(p))
        case "flag" => r.update(5, readLong(p))
        case "timestamp" => r.update(6, readLong(p))
        case _ => skipValue(p)
      }
      t = p.nextToken()
    }
    if (t != JsonToken.END_OBJECT) throw MalformedField
    r
  }

  /** Called from generated code. */
  def compute(line: UTF8String): InternalRow =
    try {
      val p = Factory.createParser(line.toString)
      try {
        if (p.nextToken() != JsonToken.START_OBJECT) return null
        val r = new GenericInternalRow(4)
        var t = p.nextToken()
        while (t == JsonToken.FIELD_NAME) {
          val name = p.currentName()
          p.nextToken()
          name match {
            case "collected_by" => r.update(0, readString(p))
            case "timestamp" => r.update(1, readString(p))
            case "count" => r.update(2, readInt(p))
            case "positions" =>
              p.currentToken() match {
                case JsonToken.VALUE_NULL => r.update(3, null)
                case JsonToken.START_ARRAY =>
                  val buf = new java.util.ArrayList[Any](16)
                  var e = p.nextToken()
                  while (e != JsonToken.END_ARRAY) {
                    e match {
                      case JsonToken.START_OBJECT => buf.add(parsePosition(p))
                      case JsonToken.VALUE_NULL => buf.add(null)
                      case _ => throw MalformedField
                    }
                    e = p.nextToken()
                  }
                  r.update(3, new GenericArrayData(buf.toArray))
                case _ => throw MalformedField
              }
            case _ => skipValue(p)
          }
          t = p.nextToken()
        }
        if (t != JsonToken.END_OBJECT) throw MalformedField
        r
      } finally p.close()
    } catch { case _: Exception => null }
}

/** routes envelope: struct<collected_by:string, timestamp:string,
  * poll_number:long, route_count:int,
  * routes:array<struct<id:long, number:string, type:int>>>. */
case class RoutesRecordParse(child: Expression)
  extends UnaryExpression with ImplicitCastInputTypes {
  override def dataType: DataType = graft.sources.PositionLog.RoutesRecordSchema
  override def prettyName: String = "routes_record_parse"
  override def inputTypes = Seq(StringType)

  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any =
    RoutesRecordParse.compute(input.asInstanceOf[UTF8String])

  // see PositionRecordParse.doGenCode — null return must set isNull
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.plans.RoutesRecordParse.compute($c);
      ${ev.isNull} = ${ev.value} == null;
    """)

  override protected def withNewChildInternal(newChild: Expression): RoutesRecordParse =
    copy(child = newChild)
}

object RoutesRecordParse {
  import PositionJsonCommon._

  def apply(c: Column): Column = call_function("routes_record_parse", c)

  private def parseRoute(p: JsonParser): InternalRow = {
    val r = new GenericInternalRow(3)
    var t = p.nextToken()
    while (t == JsonToken.FIELD_NAME) {
      val name = p.currentName()
      p.nextToken()
      name match {
        case "id" => r.update(0, readLong(p))
        case "number" => r.update(1, readString(p))
        case "type" => r.update(2, readInt(p))
        case _ => skipValue(p)
      }
      t = p.nextToken()
    }
    if (t != JsonToken.END_OBJECT) throw MalformedField
    r
  }

  /** Called from generated code. */
  def compute(line: UTF8String): InternalRow =
    try {
      val p = Factory.createParser(line.toString)
      try {
        if (p.nextToken() != JsonToken.START_OBJECT) return null
        val r = new GenericInternalRow(5)
        var t = p.nextToken()
        while (t == JsonToken.FIELD_NAME) {
          val name = p.currentName()
          p.nextToken()
          name match {
            case "collected_by" => r.update(0, readString(p))
            case "timestamp" => r.update(1, readString(p))
            case "poll_number" => r.update(2, readLong(p))
            case "route_count" => r.update(3, readInt(p))
            case "routes" =>
              p.currentToken() match {
                case JsonToken.VALUE_NULL => r.update(4, null)
                case JsonToken.START_ARRAY =>
                  val buf = new java.util.ArrayList[Any](16)
                  var e = p.nextToken()
                  while (e != JsonToken.END_ARRAY) {
                    e match {
                      case JsonToken.START_OBJECT => buf.add(parseRoute(p))
                      case JsonToken.VALUE_NULL => buf.add(null)
                      case _ => throw MalformedField
                    }
                    e = p.nextToken()
                  }
                  r.update(4, new GenericArrayData(buf.toArray))
                case _ => throw MalformedField
              }
            case _ => skipValue(p)
          }
          t = p.nextToken()
        }
        if (t != JsonToken.END_OBJECT) throw MalformedField
        r
      } finally p.close()
    } catch { case _: Exception => null }
}
