package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Reader for the reference's date-rotated position JSONL
  * (kpt/poller/writer.py:85-92 `write_positions`: one JSON object per
  * line with metadata + a nested `positions` array of VehiclePosition
  * dicts, models.py:9-27).
  *
  * Declarative from_json + posexplode: Catalyst prunes unreferenced
  * struct fields at the parse, and the explode is pipeline-parallel —
  * no custom record reader needed for a line-delimited format.
  */
object PositionLog {

  /** VehiclePosition fields (models.py:9-17). */
  val PositionSchema: StructType = StructType(Seq(
    StructField("vehicle_id", LongType),
    StructField("route_id", LongType),
    StructField("lat", DoubleType),
    StructField("lon", DoubleType),
    StructField("direction", LongType),
    StructField("flag", LongType),
    StructField("timestamp", LongType)))

  /** Full record envelope (writer.py:86-91). */
  val RecordSchema: StructType = StructType(Seq(
    StructField("collected_by", StringType),
    StructField("timestamp", StringType),
    StructField("count", IntegerType),
    StructField("positions", ArrayType(PositionSchema))))

  /** Route metadata record (models.py:40-57 RouteRecord.to_dict: an
    * envelope with poll bookkeeping + a nested `routes` array; route
    * dicts carry id / number / type with type 1/2/3 = tram/trol/bus). */
  val RouteSchema: StructType = StructType(Seq(
    StructField("id", LongType),
    StructField("number", StringType),
    StructField("type", IntegerType)))

  val RoutesRecordSchema: StructType = StructType(Seq(
    StructField("collected_by", StringType),
    StructField("timestamp", StringType),
    StructField("poll_number", LongType),
    StructField("route_count", IntegerType),
    StructField("routes", ArrayType(RouteSchema))))

  /** One row per nested route with its in-record index. */
  def parseRouteLines(df: DataFrame, lineCol: Column): DataFrame =
    df.withColumn("__rec", graft.plans.RoutesRecordParse(lineCol))
      .select(col("*"), col("__rec.poll_number").as("poll_number"),
        col("__rec.route_count").as("route_count"),
        posexplode(col("__rec.routes")).as(Seq("route_idx", "__r")))
      .select(col("*"), col("__r.id").as("route_id"),
        col("__r.number").as("route_number"), col("__r.type").as("route_type"))
      .drop("__rec", "__r")

  /** Parses a column of JSONL lines into one row per nested position,
    * keeping the in-record index (pos_idx) and the envelope count. */
  def parseLines(df: DataFrame, lineCol: Column): DataFrame =
    // native fixed-schema parse (plans/PositionJson.scala): from_json is
    // CodegenFallback and walks a generic converter; field-identical on
    // canonical writer output (PositionJsonSpec), and the null-struct-
    // on-malformed difference is invisible past the posexplode
    df.withColumn("__rec", graft.plans.PositionRecordParse(lineCol))
      .select(col("*"), col("__rec.count").as("rec_count"),
        posexplode(col("__rec.positions")).as(Seq("pos_idx", "__p")))
      .select(col("*"), col("__p.vehicle_id").as("vehicle_id"),
        col("__p.route_id").as("route_id"), col("__p.lat").as("lat"),
        col("__p.lon").as("lon"), col("__p.direction").as("direction"),
        col("__p.flag").as("flag"), col("__p.timestamp").as("pos_ts"))
      .drop("__rec", "__p")
}
