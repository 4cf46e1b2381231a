package graft

import graft.plans.{PositionRecordParse, RoutesRecordParse}
import graft.sources.PositionLog
import org.apache.spark.sql.functions._

/** Equality of the native envelope parsers with from_json on the
  * writer's canonical output plus stress variants (field order,
  * unknown fields, nulls, missing fields, unicode). Malformed lines:
  * the native parse yields a NULL struct where PERMISSIVE from_json
  * yields all-null FIELDS — the spec pins that every OBSERVABLE
  * consumer output (field projection, posexplode) is identical.
  */
class PositionJsonSpec extends SparkSpec {
  import spark.implicits._

  private val canonical = Seq(
    """{"collected_by":"kyiv-traffic","timestamp":"2024-01-05T10:00:00","count":2,"positions":[{"vehicle_id":7,"route_id":3,"lat":50.45,"lon":30.52,"direction":90,"flag":1,"timestamp":1704448800},{"vehicle_id":8,"route_id":3,"lat":50.46,"lon":30.53,"direction":180,"flag":0,"timestamp":1704448801}]}""",
    // reordered fields + unknown field + unicode value
    """{"count":1,"extra":{"nested":[1,2]},"timestamp":"t","collected_by":"п▒ї","positions":[{"timestamp":5,"lat":1.5,"vehicle_id":1,"route_id":2,"lon":-2.25,"flag":0,"direction":0}]}""",
    // nulls and missing fields
    """{"collected_by":null,"count":null,"positions":[{"vehicle_id":1},null,{}]}""",
    // empty positions, integer-token double
    """{"collected_by":"x","timestamp":"y","count":0,"positions":[]}""",
    """{"collected_by":"x","positions":[{"lat":50,"lon":30}]}""",
    // null positions array
    """{"collected_by":"x","positions":null}""",
    // non-numeric doubles, unquoted and quoted: Spark's JSON reader
    // runs with allowNonNumericNumbers=true, so NaN/Infinity number
    // tokens and the quoted special set must parse, not null the record
    """{"collected_by":"nn","positions":[{"vehicle_id":1,"lat":NaN,"lon":Infinity}]}""",
    """{"collected_by":"nn2","positions":[{"lat":-Infinity,"lon":"NaN"}]}""",
    """{"collected_by":"nn3","positions":[{"lat":"+INF","lon":"-Infinity"}]}"""
  )

  private val malformed = Seq(
    "", "{", "[1,2]", "\"str\"", "{\"positions\":[{\"lat\":}]}",
    "{\"positions\":{\"not\":\"array\"}}", "{\"count\":\"NaN\"}")

  test("PositionRecordParse equals from_json on canonical envelope lines") {
    val df = canonical.toDF("line")
    val rows = df.select(
      PositionRecordParse(col("line")).as("fast"),
      from_json(col("line"), PositionLog.RecordSchema).as("slow"))
      .selectExpr("fast.*", "slow.*").collect()
    rows.foreach { r =>
      val n = r.length / 2
      (0 until n).foreach { i =>
        assert(r.get(i) === r.get(i + n), s"field $i differs in row $r")
      }
    }
  }

  test("RoutesRecordParse equals from_json on canonical route lines") {
    val lines = Seq(
      """{"collected_by":"kt","timestamp":"t","poll_number":12,"route_count":2,"routes":[{"id":1,"number":"9-A","type":3},{"id":2,"number":"Т4","type":1}]}""",
      """{"routes":[{"number":"x"},{}],"poll_number":null}""",
      """{"routes":null}""").toDF("line")
    val rows = lines.select(
      RoutesRecordParse(col("line")).as("fast"),
      from_json(col("line"), PositionLog.RoutesRecordSchema).as("slow"))
      .selectExpr("fast.*", "slow.*").collect()
    rows.foreach { r =>
      val n = r.length / 2
      (0 until n).foreach { i =>
        assert(r.get(i) === r.get(i + n), s"field $i differs in row $r")
      }
    }
  }

  test("malformed lines: observable consumer output matches from_json") {
    val df = malformed.toDF("line")
    // observable surface = what parseLines consumers see: projected
    // envelope fields and the exploded positions
    def observe(parsed: org.apache.spark.sql.Column) = df
      .withColumn("__rec", parsed)
      .select(col("line"), col("__rec.count").as("c"),
        posexplode_outer(col("__rec.positions")).as(Seq("i", "p")))
      .collect().map(_.toString).sorted.toSeq
    val fast = observe(PositionRecordParse(col("line")))
    val slow = observe(from_json(col("line"), PositionLog.RecordSchema))
    assert(fast === slow)
  }

  test("parseLines output is unchanged on the writer's own envelope shape") {
    // the exact builder the batch and streaming queries feed the parser
    val lines = Seq(
      (1L, """{"collected_by":"kyiv-transport-poller","timestamp":"2024-01-05T10:00:00+00:00","count":2,"positions":[{"vehicle_id":11,"route_id":4,"lat":50.401,"lon":30.61,"direction":45,"flag":1,"timestamp":1704448800},{"vehicle_id":12,"route_id":4,"lat":50.402,"lon":30.62,"direction":46,"flag":0,"timestamp":1704448801}]}"""))
      .toDF("event_id", "line")
    val out = PositionLog.parseLines(lines, col("line"))
      .select("event_id", "pos_idx", "vehicle_id", "route_id", "lat", "lon",
        "direction", "flag", "pos_ts", "rec_count")
      .as[(Long, Int, Long, Long, Double, Double, Long, Long, Long, Int)]
      .collect().toSeq
    assert(out === Seq(
      (1L, 0, 11L, 4L, 50.401, 30.61, 45L, 1L, 1704448800L, 2),
      (1L, 1, 12L, 4L, 50.402, 30.62, 46L, 0L, 1704448801L, 2)))
  }
}
