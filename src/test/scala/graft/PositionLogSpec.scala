package graft

import graft.sources.PositionLog
import org.apache.spark.sql.functions._

class PositionLogSpec extends SparkSpec {
  import spark.implicits._

  test("parses the nested envelope, keeps per-record index and count") {
    val line = """{"collected_by":"kpt","timestamp":"2024-01-01T00:00:00","count":2,""" +
      """"positions":[{"vehicle_id":7,"route_id":2,"lat":50.5,"lon":30.6,""" +
      """"direction":1,"flag":0,"timestamp":1700000000},""" +
      """{"vehicle_id":8,"route_id":3,"lat":50.51,"lon":30.61,""" +
      """"direction":0,"flag":1,"timestamp":1700000100}]}"""
    val out = PositionLog.parseLines(Seq(line).toDF("line"), col("line"))
      .select("pos_idx", "vehicle_id", "lat", "pos_ts", "rec_count")
      .as[(Int, Long, Double, Long, Int)].collect().toSeq.sortBy(_._1)
    assert(out === Seq((0, 7L, 50.5, 1700000000L, 2), (1, 8L, 50.51, 1700000100L, 2)))
  }

  test("malformed lines and empty positions arrays yield no rows") {
    val lines = Seq(
      "not json at all",
      """{"collected_by":"kpt","timestamp":"t","count":0,"positions":[]}""")
      .toDF("line")
    assert(PositionLog.parseLines(lines, col("line")).count() === 0)
  }
}
