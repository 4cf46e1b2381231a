package graft

import org.apache.spark.sql.functions._

/** geo_map_html content contract: the assembled document carries the
  * template bytes around the substituted values, positions are ordered
  * by vehicle_id, and an empty corpus falls back to the Kyiv center
  * (visualize.py:193). Byte-level engine-vs-oracle equality is the
  * driver gate's job; this spec pins the pieces a template regression
  * would silently break.
  */
class HtmlMapSpec extends SparkSpec {

  test("geo_map_html assembles the Leaflet page around sorted positions") {
    val row = SparkEntry.queries("geo_map_html")(spark, "/root/testdata/sf0.001")
      .collect().head
    val html = row.getString(row.fieldIndex("html"))
    assert(html.startsWith("<!DOCTYPE html>"))
    assert(html.contains("L.map('map').setView(["))
    assert(html.contains("var positions = ["))
    assert(html.endsWith("</html>\n"))
    // substituted center matches the returned columns, %.6f-formatted
    val clat = row.getDouble(row.fieldIndex("center_lat"))
    val clon = row.getDouble(row.fieldIndex("center_lon"))
    assert(html.contains(f"setView([$clat%.6f, $clon%.6f], 12)"))
    // positions array ordered by vehicle_id
    val ids = "\"vehicle_id\":(\\d+)".r.findAllMatchIn(html)
      .map(_.group(1).toLong).toSeq
    assert(ids.nonEmpty && ids == ids.sorted)
    // every position object carries the full field set
    assert("\\{\"vehicle_id\":\\d+,\"route_id\":\\d+,\"lat\":[\\d.]+,\"lon\":[\\d.]+,\"timestamp\":\\d+,\"avg_speed\":[\\d.]+\\}".r
      .findAllIn(html).size == ids.size)
  }

  test("empty corpus falls back to the Kyiv center (visualize.py:193)") {
    import spark.implicits._
    val empty = Seq.empty[(Long, Long, Double, Double, Long, Double, String)]
      .toDF("vehicle_id", "route_id", "lat", "lon", "ts_us", "avg_speed", "route_label")
    // exercise the same aggregate shape the query uses on an empty frame
    val row = empty.agg(
      coalesce(round(avg("lat"), 6), lit(50.45)).as("center_lat"),
      coalesce(round(avg("lon"), 6), lit(30.52)).as("center_lon"),
      array_join(transform(array_sort(collect_list(struct(col("vehicle_id"),
        col("route_label").as("o")))), x => x.getField("o")), ",").as("pj"))
      .collect().head
    assert(row.getDouble(0) === 50.45 && row.getDouble(1) === 30.52)
    assert(row.getString(2) === "")
  }
}
