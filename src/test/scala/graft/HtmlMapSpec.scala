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
    // drive the ACTUAL query against an empty events fixture (an
    // inline re-implementation of the aggregate would not catch a
    // regression in geoMapHtml's own coalesce — round-12 ADVICE)
    val tmp = java.nio.file.Files.createTempDirectory("graft-empty-events")
    try {
      spark.read.parquet("/root/testdata/sf0.001/events.parquet").limit(0)
        .write.mode("overwrite").parquet(s"$tmp/events.parquet")
      val row = SparkEntry.queries("geo_map_html")(spark, tmp.toString)
        .collect().head
      assert(row.getDouble(row.fieldIndex("center_lat")) === 50.45)
      assert(row.getDouble(row.fieldIndex("center_lon")) === 30.52)
      val html = row.getString(row.fieldIndex("html"))
      assert(html.contains("setView([50.450000, 30.520000], 12)"))
      assert(html.contains("var positions = []"))
      assert(html.startsWith("<!DOCTYPE html>") && html.endsWith("</html>\n"))
    } finally {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(tmp).sorted(java.util.Comparator.reverseOrder())
        .iterator().asScala.foreach(java.nio.file.Files.delete)
    }
  }
}
