package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

class OsmXmlSpec extends SparkSpec {
  import spark.implicits._

  private val nodeDdl =
    "_id BIGINT, _lat BIGINT, _lon BIGINT, tag ARRAY<STRUCT<_k: STRING, _v: STRING>>"
  private val wayDdl =
    "_id BIGINT, nd ARRAY<STRUCT<_ref: BIGINT>>, tag ARRAY<STRUCT<_k: STRING, _v: STRING>>"
  private val relDdl =
    "_id BIGINT, member ARRAY<STRUCT<_type: STRING, _ref: BIGINT, _role: STRING>>, " +
      "tag ARRAY<STRUCT<_k: STRING, _v: STRING>>"

  private def agree(xmls: Seq[String], ddl: String,
                    native: org.apache.spark.sql.Column => org.apache.spark.sql.Column): Unit = {
    val df = xmls.toDF("x")
    val out = df.select(
      to_json(native(col("x"))).as("n"),
      to_json(from_xml(col("x"), StructType.fromDDL(ddl))).as("f"))
      .collect()
    out.zip(xmls).foreach { case (r, x) =>
      assert(r.getAs[String]("n") === r.getAs[String]("f"), s"diverged on: $x")
    }
  }

  test("node parse matches from_xml") {
    agree(Seq(
      """<node id="7" lat="503123" lon="302456"><tag k="highway" v="bus_stop"/><tag k="ref" v="42"/></node>""",
      // attribute order permuted, single quotes, extra whitespace
      """<node lon='11'   lat='22' id='3' ><tag k='a' v='b'/></node>""",
      // no tags, self-closing root
      """<node id="1" lat="2" lon="3"/>""",
      // entity escapes in values
      """<node id="5" lat="6" lon="7"><tag k="name" v="Q&amp;A &lt;3 &#65;"/></node>""",
      // missing attributes -> null fields
      """<node id="9"><tag k="x" v="y"/></node>""",
      // non-self-closed child form
      """<node id="4" lat="1" lon="2"><tag k="a" v="b"></tag></node>"""),
      nodeDdl, graft.plans.OsmXml.node)
  }

  test("way parse matches from_xml") {
    agree(Seq(
      """<way id="12"><nd ref="100"/><nd ref="101"/><nd ref="102"/><tag k="highway" v="primary"/></way>""",
      """<way id="13"></way>""",
      """<way id="14"><tag k="only" v="tags"/></way>"""),
      wayDdl, graft.plans.OsmXml.way)
  }

  test("relation parse matches from_xml") {
    agree(Seq(
      """<relation id="8"><member type="way" ref="20" role="outer"/><member type="way" ref="21" role="inner"/><member type="node" ref="22" role="stop"/><tag k="type" v="route"/><tag k="route_ref" v="9"/></relation>""",
      """<relation id="15"><member type="node" ref="1" role=""/></relation>"""),
      relDdl, graft.plans.OsmXml.relation)
  }

  test("malformed and non-OSM documents parse to null") {
    val bad = Seq(
      "not xml at all",
      "<node id=\"1\"",            // unterminated tag
      "<node id=1 lat=\"2\"/>",    // unquoted attribute
      "<node id=\"1\"><tag k=\"a\" v=\"b\"/>", // missing close tag
      // close-tag name must match EXACTLY, not by prefix: from_xml
      // yields null for both of these
      "<node id=\"1\"><tag k=\"a\" v=\"b\"/></nodeExtra>",
      "<node id=\"1\"><tag k=\"a\" v=\"b\"></tagX></node>",
      "<relation id=\"1\"><member type=\"way\"><nested/></member></relation>") // nesting
    val out = bad.toDF("x")
      .select(graft.plans.OsmXml.node(col("x")).as("w"))
      .collect()
    out.zip(bad).foreach { case (r, x) =>
      assert(r.isNullAt(0), s"expected null for: $x")
    }
  }

  test("null input yields null") {
    val out = Seq[Option[String]](None).toDF("x")
      .select(graft.plans.OsmXml.relation(col("x")).as("w")).collect()
    assert(out.head.isNullAt(0))
  }
}
