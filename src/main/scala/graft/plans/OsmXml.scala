package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native single-pass parsers for the three OSM XML entity shapes the
  * reference importer consumes (importer.py:258-292 _parse_node /
  * _parse_way / _parse_relation): root attributes plus the flat
  * self-closing children OSM uses (`tag`, `nd`, `member`).
  *
  * These replace `from_xml`, which is CodegenFallback: it splits the
  * whole-stage-codegen span around itself and pays generic
  * schema-driven StAX parsing per row. A purpose-built scanner for the
  * OSM element family keeps the projection inside one codegen span and
  * parses an element in one pass with no parser factory, no DOM, and
  * no per-field dispatch.
  *
  * Parsing rules (the subset of XML that OSM planet/Overpass payloads
  * use, matching from_xml's observable output on the same schema):
  * attributes in any order with single- or double-quoted values, the
  * five standard entities plus numeric character references, arbitrary
  * whitespace, self-closing or empty children, and null-on-malformed
  * (mirroring from_xml's PERMISSIVE null row). Nested grandchildren do
  * not occur in node/way/relation elements; a document carrying any is
  * rejected as malformed rather than misparsed.
  */
object OsmXml {

  val TagType: ArrayType = ArrayType(StructType(Seq(
    StructField("_k", StringType), StructField("_v", StringType))))

  val NodeType: StructType = StructType(Seq(
    StructField("_id", LongType), StructField("_lat", LongType),
    StructField("_lon", LongType), StructField("tag", TagType)))

  val WayType: StructType = StructType(Seq(
    StructField("_id", LongType),
    StructField("nd", ArrayType(StructType(Seq(StructField("_ref", LongType))))),
    StructField("tag", TagType)))

  val RelationType: StructType = StructType(Seq(
    StructField("_id", LongType),
    StructField("member", ArrayType(StructType(Seq(
      StructField("_type", StringType), StructField("_ref", LongType),
      StructField("_role", StringType))))),
    StructField("tag", TagType)))

  def node(c: Column): Column = call_function("osm_node_parse", c)
  def way(c: Column): Column = call_function("osm_way_parse", c)
  def relation(c: Column): Column = call_function("osm_relation_parse", c)

  // ---- scanner -----------------------------------------------------------

  /** Parsed element: name + interleaved [k0, v0, k1, v1, ...] attrs. */
  private final class Elem(val name: String, val attrs: Array[String])

  private def attr(e: Elem, k: String): String = {
    var i = 0
    while (i < e.attrs.length) {
      if (e.attrs(i) == k) return e.attrs(i + 1)
      i += 2
    }
    null
  }

  private def attrLong(e: Elem, k: String): Any = {
    val v = attr(e, k)
    if (v == null) null
    else try java.lang.Long.valueOf(java.lang.Long.parseLong(v.trim))
    catch { case _: NumberFormatException => null }
  }

  private def utf8(s: String): UTF8String =
    if (s == null) null else UTF8String.fromString(s)

  /** Root element + its direct children, or null when malformed. */
  private def parse(text: String): (Elem, java.util.ArrayList[Elem]) = {
    val n = text.length
    var i = skipWs(text, 0)
    if (i >= n || text.charAt(i) != '<') return null
    val root = parseTag(text, i)
    if (root == null) return null
    i = root._3
    val children = new java.util.ArrayList[Elem](8)
    if (root._2) { // self-closing root: no children
      return (root._1, children)
    }
    while (true) {
      i = skipWs(text, i)
      if (i >= n) return null // never saw the close tag
      if (text.charAt(i) != '<') {
        // text content inside node/way/relation: skip to the next tag
        while (i < n && text.charAt(i) != '<') i += 1
        if (i >= n) return null
      } else if (i + 1 < n && text.charAt(i + 1) == '/') {
        // close tag — must match the root (children self-close)
        val j = text.indexOf('>', i)
        if (j < 0) return null
        if (!closeTagMatches(text, i, root._1.name)) return null
        return (root._1, children)
      } else {
        val c = parseTag(text, i)
        if (c == null) return null
        i = c._3
        if (!c._2) {
          // a non-self-closed child: accept an immediately following
          // matching close tag (<tag ...></tag>); anything nested is
          // outside the OSM shape -> malformed
          val k = skipWs(text, i)
          if (k + 1 >= n || text.charAt(k) != '<' || text.charAt(k + 1) != '/')
            return null
          val j = text.indexOf('>', k)
          if (j < 0 || !closeTagMatches(text, k, c._1.name)) return null
          i = j + 1
        }
        children.add(c._1)
      }
    }
    null // unreachable
  }

  /** `</name>` at `openIdx` (the '<'): the name must match EXACTLY —
   *  a prefix match would accept `</nodeExtra>` as the close of
   *  `<node>`, where from_xml yields null. The char after the name
   *  must be '>' or whitespace. */
  private def closeTagMatches(s: String, openIdx: Int, name: String): Boolean = {
    if (!s.regionMatches(openIdx + 2, name, 0, name.length)) return false
    val after = openIdx + 2 + name.length
    after < s.length && (s.charAt(after) == '>' || Character.isWhitespace(s.charAt(after)))
  }

  private def skipWs(s: String, from: Int): Int = {
    var i = from
    while (i < s.length && Character.isWhitespace(s.charAt(i))) i += 1
    i
  }

  private def isNameChar(c: Char): Boolean =
    c != '>' && c != '/' && c != '=' && !Character.isWhitespace(c)

  /** Parses `<name a="v" ...>` or `<name .../>` starting at the '<'.
    * Returns (elem, selfClosed, indexAfterTag) or null. */
  private def parseTag(s: String, start: Int): (Elem, Boolean, Int) = {
    val n = s.length
    var i = start + 1
    val nameStart = i
    while (i < n && isNameChar(s.charAt(i))) i += 1
    if (i == nameStart) return null
    val name = s.substring(nameStart, i)
    val attrs = new java.util.ArrayList[String](8)
    while (true) {
      i = skipWs(s, i)
      if (i >= n) return null
      s.charAt(i) match {
        case '>' =>
          return (new Elem(name, attrs.toArray(new Array[String](attrs.size))), false, i + 1)
        case '/' =>
          if (i + 1 >= n || s.charAt(i + 1) != '>') return null
          return (new Elem(name, attrs.toArray(new Array[String](attrs.size))), true, i + 2)
        case _ =>
          val kStart = i
          while (i < n && isNameChar(s.charAt(i))) i += 1
          if (i == kStart) return null
          val k = s.substring(kStart, i)
          i = skipWs(s, i)
          if (i >= n || s.charAt(i) != '=') return null
          i = skipWs(s, i + 1)
          if (i >= n) return null
          val q = s.charAt(i)
          if (q != '"' && q != '\'') return null
          val vStart = i + 1
          val vEnd = s.indexOf(q, vStart)
          if (vEnd < 0) return null
          attrs.add(k)
          attrs.add(unescape(s.substring(vStart, vEnd)))
          i = vEnd + 1
      }
    }
    null // unreachable
  }

  /** XML entity decoding; returns the input unchanged when it carries
    * no ampersand (the hot path). Unknown entities pass through
    * verbatim, matching lenient parser behavior. */
  private def unescape(v: String): String = {
    var amp = v.indexOf('&')
    if (amp < 0) return v
    val sb = new java.lang.StringBuilder(v.length)
    var i = 0
    while (amp >= 0) {
      sb.append(v, i, amp)
      val semi = v.indexOf(';', amp)
      if (semi < 0) { i = amp; amp = -1 } // no terminator: literal tail
      else {
        val ent = v.substring(amp + 1, semi)
        val rep = ent match {
          case "amp" => "&"
          case "lt" => "<"
          case "gt" => ">"
          case "quot" => "\""
          case "apos" => "'"
          case _ if ent.startsWith("#x") || ent.startsWith("#X") =>
            try new String(Character.toChars(Integer.parseInt(ent.substring(2), 16)))
            catch { case _: Exception => null }
          case _ if ent.startsWith("#") =>
            try new String(Character.toChars(Integer.parseInt(ent.substring(1))))
            catch { case _: Exception => null }
          case _ => null
        }
        if (rep == null) { sb.append('&'); i = amp + 1 } // verbatim
        else { sb.append(rep); i = semi + 1 }
        amp = v.indexOf('&', i)
      }
    }
    sb.append(v, i, v.length)
    sb.toString
  }

  /** from_xml surfaces an element with no matching children as a NULL
    * array field, not an empty one — mirror that. */
  private def arrOrNull(out: java.util.ArrayList[Any]): GenericArrayData =
    if (out.isEmpty) null else new GenericArrayData(out.toArray)

  private def tags(children: java.util.ArrayList[Elem]): GenericArrayData = {
    val out = new java.util.ArrayList[Any](children.size)
    var i = 0
    while (i < children.size) {
      val c = children.get(i)
      if (c.name == "tag")
        out.add(InternalRow(utf8(attr(c, "k")), utf8(attr(c, "v"))))
      i += 1
    }
    arrOrNull(out)
  }

  // ---- entity builders (called from generated code) ----------------------

  def parseNode(xml: UTF8String): InternalRow = {
    val p = parse(xml.toString)
    if (p == null) return null
    val (root, children) = p
    InternalRow(attrLong(root, "id"), attrLong(root, "lat"),
      attrLong(root, "lon"), tags(children))
  }

  def parseWay(xml: UTF8String): InternalRow = {
    val p = parse(xml.toString)
    if (p == null) return null
    val (root, children) = p
    val nds = new java.util.ArrayList[Any](children.size)
    var i = 0
    while (i < children.size) {
      val c = children.get(i)
      if (c.name == "nd") nds.add(InternalRow(attrLong(c, "ref")))
      i += 1
    }
    InternalRow(attrLong(root, "id"), arrOrNull(nds), tags(children))
  }

  def parseRelation(xml: UTF8String): InternalRow = {
    val p = parse(xml.toString)
    if (p == null) return null
    val (root, children) = p
    val members = new java.util.ArrayList[Any](children.size)
    var i = 0
    while (i < children.size) {
      val c = children.get(i)
      if (c.name == "member")
        members.add(InternalRow(utf8(attr(c, "type")), attrLong(c, "ref"),
          utf8(attr(c, "role"))))
      i += 1
    }
    InternalRow(attrLong(root, "id"), arrOrNull(members), tags(children))
  }
}

/** Shared base: string -> struct with null-on-malformed codegen. */
abstract class OsmXmlParse extends UnaryExpression with ImplicitCastInputTypes {
  override def inputTypes = Seq(StringType)
  override def nullable: Boolean = true
  protected def computeFn: String

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
       |${ev.value} = graft.plans.OsmXml.$computeFn($c);
       |${ev.isNull} = ${ev.value} == null;
     """.stripMargin)
}

case class OsmNodeParse(child: Expression) extends OsmXmlParse {
  override def dataType: DataType = OsmXml.NodeType
  override def prettyName: String = "osm_node_parse"
  override protected def computeFn: String = "parseNode"
  override def nullSafeEval(input: Any): Any =
    OsmXml.parseNode(input.asInstanceOf[UTF8String])
  override protected def withNewChildInternal(newChild: Expression): OsmNodeParse =
    copy(child = newChild)
}

case class OsmWayParse(child: Expression) extends OsmXmlParse {
  override def dataType: DataType = OsmXml.WayType
  override def prettyName: String = "osm_way_parse"
  override protected def computeFn: String = "parseWay"
  override def nullSafeEval(input: Any): Any =
    OsmXml.parseWay(input.asInstanceOf[UTF8String])
  override protected def withNewChildInternal(newChild: Expression): OsmWayParse =
    copy(child = newChild)
}

case class OsmRelationParse(child: Expression) extends OsmXmlParse {
  override def dataType: DataType = OsmXml.RelationType
  override def prettyName: String = "osm_relation_parse"
  override protected def computeFn: String = "parseRelation"
  override def nullSafeEval(input: Any): Any =
    OsmXml.parseRelation(input.asInstanceOf[UTF8String])
  override protected def withNewChildInternal(newChild: Expression): OsmRelationParse =
    copy(child = newChild)
}
