package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Overpass QL query construction — the fetch-side counterpart of the
  * OSM result parsers (geo_osm_*).
  *
  * Mirrors open-street-map/pipeline/importer.py: `OsmFilter.to_query`
  * (16-49: `element["tag"="value"]` parts, bare `["tag"]` when the
  * value is a presence check), `OsmFilter.with_pattern` (46-49:
  * `element["tag"~"^(a|b|…)$"]` regex filters), `build_query_body`
  * (77-79: the `(\n…;\n…;\n)` union block), `OverpassQueryBuilder.build`
  * (94-101: `[out:json][timeout:90][bbox:s,w,n,e];` header + geometry
  * footer `out body;\n>;\nout skel qt;` or plain `out body;`) and the
  * six `fetch_*` query sets over `OSM_FILTERS` (52-74) +
  * `DEFAULT_HIGHWAY_TYPES`/`LANDUSE_TYPES` (23-32), with the Kyiv bbox
  * string from `_build_bbox_str` (113-115: south,west,north,east).
  *
  * One deliberate canonicalization: the reference wraps multi-filter
  * bodies in the union block but emits single-filter/pattern bodies
  * bare (and the landuse f-string carries incidental Python
  * indentation); here EVERY body goes through the same block form —
  * the single-statement union is semantically identical Overpass QL,
  * and one canonical shape is what a query-construction operator
  * should produce.
  *
  * The builder is data-driven (a filter-spec table in, QL strings
  * out), so a user can swap in their own filter sets; the reference's
  * six sets ship as [[spec]]. Scale is trivial by construction — the
  * spec is a dimension table; the build is two ordered string
  * aggregations.
  */
object Overpass {

  /** (query_set, filter_seq, element, tag_seq, tag, tag_value,
    * is_pattern, include_geometry) — importer.py OSM_FILTERS plus the
    * two pattern-based fetches. `tag_value = None` is a bare presence
    * filter; `is_pattern` renders `~"^(value)$"` instead of `=`. */
  val spec: Seq[(String, Int, String, Int, String, Option[String], Boolean, Boolean)] = Seq(
    // fetch_road_network (importer.py:146-151): DEFAULT_HIGHWAY_TYPES pattern
    ("road_network", 1, "way", 1, "highway",
      Some("motorway|trunk|primary|secondary|tertiary|residential"), true, true),
    // OSM_FILTERS["road_narrowing"] (importer.py:53-59)
    ("road_narrowing", 1, "way", 1, "narrow", Some("yes"), false, true),
    ("road_narrowing", 2, "way", 1, "highway", Some("construction"), false, true),
    ("road_narrowing", 3, "way", 1, "lanes:forward", None, false, true),
    ("road_narrowing", 3, "way", 2, "lanes:backward", None, false, true),
    ("road_narrowing", 4, "node", 1, "traffic_calming", None, false, true),
    ("road_narrowing", 5, "node", 1, "barrier", Some("bollard"), false, true),
    // OSM_FILTERS["elevation"] (importer.py:60-64)
    ("elevation", 1, "way", 1, "incline", None, false, true),
    ("elevation", 2, "node", 1, "ele", None, false, true),
    ("elevation", 3, "way", 1, "highway", None, false, true),
    ("elevation", 3, "way", 2, "incline", None, false, true),
    // OSM_FILTERS["traffic_signals"] (importer.py:65-68) — the one
    // include_geometry=False fetch (importer.py:173-176)
    ("traffic_signals", 1, "node", 1, "highway", Some("traffic_signals"), false, false),
    ("traffic_signals", 2, "node", 1, "crossing", Some("traffic_signals"), false, false),
    // OSM_FILTERS["pedestrian"] (importer.py:69-73)
    ("pedestrian", 1, "node", 1, "highway", Some("crossing"), false, true),
    ("pedestrian", 2, "way", 1, "highway", Some("footway"), false, true),
    ("pedestrian", 2, "way", 2, "footway", Some("crossing"), false, true),
    // fetch_landuse_zones (importer.py:160-167): LANDUSE_TYPES pattern
    // over way + relation
    ("landuse_zones", 1, "way", 1, "landuse",
      Some("residential|industrial|commercial|retail"), true, true),
    ("landuse_zones", 2, "relation", 1, "landuse",
      Some("residential|industrial|commercial|retail"), true, true))

  /** importer.py:14 KYIV_BOUNDS via _build_bbox_str (113-115). */
  val BboxStr = "50.3,30.2,50.6,30.8"
  /** importer.py:18 QUERY_TIMEOUT_SECONDS. */
  val TimeoutS = 90

  def specDf(s: SparkSession): DataFrame = {
    import s.implicits._
    spec.toDF("query_set", "filter_seq", "element", "tag_seq", "tag",
      "tag_value", "is_pattern", "include_geometry")
  }

  /** Filter-spec rows → one (query_set, overpass_ql) row per set.
    *
    * Ordering inside both string aggregations is pinned by
    * array_sort over (seq, text) structs — collect_list alone has no
    * order contract under a shuffle. */
  def buildQueries(filters: DataFrame): DataFrame = {
    val part = when(col("is_pattern"),
        concat(lit("[\""), col("tag"), lit("\"~\"^("), col("tag_value"), lit(")$\"]")))
      .when(col("tag_value").isNull, concat(lit("[\""), col("tag"), lit("\"]")))
      .otherwise(concat(lit("[\""), col("tag"), lit("\"=\""), col("tag_value"), lit("\"]")))
    val lines = filters
      .withColumn("part", part)
      .groupBy(col("query_set"), col("filter_seq"), col("element"))
      .agg(concat_ws("", expr("transform(array_sort(collect_list(struct(tag_seq, part))), x -> x.part)")).as("parts"),
        expr("bool_or(include_geometry)").as("geom"))
      .withColumn("line", concat(col("element"), col("parts"), lit(";")))
    val header = s"[out:json][timeout:$TimeoutS][bbox:$BboxStr];"
    lines
      .groupBy(col("query_set"))
      .agg(concat_ws("\n", expr("transform(array_sort(collect_list(struct(filter_seq, line))), x -> x.line)")).as("body_lines"),
        expr("bool_or(geom)").as("geom"))
      .select(col("query_set"),
        concat(lit(header + "\n(\n"), col("body_lines"), lit("\n)\n"),
          when(col("geom"), lit("out body;\n>;\nout skel qt;"))
            .otherwise(lit("out body;"))).as("overpass_ql"))
      .orderBy("query_set")
  }

  /** DuckDB oracle generated from the SAME [[spec]] literal, so engine
    * and oracle can only diverge on the build logic, never the data. */
  def oracleSql: String = {
    val rows = spec.map { case (qs, fs, el, ts, tag, v, pat, geom) =>
      val vSql = v.map(x => s"'$x'").getOrElse("CAST(NULL AS VARCHAR)")
      s"('$qs', $fs, '$el', $ts, '$tag', $vSql, $pat, $geom)"
    }.mkString(",\n    |  ")
    s"""
    |WITH spec(query_set, filter_seq, element, tag_seq, tag, tag_value,
    |          is_pattern, include_geometry) AS (VALUES
    |  $rows),
    |parts AS (
    |  SELECT *, CASE
    |      WHEN is_pattern THEN '["' || tag || '"~"^(' || tag_value || ')$$"]'
    |      WHEN tag_value IS NULL THEN '["' || tag || '"]'
    |      ELSE '["' || tag || '"="' || tag_value || '"]' END AS part
    |  FROM spec),
    |lines AS (
    |  SELECT query_set, filter_seq,
    |    element || string_agg(part, '' ORDER BY tag_seq) || ';' AS line,
    |    bool_or(include_geometry) AS geom
    |  FROM parts GROUP BY query_set, filter_seq, element),
    |bodies AS (
    |  SELECT query_set,
    |    string_agg(line, chr(10) ORDER BY filter_seq) AS body_lines,
    |    bool_or(geom) AS geom
    |  FROM lines GROUP BY query_set)
    |SELECT query_set,
    |  '[out:json][timeout:$TimeoutS][bbox:$BboxStr];' || chr(10) || '(' || chr(10)
    |    || body_lines || chr(10) || ')' || chr(10)
    |    || CASE WHEN geom THEN 'out body;' || chr(10) || '>;' || chr(10) || 'out skel qt;'
    |            ELSE 'out body;' END AS overpass_ql
    |FROM bodies ORDER BY query_set""".stripMargin
  }
}
