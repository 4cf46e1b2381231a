package graft

import org.apache.spark.sql.functions._

/** Pins graft.plans.SocketIoFrame to the exact Java-regex semantics it
  * replaces (`^42\["(\w+)",(.*)\]\s*$`, evaluated once per capture by
  * regexp_extract): for every fixture frame the expression's
  * (evt_name, payload) — with evt_name coalesced to '' — must equal
  * the live regexp_extract pair, INCLUDING the no-match rows where
  * regexp_extract yields ''. The fixture is adversarial on every
  * boundary the scan hand-rolls: truncation, trailing whitespace
  * variants, payload containing ']' (greedy capture), empty payload,
  * empty/non-word event names, line terminators inside the payload
  * (Java '.' excludes them), unicode word-likes (\w is ASCII-only),
  * and a bare prefix. */
class SocketIoFrameSpec extends SparkSpec {
  import spark.implicits._

  private val Pattern = "^42\\[\"(\\w+)\",(.*)\\]\\s*$"

  private val frames = Seq(
    """42["position",{"id":7,"t":"click"}]""", // canonical
    """42["position",{"id":7""", // truncated (corrupt route)
    """42["position",{"id":7,"t":"x"}]   """, // trailing spaces
    "42[\"position\",{\"id\":7}]\t\n", // trailing tab+newline (\\s*)
    """42["ev_1",[1,2,3]]""", // array payload, digits+underscore name
    """42["x",]""", // empty payload ((.*) matches empty)
    """42["x",{"a":[1]}] ]""", // ']' then junk then final ']' — greedy
    """42["x",{"a":"]"}]""", // ']' inside the payload string
    """42["",{}]""", // empty name (\w+ fails)
    """42["po sition",{}]""", // space in name (\w+ fails)
    """42["pos-ition",{}]""", // dash in name (\w+ fails)
    """42["né",{}]""", // unicode letter — Java \w is ASCII-only
    "42[\"x\",{\"a\":\n1}]", // newline INSIDE payload — '.' excludes it
    "42[\"x\",{\"a\":1}]", // NEL after ']': `$` matches before a FINAL terminator
    """42""", // bare prefix
    """43["position",{}]""", // wrong packet type
    """ 42["position",{}]""", // leading space (anchored ^)
    """42["position",{}]x""") // junk after ']'

  test("socketio_frame ≡ the two-regexp_extract pair on every boundary") {
    val df = frames.toDF("frame")
      .withColumn("f", graft.plans.SocketIoFrame(col("frame")))
      .withColumn("e_name", coalesce(col("f.evt_name"), lit("")))
      .withColumn("e_payload", coalesce(col("f.payload"), lit("")))
      .withColumn("r_name", regexp_extract(col("frame"), Pattern, 1))
      .withColumn("r_payload", regexp_extract(col("frame"), Pattern, 2))
    val bad = df.filter(col("e_name") =!= col("r_name") ||
      col("e_payload") =!= col("r_payload"))
      .select("frame", "e_name", "r_name", "e_payload", "r_payload")
      .collect()
    assert(bad.isEmpty, s"divergent frames:\n${bad.mkString("\n")}")
    // sanity: the fixture exercises both match and no-match paths
    val matched = df.filter(col("f").isNotNull).count()
    assert(matched >= 6 && matched < frames.size)
  }

  test("field projection from a non-matching frame is null (codegen)") {
    // regression: the generated code must set isNull when compute()
    // returns null for a NON-null input — a child-derived isNull lets
    // GetStructField NPE on the null row (the r16 quarantine failure)
    val out = frames.toDF("frame")
      .select(graft.plans.SocketIoFrame(col("frame")).as("f"))
      .select(coalesce(col("f.evt_name"), lit("-")).as("n"),
        col("f.payload").isNull.as("pn"))
      .collect()
    assert(out.length === frames.length)
    assert(out.exists(_.getString(0) == "-")) // at least one null route
  }

  test("null frame yields null struct") {
    val out = Seq[Option[String]](None).toDF("frame")
      .select(graft.plans.SocketIoFrame(col("frame")).as("f"))
      .collect()
    assert(out.head.isNullAt(0))
  }
}
