package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** In-session A/B for ing_corrupt_quarantine's parse cost at sf1:
  * (A) registered shape — two regexp_extract + from_json;
  * (B) one rlike + substring slicing + from_json;
  * (C) floor — frame build + groupBy only (no parse).
  *   sbt 'Test/runMain graft.QuarantineProbe [dir] [rounds]' */
object QuarantineProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/graft-sf1")
    val rounds = args.lift(1).map(_.toInt).getOrElse(3)
    val spark = GraftSession.get()
    spark.sparkContext.setLogLevel("WARN")
    val pattern = "^42\\[\"(\\w+)\",(.*)\\]\\s*$"
    val schema = StructType(Seq(StructField("id", LongType), StructField("t", StringType)))
    // ONE frame-synthesis expression shared by every variant: the
    // probe's point is comparing identical shapes, so the frame format
    // must be impossible to diverge between them
    val goodFrame = concat(
      lit("42[\"position\",{\"id\":"), col("user_id").cast("string"),
      lit(",\"t\":\""), col("event_type"), lit("\"}]"))
    val frameExpr = when(col("event_id") % 7 === 0,
      concat(lit("42[\"position\",{\"id\":"), col("user_id").cast("string")))
      .otherwise(goodFrame)
    def rawFrames = Tables.events(spark, dir)
      .select(col("event_id"), col("user_id"), col("event_type"))
      .select(col("event_id"), frameExpr.as("frame"))
    def base = graft.operators.Par.spread(
      Tables.events(spark, dir).select(col("event_id"), col("user_id"), col("event_type")))
      .select(col("event_id"), frameExpr.as("frame"))
    def finish(df: org.apache.spark.sql.DataFrame) = df
      .withColumn("ok", col("p.id").isNotNull)
      .groupBy("evt_name")
      .agg(count(lit(1)).as("n_frames"),
        count(when(col("ok"), 1)).as("n_ok"),
        count(when(!col("ok"), 1)).as("n_bad"),
        min(when(!col("ok"), col("frame"))).as("quarantine_sample"))
      .orderBy("evt_name")
    def vA = finish(base.select(col("frame"),
      regexp_extract(col("frame"), pattern, 1).as("evt_name"),
      from_json(regexp_extract(col("frame"), pattern, 2), schema).as("p")))
    def vB = {
      val t = rtrim(col("frame"))
      val m = col("frame").rlike(pattern)
      val name = substring_index(substring(t, 5, 1000000), "\"", 1)
      val payload = expr("substring(rtrim(frame), 7 + length(substring_index(substring(rtrim(frame), 5, 1000000), '\"', 1)), " +
        "length(rtrim(frame)) - 7 - length(substring_index(substring(rtrim(frame), 5, 1000000), '\"', 1)))")
      finish(base.select(col("frame"),
        when(m, name).otherwise(lit("")).as("evt_name"),
        from_json(when(m, payload).otherwise(lit("")), schema).as("p")))
    }
    def vD = {
      val m = col("frame").rlike(pattern)
      val payload = regexp_extract(col("frame"), pattern, 2)
      finish2(base.select(col("frame"),
        regexp_extract(col("frame"), pattern, 1).as("evt_name"),
        get_json_object(payload, "$.id").isNotNull.as("ok")))
    }
    def vC = base.select(col("frame"), lit("x").as("evt_name"))
      .groupBy("evt_name").agg(count(lit(1)).as("n"), min("frame").as("q"))
    // E: ONE regex pass — regexp_replace rewrites a matching frame to
    // "name\x01payload" (no match → unchanged), split_part slices both
    // groups out; jackson runs only via get_json_object as in D
    def vE = {
      val rep = regexp_replace(col("frame"), pattern, "$1$2")
      val matched = contains(rep, lit(""))
      finish2(base
        .withColumn("rep", rep)
        .select(col("frame"),
          when(matched, split_part(col("rep"), lit(""), lit(1)))
            .otherwise(lit("")).as("evt_name"),
          (matched && get_json_object(
            split_part(col("rep"), lit(""), lit(2)), "$.id").isNotNull)
            .as("ok")))
    }
    // F: regex-free — wire-format string ops (prefix + suffix + quote
    // slicing); probes the regex share of the parse cost
    def vF = {
      val t = rtrim(col("frame"))
      val name = substring_index(substring(t, 5, 1 << 20), "\"", 1)
      val m = startswith(col("frame"), lit("42[\"")) && endswith(t, lit("]")) &&
        name.rlike("^\\w+$")
      val payload = expr(
        "substring(rtrim(frame), 7 + length(substring_index(substring(rtrim(frame), 5, 1048576), '\"', 1)), " +
        "length(rtrim(frame)) - 7 - length(substring_index(substring(rtrim(frame), 5, 1048576), '\"', 1)))")
      finish2(base.select(col("frame"),
        when(m, name).otherwise(lit("")).as("evt_name"),
        (m && get_json_object(payload, "$.id").isNotNull).as("ok")))
    }
    def finish2(df: org.apache.spark.sql.DataFrame) = df
      .groupBy("evt_name")
      .agg(count(lit(1)).as("n_frames"),
        count(when(col("ok"), 1)).as("n_ok"),
        count(when(!col("ok"), 1)).as("n_bad"),
        min(when(!col("ok"), col("frame"))).as("quarantine_sample"))
      .orderBy("evt_name")
    // G: the native single-pass SocketIoFrame expression (one char
    // scan, no regex) + the same get_json_object id probe
    def vG = finish2(base
      .select(col("frame"), graft.plans.SocketIoFrame(col("frame")).as("f"))
      .select(col("frame"),
        coalesce(col("f.evt_name"), lit("")).as("evt_name"),
        get_json_object(col("f.payload"), "$.id").isNotNull.as("ok")))
    def time(tag: String)(f: => org.apache.spark.sql.DataFrame): Unit = {
      val t0 = System.nanoTime()
      f.write.format("noop").mode("overwrite").save()
      println(f"QPROBE $tag ${(System.nanoTime() - t0) / 1e9}%6.3f s")
    }
    // equality check once
    val a = vA.collect().map(_.toString).sorted.toSeq
    val b = vB.collect().map(_.toString).sorted.toSeq
    println("QPROBE B==A: " + (a == b))
    val d = vD.collect().map(_.toString).sorted.toSeq
    println("QPROBE D==A: " + (a == d))
    println("QPROBE E==A: " + (a == vE.collect().map(_.toString).sorted.toSeq))
    println("QPROBE F==A: " + (a == vF.collect().map(_.toString).sorted.toSeq))
    println("QPROBE G==A: " + (a == vG.collect().map(_.toString).sorted.toSeq))
    // H: the registered G shape WITHOUT the Par.spread pre-shuffle —
    // the scan's own splits feed SocketIoFrame directly (r18: is the
    // fan-out shuffle still paying for itself on a 10-shard source?).
    // Shares vG's body via gShape so the H-vs-G A/B compares provably
    // identical shapes modulo the spread wrapper.
    def gShape(src: org.apache.spark.sql.DataFrame) = finish2(src
      .select(col("frame"), graft.plans.SocketIoFrame(col("frame")).as("f"))
      .select(col("frame"),
        coalesce(col("f.evt_name"), lit("")).as("evt_name"),
        get_json_object(col("f.payload"), "$.id").isNotNull.as("ok")))
    def vH = gShape(rawFrames)
    // C0: bare scan + count floor (no frame build, no parse, no spread)
    def vC0 = Tables.events(spark, dir)
      .select(col("event_id"), col("user_id"), col("event_type"))
      .groupBy().agg(count(lit(1)).as("n"))
    println("QPROBE H==A: " + (a == vH.collect().map(_.toString).sorted.toSeq))
    for (r <- 1 to rounds) {
      time(s"D r$r")(vD); time(s"G r$r")(vG); time(s"C r$r")(vC)
      time(s"H r$r")(vH); time(s"C0 r$r")(vC0)
    }
    spark.stop()
  }
}
