package graft

import org.apache.spark.sql.functions._

class WsTokenCountSpec extends SparkSpec {
  import spark.implicits._

  private def tree(c: org.apache.spark.sql.Column) =
    size(split(trim(c), "\\s+"))

  test("native count equals size(split(trim, \\s+)) on edge cases") {
    val samples = Seq(
      "one two three",
      "",
      "   ",               // trims to "" -> 1
      "single",
      "a\tb\nc\r\nd",
      "\ttab leads",       // trim keeps the tab -> empty first segment
      "trailing tab\t",    // empty last segment
      " padded both  ",
      "multi   gap\t\t\tmix",
      "київ 12 трафік",    // multi-byte UTF-8
      "emoji 🚋 x")
    val out = samples.toDF("t")
      .select(graft.plans.WsTokenCount(col("t")).as("n"), tree(col("t")).as("o"))
      .collect()
    out.zip(samples).foreach { case (r, s) =>
      assert(r.getInt(0) === r.getInt(1), s"diverged on: <$s>")
    }
  }

  test("null yields null; randomized agreement") {
    val nr = Seq[Option[String]](None).toDF("t")
      .select(graft.plans.WsTokenCount(col("t")).as("n")).collect().head
    assert(nr.isNullAt(0))
    val rnd = new scala.util.Random(7)
    val chars = "ab  \t\n\r.é🚋".toCharArray
    val samples = (1 to 300).map { _ =>
      (0 to rnd.nextInt(40)).map(_ => chars(rnd.nextInt(chars.length))).mkString
    }
    val out = samples.toDF("t")
      .select(graft.plans.WsTokenCount(col("t")).as("n"), tree(col("t")).as("o"))
      .collect()
    out.zip(samples).foreach { case (r, s) =>
      assert(r.getInt(0) === r.getInt(1), s"diverged on: <${s.replace("\n", "\\n")}>")
    }
  }
}
