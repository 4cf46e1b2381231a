package graft

import graft.operators.Skew
import org.apache.spark.sql.functions._

class SkewSpec extends SparkSpec {
  import spark.implicits._

  private val big = Seq.tabulate(200)(i =>
    (if (i % 2 == 0) "hot" else s"k${i % 5}", i.toDouble))
    .toDF("k", "v")
  private val dim = Seq(("hot", 10.0), ("k1", 1.0), ("k3", 3.0))
    .toDF("k", "w")

  test("saltedJoin equals the plain equi-join") {
    val salted = Skew.saltedJoin(big, dim, "k", nSalts = 8)
      .groupBy("k").agg(count(lit(1)).as("n"), sum($"v" * $"w").as("ws"))
      .as[(String, Long, Double)].collect().toSet
    val plain = big.join(dim, "k")
      .groupBy("k").agg(count(lit(1)).as("n"), sum($"v" * $"w").as("ws"))
      .as[(String, Long, Double)].collect().toSet
    assert(salted === plain)
  }

  test("saltedJoin plans a sort-merge join keyed on (k, salt), not a broadcast") {
    val plan = Skew.saltedJoin(big, dim, "k", nSalts = 8)
      .queryExecution.executedPlan.toString
    assert(plan.contains("SortMergeJoin"), s"expected SMJ in:\n$plan")
    assert(plan.contains("__salt"), s"expected salted keys in:\n$plan")
    assert(!plan.contains("BroadcastHashJoin"), s"unexpected broadcast in:\n$plan")
  }

  test("saltedJoin spreads a hot key across multiple shuffle partitions") {
    // AQE rightly coalesces this tiny shuffle to one partition — turn
    // coalescing off so the test observes the salt's partitioning, the
    // thing that matters when the hot key is 20 GB instead of 100 rows
    val key = "spark.sql.adaptive.coalescePartitions.enabled"
    val prev = spark.conf.get(key)
    try {
      spark.conf.set(key, "false")
      val parts = Skew.saltedJoin(big.repartition(8), dim, "k", nSalts = 8)
        .filter($"k" === "hot")
        .select(org.apache.spark.sql.functions.spark_partition_id().as("p"))
        .distinct().count()
      assert(parts > 1, s"hot key stayed on $parts partition(s)")
    } finally spark.conf.set(key, prev)
  }
}
