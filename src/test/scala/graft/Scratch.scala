package graft

import org.apache.spark.sql.DataFrame

object Scratch {
  def time(name: String)(f: => DataFrame): Unit = {
    val t0 = System.nanoTime()
    f.write.format("noop").mode("overwrite").save()
    println(f"SCRATCH $name%-24s ${(System.nanoTime() - t0) / 1e9}%7.2f s")
  }

  def main(args: Array[String]): Unit = {
    val spark = GraftSession.builder().getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import org.apache.spark.sql.functions._
    import graft.operators.Dedup
    import graft.queries.DedupQueries.{JaccardThreshold, ShingleN}

    val dir = "/root/testdata/sf0.1"
    def docs = Tables.documents(spark, dir)

    def sh = Dedup.shingles(docs, "doc_id", "text", ShingleN)
    def hsh = Dedup.hashShingles(sh)
    def idx = Dedup.invertedIndex(hsh)

    def sortSmall(df: DataFrame) =
      df.repartition(1).sortWithinPartitions("a_id", "b_id")

    // current registered plan
    def current = sortSmall(Dedup.jaccardPairsFromIndex(
      idx.repartition(col("sg")), JaccardThreshold))

    // variant: shuffle_hash hint on the self-join (skip SMJ sorts)
    def shj = {
      val base = idx.repartition(col("sg"))
      val a = base.select(col("__id").as("a_id"), col("sz").as("a_sz"), col("sg"))
        .hint("shuffle_hash")
      val b = base.select(col("__id").as("b_id"), col("sz").as("b_sz"), col("sg"))
      sortSmall(a.join(b, Seq("sg"))
        .filter(col("a_id") < col("b_id") &&
          col("a_sz") >= lit(JaccardThreshold) * col("b_sz") &&
          col("b_sz") >= lit(JaccardThreshold) * col("a_sz"))
        .groupBy("a_id", "b_id", "a_sz", "b_sz")
        .agg(count(lit(1)).as("shared"))
        .withColumn("jac",
          col("shared").cast("double") / (col("a_sz") + col("b_sz") - col("shared")))
        .filter(col("jac") >= JaccardThreshold)
        .select("a_id", "b_id", "shared", "jac"))
    }

    // variant: no explicit repartition (planner-placed exchanges)
    def noRepart = sortSmall(Dedup.jaccardPairsFromIndex(idx, JaccardThreshold))

    // stage floors
    def scanOnly = docs.select(col("doc_id"), col("text"))
    def shingleOnly = sh
    def hashOnly = hsh
    def indexOnly = idx

    def prefix = sortSmall(Dedup.jaccardPairsPrefix(hsh, JaccardThreshold))

    val t = JaccardThreshold
    // prefix with the full arrays carried through the candidate join:
    // one scan chain, no verify re-derivation
    def prefix2 = {
      val pre = hsh
        .select(col("__id"), col("sz"), array_sort(col("hs")).as("hs"))
        .select(col("__id"), col("sz"), col("hs"),
          explode(slice(col("hs"), lit(1), greatest(lit(1),
            (col("sz") - ceil(col("sz") * t) + 1).cast("int")))).as("sg"))
      val a = pre.select(col("__id").as("a_id"), col("sz").as("a_sz"),
        col("hs").as("hs_a"), col("sg")).hint("shuffle_hash")
      val b = pre.select(col("__id").as("b_id"), col("sz").as("b_sz"),
        col("hs").as("hs_b"), col("sg"))
      sortSmall(a.join(b, Seq("sg"))
        .filter(col("a_id") < col("b_id") &&
          col("a_sz") >= lit(t) * col("b_sz") &&
          col("b_sz") >= lit(t) * col("a_sz"))
        .withColumn("shared", size(array_intersect(col("hs_a"), col("hs_b"))).cast("long"))
        .withColumn("jac",
          col("shared").cast("double") / (col("a_sz") + col("b_sz") - col("shared")))
        .filter(col("jac") >= t)
        .select("a_id", "b_id", "shared", "jac").distinct())
    }

    // full index but packed (id,sz) -> one long per side: half the agg
    // key width, smaller join payload
    def shjPacked = {
      val packed = idx.select(
        (col("__id") * lit(1L << 24) + col("sz")).as("p"), col("sg"))
        .repartition(col("sg"))
      val mask = lit((1L << 24) - 1)
      val a = packed.select(col("p").as("pa"), col("sg")).hint("shuffle_hash")
      val b = packed.select(col("p").as("pb"), col("sg"))
      sortSmall(a.join(b, Seq("sg"))
        .filter(col("pa") < col("pb") &&
          col("pa").bitwiseAND(mask) >= lit(t) * col("pb").bitwiseAND(mask) &&
          col("pb").bitwiseAND(mask) >= lit(t) * col("pa").bitwiseAND(mask))
        .groupBy("pa", "pb").agg(count(lit(1)).as("shared"))
        .select(shiftright(col("pa"), 24).as("a_id"),
          shiftright(col("pb"), 24).as("b_id"),
          col("pa").bitwiseAND(mask).as("a_sz"),
          col("pb").bitwiseAND(mask).as("b_sz"), col("shared"))
        .withColumn("jac",
          col("shared").cast("double") / (col("a_sz") + col("b_sz") - col("shared")))
        .filter(col("jac") >= t)
        .select("a_id", "b_id", "shared", "jac"))
    }

    // incremental chain: where do the ~0.8 s beyond the index go?
    def repartOnly = idx.repartition(col("sg"))
    def joinOnly = {
      val base = idx.repartition(col("sg"))
      val a = base.select(col("__id").as("a_id"), col("sz").as("a_sz"), col("sg"))
        .hint("shuffle_hash")
      val b = base.select(col("__id").as("b_id"), col("sz").as("b_sz"), col("sg"))
      a.join(b, Seq("sg"))
        .filter(col("a_id") < col("b_id") &&
          col("a_sz") >= lit(t) * col("b_sz") &&
          col("b_sz") >= lit(t) * col("a_sz"))
    }
    def joinAgg = joinOnly
      .groupBy("a_id", "b_id", "a_sz", "b_sz")
      .agg(count(lit(1)).as("shared"))
      .withColumn("jac",
        col("shared").cast("double") / (col("a_sz") + col("b_sz") - col("shared")))
      .filter(col("jac") >= t)
      .select("a_id", "b_id", "shared", "jac")
    def full = sortSmall(joinAgg)
    def noAqe(name: String)(f: => DataFrame): Unit = {
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      try time(name)(f) finally spark.conf.set("spark.sql.adaptive.enabled", "true")
    }

    // prefix candidates verified in-row, then ONE tiny exchange to a
    // single partition where dedup + deterministic sort run locally
    def prefix3 = {
      val pre = hsh
        .select(col("__id"), col("sz"), array_sort(col("hs")).as("hs"))
        .select(col("__id"), col("sz"), col("hs"),
          explode(slice(col("hs"), lit(1), greatest(lit(1),
            (col("sz") - ceil(col("sz") * t) + 1).cast("int")))).as("sg"))
      val a = pre.select(col("__id").as("a_id"), col("sz").as("a_sz"),
        col("hs").as("hs_a"), col("sg")).hint("shuffle_hash")
      val b = pre.select(col("__id").as("b_id"), col("sz").as("b_sz"),
        col("hs").as("hs_b"), col("sg"))
      a.join(b, Seq("sg"))
        .filter(col("a_id") < col("b_id") &&
          col("a_sz") >= lit(t) * col("b_sz") &&
          col("b_sz") >= lit(t) * col("a_sz"))
        .withColumn("shared", size(array_intersect(col("hs_a"), col("hs_b"))).cast("long"))
        .withColumn("jac",
          col("shared").cast("double") / (col("a_sz") + col("b_sz") - col("shared")))
        .filter(col("jac") >= t)
        .select("a_id", "b_id", "shared", "jac")
        .repartition(1).dropDuplicates()
        .sortWithinPartitions("a_id", "b_id")
    }

    def prefixChain(src: DataFrame) = {
      val h = Dedup.hashShingles(Dedup.shingles(src, "doc_id", "text", ShingleN))
      val pre = h
        .select(col("__id"), col("sz"), array_sort(col("hs")).as("hs"))
        .select(col("__id"), col("sz"), col("hs"),
          explode(slice(col("hs"), lit(1), greatest(lit(1),
            (col("sz") - ceil(col("sz") * t) + 1).cast("int")))).as("sg"))
      val a = pre.select(col("__id").as("a_id"), col("sz").as("a_sz"),
        col("hs").as("hs_a"), col("sg")).hint("shuffle_hash")
      val b = pre.select(col("__id").as("b_id"), col("sz").as("b_sz"),
        col("hs").as("hs_b"), col("sg"))
      a.join(b, Seq("sg"))
        .filter(col("a_id") < col("b_id") &&
          col("a_sz") >= lit(t) * col("b_sz") &&
          col("b_sz") >= lit(t) * col("a_sz"))
        .withColumn("shared", size(array_intersect(col("hs_a"), col("hs_b"))).cast("long"))
        .withColumn("jac",
          col("shared").cast("double") / (col("a_sz") + col("b_sz") - col("shared")))
        .filter(col("jac") >= t)
        .select("a_id", "b_id", "shared", "jac")
    }
    // coalesce(1): narrow — removes the exC exchange, join runs 1 task
    def prefix4 = prefixChain(docs).coalesce(1).dropDuplicates()
      .sortWithinPartitions("a_id", "b_id")
    // spread to 8 instead of 32
    def prefix5 = prefixChain(docs.repartition(8)).repartition(1)
      .dropDuplicates().sortWithinPartitions("a_id", "b_id")

    // candidate join repartitioned to an adaptive count (1 at this
    // scale): single partition satisfies every downstream clustering,
    // so dedup+sort run with no further exchange — 3 stages total
    def prefix6 = {
      val h = Dedup.hashShingles(Dedup.shingles(docs, "doc_id", "text", ShingleN))
      val pre = h
        .select(col("__id"), col("sz"), array_sort(col("hs")).as("hs"))
        .select(col("__id"), col("sz"), col("hs"),
          explode(slice(col("hs"), lit(1), greatest(lit(1),
            (col("sz") - ceil(col("sz") * t) + 1).cast("int")))).as("sg"))
      val preP = pre.repartition(1, col("sg"))
      val a = preP.select(col("__id").as("a_id"), col("sz").as("a_sz"),
        col("hs").as("hs_a"), col("sg")).hint("shuffle_hash")
      val b = preP.select(col("__id").as("b_id"), col("sz").as("b_sz"),
        col("hs").as("hs_b"), col("sg"))
      a.join(b, Seq("sg"))
        .filter(col("a_id") < col("b_id") &&
          col("a_sz") >= lit(t) * col("b_sz") &&
          col("b_sz") >= lit(t) * col("a_sz"))
        .withColumn("shared", size(array_intersect(col("hs_a"), col("hs_b"))).cast("long"))
        .withColumn("jac",
          col("shared").cast("double") / (col("a_sz") + col("b_sz") - col("shared")))
        .filter(col("jac") >= t)
        .select("a_id", "b_id", "shared", "jac")
        .dropDuplicates()
        .sortWithinPartitions("a_id", "b_id")
    }

    def planInfo(name: String, df: DataFrame): Unit = {
      df.collect()
      val p = df.queryExecution.executedPlan.toString
      val scans = p.linesIterator.count(_.contains("FileScan"))
      val reused = p.linesIterator.count(_.contains("ReusedExchange")) +
        p.linesIterator.count(_.contains("Reused"))
      println(s"SCRATCH-PLAN $name filescans=$scans reusedLines=$reused")
    }
    planInfo("current", current)
    planInfo("prefix3", prefix3)
    planInfo("prefix6", prefix6)
    spark.stop()
  }
}
