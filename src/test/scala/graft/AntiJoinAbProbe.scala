package graft

import org.apache.spark.sql.functions._

/** A/B: the fkAudit anti-join shape at sf1 — planner-chosen (broadcasts
  * the 1.5M-key parent side), hinted shuffle_hash (parent keys built
  * per-partition), hinted merge. */
object AntiJoinAbProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/graft-sf1")
    val reps = args.lift(1).map(_.toInt).getOrElse(6)
    val spark = GraftSession.builder().getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def audit(hint: String): org.apache.spark.sql.DataFrame = {
      val cust = graft.Tables.customer(spark, dir).filter(col("c_custkey") % 97 =!= 0)
      val ord = graft.Tables.orders(spark, dir)
      val ordThin = ord.filter(col("o_orderkey") % 89 =!= 0)
      def orphans(child: org.apache.spark.sql.DataFrame, ck: String,
                  parent: org.apache.spark.sql.DataFrame, pk: String) = {
        val keys0 = parent.select(col(pk).as("__graft_pk"))
        val keys = if (hint.isEmpty) keys0 else keys0.hint(hint)
        child.join(keys, col(ck) === col("__graft_pk"), "left_anti")
      }
      Seq((ord, "o_custkey", cust, "c_custkey", "orders_customer"),
          (graft.Tables.lineitem(spark, dir), "l_orderkey", ordThin,
           "o_orderkey", "lineitem_orders"))
        .map { case (child, ck, parent, pk, name) =>
          orphans(child, ck, parent, pk)
            .agg(count(lit(1)).as("n_orphans"))
            .crossJoin(child.agg(count(lit(1)).as("n_total")))
            .select(lit(name).as("check_name"), col("n_orphans"), col("n_total"))
        }.reduce(_ unionAll _).orderBy("check_name")
    }

    for (h <- Seq("", "shuffle_hash", "merge")) {
      var best = Double.MaxValue
      for (i <- 1 to reps) {
        val t0 = System.nanoTime()
        audit(h).write.format("noop").mode("overwrite").save()
        val s = (System.nanoTime() - t0) / 1e9
        if (i > 1 && s < best) best = s
      }
      val tag = if (h.isEmpty) "planner" else h
      println(f"AB orphan[$tag%-14s] steady-min ${best}%6.3f s")
    }
    spark.stop()
  }
}
