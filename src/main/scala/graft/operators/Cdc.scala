package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Change-data-capture style merge operators. */
object Cdc {

  /** Latest-wins upsert of an update batch into a base snapshot: union
    * both sides (schemas matched by name), keep the single newest row
    * per key under `orderCols` descending lexicographic order. One hash
    * shuffle on the key — the merge partitions by exactly the column an
    * upsert must be atomic over, so a 100 TB base with a small update
    * batch pays one co-partitioned window, never a broadcast or a
    * driver-side diff. Ties across `orderCols` must be broken by a
    * deterministic column (e.g. a source tag) — the LAST orderCol
    * should be unique per (key, version) or the kept row is
    * arbitrary. */
  def latestWins(base: DataFrame, updates: DataFrame,
                 keyCols: Seq[String], orderCols: Seq[String]): DataFrame = {
    require(keyCols.nonEmpty && orderCols.nonEmpty,
      "latestWins needs at least one key and one ordering column")
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(orderCols.map(c => col(c).desc): _*)
    base.unionByName(updates)
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }
}
