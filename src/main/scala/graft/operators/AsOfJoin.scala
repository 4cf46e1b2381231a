package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Scalable as-of (backward) join: for every left row, attach the most
  * recent right row with right.time <= left.time (optionally per key).
  *
  * Mirrors the reference's intent of correlating vehicle positions with
  * the hourly weather series (weather/pipeline/extract.py fetches hourly
  * rows keyed by time; the analysis joins "conditions at that moment").
  *
  * Implementation is the union-tag-window pattern: tag both sides, union,
  * ONE hash shuffle on the key, sort by (time, side) within partitions,
  * then last-non-null window to propagate the right row forward. O(n log
  * n) per partition, no broadcast of the big side, no point-lookup joins
  * — survives a 100 TB left side as long as keys hash-spread (the right
  * side is a time series per key, naturally small per partition).
  */
object AsOfJoin {

  /** @param left       big side; must carry `keyCols` and `timeCol`
    * @param right      series side; must carry `keyCols`, `timeCol`, and
    *                   `valueCols` (columns to attach)
    * @param timeCol    orderable column name present on both sides
    * @param valueCols  right-side payload column names to carry over
    */
  def backward(left: DataFrame, right: DataFrame, keyCols: Seq[String],
               timeCol: String, valueCols: Seq[String]): DataFrame = {
    val leftCols = left.columns
    // A valueCol name colliding with a left column would emit the name
    // twice in taggedLeft and corrupt the unionByName — fail fast.
    require(valueCols.intersect(leftCols).isEmpty,
      s"valueCols ${valueCols.intersect(leftCols).mkString(",")} collide with left columns; rename first")
    // Contract: right must be unique per (keyCols, timeCol) — duplicate
    // right timestamps would make which value wins nondeterministic.
    // Series produced by groupBy(hour) satisfy this by construction.
    //
    // SQL equality never matches NULL keys, but a window partitionBy
    // groups NULLs together — drop null-key right rows so a null-key
    // left row falls through to null values exactly like an ASOF JOIN.
    val rightNonNull = keyCols.foldLeft(right)((d, k) => d.filter(col(k).isNotNull))
    // side=0 sorts right rows before left rows at equal time → a right
    // row at exactly t is visible to a left row at t (inclusive as-of).
    // Values travel as ONE struct, not independent columns: filling each
    // column separately with last(ignoreNulls) would mix fields from
    // DIFFERENT right rows whenever the latest row holds a null in one
    // field (a "torn" match). The struct is non-null exactly for right
    // rows, so last(ignoreNulls) always lands on a single right row.
    val payloadType = org.apache.spark.sql.types.StructType(
      valueCols.map(c => right.schema(c).copy(name = c)))
    val taggedRight = rightNonNull.select(
      keyCols.map(col) ++ Seq(col(timeCol), lit(0).as("__side"),
        struct(valueCols.map(col): _*).as("__vals")) ++
        leftCols.filterNot(c => keyCols.contains(c) || c == timeCol)
          .map(c => lit(null).cast(left.schema(c).dataType).as(c)): _*)
    val taggedLeft = left.select(
      keyCols.map(col) ++ Seq(col(timeCol), lit(1).as("__side"),
        lit(null).cast(payloadType).as("__vals")) ++
        leftCols.filterNot(c => keyCols.contains(c) || c == timeCol).map(col): _*)

    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col(timeCol).asc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, 0)
    val filled = taggedRight.unionByName(taggedLeft)
      .withColumn("__asof", last(col("__vals"), ignoreNulls = true).over(w))
    filled.filter(col("__side") === 1)
      .select(leftCols.map(col) ++
        valueCols.map(c => col(s"__asof.$c").as(c)): _*)
  }
}
