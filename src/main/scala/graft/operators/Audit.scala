package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Self-audit columns for approximate operators.
  *
  * The driver's rows-only check (queries whose hashing DuckDB cannot
  * replicate) only sees a row count; appending the recall actually
  * achieved against the exact counterpart turns that into a quality
  * gate — a broken LSH that still returns "some rows" now shows
  * recall 0 instead of passing silently.
  */
object Audit {

  /** Appends a constant `recall` column to `approx`: the fraction of
    * `exact`'s rows (keyed by keyCols) that approx found. Both inputs
    * are small post-aggregation RESULT sets, so the audit joins are
    * trivial next to the queries they grade. An empty exact set yields
    * recall 1.0 (nothing to find). At corpus scale, pass a sampled
    * exact set — recall is a statistic, not part of the result grain. */
  def withRecall(approx: DataFrame, exact: DataFrame,
                 keyCols: Seq[String]): DataFrame = {
    val keys = keyCols.map(col)
    val found = exact.select(keys: _*)
      .join(approx.select(keys: _*).distinct(), keyCols)
    val stats = exact.agg(count(lit(1)).cast("double").as("__ne"))
      .crossJoin(found.agg(count(lit(1)).cast("double").as("__nf")))
      .select(when(col("__ne") === 0, lit(1.0))
        .otherwise(round(col("__nf") / col("__ne"), 4)).as("recall"))
    approx.crossJoin(broadcast(stats))
  }
}
