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
    * `exact`'s rows (keyed by keyCols) that approx found. An empty
    * exact set yields recall 1.0 (nothing to find). At corpus scale,
    * pass a sampled exact set — recall is a statistic, not part of the
    * result grain.
    *
    * Both inputs are materialized ONCE via a LAZY localCheckpoint
    * before the audit joins: each appears in two plan branches below
    * (the found join and the output / the total count), and without
    * lineage truncation Spark recomputes the full upstream pipeline —
    * an LSH candidate join, an all-pairs exact baseline — per branch,
    * roughly doubling the cost of every audited query. `eager = false`
    * keeps registry functions pure plan builders (constructing the
    * DataFrame runs no jobs — plan-lint specs can inspect hundreds of
    * registered plans without executing their pipelines); the persist
    * is registered up front, so when the FIRST action runs, the
    * checkpointed partitions compute once and every other branch reads
    * the stored blocks. Those blocks are the tiny post-aggregation
    * RESULT sets and are released by the ContextCleaner when the
    * result DataFrame is dropped. */
  def withRecall(approx: DataFrame, exact: DataFrame,
                 keyCols: Seq[String]): DataFrame = {
    val keys = keyCols.map(col)
    val a = approx.localCheckpoint(eager = false)
    val e = exact.select(keys: _*).localCheckpoint(eager = false)
    val found = e.join(a.select(keys: _*).distinct(), keyCols)
    val stats = e.agg(count(lit(1)).cast("double").as("__ne"))
      .crossJoin(found.agg(count(lit(1)).cast("double").as("__nf")))
      .select(when(col("__ne") === 0, lit(1.0))
        .otherwise(round(col("__nf") / col("__ne"), 4)).as("recall"))
    a.crossJoin(broadcast(stats))
  }
}
