package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Relational data-quality audits — the checks an ingest pipeline runs
  * before promoting a landed batch.
  */
object Quality {

  /** Rows of `child` whose `childKey` has no match in
    * `parent.parentKey` — a LEFT ANTI join, i.e. one hash shuffle on
    * the key pair and nothing materialized but the violations. At
    * 100 TB the anti-join is the only shape that works: collecting
    * parent keys to the driver or a broadcast of a billion-row parent
    * are both non-starters, while a shuffled anti join partitions by
    * the very key being checked. */
  def orphans(child: DataFrame, childKey: String,
              parent: DataFrame, parentKey: String): DataFrame = {
    // internal alias: childKey and parentKey may be the same name (or
    // the same table — a self-check), which would make the join
    // condition ambiguous
    val keys = parent.select(col(parentKey).as("__graft_pk"))
    // SHUFFLE_HASH pins the shape the doc above promises: without it
    // the planner broadcasts the parent keys whenever their estimate
    // dips under the threshold — at 10x bench data that is a 1.5M-row
    // driver-side build (measured 1.04 s vs 0.64 s for the hinted
    // shuffled hash, AntiJoinAbProbe). The build side here is the
    // parent KEY COLUMN only, so the per-partition hash set is narrow
    // and bounded by the shuffle partitioning, and the (much larger)
    // child side streams through unsorted — cheaper than a merge
    // anti-join, which would sort the child.
    child.join(keys.hint("shuffle_hash"),
      col(childKey) === col("__graft_pk"), "left_anti")
  }

  /** One audit row per FK check: name, orphan count, child row count.
    * The inputs are (childDf, childKey, parentDf, parentKey, name). */
  def fkAudit(checks: Seq[(DataFrame, String, DataFrame, String, String)]): DataFrame =
    checks.map { case (child, ck, parent, pk, name) =>
      orphans(child, ck, parent, pk)
        .agg(count(lit(1)).as("n_orphans"))
        .crossJoin(child.agg(count(lit(1)).as("n_total")))
        .select(lit(name).as("check_name"), col("n_orphans"), col("n_total"))
    }.reduce(_ unionAll _)
}
