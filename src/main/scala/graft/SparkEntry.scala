package graft
import org.apache.spark.sql.{SparkSession, DataFrame}
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` maps every SURVEY §2 key to a (session, sfDir) => DataFrame;
  * `oracleSql` carries the DuckDB-equivalent SQL for every
  * SQL-expressible key (keys absent there get a rows-only check).
  */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    TpchQueries.q5LocalSupplier(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2.
    *
    * Every dispatch first runs [[GraftSession.ensureFunctions]], so the
    * dd_/ss_/geo_range/ing_binary queries (which call graft's custom
    * Catalyst functions) work on ANY session — not only one built with
    * `spark.sql.extensions=graft.GraftExtensions`. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = {
    val raw =
      TpchQueries.queries ++ TrafficQueries.queries ++ TextQueries.queries ++
        IngestQueries.queries ++ DedupQueries.queries ++
        SimilarityQueries.queries ++ GeoQueries.queries ++ MiscQueries.queries
    raw.map { case (name, fn) =>
      name -> ((s: SparkSession, dir: String) => fn(GraftSession.ensureFunctions(s), dir))
    }
  }

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    TpchQueries.oracles ++ TrafficQueries.oracles ++ TextQueries.oracles ++
      IngestQueries.oracles ++ DedupQueries.oracles ++
      SimilarityQueries.oracles ++ GeoQueries.oracles ++ MiscQueries.oracles
}
