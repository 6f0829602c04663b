package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries.{CoreQueries, ExtQueries, GQ}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Queries are assembled from per-family registries; each entry carries its
  * own DuckDB oracle SQL (when SQL-expressible) so `queries` and `oracleSql`
  * can never drift apart.
  */
object SparkEntry {

  def registry: Seq[GQ] = CoreQueries.all ++ ExtQueries.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The E1 pipeline shape (SURVEY.md §3): scan → filter/cast → agg-join-back
    * → lag-window delta, in one plan.
    */
  def entry(spark: SparkSession): DataFrame =
    queries("w1_lag_delta")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    registry.map(q => q.name -> q.run).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops (driver
    * records a weaker rows-only check for those).
    */
  def oracleSql: Map[String, String] =
    registry.collect { case GQ(name, Some(sql), _) => name -> sql }.toMap
}
