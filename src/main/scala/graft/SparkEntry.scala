package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * One query per implemented operator (SURVEY §2.1 v1 keys + §2.3
  * extensions), each with a DuckDB oracle in [[graft.queries.Oracles]].
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The full reference pipeline composition (scan → validate → dropna →
    * timestamp → project → dedup). */
  def entry(spark: SparkSession): DataFrame =
    queries("pipeline_backfill_then_watch")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    graft.queries.CoreQueries.all ++
      graft.streaming.StreamQueries.all ++
      graft.queries.ExtQueries.all ++
      graft.queries.AnalyticsQueries.all

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. */
  def oracleSql: Map[String, String] = graft.queries.Oracles.all

  /** Bench-only serve-vs-build split for the persisted-store keys: the
    * builder stages the store untimed, the returned thunk is the
    * serve-only query Bench records as `<key>__serve`. See
    * [[graft.queries.ExtQueries.serveSplit]]. */
  def serveSplit: Map[String, (SparkSession, String) => () => DataFrame] =
    graft.queries.ExtQueries.serveSplit
}
