package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed-table layout — Spark's co-located join primitive.
  *
  * A fact/dim pair that joins on the same key every day should pay the
  * shuffle ONCE, at write time: `bucketBy(n, key)` pre-hashes rows into a
  * fixed bucket scheme recorded in the table catalog, and every later join
  * between tables sharing the scheme satisfies the planner's required
  * distribution straight off the scan — zero Exchange on either side
  * (sort-merge join reads bucket files pairwise; `sortBy` makes even the
  * sort free). At 100 TB this turns the nightly fact×fact join from the
  * dominant shuffle into a local merge, and bucket count picks the
  * parallelism independent of file count.
  *
  * Spark only honors bucket metadata through the session catalog, so the
  * writer goes through `saveAsTable` with an explicit `path` (external
  * table — data lives in the caller's directory, and dropping the table
  * definition never deletes data).
  */
object BucketedTables {

  /** (Re)write `df` as an external parquet table bucketed+sorted on `key`. */
  def writeBucketed(df: DataFrame, table: String, path: String,
                    key: String, buckets: Int): Unit = {
    val spark = df.sparkSession
    spark.sql(s"DROP TABLE IF EXISTS `$table`")
    df.write.format("parquet")
      .option("path", path)
      .bucketBy(buckets, key)
      .sortBy(key)
      .mode("overwrite")
      .saveAsTable(table)
  }

  /** Equi-join two bucketed tables on their shared bucket key. With
    * matching bucket specs the physical plan contains no
    * ShuffleExchange under the join (asserted in PlanSpec). */
  def bucketedJoin(spark: SparkSession, left: String, right: String,
                   key: String): DataFrame =
    // merge hint: the recurring fact×fact join this layout exists for is
    // sort-merge over co-located buckets; without it AQE broadcasts small
    // test tables and the bucket scheme never gets exercised
    spark.table(left).join(spark.table(right).hint("merge"), Seq(key))
}
