package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Lake-table maintenance on plain partitioned parquet. */
object LakeOps {

  /** MERGE INTO emulation: upsert `updates` (new keys insert, existing
    * keys replace) into a `partCol`-partitioned parquet table, rewriting
    * ONLY the partitions the batch touches:
    *
    *  1. the affected partition VALUES are collected (metadata-scale —
    *     one row per touched partition, same move as the pipeline's
    *     literal-date sink anti-join);
    *  2. the base read is filtered to those values, so partition pruning
    *     keeps every untouched partition unread;
    *  3. matched keys drop via a left-anti join, the update batch unions
    *     in, and DYNAMIC partition overwrite rewrites exactly the
    *     partitions present in the merged frame — untouched partition
    *     directories are never listed, read, or written.
    *
    * At 100 TB this is the difference between a full-table rewrite and
    * touching the day's partitions. Clustering by `partCol` before the
    * write keeps one writer per partition (no tasks x partitions file
    * spray). */
  def mergeInto(spark: SparkSession, sinkDir: String, updates: DataFrame,
                keyCol: String, partCol: String): Unit = {
    val affected = updates.select(partCol).distinct().collect().map(_.get(0))
    val base = spark.read.parquet(sinkDir)
      .filter(col(partCol).isin(affected: _*))
    val merged = base.join(updates.select(keyCol), Seq(keyCol), "left_anti")
      .unionByName(updates.select(base.columns.map(col): _*))
    val key = "spark.sql.sources.partitionOverwriteMode"
    val old = spark.conf.getOption(key)
    spark.conf.set(key, "dynamic")
    try merged.repartition(col(partCol))
      .write.mode("overwrite").partitionBy(partCol).parquet(sinkDir)
    finally old match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }
}
