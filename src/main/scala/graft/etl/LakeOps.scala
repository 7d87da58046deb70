package graft.etl

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Lake-table maintenance on plain partitioned parquet. */
object LakeOps {

  /** MERGE INTO emulation: upsert `updates` (new keys insert, existing
    * keys replace) into a `partCol`-partitioned parquet table, rewriting
    * ONLY the partitions the batch touches, with a staged-commit write:
    *
    *  1. the affected partition VALUES are collected (metadata-scale —
    *     one row per touched partition, same move as the pipeline's
    *     literal-date sink anti-join);
    *  2. the base read is filtered to those values, so partition pruning
    *     keeps every untouched partition unread;
    *  3. matched keys drop via a left-anti join, the update batch unions
    *     in, and the merged partitions are written to a STAGING directory
    *     ([[stageMerge]]) — a dot-prefixed child of the table dir, which
    *     parquet listing ignores, so readers never see it. The base table
    *     is untouched while the expensive, failure-prone data write runs:
    *     a crash anywhere in it leaves the table byte-identical.
    *  4. [[promoteStaged]] swaps each staged partition directory in with
    *     two metadata-only renames (old dir aside, staged dir in). Each
    *     partition's swap is atomic on HDFS/POSIX semantics; a crash
    *     mid-promote leaves every partition either fully old or fully new
    *     (never partial files), and the displaced originals are kept
    *     under the staging dir until the final cleanup, so recovery is
    *     "rename back or re-promote". Table-level atomicity across
    *     partitions is the province of a log-based table format
    *     (Delta/Iceberg) and out of scope; what this removes is the
    *     window where a crash mid-WRITE corrupts served data.
    *
    * At 100 TB this is the difference between a full-table rewrite and
    * touching the day's partitions. Clustering by `partCol` before the
    * write keeps one writer per partition (no tasks x partitions file
    * spray). Concurrent readers can see a mix of pre/post-merge
    * partitions during the (brief, metadata-only) promote loop.
    */
  def mergeInto(spark: SparkSession, sinkDir: String, updates: DataFrame,
                keyCol: String, partCol: String): Unit = {
    val staging = stageMerge(spark, sinkDir, updates, keyCol, partCol)
    promoteStaged(spark, sinkDir, staging)
  }

  /** Phase 1: materialize the merged touched partitions under
    * `sinkDir/.graft_staging_<nanos>` and return that path. The base
    * table is only READ; nothing under `sinkDir` visible to a reader is
    * created, changed, or deleted. */
  def stageMerge(spark: SparkSession, sinkDir: String, updates: DataFrame,
                 keyCol: String, partCol: String): String = {
    val affected = updates.select(partCol).distinct().collect().map(_.get(0))
    // bootstrap: a missing or empty table (no data files — e.g. a freshly
    // created sink) merges against an empty base with the updates' schema
    val base = scala.util.Try(spark.read.parquet(sinkDir))
      .getOrElse(updates.limit(0))
      .filter(col(partCol).isin(affected: _*))
    val merged = base.join(updates.select(keyCol), Seq(keyCol), "left_anti")
      .unionByName(updates.select(base.columns.map(col): _*))
    val staging = s"$sinkDir/.graft_staging_${System.nanoTime()}"
    merged.repartition(col(partCol))
      .write.mode("error").partitionBy(partCol).parquet(staging)
    staging
  }

  /** Right-to-be-forgotten DELETE: remove every row whose `keyCol` is in
    * `keys` (a one-column frame), rewriting ONLY the partitions that
    * contain at least one matching row — found with a column-pruned
    * (partCol, keyCol) scan semi-joined against the broadcast key set, so
    * untouched partitions are never read past their footers. The rewrite
    * rides the same staged-write + rename-promote machinery as
    * [[mergeInto]] (crash mid-delete leaves the table byte-identical;
    * promote is metadata-only renames).
    *
    * A partition whose every row is deleted produces NO staged directory
    * — [[promoteStaged]] alone would leave the stale original in place —
    * so affected-but-unstaged partition dirs are dropped explicitly after
    * the promote. At 100 TB the cost profile is the GDPR job's ideal:
    * scan (2 columns) + rewrite only the partitions the subjects appear
    * in. */
  def deleteKeys(spark: SparkSession, sinkDir: String, keys: DataFrame,
                 keyCol: String, partCol: String): Unit = {
    import org.apache.spark.sql.functions.{broadcast, col}
    val base = spark.read.parquet(sinkDir)
    val affected = base.select(partCol, keyCol)
      .join(broadcast(keys), Seq(keyCol), "left_semi")
      .select(partCol).distinct().collect().map(_.get(0))
    if (affected.isEmpty) return
    val kept = base.filter(col(partCol).isin(affected: _*))
      .join(broadcast(keys), Seq(keyCol), "left_anti")
      .select(base.columns.map(col): _*)
    val staging = s"$sinkDir/.graft_staging_${System.nanoTime()}"
    kept.repartition(col(partCol))
      .write.mode("error").partitionBy(partCol).parquet(staging)
    val fs = new Path(sinkDir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val staged = {
      val p = new Path(staging)
      if (fs.exists(p)) fs.listStatus(p).filter(_.isDirectory).map(_.getPath.getName).toSet
      else Set.empty[String]
    }
    promoteStaged(spark, sinkDir, staging)
    for (v <- affected) {
      val dirName = s"$partCol=$v"
      if (!staged.contains(dirName)) fs.delete(new Path(sinkDir, dirName), true)
    }
  }

  /** Small-file COMPACTION — the other standing lake-maintenance job: a
    * streaming sink or per-task writers leave each partition as many
    * small files (here: whatever the table accumulated); rewrite every
    * partition's data clustered to ONE writer per partition so each
    * partition becomes a single right-sized file, using the same
    * staged-write + rename-promote machinery as [[mergeInto]] (crash
    * mid-compact leaves the table untouched; promote is metadata-only).
    * Row content is byte-for-byte preserved — compaction only changes
    * the file layout. At 100 TB this runs per-partition incrementally;
    * the single parallel `repartition(partCol)` here is that same job
    * fanned over all partitions at once. */
  def compact(spark: SparkSession, sinkDir: String, partCol: String): Unit = {
    val staging = s"$sinkDir/.graft_staging_${System.nanoTime()}"
    spark.read.parquet(sinkDir)
      .repartition(col(partCol))
      .write.mode("error").partitionBy(partCol).parquet(staging)
    promoteStaged(spark, sinkDir, staging)
  }

  /** Phase 2: swap every `part=value` directory under `staging` into
    * `sinkDir` — displaced originals go under `staging/.replaced/` until
    * the staging dir is dropped at the end. Pure metadata renames, no
    * data I/O. Idempotent per partition: re-running after a mid-loop
    * crash re-promotes the remaining staged partitions. */
  def promoteStaged(spark: SparkSession, sinkDir: String, staging: String): Unit = {
    val fs = new Path(sinkDir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.mkdirs(new Path(sinkDir)) // first merge may be creating the table
    val stagingPath = new Path(staging)
    val trash = new Path(stagingPath, ".replaced")
    fs.mkdirs(trash)
    val parts = fs.listStatus(stagingPath)
      .filter(s => s.isDirectory && s.getPath.getName.contains("="))
    for (p <- parts) {
      val dest = new Path(sinkDir, p.getPath.getName)
      if (fs.exists(dest)) fs.rename(dest, new Path(trash, p.getPath.getName))
      if (!fs.rename(p.getPath, dest))
        throw new java.io.IOException(s"promote failed for ${p.getPath} -> $dest")
    }
    fs.delete(stagingPath, true)
  }
}
