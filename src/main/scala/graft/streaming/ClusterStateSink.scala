package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Keyed merge target for streaming dedup state — the scale-safe
  * replacement for `complete`-mode aggregation into a memory sink (which
  * holds every signature ever seen in executor state AND collects all of
  * it to the driver every trigger).
  *
  * Model: signature-cluster state lives in a distributed keyed store,
  * versioned by micro-batch id. Each foreachBatch merges the batch's
  * clusters into the previous version and writes `state_v<batchId>`:
  *
  *   - per-batch work = batch delta + one keyed merge (shuffle on `sig`),
  *     never a full re-aggregation of history on the driver;
  *   - min(rep)/sum(n_docs) are associative-commutative, so the running
  *     merge equals the batch groupBy over all data regardless of
  *     micro-batch boundaries;
  *   - idempotent under foreachBatch's at-least-once replay: a batch
  *     replayed after a crash re-reads the SAME previous version (ids
  *     below its own) and overwrites its own output dir — the
  *     checkpoint-restart test in StreamingSpec exercises this.
  *
  * At 100 TB the version dirs become a transactional keyed table
  * (Delta/Hudi MERGE, or the reference's Postgres upsert); versioned
  * parquet is the dependency-free equivalent with the same plan shape.
  */
object ClusterStateSink {

  private def versionDir(root: String, v: Long) = s"$root/state_v$v"

  private def versions(spark: SparkSession, root: String): Seq[Long] = {
    val p = new Path(root)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(p)) Seq.empty
    else fs.listStatus(p).map(_.getPath.getName)
      .collect { case s if s.startsWith("state_v") => s.drop("state_v".length).toLong }
      .toSeq
  }

  /** foreachBatch hook: batch rows are (doc_id, sig). */
  def merge(root: String)(batch: DataFrame, batchId: Long): Unit = {
    val spark = batch.sparkSession
    val cur = batch.groupBy("sig")
      .agg(min(col("doc_id")).as("rep"), count(lit(1)).as("n_docs"))
    val prior = versions(spark, root).filter(_ < batchId)
    val merged = prior.maxOption match {
      case Some(pv) =>
        spark.read.parquet(versionDir(root, pv)).unionByName(cur)
          .groupBy("sig")
          .agg(min(col("rep")).as("rep"), sum(col("n_docs")).as("n_docs"))
      case None => cur
    }
    merged.write.mode("overwrite").parquet(versionDir(root, batchId))
    // prune: only the newest prior version can ever be replayed against
    val fs = new Path(root).getFileSystem(spark.sessionState.newHadoopConf())
    prior.filter(_ < batchId - 1)
      .foreach(v => fs.delete(new Path(versionDir(root, v)), true))
  }

  /** Latest merged state: (sig, rep, n_docs). */
  def read(spark: SparkSession, root: String): DataFrame =
    versions(spark, root).maxOption match {
      case Some(v) => spark.read.parquet(versionDir(root, v))
      case None =>
        import spark.implicits._
        Seq.empty[(String, Long, Long)].toDF("sig", "rep", "n_docs")
    }
}
