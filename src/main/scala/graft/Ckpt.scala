package graft

import org.apache.spark.sql.Dataset

/** Central lineage-truncation point for the engine's iterative operators.
  *
  * Every iterative plan (PageRank rounds, label propagation, Lloyd
  * iterations, ER-ledger folds, …) must truncate lineage each round or
  * the plan tree grows unboundedly. Two modes, selected by the session
  * conf `spark.graft.checkpoint.mode` (unset, the default is chosen by
  * master: `local` on single-JVM `local[n]` masters, `reliable`
  * everywhere else — see [[Ckpt.mode]]):
  *
  *  - `local` (default on `local[n]`): `Dataset.localCheckpoint()` — eager, blocks are
  *    executor-local and NON-replicated. Fastest, and safe on a
  *    single-JVM master (`local[n]`) where executor loss is impossible.
  *  - `reliable`: `Dataset.checkpoint()` — eager, writes the blocks to
  *    the SparkContext checkpoint directory (a shared filesystem on a
  *    real cluster). Survives executor loss mid-iteration, which is the
  *    failure mode `localCheckpoint` cannot: on a 1000-executor cluster
  *    a lost executor kills a `localCheckpoint`-lineaged job, while a
  *    reliable checkpoint recomputes nothing. The checkpoint dir comes
  *    from `spark.graft.checkpoint.dir` (set lazily on first use) or a
  *    pre-set `SparkContext.setCheckpointDir`. Deployments that iterate
  *    many rounds should also set
  *    `spark.cleaner.referenceTracking.cleanCheckpoints=true` so
  *    superseded round snapshots are reclaimed.
  *
  * Both modes are EAGER — construction is execution at each truncation
  * point — and produce bit-identical results (the mode changes where the
  * materialised blocks live, never the rows). `ClusterSmokeSpec` holds
  * that contract; `graft.ClusterSmoke` runs the heavy keys in reliable
  * mode on a multi-JVM `local-cluster` master.
  */
object Ckpt {
  val ModeKey = "spark.graft.checkpoint.mode"
  val DirKey = "spark.graft.checkpoint.dir"

  /** Mode resolution: explicit conf wins; otherwise SAFE BY MASTER —
    * `local[n]` masters (single JVM, executor loss impossible) default
    * to the fast `localCheckpoint`, every other master (standalone,
    * local-cluster, YARN, k8s) defaults to `reliable`, because a
    * deployment that forgets the conf must inherit the mode that
    * survives executor loss, not the one that dies with
    * CHECKPOINT_RDD_BLOCK_ID_NOT_FOUND (the demonstrated failure —
    * docs/CLUSTER.md). */
  private[graft] def mode(spark: org.apache.spark.sql.SparkSession): String =
    spark.conf.getOption(ModeKey).getOrElse {
      if (spark.sparkContext.master.startsWith("local[") ||
          spark.sparkContext.master == "local") "local" else "reliable"
    }

  def apply[T](ds: Dataset[T]): Dataset[T] = {
    val spark = ds.sparkSession
    mode(spark) match {
      case "reliable" =>
        if (spark.sparkContext.getCheckpointDir.isEmpty) {
          val dir = spark.conf.get(DirKey,
            new java.io.File(sys.props("java.io.tmpdir"),
              s"graft-ckpt-${spark.sparkContext.applicationId}").toString)
          // the fallback is a NODE-LOCAL path: fine on a single-host
          // master, but on a real cluster each executor would write its
          // "reliable" blocks to its own disk — silently defeating the
          // recovery the mode exists for. Multi-node deployments must
          // point DirKey (or setCheckpointDir) at a shared filesystem.
          if (!spark.sparkContext.master.startsWith("local"))
            org.slf4j.LoggerFactory.getLogger(getClass).warn(
              s"graft: reliable checkpoint dir defaulting to node-local $dir on " +
                s"master ${spark.sparkContext.master}; set $DirKey to a shared " +
                "filesystem or executor-loss recovery will not work")
          spark.sparkContext.setCheckpointDir(dir)
        }
        ds.checkpoint()
      case _ => ds.localCheckpoint()
    }
  }

  /** `.graftCheckpoint()` — the call shape every operator uses in place
    * of a raw `.localCheckpoint()`. */
  implicit final class Ops[T](private val ds: Dataset[T]) extends AnyVal {
    def graftCheckpoint(): Dataset[T] = Ckpt(ds)
  }
}
