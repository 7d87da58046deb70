package graft

import org.apache.spark.sql.SparkSession

/** Executor-LOSS resilience demonstration — the experiment that separates
  * the two [[Ckpt]] modes for real, not by argument:
  *
  * run an iterative operator (PageRank, 12 rounds) on
  * `local-cluster[2,8,4096]` and `kill -9` every executor JVM mid-run.
  *
  *  - `reliable` mode: the truncation points wrote cluster-visible
  *    checkpoint files, the standalone master replaces the dead executor,
  *    lost tasks re-read the checkpoint — the job COMPLETES.
  *  - `local` mode: the previous round's `localCheckpoint` blocks lived
  *    only in the killed executor's block store and lineage was truncated
  *    at them — recompute is impossible and the job FAILS (the exact
  *    100-TB fragility the reliable mode exists to remove).
  *
  * Beyond the RDD-checkpoint arm, two STREAMING-STATE scenarios exercise
  * the engine's other recovery contracts under the same kill-all:
  *
  *  - `stream_state`: the `stream_transform_state` path — a
  *    `transformWithState` RunningTotals processor with RocksDB state
  *    across 4 micro-batches. Killed tasks are retried on relaunched
  *    executors, state restores from the streaming checkpoint, and the
  *    final per-user totals must be bit-identical to a no-kill run
  *    (compare `result_hash` across runs).
  *  - `lake_merge`: the `stream_lake_merge` path — foreachBatch
  *    staged-commit MERGEs into the manifest-committed lake. A kill mid
  *    staged write must never surface a half-applied batch: the manifest
  *    switch is the only commit point and replayed batches upsert the
  *    same keys, so the table converges to the same content
  *    (`result_hash`) as a no-kill run.
  *
  * Usage: `runMain graft.ExecutorLossSmoke <local|reliable> [sfDir]
  * [killAfterSec] [pagerank|stream_state|lake_merge]` — killAfterSec 0 =
  * no kill (baseline timing + truth hash; use it to pick a mid-run kill
  * delay). Prints one JSON line with the outcome and a content hash of
  * the result rows; exit 1 only when RELIABLE mode (or a streaming
  * scenario, which must always recover) fails to complete (local-mode
  * pagerank failure is the expected demonstration, not an error).
  */
object ExecutorLossSmoke {
  def main(args: Array[String]): Unit = {
    val mode = if (args.length > 0) args(0) else "reliable"
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    val killAfterSec = if (args.length > 2) args(2).toInt else 10
    val scenario = if (args.length > 3) args(3) else "pagerank"

    val appClasses = new java.io.File(
      getClass.getProtectionDomain.getCodeSource.getLocation.toURI).getAbsolutePath
    val ckptDir = java.nio.file.Files.createTempDirectory("graft-loss-ckpt").toString
    val spark = SparkSession.builder()
      .master("local-cluster[2,8,4096]")
      .appName(s"graft-executor-loss-$mode-$scenario")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.executor.extraClassPath", appClasses)
      .config("spark.executorEnv.SPARK_SCALA_VERSION", "2.13")
      .config("spark.graft.checkpoint.mode", mode)
      .config("spark.graft.checkpoint.dir", ckptDir)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.expressions.GraftFunctions.register(spark)

    if (killAfterSec > 0) {
      // Target ONLY this application's executors: the backend command
      // line carries --app-id <applicationId>, so executors of unrelated
      // Spark apps sharing the host are never touched.
      val appId = spark.sparkContext.applicationId
      val killer = new Thread(() => {
        try {
          Thread.sleep(killAfterSec * 1000L)
          import scala.sys.process._
          val pids = Seq("bash", "-c",
            s"ps -eo pid,args | grep CoarseGrainedExecutorBackend | grep -- '--app-id $appId' | grep -v grep | awk '{print $$1}'")
            .!!.trim.split("\\s+").filter(_.nonEmpty)
          // kill EVERY executor JVM of THIS app: at fixture scale a single
          // kill is non-deterministic (the survivor may hold all blocks of
          // the latest round's checkpoint); losing all executors loses every
          // executor-local block by construction, while the standalone
          // master relaunches fresh executors either way — so the arms
          // separate on exactly one variable: where checkpoint blocks live
          System.err.println(s"[loss] kill -9 ALL executor JVMs of $appId: ${pids.mkString(", ")}")
          pids.foreach(pid => Seq("kill", "-9", pid).!)
        } catch { case scala.util.control.NonFatal(e) =>
          System.err.println(s"[loss] killer thread failed: $e")
        }
      })
      killer.setDaemon(true)
      killer.start()
    }

    val t0 = System.nanoTime()
    val outcome = try {
      val result = scenario match {
        case "stream_state" =>
          graft.streaming.TransformStateStream.run(spark, sfDir)
        case "lake_merge" =>
          graft.streaming.StreamQueries.streamLakeMerge(spark, sfDir)
        case _ =>
          val edges = graft.operators.Graph.coPartEdgesMin(
            graft.queries.Staging.tbl(spark, sfDir, "lineitem"), 2L)
          graft.operators.Graph.pageRank(edges, iters = 12)
      }
      val rows = result.collect().map(_.toString).sorted
      // content hash: equal across kill/no-kill runs = exactly-once result
      val hash = java.security.MessageDigest.getInstance("MD5")
        .digest(rows.mkString("\n").getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      val secs = (System.nanoTime() - t0) / 1e9
      println(f"""{"metric":"executor_loss","mode":"$mode","scenario":"$scenario","kill_after_sec":$killAfterSec,"outcome":"completed","rows":${rows.length},"result_hash":"$hash","secs":$secs%.2f}""")
      "completed"
    } catch { case e: Throwable =>
      val msg = Option(e.getMessage).getOrElse("").replaceAll("[\"\\n]", " ").take(160)
      println(s"""{"metric":"executor_loss","mode":"$mode","scenario":"$scenario","kill_after_sec":$killAfterSec,"outcome":"failed","error":"${e.getClass.getSimpleName}: $msg"}""")
      "failed"
    }
    try spark.stop() catch { case _: Throwable => () }
    try {
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(rm)
        f.delete(); ()
      }
      rm(new java.io.File(ckptDir))
    } catch { case scala.util.control.NonFatal(_) => () }
    // streaming-state scenarios must ALWAYS recover (their state is
    // checkpointed by the engine regardless of Ckpt mode); the pagerank
    // local-mode failure is the demonstration, not an error
    val mustComplete = scenario != "pagerank" || mode == "reliable"
    if (mustComplete && killAfterSec > 0 && outcome != "completed") sys.exit(1)
  }
}
