package graft

import org.apache.spark.sql.SparkSession

/** NETWORKED executor-side JDBC smoke — the cluster shape the embedded-
  * Derby catalog keys cannot exercise (Derby embedded locks its db dir
  * to ONE JVM, so `ClusterSmoke` excludes the 3 JDBC keys with a logged
  * contract). The distribution ships no derbynet/derbyclient, but it
  * DOES ship Spark's own Thrift JDBC server (`spark-hive-thriftserver`)
  * and the `hive-jdbc` driver — a real TCP database endpoint and a real
  * network JDBC client, both offline.
  *
  * The experiment: start the Thrift server inside the driver of a
  * `local-cluster[2,8,4096]` app (single-session mode, so the app's temp
  * views are the served warehouse), then run a PARTITIONED
  * `spark.read.jdbc` against `jdbc:hive2://localhost:<port>` from the
  * SAME app. The four partition tasks execute on the remote EXECUTOR
  * JVMs, each opening its own TCP JDBC connection back to the server —
  * cross-process, through a socket, with the generated HiveQL carrying
  * the partition bounds and pruned columns ([[graft.sources
  * .HiveJdbcDialect]] makes the generated SQL valid HiveQL; without it
  * the default dialect's double-quoted identifiers parse as string
  * literals). Verified: row count, per-key content equality against the
  * direct parquet read, and the executor id of every partition task
  * (all must be real executors, not the driver).
  *
  * The WRITE leg then retires the last embedded-Derby-only contract:
  * [[graft.sources.JdbcStatementWriter]] sends multi-row
  * `INSERT INTO … VALUES` TEXT statements (the reference's
  * `to_sql(method='multi')` shape, btc_etl.py:179-180) from executor
  * tasks over their own TCP connections — no prepared placeholders, so
  * it works where Spark's built-in jdbc writer cannot. The four writes
  * run CONCURRENTLY through per-writer staging tables + one atomic
  * commit statement (the staged-commit shape that closes the measured
  * shared-`_temporary` loss class on FS-backed tables), followed by a
  * read-back equality check and a full replay through the anti-join
  * guard that must insert zero rows.
  *
  * Usage: `runMain graft.JdbcClusterSmoke [sfDir] [port]`. Prints one
  * JSON line; exit 1 on any mismatch. */
object JdbcClusterSmoke {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.001"
    val port = if (args.length > 1) args(1).toInt else 10123

    val appClasses = new java.io.File(
      getClass.getProtectionDomain.getCodeSource.getLocation.toURI).getAbsolutePath
    // keep the server's embedded Hive metastore out of the repo cwd
    val meta = java.nio.file.Files.createTempDirectory("graft-jdbc-meta").toString
    sys.props("derby.system.home") = meta
    sys.props("derby.stream.error.file") = s"$meta/derby.log"

    val spark = SparkSession.builder()
      .master("local-cluster[2,8,4096]")
      .appName("graft-jdbc-cluster-smoke")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.executor.extraClassPath", appClasses)
      .config("spark.executorEnv.SPARK_SCALA_VERSION", "2.13")
      .config("hive.server2.thrift.port", port.toString)
      // the served session IS this session: temp views become the warehouse
      .config("spark.sql.hive.thriftServer.singleSession", "true")
      .config("spark.hadoop.javax.jdo.option.ConnectionURL",
        s"jdbc:derby:;databaseName=$meta/metastore_db;create=true")
      .config("spark.sql.warehouse.dir", s"$meta/warehouse")
      // NOT enableHiveSupport(): a hive-serde sink would give per-query
      // commit staging, but every new HS2 connection then initialises
      // Spark's EXECUTION hive client against a `jdbc:derby:memory:`
      // metastore this distribution's Derby cannot create (measured:
      // "Failed to create database 'memory:'" on the replay leg's fresh
      // connection). Concurrent-append safety comes from per-writer
      // staging tables + one commit statement instead (write leg below).
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.sources.HiveJdbcDialect.register()

    // coarse progress markers on stderr: the smoke runs at WARN log
    // level, so a hang is otherwise a silent 10-minute mystery
    def mark(s: String): Unit = System.err.println(s"[jdbc-smoke] $s")
    mark("session up")

    val customer = graft.queries.Staging.tbl(spark, sfDir, "customer")
      .select("c_custkey", "c_name", "c_nationkey")
    customer.createOrReplaceTempView("customer_src")
    val maxKey = customer.agg(org.apache.spark.sql.functions.max("c_custkey"))
      .collect()(0).getLong(0)
    mark(s"customer staged, maxKey=$maxKey")

    org.apache.spark.sql.hive.thriftserver.HiveThriftServer2
      .startWithSparkSession(spark, exitOnError = false)
    mark("thrift server starting")
    // wait for the TCP listener
    val deadline = System.nanoTime() + 60L * 1000 * 1000 * 1000
    var up = false
    while (!up && System.nanoTime() < deadline) {
      try { new java.net.Socket("localhost", port).close(); up = true }
      catch { case _: java.io.IOException => Thread.sleep(500) }
    }
    require(up, s"Thrift JDBC server did not open port $port within 60s")
    mark("port open")

    val url = s"jdbc:hive2://localhost:$port/default"
    val jdbcDf = spark.read.format("jdbc")
      .option("url", url)
      .option("driver", "org.apache.hive.jdbc.HiveDriver")
      .option("dbtable", "customer_src")
      .option("partitionColumn", "c_custkey")
      .option("lowerBound", "1")
      .option("upperBound", (maxKey + 1).toString)
      .option("numPartitions", "4")
      .load()

    val outcome = try {
      // where did the partition tasks run? (must be executors, not driver)
      val parts = jdbcDf.rdd.mapPartitions { it =>
        Iterator((org.apache.spark.SparkEnv.get.executorId, it.size))
      }.collect()
      val execIds = parts.map(_._1).distinct.sorted
      val viaJdbc = jdbcDf.collect().map(_.toString).sorted
      val direct = customer.collect().map(_.toString).sorted
      val contentEqual = viaJdbc.sameElements(direct)
      val onExecutors = execIds.forall(_ != "driver")
      // column pruning + predicate pushdown also cross the wire as HiveQL
      val pushed = jdbcDf.filter(org.apache.spark.sql.functions.col("c_custkey") <= 10)
        .select("c_name").count()
      val pushedTruth = customer
        .filter(org.apache.spark.sql.functions.col("c_custkey") <= 10)
        .count()
      mark("read leg done")

      // WRITE leg — the reference sink's actual wire shape
      // (btc_etl.py:179-180, to_sql(method='multi')) over the network:
      // executor tasks render multi-row `INSERT INTO … VALUES (…),(…)`
      // TEXT statements and send them over their own TCP connection to
      // the Thrift endpoint. No prepared-statement placeholders — which
      // hive2 does not serve and is exactly why Spark's built-in jdbc
      // writer cannot write here ([[graft.sources.JdbcStatementWriter]]).
      // Verified: every write task ran on a real executor, read-back
      // content equality vs the direct frame, and a FULL REPLAY through
      // the anti-join guard inserts zero rows (the reference's
      // crash-between-to_sql-and-SADD duplication made a no-op).
      spark.sql("DROP TABLE IF EXISTS graft_sink_net")
      spark.sql("CREATE TABLE graft_sink_net " +
        "(c_custkey BIGINT, c_name STRING, c_nationkey BIGINT) USING parquet")
      // The four executor-side writes run CONCURRENTLY — four append
      // jobs in flight at once, each one task on a remote executor
      // pushing multi-row INSERT text over its own TCP connection. A
      // naive concurrent append into ONE `USING parquet` table loses
      // rows (measured 26/150: the FS commit protocol stages every job
      // under one shared `_temporary` dir and a committing job deletes
      // the others' pending task files — the reason the r15 smoke
      // serialized its writes). The fix is the STAGED-COMMIT shape
      // ([[graft.etl.LakeOps.appendConcurrent]]'s pattern translated to
      // warehouse SQL): each writer appends to its OWN staging table —
      // own directory, own `_temporary`, nothing shared — and one
      // atomic `INSERT INTO sink SELECT ... UNION ALL ...` statement
      // commits all four at once. Against a real row-locking endpoint
      // (the reference's Postgres) no staging is needed at all — the
      // writer's concurrent-partition correctness there is pinned in
      // JdbcStatementWriterSpec (live Derby, 8 connections, zero loss).
      val kc = org.apache.spark.sql.functions.col("c_custkey")
      for (b <- 0 until 4) {
        spark.sql(s"DROP TABLE IF EXISTS graft_sink_stage_$b")
        spark.sql(s"CREATE TABLE graft_sink_stage_$b " +
          "(c_custkey BIGINT, c_name STRING, c_nationkey BIGINT) USING parquet")
      }
      val audit = {
        import scala.concurrent.{Await, Future}
        import scala.concurrent.duration._
        import scala.concurrent.ExecutionContext.Implicits.global
        Await.result(Future.sequence((0 until 4).map { b =>
          Future {
            graft.sources.JdbcStatementWriter.append(
              customer.filter(kc % 4 === b).coalesce(1),
              url, s"graft_sink_stage_$b", batchSize = 100)
          }
        }), 10.minutes).flatten
      }
      mark(s"write leg: concurrent staged appends done (${audit.map(_.rows).sum} rows)")
      // the commit point: one statement, one job, no concurrency
      spark.sql("INSERT INTO graft_sink_net " +
        (0 until 4).map(b => s"SELECT * FROM graft_sink_stage_$b")
          .mkString(" UNION ALL "))
      (0 until 4).foreach(b => spark.sql(s"DROP TABLE graft_sink_stage_$b"))
      mark("write leg: staged commit done")
      val writeExecs = audit.map(_.executorId).distinct.sorted
      val writtenBack = spark.table("graft_sink_net").collect().map(_.toString).sorted
      val writeEqual = writtenBack.sameElements(direct)
      val writeOnExecutors = audit.nonEmpty && writeExecs.forall(_ != "driver")
      val replayRows = graft.sources.JdbcStatementWriter
        .appendIdempotent(customer, url, "graft_sink_net", "c_custkey")
        .map(_.rows).sum
      val replayOk = replayRows == 0 &&
        spark.table("graft_sink_net").count() == direct.length

      val ok = contentEqual && onExecutors && parts.length == 4 &&
        pushed == pushedTruth && writeEqual && writeOnExecutors && replayOk
      println(s"""{"metric":"jdbc_cluster_smoke","outcome":"${if (ok) "ok" else "MISMATCH"}","rows":${viaJdbc.length},"partitions":${parts.length},"executors":${execIds.mkString("[\"", "\",\"", "\"]")},"content_equal":$contentEqual,"pushdown_rows":$pushed,"write_rows":${audit.map(_.rows).sum},"write_statements":${audit.map(_.statements).sum},"write_concurrent":true,"write_executors":${writeExecs.mkString("[\"", "\",\"", "\"]")},"write_content_equal":$writeEqual,"replay_inserted":$replayRows,"url":"jdbc:hive2://localhost:$port"}""")
      if (ok) "ok" else "MISMATCH"
    } catch { case e: Throwable =>
      val msg = Option(e.getMessage).getOrElse("").replaceAll("[\"\\n]", " ").take(200)
      println(s"""{"metric":"jdbc_cluster_smoke","outcome":"failed","error":"${e.getClass.getSimpleName}: $msg"}""")
      "failed"
    }
    try spark.stop() catch { case _: Throwable => () }
    // the embedded metastore's derby.log lands in cwd despite the
    // derby.system.home prop (DataNucleus re-boots Derby) — sweep any
    // cwd droppings so a smoke run never dirties the repo
    for (n <- Seq("derby.log", "spark-warehouse", "metastore_db")) try {
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(rm)
        f.delete(); ()
      }
      val f = new java.io.File(n)
      if (f.exists()) rm(f)
    } catch { case scala.util.control.NonFatal(_) => () }
    if (outcome != "ok") sys.exit(1)
  }
}
