package graft

import org.apache.spark.sql.functions._
import graft.etl.{EtlConfig, ParquetMigrate, Schemas}
import graft.sources.JdbcSink
import graft.sources.JdbcSink.JdbcOptions

/** The DB-sink surface without a live database: option/DDL builders are
  * pinned exactly; the partitioned-migration path runs end to end on
  * parquet. */
class JdbcSinkSpec extends SparkSpec {

  test("writerOptions maps batching/pool knobs to the jdbc writer keys") {
    val o = JdbcOptions(
      url = "jdbc:postgresql://db:5432/postgres", table = "bitcoin_stock_data",
      user = Some("postgres"), password = Some("pw"),
      batchSize = 500, numPartitions = 10)
    val m = JdbcSink.writerOptions(o)
    assert(m("url") === "jdbc:postgresql://db:5432/postgres")
    assert(m("dbtable") === "bitcoin_stock_data")
    assert(m("batchsize") === "500")      // to_sql method='multi' analog
    assert(m("numPartitions") === "10")   // pool_size=10 analog
    assert(m("isolationLevel") === "READ_COMMITTED")
    assert(m("user") === "postgres" && m("password") === "pw")
  }

  test("writerOptions rejects malformed config instead of failing at the DB") {
    intercept[IllegalArgumentException] {
      JdbcSink.writerOptions(JdbcOptions(url = "postgresql://no-scheme", table = "t"))
    }
    intercept[IllegalArgumentException] {
      JdbcSink.writerOptions(JdbcOptions(url = "jdbc:postgresql://x/db", table = "t", batchSize = 0))
    }
    intercept[IllegalArgumentException] {
      JdbcSink.writerOptions(JdbcOptions(url = "jdbc:postgresql://x/db", table = ""))
    }
  }

  test("createTableDdl reproduces the reference DDL shape (btc_etl.py:73-82)") {
    val ddl = JdbcSink.createTableDdl("bitcoin_stock_data")
    assert(ddl.contains("CREATE TABLE IF NOT EXISTS bitcoin_stock_data"))
    assert(ddl.contains("date_time TIMESTAMPTZ PRIMARY KEY"))
    Schemas.sinkCols.filterNot(_ == "date_time").foreach { c =>
      assert(ddl.contains(s"$c DOUBLE PRECISION"), s"missing metric column $c")
    }
    assert(JdbcSink.createHypertableDdl("bitcoin_stock_data")
      .contains("migrate_data => TRUE"))
    intercept[IllegalArgumentException] {
      JdbcSink.createTableDdl("bad name; DROP TABLE x")
    }
  }

  test("EtlConfig: sys.props override env, dynamic re-read, reference defaults") {
    assert(EtlConfig.tableName === "bitcoin_stock_data")
    assert(EtlConfig.maxThreads === 4)
    assert(!EtlConfig.multithreadingEnabled)
    try {
      sys.props("TABLE_NAME") = "override_tbl"
      sys.props("ENABLE_MULTITHREADING") = "True"
      assert(EtlConfig.tableName === "override_tbl")
      assert(EtlConfig.multithreadingEnabled, "flag is re-read per call")
      assert(EtlConfig.jdbcOptions.table === "override_tbl")
    } finally {
      sys.props -= "TABLE_NAME"
      sys.props -= "ENABLE_MULTITHREADING"
    }
  }

  test("appendBatch dispatches on the sink target (parquet writes; jdbc reaches the writer)") {
    val rows = graft.etl.BtcPipeline.transform(spark, "/root/reference/dataset-test")
      .filter(to_date(col("date_time")) === lit("2012-01-01"))
    val tmp = java.nio.file.Files.createTempDirectory("graft-sinktgt-").toString
    graft.etl.BtcPipeline.appendBatch(rows, graft.etl.ParquetSink(s"$tmp/sink"))
    assert(spark.read.parquet(s"$tmp/sink").count() === rows.count())
    assert(new java.io.File(s"$tmp/sink").listFiles().exists(_.getName.startsWith("date=")))
    // no database/driver in the sandbox: the dispatch must still reach the
    // jdbc writer and fail there (driver resolution), not earlier
    val e = intercept[Exception] {
      graft.etl.BtcPipeline.appendBatch(rows.limit(1),
        graft.etl.JdbcTarget(EtlConfig.jdbcOptions))
    }
    val msg = (e.getMessage + e.getClass.getName).toLowerCase
    assert(msg.contains("driver") || msg.contains("jdbc") || msg.contains("connection"),
      s"expected a jdbc-layer failure, got: $e")
  }

  test("ParquetMigrate: unpartitioned sink rows land date-partitioned, none lost") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-migrate-").toString
    val flat = graft.etl.BtcPipeline.transform(spark, "/root/reference/dataset-test")
      .filter(to_date(col("date_time")) <= lit("2012-01-03"))
    flat.write.mode("overwrite").parquet(s"$tmp/flat")
    ParquetMigrate.toDatePartitioned(spark, s"$tmp/flat", s"$tmp/part")
    val back = spark.read.parquet(s"$tmp/part")
    assert(back.count() === flat.count())
    assert(new java.io.File(s"$tmp/part").listFiles().exists(_.getName.startsWith("date=")))
    // partition pruning works on the migrated layout
    val pruned = back.filter(col("date") === lit("2012-01-01"))
    assert(pruned.count() === flat.filter(to_date(col("date_time")) === lit("2012-01-01")).count())
  }
}
