package graft.sources

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

import graft.SparkSpec

/** The statement-based multi-row INSERT writer (the reference's
  * to_sql(method='multi') wire shape) END-TO-END against live embedded
  * Derby: literal rendering roundtrips, batch sizing, and the
  * replay-idempotence guard. The networked hive2 leg (executor JVMs over
  * TCP) is `graft.JdbcClusterSmoke`'s job — this suite pins the writer's
  * semantics in one JVM. */
class JdbcStatementWriterSpec extends SparkSpec {

  private def freshUrl(tag: String): String =
    s"jdbc:derby:${graft.queries.Staging.tmpDir(s"stw-$tag")}/db;create=true"

  private def exec(url: String, sql: String): Unit = {
    val c = java.sql.DriverManager.getConnection(url)
    try { val st = c.createStatement(); try st.execute(sql) finally st.close() }
    finally c.close()
  }

  test("literal rendering: quote escaping per dialect family") {
    assert(JdbcStatementWriter.escape("O'Brien", JdbcStatementWriter.AnsiQuoting) === "O''Brien")
    assert(JdbcStatementWriter.escape("O'Brien", JdbcStatementWriter.BackslashQuoting) === "O\\'Brien")
    assert(JdbcStatementWriter.escape("a\\b", JdbcStatementWriter.AnsiQuoting) === "a\\b")
    assert(JdbcStatementWriter.escape("a\\b", JdbcStatementWriter.BackslashQuoting) === "a\\\\b")
    assert(JdbcStatementWriter.quotingFor("jdbc:hive2://h:10000/default") ===
      JdbcStatementWriter.BackslashQuoting)
    assert(JdbcStatementWriter.quotingFor("jdbc:derby:/tmp/x") ===
      JdbcStatementWriter.AnsiQuoting)
    // backslash-escaping families route to the backslash dialect (a value
    // ending in '\' under ANSI doubling would eat MySQL's closing quote)
    assert(JdbcStatementWriter.quotingFor("jdbc:mysql://h:3306/db") ===
      JdbcStatementWriter.BackslashQuoting)
    assert(JdbcStatementWriter.quotingFor("jdbc:mariadb://h:3306/db") ===
      JdbcStatementWriter.BackslashQuoting)
    assert(JdbcStatementWriter.quotingFor("jdbc:postgresql://h:5432/db") ===
      JdbcStatementWriter.AnsiQuoting)
    // unmapped families fail fast instead of guessing an escaping rule
    intercept[IllegalArgumentException] {
      JdbcStatementWriter.quotingFor("jdbc:oracle:thin:@//h:1521/svc")
    }
  }

  test("literal rendering: NULL, numerics, bool, timestamp; NaN rejected") {
    val q = JdbcStatementWriter.AnsiQuoting
    assert(JdbcStatementWriter.literal(null, q) === "NULL")
    assert(JdbcStatementWriter.literal(3L, q) === "3")
    assert(JdbcStatementWriter.literal(2.5d, q) === "2.5")
    assert(JdbcStatementWriter.literal(true, q) === "TRUE")
    assert(JdbcStatementWriter.literal(java.sql.Timestamp.valueOf("2012-01-21 07:52:00"), q)
      === "{ts '2012-01-21 07:52:00.0'}")
    assert(JdbcStatementWriter.literal(java.sql.Timestamp.valueOf("2012-01-21 07:52:00"),
      JdbcStatementWriter.BackslashQuoting) === "TIMESTAMP '2012-01-21 07:52:00.0'")
    assert(JdbcStatementWriter.literal(new java.math.BigDecimal("12.3400"), q) === "12.3400")
    intercept[IllegalArgumentException] { JdbcStatementWriter.literal(Double.NaN, q) }
    intercept[IllegalArgumentException] { JdbcStatementWriter.literal(Seq(1), q) }
  }

  test("tricky strings, nulls and timestamps roundtrip through live Derby") {
    val url = freshUrl("round")
    exec(url, "CREATE TABLE T1 (ID BIGINT, NAME VARCHAR(64), TS TIMESTAMP, V DOUBLE)")
    val schema = StructType(Seq(
      StructField("ID", LongType), StructField("NAME", StringType),
      StructField("TS", TimestampType), StructField("V", DoubleType)))
    val rows = Seq(
      Row(1L, "O'Brien", java.sql.Timestamp.valueOf("2012-01-21 07:52:00"), 6.3),
      Row(2L, "back\\slash, comma", java.sql.Timestamp.valueOf("2013-12-31 23:59:00"), -0.5),
      Row(3L, null, null, null))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), schema)
    val audit = JdbcStatementWriter.append(df, url, "T1", batchSize = 2)
    assert(audit.map(_.rows).sum === 3)
    val back = spark.read.format("jdbc").option("url", url).option("dbtable", "T1")
      .load().collect().map(r => (r.get(0), r.get(1), r.get(2), r.get(3))).toSet
    val want = rows.map(r => (r.get(0), r.get(1), r.get(2), r.get(3))).toSet
    assert(back === want)
  }

  test("batch sizing: 10 rows / batchSize 3 in one partition = 4 statements") {
    val url = freshUrl("batch")
    exec(url, "CREATE TABLE T2 (ID BIGINT)")
    val df = spark.range(10).toDF("ID").coalesce(1)
    val audit = JdbcStatementWriter.append(df, url, "T2", batchSize = 3)
    assert(audit.size === 1)
    assert(audit.head.rows === 10)
    assert(audit.head.statements === 4)
  }

  test("concurrent partition writers against a row-locking DB lose nothing") {
    // the reference's pool shape: N tasks, N simultaneous connections,
    // one table — a real database interleaves them safely (contrast:
    // an FS-backed thrift table is single-writer, see JdbcClusterSmoke)
    val url = freshUrl("conc")
    exec(url, "CREATE TABLE T4 (ID BIGINT)")
    val df = spark.range(0, 5000).toDF("ID").repartition(8)
    val audit = JdbcStatementWriter.append(df, url, "T4", batchSize = 257)
    assert(audit.size === 8)
    assert(audit.map(_.rows).sum === 5000)
    val back = spark.read.format("jdbc").option("url", url).option("dbtable", "T4").load()
    assert(back.count() === 5000)
    assert(back.distinct().count() === 5000)
  }

  test("appendIdempotent: a full replay inserts zero rows") {
    val url = freshUrl("idem")
    exec(url, "CREATE TABLE T3 (ID BIGINT, NAME VARCHAR(32))")
    val df = spark.range(20).selectExpr("id as ID", "concat('n', id) as NAME")
    val first = JdbcStatementWriter.appendIdempotent(df, url, "T3", "ID", batchSize = 7)
    assert(first.map(_.rows).sum === 20)
    val replay = JdbcStatementWriter.appendIdempotent(df, url, "T3", "ID", batchSize = 7)
    assert(replay.map(_.rows).sum === 0)
    // and a half-new batch writes exactly the missing half
    val half = spark.range(10, 30).selectExpr("id as ID", "concat('n', id) as NAME")
    val delta = JdbcStatementWriter.appendIdempotent(half, url, "T3", "ID")
    assert(delta.map(_.rows).sum === 10)
    val n = spark.read.format("jdbc").option("url", url).option("dbtable", "T3")
      .load().count()
    assert(n === 30)
  }
}
