package graft.sources

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types._

/** Statement-based multi-row JDBC INSERT writer — the reference sink's
  * actual wire shape: pandas `to_sql(..., method='multi')`
  * (/root/reference/btc_etl.py:179-180) renders one
  * `INSERT INTO t VALUES (…),(…),…` text statement per chunk and sends
  * it from each worker thread over its own pooled connection.
  *
  * Spark's built-in jdbc writer speaks PREPARED statements
  * (`INSERT INTO t VALUES (?,?)` + addBatch), which endpoints like
  * HiveServer2 / the Spark Thrift server (`jdbc:hive2://`) do not serve
  * — so the built-in writer cannot write there at all. This writer
  * renders full SQL text with dialect-correct literals instead, which
  * any endpoint that can parse SQL accepts. Each partition task opens
  * its own TCP connection (the pool analog: Spark's task concurrency IS
  * the pool, capped by `df` partition count — repartition to the
  * reference's pool_size=10 for parity) and streams its rows in
  * `batchSize`-row statements.
  *
  * Semantics are the reference's: at-least-once per statement — a task
  * retry can replay a chunk. [[appendIdempotent]] layers the repo's
  * anti-join-before-append guard on top (one pruned key-column read of
  * the sink, then only missing rows are written), making a full replay
  * a measured no-op — `graft.JdbcClusterSmoke`'s write leg proves both
  * halves over real executor JVMs and a real TCP endpoint.
  *
  * Scale posture: rows never collect to the driver — each task streams
  * its partition through bounded `batchSize` chunks (memory is O(batch),
  * not O(partition)); the returned [[TaskWrite]] audit is one tiny row
  * per task. At 1000 executors this is 1000 concurrent multi-row INSERT
  * streams, the exact shape a warehouse bulk-load expects.
  */
object JdbcStatementWriter {

  /** Per-task write audit: which JVM ran it (executor id — the cluster
    * smoke asserts these are real executors, not the driver), how many
    * rows landed, in how many multi-row statements. */
  final case class TaskWrite(executorId: String, rows: Long, statements: Long)

  /** String-literal escaping differs by endpoint family. */
  sealed trait Quoting extends Serializable
  /** ANSI: double the single quote (Derby, Postgres, most warehouses). */
  case object AnsiQuoting extends Quoting
  /** HiveQL/Spark SQL: backslash escapes; backslash itself doubles. */
  case object BackslashQuoting extends Quoting

  /** Map a JDBC URL family to its literal dialect — and FAIL FAST on
    * families outside the mapped set rather than guess. Escaping is a
    * correctness/injection boundary: a backslash-escaping endpoint fed
    * ANSI-escaped literals lets a trailing `\` in a value consume the
    * closing quote and corrupt (or break out of) the statement.
    *
    *  - hive2/mysql/mariadb parse backslash escapes by default →
    *    [[BackslashQuoting]].
    *  - derby/postgresql/h2/sqlite follow ANSI '' doubling →
    *    [[AnsiQuoting]]. Postgres note: assumes the server-default
    *    `standard_conforming_strings=on` (default since 9.1); a legacy
    *    `off` server would need the backslash dialect.
    *  - anything else throws — add the family here once its escaping
    *    rules are verified, don't silently mis-escape. */
  def quotingFor(url: String): Quoting = {
    val u = url.toLowerCase(java.util.Locale.ROOT)
    def fam(names: String*) = names.exists(n => u.startsWith(s"jdbc:$n:"))
    if (fam("hive2", "mysql", "mariadb")) BackslashQuoting
    else if (fam("derby", "postgresql", "h2", "sqlite")) AnsiQuoting
    else throw new IllegalArgumentException(
      s"unmapped JDBC URL family for statement-literal escaping: $url — " +
        "supported: hive2/mysql/mariadb (backslash), derby/postgresql/h2/sqlite (ANSI)")
  }

  private[sources] def escape(s: String, q: Quoting): String = q match {
    case AnsiQuoting      => s.replace("'", "''")
    case BackslashQuoting => s.replace("\\", "\\\\").replace("'", "\\'")
  }

  private def quoteIdent(name: String, q: Quoting): String = q match {
    // HiveQL identifiers quote with backticks (see HiveJdbcDialect);
    // ANSI targets get standard double-quoted identifiers (same policy
    // as Spark's built-in JdbcDialect) — reserved column names like
    // `value` stay valid, and the frame's column case must match the
    // stored case (Derby folds unquoted DDL to upper).
    case BackslashQuoting => s"`${name.replace("`", "``")}`"
    case AnsiQuoting      => "\"" + name.replace("\"", "\"\"") + "\""
  }

  /** One SQL literal. All numeric renderings are Locale-independent
    * (`Double.toString`/`toPlainString` never locale-format). NaN/Inf
    * have no portable SQL literal and the reference's data has none —
    * rejected loudly rather than written wrong. */
  private[sources] def literal(v: Any, q: Quoting): String = v match {
    case null                      => "NULL"
    case s: String                 => s"'${escape(s, q)}'"
    case t: java.sql.Timestamp =>
      // HiveQL takes the ANSI literal; ANSI-family targets get the JDBC
      // escape {ts '…'}, which every JDBC driver translates (Derby has
      // no ANSI TIMESTAMP literal at all — only the escape/function forms)
      q match {
        case BackslashQuoting => s"TIMESTAMP '${t.toString}'"
        case AnsiQuoting      => s"{ts '${t.toString}'}"
      }
    case d: java.sql.Date =>
      q match {
        case BackslashQuoting => s"DATE '${d.toString}'"
        case AnsiQuoting      => s"{d '${d.toString}'}"
      }
    case d: java.math.BigDecimal   => d.toPlainString
    case d: scala.math.BigDecimal  => d.bigDecimal.toPlainString
    case d: Double =>
      require(!d.isNaN && !d.isInfinity, s"no SQL literal for $d"); d.toString
    case f: Float =>
      require(!f.isNaN && !f.isInfinity, s"no SQL literal for $f"); f.toString
    case b: Boolean                => if (b) "TRUE" else "FALSE"
    case n @ (_: Long | _: Int | _: Short | _: Byte) => n.toString
    case other => throw new IllegalArgumentException(
      s"unsupported sink type ${other.getClass.getName} — " +
        "cast to a SQL-literal type (string/numeric/timestamp/date/bool) before the sink")
  }

  /** Append `df` to `table` at `url` as multi-row INSERT statements.
    * One connection per partition task; `batchSize` rows per statement.
    * Returns the per-task audit (sum of `.rows` = rows written). */
  def append(df: DataFrame, url: String, table: String,
             batchSize: Int = 500,
             props: Map[String, String] = Map.empty): Seq[TaskWrite] = {
    require(batchSize > 0, s"batchSize must be positive: $batchSize")
    require(table.matches("[A-Za-z_][A-Za-z0-9_]*"), s"unsafe table name: $table")
    val q = quotingFor(url)
    val schema = df.schema
    val colList = schema.fieldNames.map(quoteIdent(_, q)).mkString("(", ",", ")")
    val propsSer = props.toSeq
    df.rdd.mapPartitions { rows =>
      if (!rows.hasNext) Iterator.empty
      else {
        val p = new java.util.Properties()
        propsSer.foreach { case (k, v) => p.setProperty(k, v) }
        val conn = java.sql.DriverManager.getConnection(url, p)
        var n = 0L
        var stmts = 0L
        try {
          val st = conn.createStatement()
          try rows.grouped(batchSize).foreach { chunk =>
            val values = chunk.iterator
              .map(r => Range(0, schema.length)
                .map(i => literal(r.get(i), q)).mkString("(", ",", ")"))
              .mkString(",")
            st.execute(s"INSERT INTO $table $colList VALUES $values")
            stmts += 1
            n += chunk.size
          } finally st.close()
        } finally conn.close()
        Iterator(TaskWrite(org.apache.spark.SparkEnv.get.executorId, n, stmts))
      }
    }.collect().toSeq
  }

  /** Replay-safe append: anti-join the incoming batch against the sink's
    * CURRENT keys (one key-column JDBC read — column pruning reaches the
    * endpoint as `SELECT keyCol FROM table`), then statement-append only
    * the missing rows. A full replay of an already-landed batch writes
    * zero rows — the reference's crash-between-to_sql-and-SADD
    * duplication (btc_etl.py:144,180) made a no-op, same idiom as
    * `CoreQueries.sinkJdbcIdempotent` but on the statement writer. The
    * sink-table read goes through Spark's jdbc source, so hive2 targets
    * need [[HiveJdbcDialect.register]] (called here — idempotent). */
  def appendIdempotent(df: DataFrame, url: String, table: String, keyCol: String,
                       batchSize: Int = 500,
                       props: Map[String, String] = Map.empty): Seq[TaskWrite] = {
    HiveJdbcDialect.register()
    val reader = df.sparkSession.read.format("jdbc")
      .option("url", url).option("dbtable", table)
      .options(props)
    val existing = reader.load().select(keyCol)
    val missing = df.join(existing, Seq(keyCol), "left_anti")
    append(missing, url, table, batchSize, props)
  }
}
