package graft.etl

/** Environment-driven configuration surface, mirroring the reference's
  * env handling (/root/reference/btc_etl.py:20-31): DB_URI,
  * DATA_DIRECTORY, TABLE_NAME, MAX_THREADS, and the dynamically re-read
  * ENABLE_MULTITHREADING flag.
  *
  * Every accessor re-reads on call (the reference reads most vars once at
  * import but documents `is_multithreading_enabled` as deliberately
  * dynamic — here everything is dynamic, which subsumes that behavior).
  * JVM system properties override env vars: process env is immutable
  * in-JVM, so tests (and operators) can inject config via -D / sys.props.
  *
  * The function-parameter API (BtcPipeline.backfill(spark, src, sink,
  * ledger)) stays the primary surface; this object adapts it to the
  * reference's env contract for drop-in use.
  */
object EtlConfig {

  /** sys.props first (testable), then env, then default. */
  def get(name: String, default: String): String =
    sys.props.get(name).orElse(sys.env.get(name)).getOrElse(default)

  /** btc_etl.py:20. The reference default is a SQLAlchemy URI; the Spark
    * JDBC writer wants the jdbc: scheme form. */
  def dbUri: String =
    get("DB_URI", "jdbc:postgresql://localhost:5432/postgres")

  /** btc_etl.py:22. */
  def dataDirectory: String = get("DATA_DIRECTORY", "./dataset-test")

  /** btc_etl.py:25. */
  def tableName: String = get("TABLE_NAME", "bitcoin_stock_data")

  /** btc_etl.py:26. In Spark the thread count is the master's core count /
    * shuffle parallelism, not a per-file pool — used as the default
    * numPartitions of the JDBC writer. */
  def maxThreads: Int = get("MAX_THREADS", "4").toInt

  /** btc_etl.py:29-31 — dynamically re-read, like the reference. */
  def multithreadingEnabled: Boolean =
    get("ENABLE_MULTITHREADING", "False").toLowerCase == "true"

  /** The reference's full sink config in one call. */
  def jdbcOptions: graft.sources.JdbcSink.JdbcOptions =
    graft.sources.JdbcSink.JdbcOptions(
      url = dbUri,
      table = tableName,
      numPartitions = maxThreads)
}
