package graft

import org.apache.spark.sql.SparkSession

/** SQL-facing facade: registers the engine's functions and the testdata
  * tables as views so the whole surface is drivable through `spark.sql`
  * as well as the DataFrame API (the reference's users get both doors).
  */
object GraftSession {

  val tables: Seq[String] = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")

  /** Idempotent: native function registry + one temp view per table. */
  def open(spark: SparkSession, dir: String): SparkSession = {
    graft.expressions.GraftFunctions.register(spark)
    tables.foreach { t =>
      graft.queries.Staging.tbl(spark, dir, t).createOrReplaceTempView(t)
    }
    spark
  }
}
