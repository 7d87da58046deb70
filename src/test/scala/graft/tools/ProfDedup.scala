package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch profiler (delete before close). */
object ProfDedup {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"PROF $name ${(System.nanoTime() - t0) / 1e9}%.2fs"); r
    }
    val emb = graft.queries.Staging.tbl(spark, dir, "embeddings")
    for (i <- 1 to 2) {
      println(s"--- round $i")
      val q = emb.select(graft.functions.CrossFns.quantize(col("embedding")).as("qv"))
      t("quantize-count")(q.agg(sum(expr("qv[0]"))).collect())
      val prods = q.select(posexplode(expr(
        "flatten(transform(qv, x -> transform(qv, y -> x * y)))")))
      t("explode-count")(prods.count())
      val agg = prods
        .select((col("pos") / 64).cast("long").as("i"),
          pmod(col("pos"), lit(64)).cast("long").as("j"), col("col").as("p"))
        .groupBy("i", "j")
        .agg(sum(col("p").cast("decimal(38,0)")).as("sij"), count(lit(1)).as("n"))
      t("gram-agg")(agg.count())
      t("full-loadings")(graft.operators.Embeddings.pcaPowerLoadings(emb, 8).count())
    }
    spark.stop()
  }
}
