package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Materialise a SUPER-sf0.1 full-catalog corpus ("sf1-sim"): every
  * testdata table replicated f× (default 10×) as DISJOINT copies — copy
  * i offsets every entity-id column by i × 10,000,000, the same offset
  * for every table so every within-copy equi-join relationship
  * (orders↔customer, lineitem↔part/supplier, documents↔embeddings,
  * events↔user) is preserved and no cross-copy key ever matches. The
  * tiny fixed dimensions (region, nation — 5/25 rows by TPC-H contract)
  * are copied verbatim; nationkey/regionkey references stay valid.
  *
  * Purpose (round-15 scale evidence): the per-family 1×/4×/16× ladders
  * (docs/SCALING.md) can miss a CROSS-family tail — e.g. a
  * fixture-sized broadcast that stops fitting — so one FULL-catalog
  * pass at ~10× the bench fixture retires that class:
  * `graft.Sf1Sim` then `SPARK_GRAFT_SF_DIR=/tmp/sf1-sim runMain
  * graft.Bench` → committed as docs/bench/sf1-sim.json.
  *
  * Exact-duplicate document text across copies is deliberate: it is the
  * dedup families' adversarial multiplicity case (cluster sizes ×f),
  * and both the engine and any oracle run over the same materialised
  * corpus, so every catalog key stays self-consistent at this scale.
  *
  * Usage: `runMain graft.Sf1Sim [srcSfDir] [outDir] [f]`. */
object Sf1Sim {

  /** id columns that carry the per-copy offset, per table (nationkey /
    * regionkey / linenumber / label are NOT ids — they reference fixed
    * dims or are small categorical ints). */
  val idCols: Map[String, Seq[String]] = Map(
    "events"     -> Seq("event_id", "user_id"),
    "documents"  -> Seq("doc_id"),
    "embeddings" -> Seq("vec_id"),
    "customer"   -> Seq("c_custkey"),
    "orders"     -> Seq("o_orderkey", "o_custkey"),
    "lineitem"   -> Seq("l_orderkey", "l_partkey", "l_suppkey"),
    "supplier"   -> Seq("s_suppkey"),
    "part"       -> Seq("p_partkey"))

  val CopyOffset = 10000000L

  def replicate(df: DataFrame, cols: Seq[String], f: Int): DataFrame = {
    val spark = df.sparkSession
    // one copy-index cross join, not f unions: a single scan of the
    // source feeds all copies
    val copies = spark.range(0, f).toDF("__copy")
    df.crossJoin(broadcast(copies))
      .select(df.columns.map { c =>
        if (cols.contains(c)) (col(c) + col("__copy") * CopyOffset).as(c)
        else col(c)
      }: _*)
      // A realistic file count is part of the fixture's fidelity: the
      // crossJoin preserves the (often single-file) source partitioning,
      // and a 10×-corpus written as ONE file starves byte-driven scan
      // splitting — measured on the first sf1-sim attempt, where the 50k
      // documents landed in one 1 MB file and every explode-heavy text
      // key ran its 1000×-amplifying scan stage on a single core. Real
      // multi-TB corpora arrive as many files; write ≥32 here.
      .repartition(32)
  }

  def main(args: Array[String]): Unit = {
    val src = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val out = if (args.length > 1) args(1) else "/tmp/sf1-sim"
    val f = if (args.length > 2) args(2).toInt else 10
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .appName("graft-sf1-sim")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // see Bench.scala — raised ObjectHashAggregate fallback (r16)
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold",
        sys.env.getOrElse("SPARK_GRAFT_OBJ_AGG_FALLBACK", "4096"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    for ((t, cols) <- idCols.toSeq.sortBy(_._1)) {
      // read through Staging.tbl: events.ts normalises to µs TimestampType
      // once here, so the sim corpus needs no reader special-casing
      val base = graft.queries.Staging.tbl(spark, src, t)
      replicate(base, cols, f)
        .write.mode("overwrite").parquet(s"$out/$t.parquet")
      System.err.println(s"[sf1-sim] $t x$f written")
    }
    for (t <- Seq("region", "nation")) {
      graft.queries.Staging.tbl(spark, src, t)
        .write.mode("overwrite").parquet(s"$out/$t.parquet")
      System.err.println(s"[sf1-sim] $t copied")
    }
    val n = spark.read.parquet(s"$out/lineitem.parquet").count()
    println(s"""{"metric":"sf1_sim","out":"$out","f":$f,"lineitem_rows":$n}""")
    spark.stop()
  }
}
