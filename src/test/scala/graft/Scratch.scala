package graft
import org.apache.spark.sql.SparkSession

/** Dev-only profiling scratch runner (not part of the driver contract). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000).selectExpr("sum(id)").collect()
    spark.read.parquet(s"$sfDir/lineitem.parquet").count()
    def phase[T](tag: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[phase] $tag%-30s ${(System.nanoTime() - t0) / 1e9}%8.2fs")
      r
    }
    if (args.headOption.contains("vacuum-debug")) {
      import org.apache.spark.sql.functions._
      val out = graft.queries.Staging.tmpDir("vacdbg")
      val base = graft.queries.Staging.tbl(spark, sfDir, "events")
        .withColumn("event_date", date_format(col("ts"), "yyyy-MM-dd"))
        .select("event_id", "event_type", "value", "event_date")
      base.repartition(4, col("event_id"))
        .write.mode("overwrite").partitionBy("event_date").parquet(out)
      val root = new org.apache.hadoop.fs.Path(out)
      val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
      def counts(tag: String): Unit = {
        val vs = graft.etl.LakeOps.listVersions(spark, out)
        val files = fs.listStatus(root)
          .filter(s => s.isDirectory && s.getPath.getName.startsWith("event_date="))
          .flatMap(d => fs.listStatus(d.getPath))
          .count(_.getPath.getName.endsWith(".parquet"))
        println(s"[vac] $tag versions=$vs dataFiles=$files")
        vs.lastOption.foreach { v =>
          val refs = spark.read.textFile(
            new org.apache.hadoop.fs.Path(root, s"_graft_manifest_v$v").toString).collect()
          println(s"[vac] $tag manifest v$v entries=${refs.length} sample=${refs.take(3).mkString("; ")}")
        }
      }
      counts("after-base-write")
      val firstDate = base.agg(min("event_date")).head().getString(0)
      graft.etl.LakeOps.mergeInto(spark, out,
        base.filter(col("event_date") === firstDate),
        keyCol = "event_id", partCol = "event_date", retainHistory = true)
      counts("after-merge")
      graft.etl.LakeOps.vacuum(spark, out)
      counts("after-vacuum")
      spark.stop(); return
    }
    if (args.headOption.contains("colloc")) {
      import org.apache.spark.sql.functions._
      import graft.functions.CrossFns.{tokens, shingles}
      val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      phase("tokens-explode-count") {
        docs.select(explode(tokens(col("text"))).as("term")).count()
      }
      phase("uni-agg") {
        docs.select(explode(tokens(col("text"))).as("term"))
          .groupBy("term").agg(count(lit(1))).count()
      }
      phase("bigrams-count") {
        docs.select(explode(shingles(tokens(col("text")), 2)).as("bg")).count()
      }
      phase("bigram-agg-filter") {
        docs.select(explode(shingles(tokens(col("text")), 2)).as("bg"))
          .groupBy("bg").agg(count(lit(1)).as("cxy")).filter(col("cxy") >= 5).count()
      }
      phase("full-query") {
        graft.queries.AnalyticsQueries.textCollocations(spark, sfDir).count()
      }
      phase("full-query-2") {
        graft.queries.AnalyticsQueries.textCollocations(spark, sfDir).count()
      }
      spark.stop(); return
    }
    if (args.headOption.contains("pairgen")) {
      import org.apache.spark.sql.functions._
      val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
      def selfJoin() = {
        val os = li.select(col("l_orderkey").as("ok"), col("l_partkey").as("s")).distinct()
        os.as("a").join(os.as("b"), col("a.ok") === col("b.ok") && col("a.s") < col("b.s"))
          .groupBy(col("a.s").as("src"), col("b.s").as("dst"))
          .agg(count(lit(1)).as("w")).filter(col("w") >= 2).select("src", "dst")
      }
      def combExplode() = {
        val items = li.select(col("l_orderkey").as("ok"), col("l_partkey").as("s")).distinct()
          .groupBy("ok").agg(sort_array(collect_set(col("s"))).as("it"))
        items.select(explode(flatten(expr(
            "transform(it, (x, i) -> transform(slice(it, i + 2, size(it) - i - 1), y -> struct(x AS src, y AS dst)))")))
            .as("p"))
          .groupBy(col("p.src").as("src"), col("p.dst").as("dst"))
          .agg(count(lit(1)).as("w")).filter(col("w") >= 2).select("src", "dst")
      }
      for (i <- 1 to 3) {
        phase(s"self-join-$i") { selfJoin().count() }
        phase(s"comb-explode-$i") { combExplode().count() }
      }
      // cross-check identical results
      val a = selfJoin(); val b = combExplode()
      println(s"[pairgen] diff=${a.exceptAll(b).count() + b.exceptAll(a).count()}")
      spark.stop(); return
    }
    if (args.headOption.contains("lpa-compare")) {
      val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
      val edges = graft.operators.Graph.coPartEdgesMin(li, 2L)
      phase("edges-count-once") { edges.count() }
      phase("lpa-unpersisted") {
        graft.operators.Graph.labelPropagation(edges, 3)
          .groupBy("community").count().count()
      }
      val p = edges.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      phase("materialize-persist") { p.count() }
      phase("lpa-persisted") {
        graft.operators.Graph.labelPropagation(p, 3)
          .groupBy("community").count().count()
      }
      spark.stop(); return
    }
    if (args.headOption.contains("lpa-phases")) {
      import org.apache.spark.sql.functions._
      val lvl = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
      val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
      val edges = graft.operators.Graph.coPartEdgesMin(li, 2L)
      val e = edges.select(col("src"), col("dst"))
        .union(edges.select(col("dst").as("src"), col("src").as("dst")))
        .persist(lvl)
      var labels = phase("init-labels") {
        e.select(col("src").as("node")).distinct()
          .select(col("node"), col("node").as("label"))
          .localCheckpoint()
      }
      for (i <- 1 to 3) {
        labels = phase(s"iter-$i") {
          val counted = e.join(labels.withColumnRenamed("node", "src"), "src")
            .groupBy(col("dst").as("node"), col("label"))
            .agg(count(lit(1)).as("c"))
          val plural = counted
            .withColumn("rk", row_number().over(
              org.apache.spark.sql.expressions.Window.partitionBy("node")
                .orderBy(col("c").desc, col("label"))))
            .filter(col("rk") === 1)
            .select(col("node"), col("label").as("nl"))
          labels.join(plural, Seq("node"), "left")
            .select(col("node"), coalesce(col("nl"), col("label")).as("label"))
            .localCheckpoint()
        }
      }
      phase("final-agg") {
        labels.groupBy("label").agg(count(lit(1))).count()
      }
      spark.stop(); return
    }
    args.foreach { name =>
      val t0 = System.nanoTime()
      val n = SparkEntry.queries(name)(spark, sfDir).count()
      val secs = (System.nanoTime() - t0) / 1e9
      println(f"[scratch] $name%-30s $secs%8.2fs  rows=$n")
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
