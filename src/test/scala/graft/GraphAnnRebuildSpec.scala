package graft

import org.apache.spark.sql.functions._
import graft.operators.{Graph, Similarity}
import graft.queries.Staging

/** The census→rebuild maintenance loop on the GRAPH-embedding ANN store
  * — the second persisted vector store (`graph_embedding_ann` serves
  * from it through `ivfLiveRoot`, so the generation machinery was
  * designed-compatible but previously undemonstrated): flood/drift the
  * SGNS store through its own pre-quantised ingest shape
  * ([[graft.operators.Similarity.ivfAppendIndexQ]]), watch the census
  * flag, rebuild, and prove the rebuilt store serves BIT-IDENTICALLY to
  * a fresh build over the same drifted corpus — recall therefore
  * unchanged by construction (same serve, same truth). */
class GraphAnnRebuildSpec extends SparkSpec {

  test("census→rebuild closes the maintenance loop on the SGNS ANN store") {
    // the exact store graph_embedding_ann serves from (sf0.001 fixture)
    val idx = Staging.tmpDir("gann-reb")
    Graph.sgnsAnnIndexBuild(
      Graph.walkSkipgramPairs(
        Graph.coPartEdgesMin(Staging.tbl(spark, sf, "lineitem"), minCount = 2L),
        walksPerNode = 2, steps = 4, window = 2),
      idx, numCentroids = 8, iterations = 1)

    // DRIFT: a positive-orthant cluster of NEW node ids, distinct
    // vectors (balanceable — the IvfRebuildSpec fixture shape), appended
    // through the store's own pre-quantised ingest path. Materialise the
    // pre-drift corpus rows first: the fresh-build comparison needs them
    // and the rebuild's vacuum will reclaim the old generation's files.
    val preDrift = spark.read
      .parquet(s"${Similarity.ivfLiveRoot(spark, idx)}/vectors")
      .select(col("vec_id"), col("qv"), col("nrm"))
    // n/2, not the embeddings fixture's n/5: the SGNS store is small
    // (~240 vectors / 8 cells) and an n/5 flood lands at EXACTLY 2.0x
    // the mean cell — the flag needs strictly more
    val flood = preDrift.filter(col("vec_id") % 2 === 0)
      .select((col("vec_id") + lit(1000000L)).as("vec_id"),
        transform(col("qv"), x => abs(x) + lit(1000L)).as("qv"))
      .withColumn("nrm",
        aggregate(transform(col("qv"), x => x * x), lit(0L), (a, x) => a + x))
    // checkpoint severs the file lineage: the append below refreshes the
    // cache by path and the rebuild's vacuum then deletes the old
    // generation's files, so a lazily file-backed `drifted` would
    // recompute into FILE_NOT_EXIST (the exact reader-vs-vacuum hazard
    // IvfRebuildSpec's retention tests pin)
    val drifted = { import graft.Ckpt.Ops; preDrift.union(flood).graftCheckpoint() }
    assert(drifted.count() > preDrift.count())
    Similarity.ivfAppendIndexQ(flood, idx)

    // the census flags the skew; the rebuild is its executable remedy
    val pre = Similarity.ivfCellCensus(spark, idx).collect()
    assert(pre.exists(_.getAs[Long]("needs_rebuild") == 1L),
      s"drift fixture must trip the rebuild flag: ${pre.mkString(", ")}")
    val ran = Similarity.ivfRebuildIfNeeded(spark, idx, numCentroids = 8,
      iterations = 1, sampleMod = 2L)
    assert(ran, "flagged store must trigger a rebuild")
    val post = Similarity.ivfCellCensus(spark, idx).collect()
    assert(post.map(_.getAs[Long]("n_vectors")).sum ==
      pre.map(_.getAs[Long]("n_vectors")).sum, "rebuild must not lose vectors")
    assert(post.map(_.getAs[Long]("load_ppm")).max <
      pre.map(_.getAs[Long]("load_ppm")).max, "rebuild must reduce the hot-cell load")

    // serve ≡ fresh build over the same drifted corpus (same Lloyd
    // params/sample), probed through the graph store's own serving path
    val fresh = Staging.tmpDir("gann-fresh")
    Similarity.ivfBuildIndexQ(drifted, numCentroids = 8, iterations = 1,
      indexDir = fresh, sampleMod = 2L)
    def serveFrom(dir: String): Seq[String] =
      Graph.sgnsAnnServe(spark, dir, k = 5, nprobe = 2, sampleMod = 100L)
        .collect().map(_.toString).sorted.toSeq
    val rebuilt = serveFrom(idx)
    assert(rebuilt.nonEmpty && rebuilt == serveFrom(fresh),
      "rebuilt graph ANN store must serve exactly what a fresh build serves")
    // recall census identical too (same serve + same brute truth corpus)
    def recallFrom(dir: String): Seq[String] =
      Graph.sgnsAnnRecall(spark, dir, k = 5, nprobe = 2, sampleMod = 100L)
        .collect().map(_.toString).sorted.toSeq
    assert(recallFrom(idx) == recallFrom(fresh),
      "recall census must be unchanged vs a fresh build")
  }

  test("store file count stays cell-bounded: REBALANCE with AQE, cid repartition without") {
    // r16 advisor finding: the pre-write REBALANCE that prevents the
    // partitions×K tiny-file write is an AQE feature — with AQE off it
    // is a silent no-op, so the build falls back to an explicit cid
    // repartition there. Pin BOTH session shapes to a cell-bounded file
    // count (the r16 regression wrote 256 files for an 8-cell store;
    // cell-bounded = at most ~2 files per cell at this scale).
    def storeFiles(idx: String): Long = {
      def walk(f: java.io.File): Long =
        if (f.isDirectory) Option(f.listFiles()).map(_.map(walk).sum).getOrElse(0L)
        else if (f.getName.startsWith("part-")) 1L else 0L
      walk(new java.io.File(
        s"${Similarity.ivfLiveRoot(spark, idx)}/vectors"))
    }
    val pairs = Graph.walkSkipgramPairs(
      Graph.coPartEdgesMin(Staging.tbl(spark, sf, "lineitem"), minCount = 2L),
      walksPerNode = 2, steps = 4, window = 2)
    val withAqe = Staging.tmpDir("gann-files-aqe")
    Graph.sgnsAnnIndexBuild(pairs, withAqe, numCentroids = 8, iterations = 1)
    assert(storeFiles(withAqe) <= 16L,
      s"AQE REBALANCE store wrote ${storeFiles(withAqe)} files for 8 cells")
    val aqeKey = "spark.sql.adaptive.enabled"
    spark.conf.set(aqeKey, "false")
    try {
      val noAqe = Staging.tmpDir("gann-files-noaqe")
      Graph.sgnsAnnIndexBuild(pairs, noAqe, numCentroids = 8, iterations = 1)
      assert(storeFiles(noAqe) <= 16L,
        s"AQE-off store wrote ${storeFiles(noAqe)} files for 8 cells")
    } finally spark.conf.set(aqeKey, "true")
  }
}
