package graft

import org.apache.spark.sql.functions._
import graft.operators.Similarity
import graft.queries.Staging

/** The rebuild trigger of [[graft.operators.Similarity.ivfCellCensus]]
  * must FIRE on a genuinely skewed store: the sf0.01 catalog key
  * (`simsearch_ivf_census`) shows the census arithmetic oracle-exact at
  * ~1.4× mean load (below threshold); this spec appends a flood heavy
  * enough to push one cell past 2× the mean and asserts the flag. */
class IvfCensusSpec extends SparkSpec {

  test("near-duplicate flood pushes its cell past 2x mean and fires needs_rebuild") {
    val emb = Staging.tbl(spark, sf, "embeddings") // 500 vectors at sf0.001
    val idx = Staging.tmpDir("ivfcen-spec")
    Similarity.ivfBuildIndex(emb, numCentroids = 8, iterations = 1, indexDir = idx)
    // 2000 copies of vector 0: all assign to vec 0's frozen cell
    val flood = emb.filter(col("vec_id") === 0)
      .crossJoin(spark.range(2000).toDF("i"))
      .select((lit(100000L) + col("i")).as("vec_id"), col("embedding"))
    Similarity.ivfAppendIndex(flood, idx)

    val census = Similarity.ivfCellCensus(spark, idx).collect()
    val flagged = census.filter(_.getAs[Long]("needs_rebuild") == 1L)
    assert(flagged.length == 1, s"expected exactly the flooded cell flagged, got ${flagged.length}")
    // the flooded cell holds >2000 of ~2500 vectors: load far above 2e6 ppm
    assert(flagged.head.getAs[Long]("load_ppm") > 2000000L)
    assert(flagged.head.getAs[Long]("n_vectors") >= 2000L)
    // every other cell sits below the mean now — none flagged
    assert(census.count(_.getAs[Long]("needs_rebuild") == 0L) == census.length - 1)
  }

  test("balanced store census stays unflagged and sums to the corpus") {
    val emb = Staging.tbl(spark, sf, "embeddings")
    val idx = Staging.tmpDir("ivfcen-bal")
    Similarity.ivfBuildIndex(emb, numCentroids = 4, iterations = 1, indexDir = idx)
    val census = Similarity.ivfCellCensus(spark, idx).collect()
    assert(census.map(_.getAs[Long]("n_vectors")).sum == emb.count())
    assert(census.forall(_.getAs[Long]("needs_rebuild") == 0L))
    // ppm loads of observed cells average to ~1e6 by construction
    val meanPpm = census.map(_.getAs[Long]("load_ppm")).sum / census.length
    assert(math.abs(meanPpm - 1000000L) < 5000,
      s"mean load_ppm $meanPpm should be ~1e6")
  }

  test("sample-bounded training matches full training when the sample is the corpus") {
    val emb = Staging.tbl(spark, sf, "embeddings")
    val full = Similarity.ivfTrainedTopKSampled(emb, k = 5, numCentroids = 8,
      nprobe = 2, iterations = 1, sampleMod = 1L, probePred = col("vec_id") < 5)
      .collect().map(_.toString).sorted
    // sampleMod=1 through the sampled path must equal the seeds-renumbered
    // full path (dense ids: first-K-by-order == vec_id < K)
    val trained = Similarity.ivfTrainedTopK(emb, k = 5, numCentroids = 8,
      nprobe = 2, iterations = 1, probePred = col("vec_id") < 5)
      .collect().map(_.toString).sorted
    assert(full.sameElements(trained))
  }
}
