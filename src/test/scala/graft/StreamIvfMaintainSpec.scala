package graft

import org.apache.spark.sql.functions._
import graft.operators.Similarity
import graft.queries.Staging
import graft.streaming.StreamQueries

/** The streaming append→census→rebuild tail
  * ([[graft.streaming.StreamQueries.streamIvfMaintain]]): the drifted
  * cluster arrives ACROSS micro-batches, so the retrain + atomic
  * generation swap fires mid-stream while ingest continues — and the
  * final index must hold exactly-once content, serve from a committed
  * generation, and carry no outstanding rebuild flag (the last batch's
  * maintenance pass is the loop invariant). */
class StreamIvfMaintainSpec extends SparkSpec {

  test("mid-stream rebuild: exactly-once content, generation advanced, census clean") {
    val idx = Staging.tmpDir("sivfm-spec")
    val out = StreamQueries.streamIvfMaintainAt(spark, sf, idx).collect()

    // exactly-once CONTENT: every ingested vec_id exactly once
    assert(out.nonEmpty)
    assert(out.forall(_.getAs[Long]("n") == 1L),
      "no vec_id may appear twice across generations/batches")
    val emb = Staging.tbl(spark, sf, "embeddings")
    val corpusN = Similarity.quantized(emb).count()
    val floodN = Similarity.quantized(
      emb.filter(col("vec_id") % 5 === 0)
        .select((lit(1000000L) + col("vec_id")).as("vec_id"),
          transform(col("embedding"), x => abs(x.cast("double")) + lit(1.0d))
            .as("embedding"))).count()
    assert(out.length == corpusN + floodN,
      s"final corpus ${out.length} != base+increments $corpusN + flood $floodN")

    // the skewed flood MUST have fired at least one mid-stream rebuild:
    // the live root is a committed generation, not the flat build
    val live = Similarity.ivfLiveRoot(spark, idx)
    assert(live.startsWith(s"$idx/gen-"),
      s"a mid-stream rebuild must have committed a generation (live=$live)")

    // loop invariant: the last batch's maintenance pass leaves no flag
    val census = Similarity.ivfCellCensus(spark, idx).collect()
    assert(census.forall(_.getAs[Long]("needs_rebuild") == 0L),
      s"post-stream census still flagged: ${census.mkString(", ")}")

    // and the store serves through the standard probe path
    assert(Similarity.ivfProbeIndexSelf(spark, idx, k = 3, nprobe = 2,
      probePred = col("vec_id") < 5).count() > 0)
  }
}
