package graft

import org.apache.spark.sql.functions._
import graft.functions.CrossFns

/** Differential tests: every native codegen'd expression must agree with
  * its built-in higher-order-function reference form on real corpus data
  * and adversarial strings — the HOF form is what the DuckDB oracles
  * mirror, so native == HOF ⟹ native == oracle. */
class CrossFnsSpec extends SparkSpec {
  import spark.implicits._

  private lazy val corpus = graft.queries.Staging.tbl(spark, sf, "documents")

  test("charHash native == HOF on the document corpus") {
    val diff = corpus
      .select(CrossFns.charHash(col("text")).as("a"), CrossFns.charHashHof(col("text")).as("b"))
      .filter(col("a") =!= col("b")).count()
    assert(diff === 0)
  }

  test("charHash on edge strings incl. unicode and empties") {
    val edge = Seq("", " ", "a", "ab c", "  double  space  ", "tab\tsep",
      "ünïcôdé", "emoji 😀 end", "trailing ").toDF("s")
    val rows = edge
      .select(CrossFns.charHash(col("s")).as("a"), CrossFns.charHashHof(col("s")).as("b"))
      .collect()
    rows.foreach { r => assert(r.getLong(0) === r.getLong(1)) }
  }

  test("charHash known value: 'ab' = (97*31 + 98) mod P") {
    val v = Seq("ab").toDF("s").select(CrossFns.charHash(col("s"))).head().getLong(0)
    assert(v === (97L * 31 + 98) % CrossFns.HashP)
  }

  test("shingleHashes native == HOF (incl. docs with <3 tokens)") {
    val extra = Seq("one two", "a b c", "x", "").toDF("text")
    Seq(corpus.select("text"), extra).foreach { df =>
      val diff = df
        .select(
          CrossFns.shingleHashes(col("text"), 3).as("a"),
          CrossFns.shingleHashesHof(col("text"), 3).as("b"))
        .filter(col("a") =!= col("b")).count()
      assert(diff === 0)
    }
  }

  test("shingle generator rows == posexplode of the HOF shingle hashes") {
    graft.expressions.GraftFunctions.register(spark)
    val gen = corpus
      .select(col("doc_id"), CrossFns.tokens(col("text")).as("w"))
      .select(col("doc_id"), call_function("graft_shingle_gen", col("w"), lit(3)))
    // the generator emits RAW positional windows (shingleHashesHof
    // dedups via array_distinct, so compare against the non-distinct form)
    val hofRaw = corpus
      .select(col("doc_id"), CrossFns.tokens(col("text")).as("w"))
      .select(col("doc_id"),
        posexplode(transform(CrossFns.shingles(col("w"), 3), s => CrossFns.charHashHof(s))))
      .select(col("doc_id"), (col("pos") + 1).cast("int").as("pos"), col("col").as("sh"))
    assert(gen.exceptAll(hofRaw).count() === 0L)
    assert(hofRaw.exceptAll(gen).count() === 0L)
    assert(gen.count() > 0L)
  }

  test("quantize + qdot native == HOF on embeddings") {
    val emb = graft.queries.Staging.tbl(spark, sf, "embeddings")
    val diff = emb
      .select(
        CrossFns.qdot(CrossFns.quantize(col("embedding")), CrossFns.quantize(col("embedding"))).as("a"),
        CrossFns.qdotHof(CrossFns.quantizeHof(col("embedding")), CrossFns.quantizeHof(col("embedding"))).as("b"))
      .filter(col("a") =!= col("b")).count()
    assert(diff === 0)
  }

  test("minhashSig == explode/groupBy formulation") {
    // reference formulation: min over (31s+17)h + 97s+11 mod P per seed
    val hs = corpus.select(col("doc_id"), CrossFns.shingleHashes(col("text"), 3).as("hs"))
      .filter(size(col("hs")) > 0)
    val viaExpr = hs.select(col("doc_id"), CrossFns.minhashSig(col("hs"), 16).as("sig"))
    val viaExplode = hs.select(col("doc_id"), explode(col("hs")).as("h"))
      .crossJoin(spark.range(16).select(col("id").cast("int").as("seed")))
      .select(col("doc_id"), col("seed"),
        (((col("seed") * 31 + 17) * col("h") + col("seed") * 97 + 11) % CrossFns.HashP).as("v"))
      .groupBy("doc_id", "seed").agg(min("v").as("mh"))
      .groupBy("doc_id")
      .agg(transform(array_sort(collect_list(struct(col("seed"), col("mh")))),
        s => s.getField("mh")).as("sig"))
    val joined = viaExpr.alias("a").join(viaExplode.alias("b"), "doc_id")
      .filter(col("a.sig") =!= col("b.sig"))
    assert(joined.count() === 0)
  }

  test("KMV sketch: partition-invariant (merge correctness) and ~accurate") {
    import org.apache.spark.sql.functions.{call_function, lit => flit}
    val n = 5000
    val df = spark.range(n).select(
      CrossFns.scrambledHash(col("id").cast("string")).as("hv"))
    def est(parts: Int): Double = df.repartition(parts)
      .agg(call_function("graft_kmv_distinct", col("hv"), flit(64)))
      .head().getDouble(0)
    val e1 = est(1)
    // merge across many partitions must give the IDENTICAL sketch result
    assert(est(13) === e1)
    assert(est(32) === e1)
    // ~1/sqrt(k) relative error; allow 4 sigma
    assert(math.abs(e1 - n) / n < 0.5, s"estimate $e1 too far from $n")
  }

  test("charHash property: native == HOF on 500 seeded-random ASCII strings") {
    val rnd = new scala.util.Random(42)
    val strs = (0 until 500).map { _ =>
      val len = rnd.nextInt(80)
      (0 until len).map(_ => (32 + rnd.nextInt(95)).toChar).mkString
    }
    val diff = strs.toDF("s")
      .select(CrossFns.charHash(col("s")).as("a"), CrossFns.charHashHof(col("s")).as("b"))
      .filter(col("a") =!= col("b")).count()
    assert(diff === 0)
  }
}
