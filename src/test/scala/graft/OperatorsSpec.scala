package graft

import org.apache.spark.sql.functions._
import graft.operators.{Dedup, Similarity, TextOps}

/** Behavioral tests for the training-pipeline extension operators on
  * constructed corpora with known ground truth. */
class OperatorsSpec extends SparkSpec {
  import spark.implicits._

  // near-dup 2 differs from 0 by one appended word -> shingle Jaccard
  // ~0.94, which the 4x4 LSH banding detects deterministically (fixed
  // seeds; verified by the assertions below)
  private val base = "the quick brown fox jumps over the lazy dog near the river bank " * 4
  private lazy val docs = Seq(
    (0L, base.trim),                                  // original
    (1L, base.trim),                                  // exact dup of 0
    (2L, base.trim + " postscript"),                  // near dup of 0
    (3L, "completely different content about spark catalyst optimizer rules and physical plans " * 4),
    (4L, "der hund und die katze und das haus und der baum und die sonne"),
  ).toDF("doc_id", "text")

  test("exactGroups finds the exact duplicate pair") {
    val g = Dedup.exactGroups(docs).collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(g(0L) === 2L, "docs 0 and 1 share a digest group")
    assert(g(2L) === 1L && g(3L) === 1L)
  }

  test("minhash LSH candidates: near-dups found, unrelated not paired") {
    val cand = Dedup.minhashCandidates(spark, docs)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(cand.contains((0L, 1L)), "exact dups must share all bands")
    assert(cand.contains((0L, 2L)) && cand.contains((1L, 2L)), "near dup should bucket with original")
    assert(!cand.exists { case (a, b) => b == 3L || a == 3L }, "unrelated doc must not pair")
  }

  test("jaccardVerified: exact dup = 1.0, near dup high, thresholds respected") {
    val j = Dedup.jaccardVerified(spark, docs, 0.5)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    assert(j((0L, 1L)) === 1.0)
    assert(j((0L, 2L)) > 0.5 && j((0L, 2L)) < 1.0)
  }

  test("editDistanceVerified: exact dup sim=1, near dup high, scoped to candidates") {
    val j = Dedup.editDistanceVerified(spark, docs, 0.4)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), (r.getLong(2), r.getDouble(3)))).toMap
    assert(j((0L, 1L)) === ((0L, 1.0)))
    val (dist02, sim02) = j((0L, 2L))
    assert(dist02 === " postscript".length.toLong && sim02 > 0.9)
    assert(!j.keySet.exists { case (a, b) => a == 3L || b == 3L })
  }

  test("lshClusters: band-overlap docs collapse to one representative, others singleton") {
    val c = Dedup.lshClusters(spark, docs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(c(0L) === 3L, "docs 0,1 (all bands) and 2 (>=1 shared band) form one cluster")
    assert(c(3L) === 1L && c(4L) === 1L, "unrelated docs stay singletons")
    assert(c.values.sum === 5L, "every doc lands in exactly one cluster")
  }

  test("ivfTopK: plan expression count independent of K; K=256 executes") {
    val emb = graft.queries.Staging.tbl(spark, sf, "embeddings")
    def exprNodes(df: org.apache.spark.sql.DataFrame): Int =
      df.queryExecution.analyzed
        .map(p => p.expressions.map(e => e.collect { case x => x }.size).sum).sum
    val p8 = Similarity.ivfTopK(emb, 5, 8, 2, col("vec_id") < 5)
    val p64 = Similarity.ivfTopK(emb, 5, 64, 2, col("vec_id") < 5)
    assert(exprNodes(p8) === exprNodes(p64),
      "centroids ride the IvfIndex object, not the expression tree")
    val r = Similarity.ivfTopK(emb, 5, 256, 2, col("vec_id") < 5)
    assert(r.count() > 0)
  }

  test("persisted IVF index: load-probe matches in-memory trained results; append reuses cells") {
    val emb = graft.queries.Staging.tbl(spark, sf, "embeddings")
    val idx = graft.queries.Staging.tmpDir("ivfspec")
    Similarity.ivfBuildIndex(emb, numCentroids = 8, iterations = 1, indexDir = idx)
    val persisted = Similarity.ivfProbePersisted(emb, idx, k = 5, nprobe = 2,
      probePred = col("vec_id") < 5).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
    val inMem = Similarity.ivfTrainedTopK(emb, k = 5, numCentroids = 8, nprobe = 2,
      iterations = 1, probePred = col("vec_id") < 5).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
    assert(persisted === inMem, "probing the persisted index must equal the trained in-memory path")
    // append: new vectors land only in EXISTING cells, increment-sized write
    val idx2 = graft.queries.Staging.tmpDir("ivfspec2")
    Similarity.ivfBuildIndex(emb.filter(col("vec_id") < 100),
      numCentroids = 8, iterations = 1, indexDir = idx2)
    val before = spark.read.parquet(s"$idx2/vectors")
    val cellsBefore = before.select(col("cid").cast("long")).distinct()
      .collect().map(_.getLong(0)).toSet
    val nBefore = before.count()
    val increment = emb.filter(col("vec_id") >= 100 && col("vec_id") < 150)
    Similarity.ivfAppendIndex(increment, idx2)
    val after = spark.read.parquet(s"$idx2/vectors")
    assert(after.count() === nBefore + Similarity.quantized(increment).count(),
      "append adds exactly the (non-zero-norm) increment")
    val cellsAfter = after.select(col("cid").cast("long")).distinct()
      .collect().map(_.getLong(0)).toSet
    assert(cellsAfter.subsetOf(cellsBefore), "appended vectors assigned to existing cells only")
  }

  test("ivfBuildIndexQ/ivfProbeIndexSelf edges: oversized K, empty probes, zero-norm drops") {
    import spark.implicits._
    // 6 integer vectors, one all-zero (must be dropped at build)
    val vecs = Seq(
      (1L, Seq(3L, 0L, 0L)), (2L, Seq(0L, 5L, 0L)), (3L, Seq(0L, 0L, 7L)),
      (4L, Seq(2L, 2L, 0L)), (5L, Seq(0L, 0L, 0L)), (6L, Seq(1L, 0L, 8L)))
      .toDF("vec_id", "qv")
      .withColumn("nrm", expr("aggregate(transform(qv, x -> x*x), 0L, (a, x) -> a + x)"))
    val idx = graft.queries.Staging.tmpDir("ivfq-edge")
    // K far beyond the corpus: seeds = every surviving vector, empty cells harmless
    Similarity.ivfBuildIndexQ(vecs, numCentroids = 50, iterations = 2, indexDir = idx)
    val stored = spark.read.parquet(s"$idx/vectors")
    assert(stored.count() === 5L, "zero-norm vector dropped at build")
    assert(spark.read.parquet(s"$idx/centroids").count() === 5L,
      "oversized K clamps to the corpus (one seed per vector)")
    // probe everything: K >= corpus and nprobe >= K means exact search
    val served = Similarity.ivfProbeIndexSelf(spark, idx, k = 2, nprobe = 50,
      probePred = lit(true)).collect()
    assert(served.map(_.getLong(0)).toSet === Set(1L, 2L, 3L, 4L, 6L))
    served.groupBy(_.getLong(0)).foreach { case (_, rows) =>
      assert(rows.length <= 2, "at most k rows per probe")
      assert(rows.map(_.getLong(2)).sorted.toSeq ===
        (1L to rows.length.toLong).toSeq, "dense ranks 1..k per probe")
    }
    // empty probe set: empty frame, not an error
    assert(Similarity.ivfProbeIndexSelf(spark, idx, k = 2, nprobe = 2,
      probePred = col("vec_id") < 0).count() === 0L)
  }

  test("serveSplit registry: every entry shadows a live catalog key and serves rows") {
    // the bench serve-vs-build split references catalog keys by name —
    // a catalog rename must fail HERE, not silently orphan the split
    val catalog = SparkEntry.queries.keySet
    SparkEntry.serveSplit.foreach { case (name, mk) =>
      assert(catalog.contains(name),
        s"serveSplit entry '$name' does not match any catalog key")
      val serve = mk(spark, sf)() // build store (untimed path), then serve
      assert(serve.count() > 0, s"serve-only path for '$name' returned no rows")
    }
    spark.catalog.clearCache()
  }

  test("ccClusters coarsens lshClusters and still covers every doc once") {
    val cc = Dedup.ccClusters(spark, docs, 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(cc.values.sum === 5L, "every doc in exactly one component")
    assert(cc(0L) >= 3L, "docs 0,1,2 stay merged")
    val oneHop = Dedup.lshClusters(spark, docs).collect().length
    assert(cc.size <= oneHop, "pointer jumping can only merge clusters, never split")
  }

  test("lshCosineClusters: duplicate vectors collapse, output covers the corpus once") {
    val emb = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f)),
      (1L, Array(1.0f, 0.0f, 0.0f)),  // exact dup of 0: same bucket, cosine 1
      (2L, Array(0.99f, 0.1f, 0.0f)), // near dup of 0
      (3L, Array(-1.0f, 0.5f, 0.2f)), // far: singleton (or fails the rep check)
    ).toDF("vec_id", "embedding")
    val c = Similarity.lshCosineClusters(emb, 2, 0.9)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(c(0L) >= 2L, "exact dup must join vec 0's cluster")
    assert(c.values.sum === 4L, "every vector lands in exactly one cluster")
  }

  test("minhashSigClusters collapses identical docs into one representative") {
    val c = Dedup.minhashSigClusters(spark, docs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(c(0L) >= 2L, "docs 0 and 1 share the full signature")
    assert(!c.contains(1L), "doc 1 collapsed into doc 0's cluster")
  }

  test("simhash: identical docs identical, near dups close in hamming distance") {
    val s = Dedup.simhash(spark, docs).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(s(0L) === s(1L))
    def hamming(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(hamming(s(0L), s(2L)) < hamming(s(0L), s(3L)),
      s"near dup should be closer: ${hamming(s(0L), s(2L))} vs ${hamming(s(0L), s(3L))}")
  }

  test("bruteForceTopK: self-similar vectors rank first, k respected") {
    val vecs = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f)),
      (1L, Array(0.99f, 0.1f, 0.0f)),   // nearly parallel to 0
      (2L, Array(0.0f, 1.0f, 0.0f)),    // orthogonal to 0
      (3L, Array(-1.0f, 0.0f, 0.0f)),   // opposite to 0
    ).toDF("vec_id", "embedding")
    val top = Similarity.bruteForceTopK(vecs, col("vec_id") === 0, 3)
      .orderBy("rk").collect().map(r => (r.getLong(1), r.getDouble(3)))
    assert(top.map(_._1).toSeq === Seq(1L, 2L, 3L))
    assert(top(0)._2 > 0.99 && math.abs(top(1)._2) < 1e-6 && top(2)._2 < -0.99)
  }

  test("maxSimTopK: exact integer late-interaction scores; permuted subs still match") {
    // probe 0 = [1,0,0,1], nSub=2 → sub-vectors [1,0],[0,1] (×1e6)
    val vecs = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f, 1.0f)),
      (1L, Array(1.0f, 0.0f, 0.0f, 1.0f)),   // identical: 2e12
      (2L, Array(0.0f, 1.0f, 1.0f, 0.0f)),   // sub-PERMUTED: MaxSim still 2e12
      (3L, Array(-1.0f, 0.0f, 0.0f, -1.0f)), // negated: best dot per sub is 0
    ).toDF("vec_id", "embedding")
    val top = Similarity.maxSimTopK(vecs, k = 3, nSub = 2, col("vec_id") === 0)
      .orderBy("rk").collect()
      .map(r => (r.getAs[Long]("vec_id"), r.getAs[Long]("score")))
    assert(top.toSeq === Seq(
      (1L, 2000000000000L), (2L, 2000000000000L), (3L, 0L)),
      "late interaction must score sub-permuted vectors as full matches")
  }

  test("cosinePairs finds only the near-parallel pair at 0.9") {
    val vecs = Seq(
      (0L, Array(1.0f, 0.0f)), (1L, Array(0.95f, 0.05f)), (2L, Array(0.0f, 1.0f)),
    ).toDF("vec_id", "embedding")
    val pairs = Similarity.cosinePairs(vecs, 0.9).collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.toSeq === Seq((0L, 1L)))
  }

  test("lshBuckets: identical vectors share buckets; opposite vectors do not") {
    val vecs = Seq(
      (0L, Array(1.0f, 0.2f, -0.3f)), (1L, Array(1.0f, 0.2f, -0.3f)),
      (2L, Array(-1.0f, -0.2f, 0.3f)),
    ).toDF("vec_id", "embedding")
    val b = Similarity.lshBuckets(vecs, 8).collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(b(0L) === b(1L))
    assert(b(0L) !== b(2L), "antipodal vectors flip every hyperplane sign")
  }

  test("langId picks the dominant lexicon, unk when no hits") {
    val d = Seq(
      (0L, "the cat and the dog of a house in a field is big"),
      (1L, "der hund und die katze und das haus"),
      (2L, "zzz qqq xxx www"),
    ).toDF("doc_id", "text")
    val got = TextOps.langId(d).collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got(0L) === "en" && got(1L) === "de" && got(2L) === "unk")
  }

  test("tokenCounts + fingerprint: order-sensitivity of the fingerprint") {
    val d = Seq((0L, "alpha beta gamma"), (1L, "gamma beta alpha"), (2L, "alpha beta gamma")).toDF("doc_id", "text")
    val tc = TextOps.tokenCounts(d).collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(tc.forall { case (_, n, u) => n === 3L && u === 3L })
    val fp = TextOps.fingerprint(d).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fp(0L) === fp(2L), "same token sequence, same fingerprint")
    assert(fp(0L) !== fp(1L), "reordered tokens must change the fingerprint")
  }

  test("simpsonDiversity: hand-computed ppm; run-length fold equals count-based sum") {
    val d = Seq(
      (0L, "a a a a"),           // one token: simpson = 1e6, eff vocab 1.0
      (1L, "a b c"),             // all distinct: 3e6/9 = 333333, eff 3.0
      (2L, "a a b"),             // c = (2,1): (4+1)e6/9 = 555555, eff 1.8
      (3L, "  "),                // no tokens: filtered out
    ).toDF("doc_id", "text")
    val got = TextOps.simpsonDiversity(d).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(got === Map(
      0L -> ((4L, 1L, 1000000L, 1000L)),
      1L -> ((3L, 3L, 333333L, 3000L)),
      2L -> ((3L, 2L, 555555L, 1800L))))
  }

  test("asOf matches the latest right row at-or-before each left row") {
    import graft.operators.AsOfJoin
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val clicks = Seq(
      (1L, ts("2024-01-01 10:00:00"), 100L, 1.0),
      (1L, ts("2024-01-01 10:20:00"), 101L, 2.0),
      (2L, ts("2024-01-01 11:00:00"), 102L, 3.0),
    ).toDF("user_id", "ts", "event_id", "value")
    val purchases = Seq(
      (1L, ts("2024-01-01 10:20:00"), 200L, 9.0), // equal ts: click 101 matches
      (1L, ts("2024-01-01 10:10:00"), 201L, 9.0), // between clicks -> 100
      (2L, ts("2024-01-01 10:30:00"), 202L, 9.0), // before any click -> null
      (3L, ts("2024-01-01 12:00:00"), 203L, 9.0), // user with no clicks -> null
    ).toDF("user_id", "ts", "event_id", "value")
    val got = AsOfJoin.asOf(purchases, clicks, "user_id", "ts", "event_id", Seq("value"))
      .collect().map(r => r.getAs[Long]("event_id") ->
        Option(r.getAs[java.lang.Long]("asof_event_id")).map(_.toLong)).toMap
    assert(got(200L) === Some(101L))
    assert(got(201L) === Some(100L))
    assert(got(202L) === None)
    assert(got(203L) === None)
  }

  test("bloomPrefilter preserves join results exactly and actually filters") {
    val li = graft.queries.Staging.tbl(spark, sf, "lineitem")
    val urgent = graft.queries.Staging.tbl(spark, sf, "orders")
      .filter(col("o_orderpriority") === "1-URGENT")
    val keys = urgent.select("o_orderkey")

    val pre = graft.operators.RuntimeFilter.bloomPrefilter(
      li, "l_orderkey", keys, expectedItems = 1L << 16, fpp = 0.03)

    // no false negatives: the prefiltered join equals the plain join
    val plainRows = li.join(urgent, col("l_orderkey") === col("o_orderkey")).count()
    val preRows = pre.join(urgent, col("l_orderkey") === col("o_orderkey")).count()
    assert(preRows === plainRows)

    // the bloom really cuts the probe side (urgent is ~20% of orders; at
    // 3% fpp the survivor set must be well under the full table)
    val total = li.count()
    val kept = pre.count()
    assert(kept < total, "bloom must reject some rows")
    assert(kept.toDouble / total < 0.5, s"expected <50% survivors, got $kept/$total")

    // the filter expression runs where it should: above the scan, inside
    // codegen, BEFORE any exchange — not after the join
    val plan = pre.queryExecution.executedPlan.toString
    assert(plan.contains("graft_bloom_might_contain"))
    assert(!plan.contains("Exchange"), s"prefilter alone must be exchange-free:\n$plan")
  }

  test("bpeTrain: greedy left-to-right merges, merged symbols recurse") {
    val corpus = Seq((0L, "x y x y x y"), (1L, "a a")).toDF("doc_id", "text")
    val merges = graft.operators.TextOps.bpeTrain(corpus, 2)
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getString(2), r.getLong(3)))).toMap
    // round 1: x-y adjacent 3 times beats y-x (2) and a-a (1)
    assert(merges(1L) === (("x", "y", 3L)))
    // round 2: the merged x\u0001y symbol pairs with ITSELF — greedy
    // left-to-right application turned all three (x,y) into one token
    assert(merges(2L) === (("x\u0001y", "x\u0001y", 2L)))
  }

  test("packSequences: offsets, boundary spans, shard independence") {
    // shard A: 3+4+5 tokens at seqLen=8 -> doc 1 starts seq0 off3,
    // doc 2 starts seq0 off7 and SPANS into seq1
    val docs = Seq(
      (0L, "a b c", "A"),
      (1L, "a b c d", "A"),
      (2L, "a b c d e", "A"),
      (3L, "x y z w v u t s q p", "B"), // 10 tokens: own shard, spans
    ).toDF("doc_id", "text", "source")
    val got = graft.operators.TextOps.packSequences(docs, seqLen = 8)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(3), r.getLong(4), r.getBoolean(5)))).toMap
    assert(got(0L) === ((0L, 0L, false)))
    assert(got(1L) === ((0L, 3L, false)))
    assert(got(2L) === ((0L, 7L, true)))
    assert(got(3L) === ((0L, 0L, true))) // shard B packs from zero
  }

  test("qualityScore components are exact ratios") {
    val d = Seq((0L, "the fox and the dog")).toDF("doc_id", "text") // 5 toks, 3 stopword hits
    val r = TextOps.qualityScore(d).head()
    assert(r.getLong(1) === 5L)
    assert(r.getDouble(2) === (3 + 3 + 3 + 3 + 3) / 5.0)
    assert(r.getDouble(3) === 3 / 5.0)
  }

  test("Kneser-Ney bigram scoring: matches a brute-force reference; unseen bigrams and contexts stay finite") {
    // train (even ids): two docs establishing bigram structure; held-out
    // (odd ids): d1 = in-distribution, d3 = seen words in UNSEEN bigram
    // order, d5 = entirely unseen vocabulary (unseen contexts).
    val d = Seq(
      (0L, "a b c a b"), (2L, "a b d"),
      (1L, "a b c"), (3L, "c b a"), (5L, "zz qq"),
    ).map { case (id, t) => (id, "en", t) }.toDF("doc_id", "lang", "text")
    val got = TextOps.knPerplexityScores(d).collect()
      .map(r => r.getLong(0) -> r.getLong(3)).toMap

    // brute-force reference: same counts, same integer rationals
    val train = Seq("a b c a b", "a b d").flatMap { t =>
      val w = t.split(" ").toSeq; ("<s>" +: w).zip(w)
    }
    val cBi = train.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val cPrev = train.groupBy(_._1).map { case (k, v) => k -> v.size.toLong }
    val nFollow = train.distinct.groupBy(_._1).map { case (k, v) => k -> v.size.toLong }
    val nCont = train.distinct.groupBy(_._2).map { case (k, v) => k -> v.size.toLong }
    val nb = train.distinct.size.toLong
    def inv(prev: String, cur: String): Long = cPrev.get(prev) match {
      case None => ((nb + 1) * 1000000L) / (nCont.getOrElse(cur, 0L) + 1)
      case Some(cp) =>
        val num = math.max(4 * cBi.getOrElse((prev, cur), 0L) - 3, 0L) * nb +
          3 * nFollow(prev) * (nCont.getOrElse(cur, 0L) + 1)
        (4 * cp * nb * 1000000L) / num
    }
    def score(t: String): Long = {
      val w = t.split(" ").toSeq
      val invs = ("<s>" +: w).zip(w).map { case (p, c) => inv(p, c) }
      invs.sum / invs.size
    }
    for ((id, t) <- Seq(1L -> "a b c", 3L -> "c b a", 5L -> "zz qq"))
      assert(got(id) === score(t), s"doc $id: engine ${got(id)} vs brute ${score(t)}")
    // finiteness + ranking: in-distribution < reordered < unseen vocab
    assert(got(1L) < got(3L) && got(3L) < got(5L), s"KN ranking: $got")
  }

  test("learned quality classifier: model generalises the gate vocabulary to held-out docs") {
    // Train split (even ids): docs 0/2 PASS the Gopher gate (clean prose
    // vocabulary); docs 4/6 FAIL it (one token repeated -> top_unigram
    // 1.0). Held-out odd ids reuse the vocabularies: the classifier must
    // rank doc 1 (clean words) above doc 3 (junk words) without ever
    // seeing their labels.
    val clean = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"
    val junk = ("junk " * 12).trim
    val d = Seq(
      (0L, clean), (2L, clean + " nu xi omicron pi rho sigma tau upsilon phi chi psi"),
      (4L, junk), (6L, junk),
      (1L, "beta gamma delta epsilon zeta eta theta iota kappa lambda mu alpha"),
      (3L, junk),
    ).toDF("doc_id", "text")
    val model = TextOps.nbQualityModel(d)
    val m = model.collect().map(r => (r.getLong(0), r.getLong(3))).toMap
    // every clean-vocab bucket has c_pos=2,c_neg=0 -> w = 3e6 div 4
    val scores = TextOps.nbQualityScores(d, model).collect()
      .map(r => r.getLong(0) -> (r.getLong(2), r.getBoolean(3))).toMap
    assert(scores(1L)._1 === 750000L && scores(1L)._2,
      s"clean held-out doc must score the pure-pos rate: $scores")
    // junk bucket: c_pos=0 (docs 4,6 fail), c_neg=24 -> w = 1e6 div 26
    assert(scores(3L)._1 === 1000000L / 26 && !scores(3L)._2,
      s"junk held-out doc must score the pure-neg rate: $scores")
    assert(m.values.exists(_ === 750000L) && m.values.exists(_ === 38461L))
    // eval census on this corpus: 1 label-pos (doc 1), predicted pos, hit
    val e = TextOps.nbQualityEval(d).head()
    assert(e.getAs[Long]("n_docs") === 2L && e.getAs[Long]("n_hit") === 1L)
    assert(e.getAs[Long]("precision_ppm") === 1000000L &&
      e.getAs[Long]("recall_ppm") === 1000000L)
  }

  test("LSH index lifecycle: persisted pairs == in-memory; probe verdicts; append grows index") {
    val idx = java.nio.file.Files.createTempDirectory("lshidx").toString
    val history = docs.filter(col("doc_id") < 3)  // 0, 1 exact dups; 2 near dup
    Dedup.lshIndexBuild(history, idx)
    // persisted path reproduces the in-memory candidates bit-for-bit
    val mem = Dedup.minhashCandidates(spark, history)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val per = Dedup.lshIndexPairs(spark, idx)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(per === mem && per.contains((0L, 1L)))
    // probe: a copy of doc 0 matches history; an unrelated doc does not
    val batch = Seq((10L, base.trim), (11L, "unrelated fresh material nothing shared here at all"))
      .toDF("doc_id", "text")
    val v = Dedup.lshIndexProbe(batch, idx)
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getBoolean(2)))).toMap
    assert(v(10L)._1 === 3L && v(10L)._2, "copy of doc 0 buckets with docs 0,1,2")
    assert(v(11L) === ((0L, false)), "unrelated doc: zero matches, not a dup")
    // append: index now answers for the grown corpus
    Dedup.lshIndexAppend(batch, idx)
    val after = Dedup.lshIndexPairs(spark, idx)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(after.contains((0L, 10L)) && after.contains((2L, 10L)))
    assert(!after.exists { case (a, b) => a == 11L || b == 11L })
  }

  test("perplexityScores: common transitions score low, rare score high; exact arithmetic") {
    // train split (even ids) establishes 'a b' as the common bigram;
    // doc 1 repeats it, doc 3 is out-of-vocabulary
    val corpus = Seq(
      (0L, "en", "a b a b a b"),
      (2L, "en", "a b a b"),
      (1L, "en", "a b a b"),
      (3L, "en", "z q z q"),
    ).toDF("doc_id", "lang", "text")
    val r = TextOps.perplexityScores(corpus.select(col("doc_id"), col("text"), col("lang")))
      .collect().map(x => (x.getLong(0), (x.getLong(2), x.getLong(3), x.getString(4)))).toMap
    assert(r.keySet === Set(1L, 3L), "only the odd (scored) split is emitted")
    // training counts: bigrams of docs 0,2 with BOS: C(<s>,a)=2, C(a,b)=5, C(b,a)=3; V=|{a,b}|=2
    // doc 1 positions: (<s>,a): (2+2)*1e6 div 3 = 1333333; (a,b): (5+2)*1e6 div 6 = 1166666 x2;
    //                  (b,a): (3+2)*1e6 div 4 = 1250000
    val expected1 = (1333333L + 1166666L * 2 + 1250000L) / 4
    assert(r(1L)._1 === 4L && r(1L)._2 === expected1)
    // doc 3: (<s>,z) = (2+2)*1e6 div 1 = 4e6; three unseen-context positions
    // (0+2)*1e6 div 1 = 2e6 -> mean 2.5e6, strictly worse
    assert(r(3L)._2 === 2500000L && r(3L)._2 > r(1L)._2)
    // ntile(3) over the 2 scored docs assigns tiles 1 and 2
    assert(r(1L)._3 === "head" && r(3L)._3 === "middle")
  }

  test("hardNegatives returns only different-label neighbors, ranked by cosine") {
    val emb = Seq(
      (0L, Array(1.0f, 0.0f), "x"),   // probe
      (1L, Array(1.0f, 0.01f), "x"),  // same label: excluded however similar
      (2L, Array(0.9f, 0.1f), "y"),   // hard negative (closest wrong-label)
      (3L, Array(0.0f, 1.0f), "y"),   // easy negative
      (4L, Array(0.5f, 0.5f), "z"),
    ).toDF("vec_id", "embedding", "label")
    val r = Similarity.hardNegatives(emb, k = 3, numCentroids = 2, nprobe = 2,
      iterations = 1, probePred = col("vec_id") === 0L)
      .collect().map(x => (x.getLong(2), x.getString(3), x.getLong(4)))
    assert(r.forall(_._2 != "x"), "no same-label vector may appear")
    assert(r.map(_._1).toSeq === Seq(2L, 4L, 3L), "ranked by cosine to the probe")
  }

  test("PQ codebooks: training vectors encode to themselves; ties take the smaller code") {
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    val cb = new graft.expressions.PqCodebooks(2, 3, Array(
      Array(Array(0L, 0L, 0L), Array(10L, 10L, 10L)),
      Array(Array(5L, 5L, 5L), Array(-5L, -5L, -5L))))
    // a vector equal to (codeword 1 of sub 0) ++ (codeword 0 of sub 1)
    val v = new GenericArrayData(Array(10L, 10L, 10L, 5L, 5L, 5L))
    val codes = cb.encode(v)
    assert(codes.getInt(0) === 1 && codes.getInt(1) === 0)
    val dec = cb.decode(codes)
    assert((0 until 6).map(dec.getLong) === Seq(10L, 10L, 10L, 5L, 5L, 5L))
    // equidistant from both codewords of sub 0 -> smaller code wins
    val tie = new GenericArrayData(Array(5L, 5L, 5L, 0L, 0L, 0L))
    assert(cb.encode(tie).getInt(0) === 0)
    // short/padded input reads missing dims as 0
    val shortV = new GenericArrayData(Array(9L))
    assert(cb.encode(shortV).numElements() === 2)
  }
}
