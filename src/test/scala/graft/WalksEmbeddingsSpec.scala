package graft

import org.apache.spark.sql.functions._
import graft.operators.{Embeddings, Graph, TimeSeries}

/** Semantic checks for the round-9 corpus-generation and spectral
  * operators: node2vec biased walks, skip-gram pair generation, the
  * power-iteration PCA, and the STL / cross-correlation time-series ops. */
class WalksEmbeddingsSpec extends SparkSpec {
  import spark.implicits._

  private def edgesDf(pairs: (Long, Long)*) = pairs.toDF("src", "dst")

  test("sgnsEpochs: epoch 1 equals the single-epoch implementation bit-for-bit; epoch 2 keeps the communities") {
    def k6(off: Long) = for (a <- 0L to 5L; b <- (a + 1) to 5L) yield (off + a, off + b)
    val g = edgesDf((k6(0) ++ k6(10) :+ (5L, 10L)): _*)
    val pairs = Graph.walkSkipgramPairs(g, 2, 4, 2).localCheckpoint()
    // two independent implementations of the same contract must agree
    // exactly on the trained center vectors after one epoch
    val one = Graph.sgnsEpoch(pairs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val loop1 = Graph.sgnsEpochs(pairs, epochs = 1).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(loop1 === one, "sgnsEpochs(1) must equal sgnsEpoch bit-for-bit")
    // epoch 2 (context vectors now in the loop): the same-community
    // nearest-neighbour rate must hold at or above epoch 1's 9/12
    val two = Graph.sgnsEpochs(pairs, epochs = 2).collect()
      .groupBy(_.getLong(0))
      .map { case (n, rs) => n -> rs.sortBy(_.getLong(1)).map(_.getLong(2)).toSeq }
    def cos(a: Seq[Long], b: Seq[Long]): Double = {
      val d = a.zip(b).map { case (x, y) => x.toDouble * y }.sum
      d / math.sqrt(a.map(x => x.toDouble * x).sum * b.map(x => x.toDouble * x).sum)
    }
    val hits = two.keys.count { n =>
      val nn = two.keys.filter(_ != n).maxBy(m => (cos(two(n), two(m)), -m))
      (n < 6) == (nn < 6)
    }
    assert(hits >= 9, s"epoch-2 same-community NN rate must hold: $hits/12")
  }

  test("sgnsEpochVecs: array form equals the reassembled row form bit-for-bit") {
    // the kNN/ANN consumers read sgnsEpochVecs directly (no
    // explode→shuffle→collect_list reassembly); this pins that the
    // direct arrays are exactly what assembleVecs(rows) reconstructs
    def k6(off: Long) = for (a <- 0L to 5L; b <- (a + 1) to 5L) yield (off + a, off + b)
    val g = edgesDf((k6(0) ++ k6(10) :+ (5L, 10L)): _*)
    val pairs = Graph.walkSkipgramPairs(g, 2, 4, 2).localCheckpoint()
    val direct = Graph.sgnsEpochVecs(pairs).collect()
      .map(r => (r.getLong(0), r.getSeq[Long](1).toVector)).toMap
    val reassembled = Graph.assembleVecs(Graph.sgnsEpoch(pairs)).collect()
      .map(r => (r.getLong(0), r.getSeq[Long](1).toVector)).toMap
    assert(direct === reassembled,
      "sgnsEpochVecs must equal assembleVecs(sgnsEpoch) exactly")
    assert(direct.nonEmpty && direct.values.forall(_.size == 32))
  }

  test("node2vecWalks: unit weights degenerate to randomWalks bit-for-bit") {
    // with wReturn = wCommon = wOut = 1 the cumulative-weight pick is
    // exactly coin % degree into the sorted list — DeepWalk's draw
    val g = edgesDf((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L), (1L, 3L))
    val n2v = Graph.node2vecWalks(g, walksPerNode = 2, steps = 4, 1L, 1L, 1L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val dw = Graph.randomWalks(g, walksPerNode = 2, steps = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(n2v.toSet === dw.toSet)
  }

  test("sgnsEpoch: community structure emerges vs the hash-init baseline; partition-invariant") {
    // two K6 cliques bridged by one edge: walks stay mostly inside a
    // clique, so after one epoch same-clique nodes should be mutual
    // nearest neighbours in the trained space more often than under the
    // hash-random init (the "beats the random baseline" contract).
    def k6(off: Long) = for (a <- 0L to 5L; b <- (a + 1) to 5L) yield (off + a, off + b)
    val g = edgesDf((k6(0) ++ k6(10) :+ (5L, 10L)): _*)
    val pairs = Graph.walkSkipgramPairs(g, walksPerNode = 2, steps = 4, window = 2)
    val trained = Graph.sgnsEpoch(pairs).collect()
      .groupBy(_.getLong(0))
      .map { case (n, rs) => n -> rs.sortBy(_.getLong(1)).map(_.getLong(2)) }
    // init baseline = the documented hash formula, recomputed here
    def chRef(s: String): Long =
      s.foldLeft(0L)((h, c) => (h * 31 + c.toLong) % 1000000007L)
    val init = trained.keys.map(n =>
      n -> (0 until 32).map(d =>
        chRef(s"$n:u:$d") * 2654435761L % 1000000007L % 2001 - 1000).toArray).toMap
    def cos(a: Seq[Long], b: Seq[Long]): Double = {
      val d = a.zip(b).map { case (x, y) => x.toDouble * y }.sum
      d / math.sqrt(a.map(x => x.toDouble * x).sum * b.map(x => x.toDouble * x).sum)
    }
    def sameCliqueNN(vecs: Map[Long, Seq[Long]]): Int =
      vecs.keys.count { n =>
        val nn = vecs.keys.filter(_ != n)
          .maxBy(m => (cos(vecs(n), vecs(m)), -m))
        (n < 6) == (nn < 6)
      }
    val afterHits = sameCliqueNN(trained.view.mapValues(_.toSeq).toMap)
    val beforeHits = sameCliqueNN(init.view.mapValues(_.toSeq).toMap)
    assert(afterHits > beforeHits,
      s"trained NN same-clique hits $afterHits must beat init $beforeHits")
    assert(afterHits >= 9, s"most of the 12 nodes must cluster: $afterHits")
    // training moved the vectors (the epoch is not a no-op)...
    assert(trained.exists { case (n, v) => v.toSeq != init(n).toSeq })
    // ...deterministically under any partitioning
    val again = Graph.sgnsEpoch(
      Graph.walkSkipgramPairs(g.repartition(7), 2, 4, 2).repartition(5))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val first = trained.toSeq.flatMap { case (n, vs) =>
      vs.zipWithIndex.map { case (v, d) => (n, d.toLong, v) } }.toSet
    assert(again === first)
    // the knn surface agrees with the driver-side cosine ranking: every
    // query node's rank-1 neighbour is its own cosine argmax
    val knn1 = Graph.sgnsKnn(pairs, k = 1, sampleMod = 1L).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    trained.keys.foreach { n =>
      val want = trained.keys.filter(_ != n)
        .maxBy(m => (cos(trained(n).toSeq, trained(m).toSeq), -m))
      assert(knn1(n) === want, s"knn rank-1 for $n: ${knn1(n)} vs $want")
    }
  }

  test("node2vecWalks: hops follow edges; huge return weight oscillates; partition-invariant") {
    val es = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (5L, 1L), (1L, 3L), (2L, 4L))
    val g = edgesDf(es: _*)
    val adj = (es ++ es.map(_.swap)).groupBy(_._1)
      .map { case (k, v) => k -> v.map(_._2).toSet }
    val rows = Graph.node2vecWalks(g, 2, 5, wReturn = 1000000L, wCommon = 1L, wOut = 1L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.length === 5 * 2 * 6)
    var backtracks = 0; var laterHops = 0
    rows.groupBy(t => (t._1, t._2)).values.foreach { w =>
      val seq = w.sortBy(_._3).map(_._4).toList
      assert(seq.head === w.head._1)
      seq.sliding(2).foreach { case List(a, b) =>
        assert(adj(a).contains(b), s"hop $a->$b not an edge in $seq")
      case _ => ()
      }
      // hops 2+ should overwhelmingly return to the previous node
      seq.sliding(3).foreach { case List(a, _, c) =>
        laterHops += 1; if (a == c) backtracks += 1
      case _ => ()
      }
    }
    assert(backtracks >= (laterHops * 9) / 10,
      s"return-weight 1e6 should dominate: $backtracks/$laterHops backtracks")
    val again = Graph.node2vecWalks(g.repartition(7), 2, 5, 1000000L, 1L, 1L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(again.toSet === rows.toSet)
  }

  test("walkSkipgramPairs: equals pairs derived from the exploded walk corpus") {
    val g = edgesDf((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L), (1L, 3L))
    val win = 2
    val walks = Graph.randomWalks(g, walksPerNode = 2, steps = 4).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val expected = walks.groupBy(t => (t._1, t._2)).values.flatMap { w =>
      val seq = w.sortBy(_._3).map(_._4)
      for {
        i <- seq.indices; j <- seq.indices
        if i != j && math.abs(i - j) <= win
      } yield (seq(i), seq(j))
    }.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val got = Graph.walkSkipgramPairs(g, 2, 4, win).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got === expected)
    // pair generation is direction-symmetric: (a,b) and (b,a) counts match
    got.foreach { case ((a, b), n) => assert(got((b, a)) === n) }
  }

  test("pcaPowerLoadings: planted dominant axis recovered, sign canonical, partition-invariant") {
    val dim = 8
    // dim 2 carries almost all variance; others near-constant noise
    val rows = (0 until 40).map { i =>
      val v = Array.fill(dim)(0.001f * (i % 3))
      v(2) = if (i % 2 == 0) 0.9f else -0.9f
      v(5) = 0.01f * (i % 5)
      (i.toLong, v)
    }
    val emb = rows.toDF("vec_id", "embedding")
    val l = Embeddings.pcaPowerLoadings(emb, iters = 8, dim = dim).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(l.size === dim)
    assert(l(2L) === 1000000L, s"dominant axis must carry the max loading: $l")
    assert(l.filterKeys(_ != 2L).values.forall(v => math.abs(v) < 100000L),
      s"off-axis loadings should be small: $l")
    val again = Embeddings.pcaPowerLoadings(emb.repartition(7), 8, dim).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(again === l)
  }

  test("pcaSecondLoadings: second planted axis recovered after deflation, near-orthogonal") {
    val dim = 8
    // dim 2 dominates, dim 6 is the clear runner-up, independent signs
    val rows = (0 until 40).map { i =>
      val v = Array.fill(dim)(0.0f)
      v(2) = if (i % 2 == 0) 0.9f else -0.9f
      v(6) = if ((i / 2) % 2 == 0) 0.3f else -0.3f
      (i.toLong, v)
    }
    val emb = rows.toDF("vec_id", "embedding")
    val l1 = Embeddings.pcaPowerLoadings(emb, iters = 8, dim = dim).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val l2 = Embeddings.pcaSecondLoadings(emb, iters = 8, dim = dim).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(l1(2L) === 1000000L && l2(6L) === 1000000L,
      s"PC1 must be the planted dominant axis, PC2 the runner-up: $l1 / $l2")
    assert(l2.filterKeys(_ != 6L).values.forall(v => math.abs(v) < 100000L),
      s"PC2 off-axis loadings should be small: $l2")
    // near-orthogonality in ppm² units (|cos| << 1)
    val dot = (0 until dim).map(i => l1(i.toLong) * l2(i.toLong)).sum
    assert(math.abs(dot) < 100000L * 1000000L / 10,
      s"PC1 . PC2 must be near zero: $dot")
    // bit-reproducible across partitionings (the whole ladder is exact)
    val again = Embeddings.pcaSecondLoadings(emb.repartition(7), 8, dim).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(again === l2)
  }

  test("chi2FromCube: exact zero on an independent table, positive on a deterministic one") {
    import graft.queries.ExtQueries
    // independent: every (c1, c2) cell count = product of margins / n,
    // integer-exactly (2x3 grid of 6s) -> every chi2 cell numerator 0
    val ind = (for { a <- Seq("x", "y"); b <- Seq("p", "q", "r") }
      yield (a, b, "2024", 6L)).toDF("c1", "c2", "c3", "cnt")
    val got = ExtQueries.chi2FromCube(ind).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(3), r.getLong(4))).toMap
    assert(got(("o_orderpriority", "o_orderstatus")) === ((2L, 0L)),
      s"independent table must score chi2 = 0: $got")
    // c3 constant -> dof 0 against either column, chi2 0
    assert(got(("o_orderpriority", "o_year")) === ((0L, 0L)))
    // deterministic: c2 is a function of c1 -> chi2/1e6 = n * min(ka,kb)-1
    // = n (2x2, dof 1); Cramer's V = 1
    val det = Seq(("x", "p", "2024", 10L), ("y", "q", "2024", 10L))
      .toDF("c1", "c2", "c3", "cnt")
    val d = ExtQueries.chi2FromCube(det).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(4), r.getDouble(5)))).toMap
    assert(d(("o_orderpriority", "o_orderstatus")) === ((20L * 1000000L, 1.0)),
      s"functional dependence must saturate chi2 and V: $d")
  }

  test("maxCoverageSelect: greedy order, disjoint gains, exhaustion stops early") {
    val d = Seq(
      (0L, "a b c d e"),         // shingles abc bcd cde — subset of doc 1
      (1L, "a b c d e f g"),     // 5 shingles, the biggest cover
      (2L, "x y z w"),           // 2 disjoint shingles
    ).toDF("doc_id", "text")
    val got = graft.operators.Embeddings.maxCoverageSelect(d, k = 3).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // doc 1 first (gain 5), then doc 2 (marginal 2); doc 0 adds NOTHING
    // once doc 1 is covered, so the greedy exhausts after 2 picks
    assert(got.toSeq === Seq((1L, 1L, 5L, 5L), (2L, 2L, 2L, 7L)))
  }

  test("pcaScoresTopK: scores are the exact integer projection, top-k by |score|") {
    val dim = 8
    val rows = (0 until 30).map { i =>
      val v = Array.fill(dim)(0.0f)
      v(0) = (i - 15) * 0.05f // monotone along the dominant axis
      (i.toLong, v)
    }
    val emb = rows.toDF("vec_id", "embedding")
    val top = Embeddings.pcaScoresTopK(emb, iters = 4, k = 5, dim = dim).collect()
    assert(top.length === 5)
    // extremes of the axis must win; scores all non-zero magnitude order
    val ids = top.map(_.getLong(0)).toSet
    assert(ids.contains(0L) && ids.contains(29L), s"extreme vecs must rank: $ids")
    val mags = top.map(r => math.abs(r.getLong(1)))
    assert(mags.sameElements(mags.sorted.reverse), "rows come back ranked by |score|")
  }

  test("kCenterSelect: geometric fixture picks the spread extremes in order") {
    val dim = 8
    def v(xs: (Int, Float)*) = {
      val a = Array.fill(dim)(0.0f); xs.foreach { case (i, x) => a(i) = x }; a
    }
    val emb = Seq(
      (0L, v()),                 // origin -> seed (min vec_id)
      (1L, v(0 -> 0.9f)),        // farthest from origin
      (2L, v(1 -> 0.8f)),        // farthest from {0,1}
      (3L, v(0 -> 0.5f, 1 -> 0.5f)),
      (4L, v(0 -> 0.05f))        // never picked at k=4
    ).toDF("vec_id", "embedding")
    val picks = Embeddings.kCenterSelect(emb, k = 4).orderBy("rk").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(picks.map(_._2).toSeq === Seq(0L, 1L, 2L, 3L))
    assert(picks.head._3 === 0L, "seed carries d2 = 0")
    // covering radius sequence is non-increasing (greedy guarantee)
    picks.drop(1).map(_._3).sliding(2).foreach { case Array(a, b) =>
      assert(a >= b, s"radius must not grow: $a < $b in ${picks.toSeq}")
    case _ => ()
    }
    val again = Embeddings.kCenterSelect(emb.repartition(5), 4).orderBy("rk")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(again.toSeq === picks.toSeq)
  }

  test("profileCorrMatrix: bounded in [-1,1], all pairs present, rerun-identical") {
    val rows = graft.queries.ExtQueries.profileCorrMatrix(spark, sf).collect()
    assert(rows.length === 6)
    rows.foreach { r =>
      val c = r.getAs[Double]("corr")
      assert(c >= -1.0 && c <= 1.0, s"corr out of range: $r")
      assert(r.getString(0) < r.getString(1), "pairs are name-ordered")
    }
    // exact-moment dag: bit-identical on rerun
    val again = graft.queries.ExtQueries.profileCorrMatrix(spark, sf).collect()
    assert(again.map(_.toString).toSeq === rows.map(_.toString).toSeq)
  }

  test("profileGiniGain: impurities in [0, 1e6] ppm; conditioning never increases impurity") {
    val rows = graft.queries.ExtQueries.profileGiniGain(spark, sf).collect()
    val all = rows.find(_.getString(0) == "_all").get
    val per = rows.filter(_.getString(0) != "_all")
    rows.foreach { r =>
      val g = r.getAs[Long]("gini_ppm")
      assert(g >= 0L && g <= 1000000L, s"gini ppm out of range: $r")
    }
    val condSum = per.map(_.getAs[Long]("term_ppm")).sum
    assert(all.getAs[Long]("gini_ppm") >= condSum,
      s"Gini gain must be >= 0: all=${all.getAs[Long]("gini_ppm")} cond=$condSum")
  }

  test("stlDecompose: constant series has flat trend, zero seasonal and residual") {
    val base = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    val events = (0 until 72).map { h =>
      (new java.sql.Timestamp(base.getTime + h * 3600_000L), "a", 5.0)
    }.toDF("ts", "event_type", "value")
    val out = TimeSeries.stlDecompose(events, halfWindow = 12).collect()
    assert(out.length === 72)
    out.foreach { r =>
      assert(r.getAs[Long]("qv") === 500L)
      assert(r.getAs[Long]("trend") === 500L)
      assert(r.getAs[Long]("seasonal") === 0L)
      assert(r.getAs[Long]("resid") === 0L)
    }
  }

  test("stlResidualAnomalies: flags an injected spike, not the seasonal rush hours") {
    val base = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    // 10 days of a strong daily profile (hour 12 is a 3x "rush hour"),
    // plus ONE corrupted off-peak hour on day 5 (hour 3 at 10x)
    val events = (0 until 240).map { h =>
      val v = if (h == 4 * 24 + 3) 100.0
        else if (h % 24 == 12) 30.0 else 10.0
      (new java.sql.Timestamp(base.getTime + h * 3600_000L), "a", v)
    }.toDF("ts", "event_type", "value")
    val flagged = TimeSeries.stlResidualAnomalies(events, halfWindow = 12, k = 3.0)
      .collect().map(_.getAs[Long]("pos")).toSet
    assert(flagged.contains(4L * 24 + 3 + 1), s"the spike hour must flag: $flagged")
    // the rush hours (pos ≡ 13 mod 24) carry the seasonal profile, not a
    // residual — none of them may flag except the trend-bleed window
    // around the spike itself
    val rushFlags = flagged.filter(p => (p - 1) % 24 == 12 &&
      math.abs(p - (4L * 24 + 4)) > 13)
    assert(rushFlags.isEmpty, s"rush hours must not flag: $rushFlags")
  }

  test("stlDecompose: components always recombine exactly; ramp trend tracks the centre") {
    val base = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    val events = (0 until 96).map { h =>
      (new java.sql.Timestamp(base.getTime + h * 3600_000L), "a", h * 1.0)
    }.toDF("ts", "event_type", "value")
    val out = TimeSeries.stlDecompose(events, halfWindow = 12).collect()
    out.foreach { r =>
      assert(r.getAs[Long]("qv") ===
        r.getAs[Long]("trend") + r.getAs[Long]("seasonal") + r.getAs[Long]("resid"))
    }
    // interior of a linear ramp: centred mean of a symmetric window = centre
    val interior = out.filter(r => {
      val p = r.getAs[Long]("pos"); p > 12 && p <= 96 - 12
    })
    interior.foreach(r => assert(r.getAs[Long]("trend") === r.getAs[Long]("qv")))
  }

  test("crossCorrStats: a 2-hour-shifted copy correlates perfectly at lag 2") {
    val base = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    def t(h: Int) = new java.sql.Timestamp(base.getTime + h * 3600_000L)
    val va = (0 until 48).map(h => (t(h), "a", math.sin(h * 0.7) * 10 + 20))
    val vb = (2 until 50).map(h => (t(h), "b", math.sin((h - 2) * 0.7) * 10 + 20))
    val events = (va ++ vb).toDF("ts", "event_type", "value")
    val all = TimeSeries.crossCorrStats(events, maxLag = 4).collect()
    // both orientations are emitted; the shifted-copy relation lives on
    // the (a, b) rows (b lags a)
    assert(all.map(r => (r.getString(0), r.getString(1))).toSet ===
      Set(("a", "b"), ("b", "a")))
    val stats = all.filter(r => r.getString(0) == "a" && r.getString(1) == "b")
      .map(r => r.getLong(2) -> (r.getLong(4), r.getLong(5), r.getLong(6))).toMap
    val (num2, denA2, denB2) = stats(2L)
    assert(num2 > 0 && num2 * num2 === denA2 * denB2,
      s"lag-2 must be a perfect correlation: $num2 $denA2 $denB2")
    val (num0, denA0, denB0) = stats(0L)
    assert(num0 * num0 < denA0 * denB0, "lag 0 must correlate imperfectly")
  }

  test("sgnsAnn: single-cell index serves exactly the brute-force ranking over the same store") {
    def k6(off: Long) = for (a <- 0L to 5L; b <- (a + 1) to 5L) yield (off + a, off + b)
    val g = edgesDf((k6(0) ++ k6(10) :+ (5L, 10L)): _*)
    val pairs = Graph.walkSkipgramPairs(g, 2, 4, 2).localCheckpoint()
    val idx = graft.queries.Staging.tmpDir("sgnsann-one")
    // K=1: every vector in the one cell, nprobe=1 probes it -> the cell
    // scan IS the full corpus scan, so ANN must equal brute bit-for-bit
    Graph.sgnsAnnIndexBuild(pairs, idx, numCentroids = 1, iterations = 1)
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
    val ann = rows(Graph.sgnsAnnServe(spark, idx, k = 3, nprobe = 1, sampleMod = 1L))
    val brute = rows(Graph.sgnsAnnStoreBrute(spark, idx, k = 3, sampleMod = 1L))
    assert(ann === brute, "one cell + one probe must degenerate to exact brute force")
    assert(ann.nonEmpty)
  }

  test("sgnsAnnRecall: nprobe=K recalls everything; nprobe=1 stays a valid census") {
    def k6(off: Long) = for (a <- 0L to 5L; b <- (a + 1) to 5L) yield (off + a, off + b)
    val g = edgesDf((k6(0) ++ k6(10) :+ (5L, 10L)): _*)
    val pairs = Graph.walkSkipgramPairs(g, 2, 4, 2).localCheckpoint()
    val idx = graft.queries.Staging.tmpDir("sgnsann-rec")
    Graph.sgnsAnnIndexBuild(pairs, idx, numCentroids = 4, iterations = 1)
    // probing every cell = exact search; every probe's recall must be 1
    val full = Graph.sgnsAnnRecall(spark, idx, k = 3, nprobe = 4, sampleMod = 1L).collect()
    assert(full.nonEmpty)
    full.foreach { r =>
      assert(r.getLong(1) > 0 && r.getLong(1) <= 3, s"n_true bounded by k: $r")
      assert(r.getLong(2) === r.getLong(1), s"nprobe=K must recall all of top-k: $r")
      assert(r.getDouble(3) === 1.0)
    }
    // cell-pruned probing is a genuine census: hits never exceed truth,
    // recall in [0,1], and the probe set is unchanged
    val pruned = Graph.sgnsAnnRecall(spark, idx, k = 3, nprobe = 1, sampleMod = 1L).collect()
    assert(pruned.map(_.getLong(0)).toSet === full.map(_.getLong(0)).toSet)
    pruned.foreach { r =>
      assert(r.getLong(2) <= r.getLong(1), s"hits bounded by truth: $r")
      assert(r.getDouble(3) >= 0.0 && r.getDouble(3) <= 1.0)
    }
  }

  test("sgnsAnn store layout: cell-partitioned vectors, K-row centroid metadata, serve-only reread") {
    def k6(off: Long) = for (a <- 0L to 5L; b <- (a + 1) to 5L) yield (off + a, off + b)
    val g = edgesDf((k6(0) ++ k6(10) :+ (5L, 10L)): _*)
    val pairs = Graph.walkSkipgramPairs(g, 2, 4, 2).localCheckpoint()
    val idx = graft.queries.Staging.tmpDir("sgnsann-layout")
    Graph.sgnsAnnIndexBuild(pairs, idx, numCentroids = 4, iterations = 1)
    assert(spark.read.parquet(s"$idx/centroids").count() === 4L,
      "centroid metadata is K rows")
    val vecs = spark.read.parquet(s"$idx/vectors")
    assert(vecs.columns.toSet === Set("vec_id", "qv", "nrm", "cid"))
    val cids = vecs.select(col("cid").cast("long")).distinct()
      .collect().map(_.getLong(0)).toSet
    assert(cids.subsetOf((0L until 4L).toSet), "cells numbered 0..K-1")
    assert(new java.io.File(s"$idx/vectors").listFiles()
      .exists(f => f.getName.startsWith("cid=")),
      "vectors table is physically partitioned by cell for probe pruning")
    // two serves from the same store are identical (no retraining jitter)
    val a = Graph.sgnsAnnServe(spark, idx, k = 2, nprobe = 2, sampleMod = 1L).collect().toSet
    val b = Graph.sgnsAnnServe(spark, idx, k = 2, nprobe = 2, sampleMod = 1L).collect().toSet
    assert(a === b)
  }
}
