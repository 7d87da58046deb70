package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.functions.CrossFns

/** Property-based differential tests: seeded random inputs (reproducible)
  * across the full unicode range and float domain, native expression vs
  * HOF reference — plus the defined null-element semantics of the native
  * loops (skip for set ops, zero for vector ops). */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    Gen.listOfN(n, g).pureApply(Gen.Parameters.default, Seed(42L))

  // codepoints across ASCII, Latin-1 supplement, CJK, emoji — excluding
  // surrogates by construction
  private val cpGen: Gen[Int] = Gen.frequency(
    (6, Gen.choose(0x20, 0x7e)),
    (2, Gen.choose(0xa0, 0x2ff)),
    (1, Gen.choose(0x4e00, 0x4fff)),
    (1, Gen.choose(0x1f600, 0x1f64f)))
  private val strGen: Gen[String] =
    Gen.choose(0, 40).flatMap(n => Gen.listOfN(n, cpGen))
      .map(cps => cps.map(Character.toChars(_).mkString).mkString)

  test("charHash: native == HOF on 300 seeded random unicode strings") {
    val df = samples(strGen, 300).toDF("s")
    val diff = df
      .select(CrossFns.charHash(col("s")).as("a"), CrossFns.charHashHof(col("s")).as("b"))
      .filter(col("a") =!= col("b")).count()
    assert(diff === 0)
  }

  test("shingleHashes: native == HOF on random multi-word texts") {
    val texts = samples(Gen.choose(0, 12).flatMap(n =>
      Gen.listOfN(n, strGen.map(_.replaceAll("\\s", "")))), 200)
      .map(_.mkString(" "))
    val df = texts.toDF("text")
    val diff = df
      .select(
        CrossFns.shingleHashes(col("text"), 3).as("a"),
        CrossFns.shingleHashesHof(col("text"), 3).as("b"))
      .filter(col("a") =!= col("b")).count()
    assert(diff === 0)
  }

  test("quantize/qdot: native == HOF on random float vectors") {
    val vecGen = Gen.listOfN(8, Gen.chooseNum(-1.0f, 1.0f))
    val df = samples(Gen.zip(vecGen, vecGen), 200)
      .map { case (a, b) => (a.toArray, b.toArray) }.toDF("a", "b")
    val diff = df
      .select(
        CrossFns.qdot(CrossFns.quantize(col("a")), CrossFns.quantize(col("b"))).as("x"),
        CrossFns.qdotHof(CrossFns.quantizeHof(col("a")), CrossFns.quantizeHof(col("b"))).as("y"))
      .filter(col("x") =!= col("y")).count()
    assert(diff === 0)
  }

  test("null elements: set ops skip them, vector ops zero them (documented semantics)") {
    val toks = Seq(Seq(Some("a"), None, Some("b"), Some("c"), None))
      .toDF("arr").select(col("arr").cast("array<string>").as("arr"))
    val skipped = toks.select(
      call_function("graft_shingle_hashes", col("arr"), lit(2)).as("withNulls"),
      call_function("graft_shingle_hashes",
        filter(col("arr"), x => x.isNotNull), lit(2)).as("filtered"))
      .head()
    assert(skipped.getSeq[Long](0) === skipped.getSeq[Long](1),
      "shingle hashing must equal hashing the null-filtered array")

    val vec = Seq(Seq(Some(0.5f), None, Some(-0.25f)))
      .toDF("v").select(col("v").cast("array<float>").as("v"))
    val quantized = vec.select(
      call_function("graft_quantize", col("v")).as("withNulls"),
      call_function("graft_quantize",
        transform(col("v"), x => coalesce(x, lit(0.0f)))).as("zeroed"))
      .head()
    assert(quantized.getSeq[Long](0) === quantized.getSeq[Long](1),
      "quantize must treat null elements as 0 and preserve length")
  }

  test("winnowing density on random token streams is ~2/(w+1) of positions") {
    graft.expressions.GraftFunctions.register(spark)
    // 40 docs of 200 random short tokens -> 198 shingle positions each
    val tokGen = Gen.listOfN(200, Gen.choose('a', 'z').map(_.toString))
    val docs = samples(tokGen, 40).zipWithIndex
      .map { case (ts, i) => (i.toLong, ts.mkString(" ")) }
      .toDF("doc_id", "text")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id").orderBy("pos").rowsBetween(-3, 0)
    val fp = docs
      .select(col("doc_id"), CrossFns.tokens(col("text")).as("w"))
      .select(col("doc_id"), call_function("graft_shingle_gen", col("w"), lit(3)))
      .withColumn("c", col("sh") * 16777216L + col("pos"))
      .withColumn("sel", min(col("c")).over(w))
      .filter(col("pos") >= 4)
      .select(col("doc_id"), expr("sel div 16777216").as("fp_sh"))
      .distinct()
    val density = fp.count().toDouble / (40.0 * 195)
    // theory: expected selection density for window w=4 is 2/(w+1) = 0.4
    // (distinct-ing repeated hashes pulls it slightly below)
    assert(density > 0.25 && density < 0.5, s"winnowing density $density")
  }

  test("substring spans: disjoint maximal per doc, length >= k, keep-one coverage a subset") {
    // 3-word vocabulary forces rich 8-gram collisions in short random docs
    val docGen = Gen.choose(0, 30).flatMap(n => Gen.listOfN(n, Gen.oneOf("a", "b", "c")))
    val docs = samples(docGen, 60).zipWithIndex
      .map { case (ws, i) => (i.toLong, ws.mkString(" ")) }
      .toDF("doc_id", "text")
    def spansOf(df: org.apache.spark.sql.DataFrame): Map[Long, Seq[(Long, Long)]] =
      df.collect().map(r => (r.getLong(0),
        (r.getAs[Number](1).longValue, r.getAs[Number](2).longValue)))
        .groupBy(_._1).view.mapValues(_.map(_._2).sortBy(_._1).toSeq).toMap
    val agg = spansOf(graft.operators.Dedup.substringSpans(spark, docs, 8))
    val one = spansOf(graft.operators.Dedup.substringSpansKeepOne(spark, docs, 8))
    assert(agg.nonEmpty, "the collision-rich corpus must produce spans")
    for ((_, sp) <- agg ++ one; (s, e) <- sp) assert(e - s >= 8L)
    for ((_, sp) <- agg ++ one; Seq((_, e1), (s2, _)) <- sp.sliding(2) if sp.size > 1)
      assert(s2 > e1, "maximal merge leaves a strict gap between spans")
    // keep-one marks a subset of the duplicated windows, so its covered
    // positions must be a subset of the aggressive form's
    def cover(m: Map[Long, Seq[(Long, Long)]]): Set[(Long, Long)] =
      m.toSeq.flatMap { case (d, sp) => sp.flatMap { case (s, e) => (s until e).map((d, _)) } }.toSet
    assert(cover(one).subsetOf(cover(agg)))
    assert(cover(one).size < cover(agg).size, "canonical exclusion must spare some text")
  }

  test("connectedComponents equals brute-force union-find on seeded random graphs") {
    val rnd = new scala.util.Random(42)
    for (_ <- 1 to 5) {
      val n = 12 + rnd.nextInt(24)
      val edges = (1 to n).map(_ =>
        (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong)).filter(e => e._1 != e._2)
      if (edges.nonEmpty) {
        // brute-force union-find truth
        val parent = Array.tabulate(n)(identity)
        def find(x: Int): Int = if (parent(x) == x) x else { parent(x) = find(parent(x)); parent(x) }
        edges.foreach { case (a, b) =>
          val (ra, rb) = (find(a.toInt), find(b.toInt))
          if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
        }
        val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
        val truth = nodes.map(v => v -> nodes.filter(u => find(u.toInt) == find(v.toInt)).min).toMap
        val got = graft.operators.Graph.connectedComponents(edges.toDF("src", "dst"))
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        assert(got === truth, s"graph edges=$edges")
      }
    }
  }

  test("bfsDistances equals brute-force BFS on seeded random graphs (rounds >= diameter)") {
    val rnd = new scala.util.Random(43)
    for (_ <- 1 to 5) {
      val n = 10 + rnd.nextInt(15)
      val edges = (1 to n).map(_ =>
        (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong)).filter(e => e._1 != e._2).distinct
      if (edges.nonEmpty) {
        val adj = edges.flatMap(e => Seq(e._1 -> e._2, e._2 -> e._1))
          .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).toSet }
        val root = adj.keys.min
        // brute-force BFS truth
        var dist = Map(root -> 0L); var frontier = Set(root)
        while (frontier.nonEmpty) {
          val next = frontier.flatMap(adj(_)).diff(dist.keySet)
          dist = dist ++ next.map(_ -> (dist(frontier.head) + 1L))
          frontier = next
        }
        val got = graft.operators.Graph.bfsDistances(edges.toDF("src", "dst"), rounds = n)
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        assert(got === dist, s"graph edges=$edges")
      }
    }
  }

  test("kCore equals brute-force peel-to-fixpoint on seeded random graphs") {
    val rnd = new scala.util.Random(44)
    for (k <- Seq(2, 3); _ <- 1 to 3) {
      val n = 10 + rnd.nextInt(15)
      val edges = (1 to 2 * n).map(_ =>
        (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong)).filter(e => e._1 != e._2)
        .map(e => (e._1 min e._2, e._1 max e._2)).distinct
      if (edges.nonEmpty) {
        // brute-force: peel until stable
        var es = edges
        var stable = false
        while (!stable) {
          val deg = es.flatMap(e => Seq(e._1, e._2)).groupBy(identity).map { case (v, xs) => v -> xs.size }
          val keep = deg.filter(_._2 >= k).keySet
          val es2 = es.filter(e => keep(e._1) && keep(e._2))
          stable = es2 == es; es = es2
        }
        val truth = es.flatMap(e => Seq(e._1, e._2)).groupBy(identity)
          .map { case (v, xs) => v -> xs.size.toLong }
        val got = graft.operators.Graph.kCore(edges.toDF("src", "dst"), k, rounds = n)
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        assert(got === truth, s"k=$k edges=$edges")
      }
    }
  }

  test("clusteringCoefficients matches brute-force triangle counting on seeded random graphs") {
    val rnd = new scala.util.Random(45)
    for (_ <- 1 to 4) {
      val n = 8 + rnd.nextInt(8)
      val edges = (1 to 3 * n).map(_ =>
        (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong)).filter(e => e._1 != e._2)
        .map(e => (e._1 min e._2, e._1 max e._2)).distinct
      if (edges.nonEmpty) {
        val adj = edges.flatMap(e => Seq(e._1 -> e._2, e._2 -> e._1))
          .groupBy(_._1).map { case (kk, v) => kk -> v.map(_._2).toSet }
        val truth = adj.collect { case (v, nb) if nb.size >= 2 =>
          val tri = nb.toSeq.combinations(2).count { case Seq(a, b) => adj(a)(b) }
          val d = nb.size.toLong
          v -> (2L * tri * 1000000L / (d * (d - 1)))
        }
        val got = graft.operators.Graph
          .clusteringCoefficients(edges.toDF("src", "dst"), topN = 1000)
          .collect().map(r => r.getAs[Long]("node") -> r.getAs[Long]("cc_ppm")).toMap
        assert(got === truth, s"edges=$edges")
      }
    }
  }

  test("histGini equals the exact grouped formula when values sit on bucket multiples") {
    // values as exact bucket multiples -> within-bucket-equality holds,
    // so the trapezoid approximation is EXACT and must match the
    // sorted-rank Gini computed brute-force
    val rnd = new scala.util.Random(7)
    for (_ <- 1 to 5) {
      val n = 5 + rnd.nextInt(20)
      val vals = Seq.fill(n)(250000L * rnd.nextInt(40))
      val got = graft.operators.Sketches.histGini(
          vals.map(("g", _)).toDF("grp", "units"), "grp", "units", 250000L, 200)
        .head().getAs[Long]("g_ppm")
      val sorted = vals.sorted
      val s = sorted.sum
      // G = 1 - sum_i (2*cum_i - x_i) / (n*S), grouped over equal values
      val t = sorted.scanLeft(0L)(_ + _).tail.zip(sorted).map { case (cum, x) => 2 * cum - x }.sum
      val expect = 1000000L - t / math.max((n.toLong * s) / 1000000L, 1L)
      assert(got === expect, s"vals=$vals")
    }
  }

  test("autocorrStats matches brute-force moments on seeded random hourly series") {
    val rnd = new scala.util.Random(11)
    val cents = Seq.fill(20)(rnd.nextInt(100000).toLong)
    val ev = cents.zipWithIndex.map { case (c, i) =>
      (i.toLong, java.sql.Timestamp.valueOf(f"2024-01-01 $i%02d:00:00"),
        "p", c.toDouble / 100.0)
    }.toDF("event_id", "ts", "event_type", "value")
    val got = graft.operators.TimeSeries.autocorrStats(ev, maxLag = 3)
      .collect().map(r => r.getAs[Long]("lag") ->
        ((r.getAs[Long]("n_pairs"), r.getAs[Long]("num"), r.getAs[Long]("den_x")))).toMap
    for (lag <- 1 to 3) {
      val pairs = cents.dropRight(lag).zip(cents.drop(lag))
      val np = pairs.length.toLong
      val sx = pairs.map(_._1).sum; val sy = pairs.map(_._2).sum
      val sxy = pairs.map(p => p._1 * p._2).sum
      val sxx = pairs.map(p => p._1 * p._1).sum
      assert(got(lag.toLong) === ((np, np * sxy - sx * sy, np * sxx - sx * sx)))
    }
  }

  test("dtwBand: metric-style properties on seeded random int series") {
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    def dtw(a: Seq[Long], b: Seq[Long], band: Int): Long =
      graft.expressions.GraftHash.dtwBand(
        new GenericArrayData(a.toArray), new GenericArrayData(b.toArray), band)
    val serGen: Gen[List[Long]] =
      Gen.choose(1, 24).flatMap(n => Gen.listOfN(n, Gen.choose(-5000L, 5000L)))
    val pairs = samples(Gen.zip(serGen, serGen), 150)
    pairs.foreach { case (a, b) =>
      val full = dtw(a, b, math.max(a.size, b.size))
      // identity and symmetry
      assert(dtw(a, a, a.size) === 0L)
      assert(full === dtw(b, a, math.max(a.size, b.size)), s"symmetry: $a $b")
      // banding only restricts the path set: banded >= full, and a
      // sufficient band reproduces full exactly
      val band = math.max(math.abs(a.size - b.size), 1)
      assert(dtw(a, b, band) >= full, s"band monotone: $a $b")
      assert(dtw(a, b, 100) === full)
      // equal lengths: the diagonal is a valid path, so full <= L1
      if (a.size == b.size) {
        val l1 = a.zip(b).map { case (x, y) => math.abs(x - y) }.sum
        assert(full <= l1, s"dtw > pointwise L1: $a $b")
        assert(dtw(a, b, 0) === l1, "band 0 must BE pointwise L1")
      }
    }
  }

  test("wedgeScores: hub-split == naive all-wedges on seeded random graphs at an admitting cap") {
    // with cap >= max degree the gate admits everything, so the split
    // engine must equal the brute-force wedge enumeration EXACTLY
    val edgeGen = Gen.listOfN(40,
      Gen.zip(Gen.choose(0L, 14L), Gen.choose(0L, 14L))).map(_.filter(p => p._1 != p._2)
      .map(p => (math.min(p._1, p._2), math.max(p._1, p._2))).distinct)
    samples(edgeGen, 12).filter(_.nonEmpty).foreach { es =>
      val g = es.toDF("src", "dst")
      val got = graft.operators.Graph.wedgeScores(g, degCap = 1024).collect()
        .map(r => (r.getLong(0), r.getLong(1)) -> ((r.getLong(2), r.getLong(3)))).toMap
      // brute force: adjacency sets, all pairs sharing >=1 neighbour
      val adj = (es ++ es.map(_.swap)).groupBy(_._1)
        .map { case (k, v) => k -> v.map(_._2).toSet }
      val nodes = adj.keys.toSeq.sorted
      val want = (for {
        i <- nodes.indices; j <- (i + 1) until nodes.size
        u = nodes(i); v = nodes(j)
        common = adj(u).intersect(adj(v))
        if common.nonEmpty
      } yield (u, v) -> ((common.size.toLong,
        common.toSeq.map(w => 1000000L / adj(w).size).sum))).toMap
      assert(got === want, s"edges=$es")
      // with the MINIMUM cap every centre is a hub except deg-1 leaves:
      // the run must still terminate and every reported score stay exact
      val capped = graft.operators.Graph.wedgeScores(g, degCap = 1).collect()
        .map(r => (r.getLong(0), r.getLong(1)) -> ((r.getLong(2), r.getLong(3)))).toMap
      capped.foreach { case (k, s) =>
        assert(want(k) === s, s"capped pair $k must keep the exact score") }
    }
  }

  test("nbQuality scores stay in [0, 1e6] and unseen-vocab docs score the exact prior") {
    val wordGen = Gen.choose(0, 30).map(i => s"w$i")
    val docGen = Gen.choose(10, 25).flatMap(n => Gen.listOfN(n, wordGen)).map(_.mkString(" "))
    val docs = samples(docGen, 60).zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val model = graft.operators.TextOps.nbQualityModel(docs)
    // unseen-vocab doc from tokens whose hash BUCKETS are collision-free
    // vs the trained vocabulary (feature hashing aliases colliding
    // tokens by design — the prior applies only to untouched buckets)
    def chRef(s: String): Long = s.foldLeft(0L)((h, c) => (h * 31 + c.toLong) % 1000000007L)
    def bucket(w: String): Long = chRef(w) % graft.operators.TextOps.NbBuckets
    val trainedBuckets = (0 to 30).map(i => bucket(s"w$i")).toSet
    val fresh = Iterator.from(0).map(i => s"u$i")
      .filterNot(w => trainedBuckets.contains(bucket(w))).take(12).toSeq
    val probe = docs.filter(col("doc_id") % 2 === 1)
      .unionByName(Seq((9999L, fresh.mkString(" "))).toDF("doc_id", "text"))
    val scores = graft.operators.TextOps.nbQualityScores(probe, model).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    scores.values.foreach(s => assert(s >= 0L && s <= 1000000L, s"score bound: $s"))
    assert(scores(9999L) === 500000L,
      "collision-free unseen vocabulary must score the exact smoothed prior")
  }

  test("knPerplexityScores: every score finite and positive on random corpora incl. unseen vocab") {
    val wordGen = Gen.choose(0, 20).map(i => s"t$i")
    val docGen = Gen.choose(3, 15).flatMap(n => Gen.listOfN(n, wordGen)).map(_.mkString(" "))
    val base = samples(docGen, 40).zipWithIndex
      .map { case (t, i) => (i.toLong, "en", t) }
    val docs = (base :+ ((41L, "en", "qq1 qq2 qq3 qq4"))).toDF("doc_id", "lang", "text")
    val rows = graft.operators.TextOps.knPerplexityScores(docs).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val kn = r.getLong(3)
      assert(kn > 0L && kn < Long.MaxValue, s"KN inverse must be finite positive: $r")
    }
    // the all-unseen doc must be present (odd id) and score WORSE than
    // the in-distribution median
    val byId = rows.map(r => r.getLong(0) -> r.getLong(3)).toMap
    val others = byId.filterNot(_._1 == 41L).values.toSeq.sorted
    assert(byId(41L) > others(others.size / 2),
      s"unseen vocab must rank worse than the median: ${byId(41L)} vs $others")
  }

  test("KMV estimate within 50% of truth on 2000 seeded random keys (k=64)") {
    graft.expressions.GraftFunctions.register(spark)
    val keys = samples(Gen.choose(0L, Long.MaxValue / 2), 2000).distinct
    val est = keys.toDF("k")
      .withColumn("hv", CrossFns.scrambledHash(col("k").cast("string")))
      .agg(call_function("graft_kmv_distinct", col("hv"), lit(64)))
      .head().getDouble(0)
    val n = keys.size.toDouble
    assert(est > n * 0.5 && est < n * 1.5, s"KMV est $est vs truth $n")
  }
}
