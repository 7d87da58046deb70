package graft

import org.apache.spark.sql.functions._
import graft.operators.{Graph, TimeSeries, TextOps}

/** Semantic checks for the graph / time-series / gopher-rule operators —
  * known-answer fixtures, invariants the oracle can't express (orientation
  * invariance, fill monotonicity), and edge cases. */
class GraphTimeSeriesSpec extends SparkSpec {
  import spark.implicits._

  private def edgesDf(pairs: (Long, Long)*) =
    pairs.toDF("src", "dst")

  test("triangleCount: known graph (K4 has 4 triangles)") {
    // K4 on nodes 1..4: 6 edges, 4 triangles
    val e = edgesDf((1L,2L),(1L,3L),(1L,4L),(2L,3L),(2L,4L),(3L,4L))
    val r = Graph.triangleCount(e).head()
    assert(r.getAs[Long]("n_nodes") === 4L)
    assert(r.getAs[Long]("n_edges") === 6L)
    assert(r.getAs[Long]("n_triangles") === 4L)
  }

  test("triangleCount: path graph has none; orientation-invariant on a skewed star+triangle") {
    val path = edgesDf((1L,2L),(2L,3L),(3L,4L))
    assert(Graph.triangleCount(path).head().getAs[Long]("n_triangles") === 0L)
    // hub node 1 with high degree + one triangle (1,2,3): degree orientation
    // must still count exactly 1
    val star = edgesDf((1L,2L),(1L,3L),(1L,4L),(1L,5L),(1L,6L),(2L,3L))
    assert(Graph.triangleCount(star).head().getAs[Long]("n_triangles") === 1L)
  }

  test("pageRank: ranks conserve mass bounds and favor the hub") {
    // star: hub 1 <-> leaves 2..5
    val star = edgesDf((1L,2L),(1L,3L),(1L,4L),(1L,5L))
    val r = Graph.pageRank(star, iters = 3).collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(r(1L) > r(2L), "hub must outrank leaves")
    assert(r(2L) === r(3L) && r(3L) === r(4L) && r(4L) === r(5L), "leaves symmetric")
    // every rank >= the teleport floor
    assert(r.values.forall(_ >= 150000L))
  }

  test("pageRank: regular graph stays uniform (integer math, no drift)") {
    // 4-cycle: all degrees 2 — ranks identical at every iteration
    val cyc = edgesDf((1L,2L),(2L,3L),(3L,4L),(1L,4L))
    val ranks = Graph.pageRank(cyc, iters = 3).select("rank").distinct().collect()
    assert(ranks.length === 1)
  }

  test("degreeHistogram on a star") {
    val star = edgesDf((1L,2L),(1L,3L),(1L,4L))
    val h = Graph.degreeHistogram(star).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(h === Map(1L -> 3L, 3L -> 1L))
  }

  test("connectedComponents: two components get their min-node labels") {
    val e = edgesDf((2L, 1L), (2L, 3L), (10L, 11L))
    val m = Graph.connectedComponents(e).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(m === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L, 11L -> 10L))
  }

  test("connectedComponents: long chain converges to one component (pointer jumping)") {
    // path 1-2-...-12: naive hash-min needs ~11 rounds; the pointer-jump
    // halving must still land every node on label 1
    val chain = edgesDf((1L to 11L).map(i => (i, i + 1)): _*)
    val labels = Graph.connectedComponents(chain).select("comp_id").distinct().collect()
    assert(labels.map(_.getLong(0)).toSeq === Seq(1L))
  }

  test("labelPropagation: two cliques bridged by one edge settle into two communities") {
    // cliques {1,2,3} and {10,11,12} + bridge 3-10: plurality pull keeps
    // each side on its own min label
    val e = edgesDf((1L,2L),(1L,3L),(2L,3L),(10L,11L),(10L,12L),(11L,12L),(3L,10L))
    val m = Graph.labelPropagation(e, iters = 3).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(m(1L) === 1L && m(2L) === 1L && m(3L) === 1L)
    assert(m(10L) === m(11L) && m(11L) === m(12L))
    assert(m(10L) !== m(1L), "bridge must not merge the cliques")
  }

  test("modularityByCommunity: bridged cliques decompose to the hand-computed Q terms") {
    // cliques {1,2,3}, {10,11,12}, bridge 3-10: m=7, each community
    // d_sum=7, e_in=3 -> q_num = 4·7·3 − 49 = 35 each, q_den = 196
    val e = edgesDf((1L,2L),(1L,3L),(2L,3L),(10L,11L),(10L,12L),(11L,12L),(3L,10L))
    val rows = Graph.modularityByCommunity(e, iters = 3).collect()
    assert(rows.length === 2)
    for (r <- rows) {
      assert(r.getAs[Long]("n_nodes") === 3L)
      assert(r.getAs[Long]("e_in") === 3L)
      assert(r.getAs[Long]("d_sum") === 7L)
      assert(r.getAs[Long]("q_num") === 35L)
      assert(r.getAs[Long]("q_den") === 196L)
    }
  }

  test("seasonalProfile: uniform series indexes to 1e6 ppm; loaded hour scales exactly") {
    // type u: same cents every hour -> every bucket idx exactly 1_000_000
    val u = hourlyEvents("u", Seq(200L, 200L, 200L, 200L))
    val iu = TimeSeries.seasonalProfile(u).collect().map(_.getAs[Long]("idx_ppm")).toSet
    assert(iu === Set(1000000L))
    // type l: hours 0..3 cents (100,100,100,500): mean 200 -> idx 500_000 ×3, 2_500_000 ×1
    val l = hourlyEvents("l", Seq(100L, 100L, 100L, 500L))
    val il = TimeSeries.seasonalProfile(l).orderBy("hod").collect()
      .map(r => r.getAs[Long]("hod") -> r.getAs[Long]("idx_ppm")).toMap
    assert(il === Map(0L -> 500000L, 1L -> 500000L, 2L -> 500000L, 3L -> 2500000L))
  }

  private def hourlyEvents(tpe: String, cents: Seq[Long]) =
    cents.zipWithIndex.map { case (c, i) =>
      (i.toLong, java.sql.Timestamp.valueOf(f"2024-01-01 ${i}%02d:00:00"),
        tpe, c.toDouble / 100.0)
    }.toDF("event_id", "ts", "event_type", "value")

  test("autocorrStats: trend series has positive lag-1 covariance; constant series zero") {
    val trend = hourlyEvents("t", Seq(100L, 200L, 300L, 400L, 500L))
    val r = TimeSeries.autocorrStats(trend, maxLag = 2).orderBy("lag").collect()
    assert(r.length === 2)
    val lag1 = r(0)
    assert(lag1.getAs[Long]("n_pairs") === 4L)
    // n·Σxy − Σx·Σy = 4·400000 − 1000·1400 = 200000
    assert(lag1.getAs[Long]("num") === 200000L)
    assert(lag1.getAs[Long]("den_x") > 0L && lag1.getAs[Long]("den_y") > 0L)
    val const = hourlyEvents("c", Seq.fill(6)(250L))
    val c1 = TimeSeries.autocorrStats(const, maxLag = 1).head()
    assert(c1.getAs[Long]("num") === 0L)
    assert(c1.getAs[Long]("den_x") === 0L && c1.getAs[Long]("den_y") === 0L)
  }

  test("changepointCusum: level shift peaks at the last pre-shift hour") {
    // cents 0,0,0,100,100,100: d = (-300,-300,-300,300,300,300),
    // cusum = -300,-600,-900,-600,-300,0 → peak |−900| at pos 3
    val ev = hourlyEvents("s", Seq(0L, 0L, 0L, 100L, 100L, 100L))
    val r = TimeSeries.changepointCusum(ev).head()
    assert(r.getAs[Long]("n_hours") === 6L)
    assert(r.getAs[Long]("cp_pos") === 3L)
    assert(r.getAs[Long]("cusum_peak") === -900L)
  }

  test("gapFillHourly: fills interior gaps, keeps observed hours, no fill before first") {
    val ev = Seq(
      (1L, java.sql.Timestamp.valueOf("2024-01-01 00:10:00"), 10.0),
      (1L, java.sql.Timestamp.valueOf("2024-01-01 03:20:00"), 20.0)
    ).toDF("user_id", "ts", "value")
    val out = TimeSeries.gapFillHourly(ev).orderBy("h").collect()
    assert(out.length === 4) // hours 00..03
    val gaps = out.map(_.getAs[Boolean]("gap")).toSeq
    assert(gaps === Seq(false, true, true, false))
    val fills = out.map(_.getAs[Double]("v_fill")).toSeq
    assert(fills === Seq(10.0, 10.0, 10.0, 20.0))
    assert(out.map(_.getAs[Long]("n_events")).toSeq === Seq(1L, 0L, 0L, 1L))
  }

  test("holtSmoothing: hand-computed fold on a 3-point series") {
    // hourly means: 4.00, 8.00, 2.00 (value in units, qv in cents: 400, 800, 200)
    // level0=400 trend0=0
    // x=800: level=(400+0)/2+400=600, trend=0/2+(600-400)/2=100
    // x=200: level=(600+100)/2+100=450, trend=100/2+(450-600)/2=-25
    // forecast = 425
    val ev = Seq(
      ("click", java.sql.Timestamp.valueOf("2024-01-01 00:30:00"), 4.0),
      ("click", java.sql.Timestamp.valueOf("2024-01-01 01:30:00"), 8.0),
      ("click", java.sql.Timestamp.valueOf("2024-01-01 02:30:00"), 2.0)
    ).toDF("event_type", "ts", "value")
    val r = TimeSeries.holtSmoothing(ev).head()
    assert(r.getAs[Long]("n_hours") === 3L)
    assert(r.getAs[Double]("level") === 450.0)
    assert(r.getAs[Double]("trend") === -25.0)
    assert(r.getAs[Double]("forecast_next") === 425.0)
  }

  test("madAnomalies flags only genuine outliers") {
    val base = (1 to 20).map(i => (i.toLong, "a", 10.0 + (i % 3))) // tight cluster
    val ev = (base :+ ((99L, "a", 500.0))).toDF("event_id", "event_type", "value")
    val out = TimeSeries.madAnomalies(ev, 3.0).collect()
    assert(out.map(_.getLong(0)).toSet === Set(99L))
  }

  test("gopherSignals: repetitive doc fails the gate, normal doc passes") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over a lazy dog while birds sing in morning light"),
      (2L, ("spam spam " * 30).trim), // top-unigram frac 1.0, dup bigrams
      (3L, "short")                    // under the token floor
    ).toDF("doc_id", "text")
    val m = TextOps.gopherSignals(docs).collect()
      .map(r => r.getLong(0) -> r.getAs[Boolean]("passes")).toMap
    assert(m(1L) === true)
    assert(m(2L) === false)
    assert(m(3L) === false)
    val dup = TextOps.gopherSignals(docs).filter($"doc_id" === 2L)
      .head().getAs[Double]("dup_bigram_frac")
    // 59 bigrams, 2 distinct ("spam spam", "spam spam" reversed is same pair here)
    assert(dup > 0.9)
  }

  test("clusteringCoefficients: K4 all 1.0, triangle-plus-tail mixes") {
    // K4: every node has d=3, tri=3 -> cc = 2*3/(3*2) = 1.0 (1_000_000 ppm)
    val k4 = edgesDf((1L,2L),(1L,3L),(1L,4L),(2L,3L),(2L,4L),(3L,4L))
    val r = Graph.clusteringCoefficients(k4, topN = 10).collect()
    assert(r.length === 4)
    assert(r.forall(_.getAs[Long]("cc_ppm") === 1000000L))
    // triangle (1,2,3) + tail 3-4: node 3 has d=3, tri=1 -> 2/6 = 333333 ppm;
    // node 4 has d=1 -> excluded (d >= 2 filter)
    val tt = edgesDf((1L,2L),(2L,3L),(1L,3L),(3L,4L))
    val m = Graph.clusteringCoefficients(tt, topN = 10).collect()
      .map(x => x.getAs[Long]("node") -> x.getAs[Long]("cc_ppm")).toMap
    assert(m === Map(1L -> 1000000L, 2L -> 1000000L, 3L -> 333333L))
  }

  test("kCore: 3-core keeps K4, peels the tail chain") {
    // K4 plus a pendant chain 4-5-6: after peeling, exactly K4 remains with
    // in-core degree 3 each
    val g = edgesDf((1L,2L),(1L,3L),(1L,4L),(2L,3L),(2L,4L),(3L,4L),(4L,5L),(5L,6L))
    val core = Graph.kCore(g, k = 3, rounds = 4).collect()
      .map(r => r.getAs[Long]("node") -> r.getAs[Long]("core_deg")).toMap
    assert(core === Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
    // a graph with no 3-core empties out
    val path = edgesDf((1L,2L),(2L,3L),(3L,4L))
    assert(Graph.kCore(path, k = 3, rounds = 4).count() === 0L)
  }

  test("bfsDistances: path graph distances from min node; unreached excluded by round cap") {
    // path 1-2-3-4-5: root=1, dists 0..4 — but only 4 relaxation rounds
    // needed for node 5 (dist 4); with rounds=4 all are settled
    val path = edgesDf((1L,2L),(2L,3L),(3L,4L),(4L,5L))
    val d = Graph.bfsDistances(path, rounds = 4).collect()
      .map(r => r.getAs[Long]("node") -> r.getAs[Long]("dist")).toMap
    assert(d === Map(1L -> 0L, 2L -> 1L, 3L -> 2L, 4L -> 3L, 5L -> 4L))
    // with rounds=2 the far tail is not yet reached (ladder prefix semantics)
    val d2 = Graph.bfsDistances(path, rounds = 2).collect()
      .map(r => r.getAs[Long]("node") -> r.getAs[Long]("dist")).toMap
    assert(d2 === Map(1L -> 0L, 2L -> 1L, 3L -> 2L))
    // disconnected component never appears
    val two = edgesDf((1L,2L),(10L,11L))
    val dd = Graph.bfsDistances(two, rounds = 3).collect()
      .map(r => r.getAs[Long]("node") -> r.getAs[Long]("dist")).toMap
    assert(dd === Map(1L -> 0L, 2L -> 1L))
  }

  test("kCoreFull: converges past the pinned ladder's depth; empty core detected") {
    // K4 plus a pendant chain of 6 — the chain peels ONE node per round, so
    // a 2-round pinned ladder under-peels while the full form reaches K4
    val g = edgesDf((1L,2L),(1L,3L),(1L,4L),(2L,3L),(2L,4L),(3L,4L),
      (4L,10L),(10L,11L),(11L,12L),(12L,13L),(13L,14L),(14L,15L))
    val pinned = Graph.kCore(g, k = 2, rounds = 2)
    assert(pinned.count() > 4L, "2-round prefix must still hold chain nodes")
    val full = Graph.kCoreFull(g, k = 2).collect()
      .map(r => r.getAs[Long]("node") -> r.getAs[Long]("core_deg")).toMap
    assert(full === Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
    // deep-peel graph with NO 3-core: must converge to empty, not loop
    val path = edgesDf((1L,2L),(2L,3L),(3L,4L),(4L,5L),(5L,6L),(6L,7L))
    assert(Graph.kCoreFull(path, k = 3).count() === 0L)
    // already-stable graph: one extra confirmation round, same answer
    val k4 = edgesDf((1L,2L),(1L,3L),(1L,4L),(2L,3L),(2L,4L),(3L,4L))
    assert(Graph.kCoreFull(k4, k = 3).count() === 4L)
  }

  test("bfsDistancesFull: reaches past any pinned horizon; unreachable explicit null") {
    // path of 8: diameter 7 — more than the catalog's 4 pinned rounds
    val path = edgesDf((1L,2L),(2L,3L),(3L,4L),(4L,5L),(5L,6L),(6L,7L),(7L,8L))
    val d = Graph.bfsDistancesFull(path).collect()
      .map(r => r.getAs[Long]("node") -> r.getAs[Long]("dist")).toMap
    assert(d === (1L to 8L).map(n => n -> (n - 1)).toMap)
    // disconnected pair: present with NULL dist (not dropped)
    val two = edgesDf((1L,2L),(10L,11L))
    val rows = Graph.bfsDistancesFull(two).collect()
    val reached = rows.filter(!_.isNullAt(1))
      .map(r => r.getAs[Long]("node") -> r.getAs[Long]("dist")).toMap
    assert(reached === Map(1L -> 0L, 2L -> 1L))
    assert(rows.filter(_.isNullAt(1)).map(_.getAs[Long]("node")).toSet === Set(10L, 11L))
  }

  test("ssspFull: cheap long path beats expensive direct edge; unreachable explicit null") {
    def wEdges(ts: (Long, Long, Long)*) = ts.toDF("src", "dst", "w")
    // 1-2 direct costs 10; 1-3-4-2 costs 1+1+1 = 3 — Bellman-Ford must
    // keep improving node 2 AFTER it is first settled (the case the
    // BFS settled-count convergence signal would exit too early on)
    val g = wEdges((1L,2L,10L), (1L,3L,1L), (3L,4L,1L), (4L,2L,1L), (9L,10L,5L))
    val d = Graph.ssspFull(g).collect()
    val reached = d.filter(!_.isNullAt(1))
      .map(r => r.getAs[Long]("node") -> r.getAs[Long]("dist")).toMap
    assert(reached === Map(1L -> 0L, 2L -> 3L, 3L -> 1L, 4L -> 2L))
    assert(d.filter(_.isNullAt(1)).map(_.getAs[Long]("node")).toSet === Set(9L, 10L))
    // undirected: traversal works against the stated edge orientation
    val rev = wEdges((2L,1L,4L))
    assert(Graph.ssspFull(rev).collect()
      .map(r => r.getAs[Long]("node") -> r.getAs[Long]("dist")).toMap
      === Map(1L -> 0L, 2L -> 4L))
  }

  test("stress/harmonic full forms reach past the pinned 4-round horizon") {
    // path of 8 from the hub end: nodes at dist 5..7 exist only in the
    // exhaustion-detected form. Source = top-degree (interior) nodes,
    // so compare against a star-with-tail where the hub is forced:
    // hub 1 with leaves 2,3,4 (degree 3) and a tail 1-5-6-7-8-9.
    val g = edgesDf((1L,2L),(1L,3L),(1L,4L),(1L,5L),(5L,6L),(6L,7L),(7L,8L),(8L,9L))
    val pinned = Graph.harmonicCentrality(g, nSources = 1, rounds = 4).collect()
      .map(r => r.getAs[Long]("node")).toSet
    val full = Graph.harmonicCentralityFull(g, nSources = 1).collect()
      .map(r => r.getAs[Long]("node") -> r.getAs[Long]("harmonic_milli")).toMap
    assert(!pinned.contains(9L), "pinned horizon must stop before the tail end")
    assert(full(9L) === 1000L / 5, "full form must reach dist-5 tail end")
    // stress: on the tail, each interior node carries all paths to the
    // nodes below it — full form counts the whole tail, pinned cannot
    val sFull = Graph.stressCentralityFull(g, nSources = 1).collect()
      .map(r => r.getAs[Long]("node") -> r.getAs[Long]("stress")).toMap
    // source is hub 1 (degree 4): paths through 5 continue to 6,7,8,9
    assert(sFull(5L) === 4L && sFull(8L) === 1L)
    assert(!sFull.contains(9L) || sFull(9L) === 0L)
  }

  test("linkPrediction: RA index hand-computed; adjacent pairs excluded") {
    // star 1-{2,3,4} plus edge 2-3: the only non-adjacent wedge pairs
    // are (2,4) and (3,4), each through hub 1 (deg 3) -> RA = 1e6 div 3
    val g = edgesDf((1L,2L),(1L,3L),(1L,4L),(2L,3L))
    val p = Graph.linkPrediction(g, topK = 10).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(p.toSeq === Seq((2L,4L,1L,333333L), (3L,4L,1L,333333L)))
  }

  test("eigenvectorCentrality: triangle-plus-pendant ordering, max pinned at 1e6") {
    // triangle 1-2-3 with pendant 4 off node 1: importance order is
    // 1 (in the cycle AND feeding the pendant) > 2 = 3 > 4
    val g = edgesDf((1L,2L),(1L,3L),(2L,3L),(1L,4L))
    val e = Graph.eigenvectorCentrality(g, iters = 8, topK = 10).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(e(1L) === 1000000L, s"the hub must carry the max score: $e")
    assert(e(2L) === e(3L), s"symmetric nodes must tie exactly: $e")
    assert(e(2L) < e(1L) && e(4L) < e(2L), s"ordering 1 > 2=3 > 4: $e")
    // bit-reproducible across partitionings (integer ladder)
    val again = Graph.eigenvectorCentrality(
      g.repartition(7), iters = 8, topK = 10).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(again === e)
  }

  test("diameterDoubleSweep: exact on trees, component-scoped") {
    // path 1-2-3-4-5: diameter 4; double sweep is exact on trees
    val p = Graph.diameterDoubleSweep(edgesDf((1L,2L),(2L,3L),(3L,4L),(4L,5L))).head()
    assert((p.getAs[Long]("start_node"), p.getAs[Long]("first_sweep_ecc"),
      p.getAs[Long]("peripheral"), p.getAs[Long]("antipode"),
      p.getAs[Long]("diameter_lb"), p.getAs[Long]("n_reached")) ===
      ((1L, 4L, 5L, 1L, 4L, 5L)))
    // min-id start is a leaf off the centre: sweep re-roots at 5, bound
    // still the true diameter 3 (antipode tie -> min id 1)
    val q = Graph.diameterDoubleSweep(edgesDf((3L,1L),(3L,2L),(3L,4L),(4L,5L))).head()
    assert((q.getAs[Long]("peripheral"), q.getAs[Long]("antipode"),
      q.getAs[Long]("diameter_lb")) === ((5L, 1L, 3L)))
    // second component (10-11) is invisible to the min-id component's probe
    val r = Graph.diameterDoubleSweep(
      edgesDf((1L,2L),(2L,3L),(10L,11L))).head()
    assert(r.getAs[Long]("diameter_lb") === 2L && r.getAs[Long]("n_reached") === 3L)
  }

  test("theilSenTrend: outlier-immune median slope on a planted ramp") {
    val base = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    // 2 cents/hour ramp, with 3 wild spikes an OLS fit would chase
    val events = (0 until 60).map { h =>
      val v = if (h == 10 || h == 30 || h == 50) 500.0 else 0.02 * h
      (new java.sql.Timestamp(base.getTime + h * 3600_000L), "a", v)
    }.toDF("ts", "event_type", "value")
    val r = TimeSeries.theilSenTrend(events).head()
    assert(r.getAs[Long]("n_points") === 60L)
    assert(r.getAs[Long]("n_pairs") === 60L * 59 / 2)
    // most pairs avoid the 3 outliers: median slope = exactly 2e6 ppm/hr
    assert(r.getAs[Double]("slope_ppm_per_hr") === 2000000.0,
      s"robust slope must be the ramp's: ${r}")
  }

  test("theilSen windowed dispatch above the gate: linear pair count, ramp recovered, outliers survive") {
    import org.apache.spark.sql.functions.{col, lit}
    val n = TimeSeries.TheilSenExactGate + 1000 // crosses the gate
    // planted 7 cents/hr ramp with every 97th point a wild spike
    val hourly = spark.range(n)
      .select(lit("big").as("event_type"),
        (col("id") * 3600L).cast("timestamp").as("hr"),
        org.apache.spark.sql.functions
          .when(col("id") % 97 === 0, lit(9000000L))
          .otherwise(col("id") * 7L).as("qv"))
    val r = TimeSeries.theilSenFromHourly(hourly).head()
    assert(r.getAs[Long]("n_points") === n.toLong)
    // windowed arm: pairs bounded by n·W/2, far under the exact n²/2
    val w = TimeSeries.TheilSenWindow.toLong
    assert(r.getAs[Long]("n_pairs") <= n.toLong * w / 2,
      s"dispatch must be windowed: ${r}")
    assert(r.getAs[Long]("n_pairs") < n.toLong * (n - 1) / 4)
    // median-of-medians still recovers the clean ramp exactly
    assert(r.getAs[Double]("slope_ppm_per_hr") === 7000000.0, s"$r")
    // a small series in the same frame stays on the exact arm
    val both = hourly.unionByName(
      spark.range(60).select(lit("small").as("event_type"),
        (col("id") * 3600L).cast("timestamp").as("hr"),
        (col("id") * 2L).as("qv")))
    val rs = TimeSeries.theilSenFromHourly(both)
      .where(col("event_type") === "small").head()
    assert(rs.getAs[Long]("n_pairs") === 60L * 59 / 2, s"exact arm: $rs")
    assert(rs.getAs[Double]("slope_ppm_per_hr") === 2000000.0)
  }

  test("graft_dtw_band: hand-computed costs, warping vs banded vs unreachable") {
    graft.expressions.GraftFunctions.register(spark)
    def dtw(a: Seq[Long], b: Seq[Long], band: Int): Long =
      spark.sql(s"SELECT graft_dtw_band(array(${a.mkString(",")}L), " +
        s"array(${b.mkString(",")}L), $band)").head().getLong(0)
    // classic: 1 aligns to the first 2, rest matches exactly
    assert(dtw(Seq(1L, 2L, 3L), Seq(2L, 2L, 3L), 3) === 1L)
    // identical series: zero at any band
    assert(dtw(Seq(7L, 1L, 4L), Seq(7L, 1L, 4L), 0) === 0L)
    // a one-step phase shift warps away entirely with a full band...
    assert(dtw(Seq(0L, 0L, 5L, 0L, 0L), Seq(0L, 5L, 0L, 0L, 0L), 5) === 0L)
    // ...but band = 0 forces the diagonal: pointwise L1 = 5 + 5
    assert(dtw(Seq(0L, 0L, 5L, 0L, 0L), Seq(0L, 5L, 0L, 0L, 0L), 0) === 10L)
    // band narrower than the length gap cannot connect the corners
    assert(dtw(Seq(1L, 1L, 1L, 1L), Seq(1L), 1) >=
      graft.expressions.GraftHash.DtwInf)
  }

  test("dtwProfileDistances: phase-shifted daily profiles warp to near zero") {
    val base = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    // type a peaks at hour 6, type b is the SAME profile rotated +1h,
    // type c is flat: DTW(a,b) small (one warp step), DTW(a,c) large
    def mk(et: String, peak: Int) = (0 until 48).map { h =>
      val v = if (h % 24 == peak) 50.0 else 10.0
      (new java.sql.Timestamp(base.getTime + h * 3600_000L), et, v)
    }
    val flat = (0 until 48).map { h =>
      (new java.sql.Timestamp(base.getTime + h * 3600_000L), "c", 10.0)
    }
    val events = (mk("a", 6) ++ mk("b", 7) ++ flat)
      .toDF("ts", "event_type", "value")
    val d = TimeSeries.dtwProfileDistances(events, band = 24).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getAs[Long]("dtw_cost")).toMap
    // the rotated peak needs only boundary-cell slack; a flat series must
    // absorb the whole 4000-cent peak twice (once per series' peak hour)
    assert(d(("a", "b")) < d(("a", "c")),
      s"shifted profile must be closer than flat: $d")
    assert(d(("a", "c")) >= 4000L && d(("b", "c")) >= 4000L)
  }

  test("neighborJaccard: hand-computed ppm; adjacent pairs excluded") {
    // star 1-{2,3,4} plus edge 2-3: non-adjacent candidates (2,4),(3,4).
    // deg 2 = deg 3 = 2, deg 4 = 1, common = 1 (hub 1) ->
    // J = 1/(2+1-1) = 500000 ppm for both
    val g = edgesDf((1L,2L),(1L,3L),(1L,4L),(2L,3L))
    val p = Graph.neighborJaccard(g, topK = 10).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(p.toSeq === Seq((2L,4L,1L,500000L), (3L,4L,1L,500000L)))
    // triangle 5-6-7 plus pendant 7-8: candidates (5,8),(6,8) via 7
    // J = 1/(2+1-1) = 500000; pair (5,6) adjacent -> excluded even
    // though they share neighbour 7
    val g2 = edgesDf((5L,6L),(5L,7L),(6L,7L),(7L,8L))
    val p2 = Graph.neighborJaccard(g2, topK = 10).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(3)))
    assert(p2.toSeq === Seq((5L,8L,500000L), (6L,8L,500000L)))
  }

  test("wedge engine hub split: hub contributions exact on small-generated candidates; hub-only pairs gated") {
    // Nodes 2 and 3 share TWO common neighbours: small centre 1 (deg 2)
    // and hub 9 (deg 4 > cap 2). Pair (2,3) is generated by centre 1 and
    // its score must still count hub 9 exactly: common=2,
    // RA = 1e6 div 2 + 1e6 div 4 = 750000. Pair (4,5) shares ONLY the
    // hub -> gated out under cap 2 (the documented candidate contract).
    val g = edgesDf((1L,2L),(1L,3L),(9L,2L),(9L,3L),(9L,4L),(9L,5L))
    // (1,9) is also a candidate — via SMALL centres 2 and 3 (deg 2 each):
    // RA = 2 · 1e6 div 2 = 1000000, ahead of (2,3)
    val p = Graph.linkPrediction(g, topK = 10, degCap = 2).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(p.toSeq === Seq((1L,9L,2L,1000000L), (2L,3L,2L,750000L)),
      s"hub patch must add centre 9 to (2,3) and gate hub-only (4,5): ${p.toSeq}")
    // jaccard twin: (2,3): deg2=deg3=2, common=2 -> 2e6 div 2 = 1e6;
    // (1,9): deg1=2, deg9=4 -> 2e6 div 4 = 500000
    val j = Graph.neighborJaccard(g, topK = 10, degCap = 2).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(j.toSeq === Seq((2L,3L,2L,1000000L), (1L,9L,2L,500000L)),
      s"jaccard hub patch: ${j.toSeq}")
    // with cap above every degree the gate admits everything: (4,5)
    // appears with its hub-only score (common=1, RA = 1e6 div 4)
    val full = Graph.linkPrediction(g, topK = 10, degCap = 1024).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(full.contains((2L,3L,2L,750000L)) && full.contains((4L,5L,1L,250000L)),
      s"uncapped run must score hub-only pairs too: $full")
  }

  test("kTruss: peel cascades (support recomputed within the subgraph), K5 survives") {
    // K5: every edge in 3 triangles -> survives k=4 (support >= 2).
    // Double triangle (10,11,12)+(11,12,13): edge 11-12 has support 2 in
    // round 1, but after its neighbours drop it has 0 — only a CASCADING
    // peel (not one support pass) removes it.
    val k5 = (for (a <- 1L to 5L; b <- (a + 1) to 5L) yield (a, b))
    val bowtie = Seq((10L,11L),(10L,12L),(11L,12L),(11L,13L),(12L,13L))
    val g = edgesDf(k5 ++ bowtie: _*)
    val t = Graph.kTruss(g, k = 4).collect()
      .map(r => r.getAs[Long]("node") -> r.getAs[Long]("truss_deg")).toMap
    assert(t === (1L to 5L).map(_ -> 4L).toMap,
      s"4-truss must be exactly K5 with degree 4, got $t")
    // k=5 demands support >= 3: K5 still qualifies; k=6 empties it
    assert(Graph.kTruss(g, k = 5).count() === 5L)
    assert(Graph.kTruss(g, k = 6).count() === 0L)
  }

  test("kTruss: incremental decrement equals full recount on deep cascades and hub overlap") {
    // chain of triangles (i, i+1, i+2): k=4 peels it one triangle per
    // round from both ends — the deepest cascade per edge count, every
    // round exercising the dead-triangle decrement path. Overlap it
    // with K6 on nodes 1..6 so dropped chain edges touch surviving
    // K6 edges (the decrement must leave K6's support exact), and a
    // hub fan (100 -> many leaves, no triangles) so the degree-ordered
    // initial count and the per-round lower-degree endpoint pick both
    // see real skew.
    val chain = (1L to 12L).flatMap(i => Seq((i, i + 1), (i, i + 2))).distinct
    val k6 = for (a <- 1L to 6L; b <- (a + 1) to 6L) yield (a, b)
    val fan = (20L to 40L).map(l => (100L, l))
    val g = edgesDf((chain ++ k6 ++ fan).distinct: _*)
    for (k <- Seq(3, 4, 5, 6, 7)) {
      val inc = Graph.kTruss(g, k).collect()
        .map(r => r.getAs[Long]("node") -> r.getAs[Long]("truss_deg")).toMap
      val full = Graph.kTrussFullRecount(g, k).collect()
        .map(r => r.getAs[Long]("node") -> r.getAs[Long]("truss_deg")).toMap
      assert(inc === full, s"incremental k-truss diverged from full recount at k=$k")
    }
  }

  test("kTruss: hub-skewed wheel takes the degree-oriented support path and stays exact") {
    // wheel: hub 0 + 300-cycle rim, every rim node tied to the hub.
    // maxDeg = 300, sumDeg ~ 1800: maxDeg^2 >> 16*sumDeg, so the probe
    // routes supportWithin to the oriented enumeration (the fast
    // intersect path would put the hub's 300-long array on every spoke
    // row). k=4: rim edges sit in 1 triangle -> drop; spokes then lose
    // both triangles -> the wheel empties in a cascade. Add K5 (ids
    // 1000..1004) so the survivor set is non-trivial.
    val rim = (0L until 300L).map(i => (i + 1, (i + 1) % 300 + 1))
      .map { case (a, b) => (math.min(a, b), math.max(a, b)) }.distinct
    val spokes = (1L to 300L).map(l => (0L, l))
    val k5 = for (a <- 1000L to 1004L; b <- (a + 1) to 1004L) yield (a, b)
    val g = edgesDf((rim ++ spokes ++ k5).distinct: _*)
    val inc = Graph.kTruss(g, 4).collect()
      .map(r => r.getAs[Long]("node") -> r.getAs[Long]("truss_deg")).toMap
    val full = Graph.kTrussFullRecount(g, 4).collect()
      .map(r => r.getAs[Long]("node") -> r.getAs[Long]("truss_deg")).toMap
    assert(inc === full)
    assert(inc === (1000L to 1004L).map(_ -> 4L).toMap,
      s"4-truss of the wheel+K5 must be exactly K5, got $inc")
  }

  test("sccFunctional: trim resolves tails, cycles become SCCs, self-loop cyclic") {
    // 1->2->3->1 cycle fed by tail 4->1; chain 5->6 (no cycle); self-loop 7
    val g = edgesDf((1L,2L),(2L,3L),(3L,1L),(4L,1L),(5L,6L),(7L,7L))
    val r = Graph.sccFunctional(g).collect()
      .map(x => x.getAs[Long]("scc_id") ->
        ((x.getAs[Long]("n_nodes"), x.getAs[Boolean]("cyclic")))).toMap
    assert(r(1L) === ((3L, true)), "cycle 1-2-3 is one SCC with canonical id 1")
    assert(r(4L) === ((1L, false)) && r(5L) === ((1L, false)) && r(6L) === ((1L, false)))
    assert(r(7L) === ((1L, true)), "self-loop is a cyclic singleton SCC")
    assert(r.size === 5)
    // pure DAG: everything trims, all singletons, none cyclic
    val dag = edgesDf((1L,2L),(2L,3L),(1L,3L))
    val d = Graph.sccFunctional(dag).collect()
    assert(d.length === 3 && d.forall(!_.getAs[Boolean]("cyclic")))
  }

  test("bpeTrainBatched: batchSize=1 is exactly sequential bpeTrain; batches are token-disjoint") {
    val docs = Seq(
      "the cat sat on the mat", "the cat ran to the mat",
      "a dog sat on a log", "the dog and the cat",
    ).zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val seq3 = TextOps.bpeTrain(docs, iterations = 3).collect()
      .sortBy(_.getAs[Long]("iter"))
      .map(r => (r.getAs[String]("tok_a"), r.getAs[String]("tok_b"), r.getAs[Long]("n")))
    val bat1 = TextOps.bpeTrainBatched(docs, merges = 3, batchSize = 1).collect()
      .sortBy(_.getAs[Long]("rank"))
      .map(r => (r.getAs[String]("tok_a"), r.getAs[String]("tok_b"), r.getAs[Long]("n")))
    assert(bat1.toSeq === seq3.toSeq,
      "batch size 1 recounts after every merge — identical to the sequential trainer")
    // batch of 4: within each batch no symbol repeats (mutual disjointness)
    val bat = TextOps.bpeTrainBatched(docs, merges = 4, batchSize = 4).collect()
    assert(bat.length === 4)
    bat.groupBy(_.getAs[Long]("batch")).foreach { case (_, rows) =>
      val syms = rows.flatMap(r => Seq(r.getAs[String]("tok_a"), r.getAs[String]("tok_b")))
      assert(syms.distinct.length === syms.length, "merges within a batch share no symbol")
    }
    // first merge of batch 1 is the global top pair — same as sequential #1
    val first = bat.minBy(_.getAs[Long]("rank"))
    assert((first.getAs[String]("tok_a"), first.getAs[String]("tok_b")) === ((seq3(0)._1, seq3(0)._2)))
  }

  test("pageRankWeighted: uniform weights reduce to plain pageRank; heavy edge pulls rank") {
    val edges = Seq((1L,2L),(2L,3L),(1L,3L),(3L,4L))
    val uni = edges.map { case (s,d) => (s,d,1L) }.toDF("src","dst","w")
    val plain = Graph.pageRank(edges.toDF("src","dst"), iters = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val wtd = Graph.pageRankWeighted(uni, iters = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(wtd === plain, "unit weights must equal the unweighted ladder")
    // skew edge 1-2 to weight 100: node 2 must outrank its uniform self
    val skew = Seq((1L,2L,100L),(2L,3L,1L),(1L,3L,1L),(3L,4L,1L)).toDF("src","dst","w")
    val sk = Graph.pageRankWeighted(skew, iters = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sk(2L) > wtd(2L), "heavier in-edge must raise rank")
  }

  test("degreeAssortativity: star is perfectly disassortative (r = -1)") {
    val star = edgesDf((1L,2L),(1L,3L),(1L,4L),(1L,5L))
    val r = Graph.degreeAssortativity(star).head()
    assert(r.getAs[Long]("n") === 8L)
    assert(math.abs(r.getAs[Double]("assortativity") - (-1.0)) < 1e-9)
  }

  test("hits: directed star — source is the hub, sinks are the authorities") {
    // 1 -> {2,3,4}: node 1 points at everything (pure hub), 2..4 are
    // pointed at (pure authorities). After any iteration count the hub
    // score concentrates on 1 and the auth budget splits over 2..4.
    val e = edgesDf((1L,2L),(1L,3L),(1L,4L))
    val m = Graph.hits(e, iters = 2).collect()
      .map(r => r.getAs[Long]("node") -> ((r.getAs[Long]("auth"), r.getAs[Long]("hub")))).toMap
    assert(m(1L)._2 > m(2L)._2, "source node must be the top hub")
    assert(m(2L)._1 > m(1L)._1, "sink nodes must out-auth the source")
    assert(m(2L) === m(3L) && m(3L) === m(4L), "symmetric sinks tie exactly")
    // L1 budget: each normalised family sums to <= 1e6 (floor division)
    assert(m.values.map(_._1).sum <= 1000000L && m.values.map(_._2).sum <= 1000000L)
  }

  test("hits: scores are exact integers invariant to input partitioning") {
    val e = Seq((1L,2L),(2L,3L),(1L,3L),(3L,4L),(4L,1L))
    val one = Graph.hits(e.toDF("src","dst").repartition(1), iters = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    val many = Graph.hits(e.toDF("src","dst").repartition(7), iters = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    assert(one.sameElements(many))
  }

  test("stressCentrality: star hub carries all shortest paths; leaves carry none") {
    // star 1-(2,3,4,5): top-3-degree sources = {1,2,3} (hub + tie-broken
    // leaves). Every leaf-to-leaf shortest path passes through the hub:
    // from s=2, D(1)=3 (continuations to 3,4,5), sigma=1 → stress 3;
    // same from s=3 → total 6. Leaves appear with stress 0 (emitted
    // horizon rows), hub with 6.
    val star = edgesDf((1L,2L),(1L,3L),(1L,4L),(1L,5L))
    val m = Graph.stressCentrality(star, nSources = 3, rounds = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(m(1L) === 6L, s"hub stress: $m")
    assert(Seq(2L,3L,4L,5L).forall(m(_) === 0L))
    assert(m.size === 5)
    // partitioning invariance (integer sums only)
    val m7 = Graph.stressCentrality(
      star.repartition(7), nSources = 3, rounds = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(m7 === m)
  }

  test("harmonicCentrality: star — exact milli sums over hub sources") {
    // sources (top-degree, ties to smaller id) = {1,2,3}. From s=1 each
    // leaf is at dist 1 (1000); from s=2/s=3 the hub is 1000, far leaves
    // 500 each. So: hub 1 → 2000/2 sources, leaves 2,3 → 1500/2,
    // leaves 4,5 → 2000/3.
    val star = edgesDf((1L,2L),(1L,3L),(1L,4L),(1L,5L))
    val m = Graph.harmonicCentrality(star, nSources = 3, rounds = 4)
      .collect().map(r => r.getAs[Long]("node") ->
        ((r.getAs[Long]("harmonic_milli"), r.getAs[Long]("n_sources")))).toMap
    assert(m === Map(
      1L -> ((2000L, 2L)), 2L -> ((1500L, 2L)), 3L -> ((1500L, 2L)),
      4L -> ((2000L, 3L)), 5L -> ((2000L, 3L))))
  }

  test("pageRankPersonalized: teleport mass concentrates on and around seeds") {
    // star with the hub as the only seed: hub dominates, leaves tie exactly
    val star = edgesDf((1L,2L),(1L,3L),(1L,4L),(1L,5L))
    val st = Graph.pageRankPersonalized(star, col("node") === 1L, iters = 3)
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(st(1L) > st(2L), "seed hub must dominate")
    assert(st(2L) === st(3L) && st(3L) === st(4L) && st(4L) === st(5L))
    // path 1-2-3-4-5, seed {1}: mass concentrates near the seed — the
    // seed's neighbourhood outranks the far end (exact values pinned by
    // the integer recurrence; 4 can transiently beat 3 via the leaf-5
    // funnel, so the decay claim is neighbourhood-vs-tail, not per-hop)
    val path = edgesDf((1L,2L),(2L,3L),(3L,4L),(4L,5L))
    val r = Graph.pageRankPersonalized(path, col("node") === 1L, iters = 3)
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(r(2L) > r(3L) && r(1L) > r(5L) && r(3L) > r(5L))
    // all-seed personalization must equal plain pageRank (same teleport)
    val all = Graph.pageRankPersonalized(path, lit(true), iters = 3)
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    val plain = Graph.pageRank(path, iters = 3)
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(all === plain, "seeds = all nodes reduces to uniform teleport")
  }
}
