package graft

import org.apache.spark.sql.functions._
import graft.operators.Linkage

/** Known-answer fixtures for the entity-resolution family: blocking
  * bounds the candidate space, verification is symmetric, clustering is
  * transitive-closure semantics, survivorship picks the min-key record. */
class LinkageSpec extends SparkSpec {
  import spark.implicits._

  private def cust(rows: (Long, String, Int, String, Double)*) =
    rows.toDF("c_custkey", "c_name", "c_nationkey", "c_mktsegment", "c_acctbal")

  test("blockedPairs: only same-block pairs are candidates; distance gates matches") {
    val c = cust(
      (1L, "acme corp", 1, "A", 10.0),
      (2L, "acme corp", 1, "A", 20.0),   // exact dup of 1, same block
      (3L, "acme c0rp", 1, "A", 30.0),   // 1 edit from 1, same block
      (4L, "acme corp", 2, "A", 40.0),   // same name, DIFFERENT block — excluded
      (5L, "zzz unrelated", 1, "A", 50.0)) // same block, far name — excluded
    val p = Linkage.blockedPairs(c, maxDist = 2).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(x => (x._1, x._2))
    assert(p.toSeq === Seq((1L, 2L, 0L), (1L, 3L, 1L), (2L, 3L, 1L)))
  }

  test("erClusters + goldenRecords: transitive closure merges chains; survivor is min key") {
    // chain: 1~2 (dist 0), 2~3 (dist 1) — but 1~3 also within 2 here;
    // add a separate far block pair (10,11) to get two clusters
    val c = cust(
      (1L, "acme corp", 1, "A", 10.0),
      (2L, "acme corp", 1, "A", 99.5),
      (3L, "acme c0rp", 1, "A", 30.0),
      (10L, "beta llc", 3, "B", 7.0),
      (11L, "beta llp", 3, "B", 8.0))
    val pairs = Linkage.blockedPairs(c, maxDist = 2)
    val cl = Linkage.erClusters(pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(cl === Map(1L -> 3L, 10L -> 2L))
    val g = Linkage.goldenRecords(c, pairs).collect()
      .map(r => (r.getAs[Long]("cluster_id"), r.getAs[String]("golden_name"),
        r.getAs[Long]("n_members"), r.getAs[Double]("max_bal"))).sortBy(_._1)
    assert(g.toSeq === Seq((1L, "acme corp", 3L, 99.5), (10L, "beta llc", 2L, 8.0)))
  }

  test("blockedPairs: result is partitioning-invariant") {
    val c = cust((1L, "n1", 1, "A", 1.0), (2L, "n2", 1, "A", 2.0),
      (3L, "n3", 1, "A", 3.0), (4L, "m4", 2, "A", 4.0))
    val a = Linkage.blockedPairs(c.repartition(1), 2).collect().toSet
    val b = Linkage.blockedPairs(c.repartition(5), 2).collect().toSet
    assert(a === b)
  }

  test("blockedPairsIncremental: batch-split sum equals the batch pair set exactly") {
    val all = cust(
      (1L, "acme corp", 1, "A", 1.0), (2L, "acme corp", 1, "A", 2.0),
      (3L, "acme c0rp", 1, "A", 3.0), (4L, "beta llc", 2, "B", 4.0),
      (5L, "beta llp", 2, "B", 5.0), (6L, "acme corpX", 1, "A", 6.0))
    val full = Linkage.blockedPairs(all, 2).collect().toSet
    // split into three arrival batches; each batch pairs within itself
    // and against accumulated history — union must equal the batch run
    val batches = Seq(Seq(1L, 4L), Seq(2L, 5L), Seq(3L, 6L))
    var hist = all.limit(0)
    val acc = batches.map { ids =>
      val b = all.filter(col("c_custkey").isin(ids: _*))
      val pairs = Linkage.blockedPairsIncremental(b, hist, 2).collect().toSet
      hist = hist.unionByName(b)
      pairs
    }
    assert(acc.reduce(_ ++ _) === full)
    // no pair is emitted twice across batches
    assert(acc.map(_.size).sum === full.size)
  }

  test("boundedPairsIncremental: equals exhaustive incremental on every batch split") {
    // r16: the bounded (deletion-core) incremental tier must emit the
    // SAME pairs at the SAME batches as blockedPairsIncremental — both
    // the union-equals-batch-run contract and the per-batch sets.
    val rnd = new scala.util.Random(20260817L)
    val rows = (1L to 40L).map { id =>
      val nm = Seq.fill(rnd.nextInt(6))("ab".charAt(rnd.nextInt(2))).mkString
      (id, nm, 1 + rnd.nextInt(2), "A", 0.0)
    }
    val all = cust(rows: _*)
    val full = Linkage.blockedPairs(all, 2).collect().toSet
    val batches = (1L to 40L).grouped(13).map(_.toSeq).toSeq
    var hist = all.limit(0)
    val acc = batches.map { ids =>
      val b = all.filter(col("c_custkey").isin(ids: _*))
      val bounded = Linkage.boundedPairsIncremental(b, hist, 2).collect().toSet
      val exhaustive = Linkage.blockedPairsIncremental(b, hist, 2).collect().toSet
      assert(bounded === exhaustive, s"tiers diverged at batch $ids")
      hist = hist.unionByName(b)
      bounded
    }
    assert(acc.reduce(_ ++ _) === full)
    assert(acc.map(_.size).sum === full.size)
  }

  test("quotient cluster fold equals batch CC at every boundary; refold idempotent") {
    import graft.operators.Graph
    // the stream_link_golden kernel (the above-threshold path local
    // fixtures never take): quotient CC over contracted pairs +
    // incremental survivorship must equal the batch forms at every
    // boundary — including a batch whose pairs BRIDGE two clusters
    val all = cust(
      (1L, "acme corp", 1, "A", 1.0), (2L, "acme corp", 1, "A", 2.0),
      (3L, "acme c0rp", 1, "A", 3.0), (4L, "acme c0rpX", 1, "A", 4.0),
      (5L, "beta llc", 2, "B", 5.0), (6L, "beta llp", 2, "B", 6.0))
    val batches = Seq(Seq(1L, 2L, 5L), Seq(4L, 6L), Seq(3L)) // 3 bridges 1-2 and 4
    var hist = all.limit(0)
    var prevMap = all.select(col("c_custkey").as("node"),
      col("c_custkey").as("comp_id")).limit(0)
    var goldenState = Linkage.goldenRecords(all, Linkage.blockedPairs(all, 2)).limit(0)
    var pairsSoFar = Linkage.blockedPairs(all, 2).limit(0)
    batches.foreach { ids =>
      val b = all.filter(col("c_custkey").isin(ids: _*))
      val pairs = Linkage.blockedPairsIncremental(b, hist, 2).localCheckpoint()
      val (newMap0, merge0) = Linkage.foldClusters(prevMap, pairs)
      val folded = newMap0.localCheckpoint()
      val merge = merge0.localCheckpoint()
      hist = hist.unionByName(b).localCheckpoint()
      pairsSoFar = pairsSoFar.unionByName(pairs).localCheckpoint()
      val batchCc = Graph.connectedComponents(
        pairsSoFar.select(col("cust_a").as("src"), col("cust_b").as("dst")))
      assert(folded.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        === batchCc.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap,
        s"quotient map diverged from batch CC after batch $ids")
      // incremental survivorship: untouched rows carry over, merged
      // clusters re-aggregate — must equal the full recompute
      val touchedNew = merge.select(col("merged").as("comp_id")).distinct()
      val members = folded.join(touchedNew, Seq("comp_id"), "left_semi")
        .withColumnRenamed("comp_id", "cluster_id")
      val redone = members
        .join(hist, members("node") === hist("c_custkey"))
        .groupBy("cluster_id")
        .agg(count(lit(1)).as("n_members"), max("c_acctbal").as("max_bal"))
        .join(hist.select(col("c_custkey").as("cluster_id"),
          col("c_name").as("golden_name")), "cluster_id")
        .select("cluster_id", "golden_name", "n_members", "max_bal")
      goldenState = goldenState
        .join(merge.select(col("comp_id").as("cluster_id")), Seq("cluster_id"), "left_anti")
        .unionByName(redone)
        .localCheckpoint()
      assert(goldenState.collect().toSet
        === Linkage.goldenFromClusters(hist, batchCc).collect().toSet,
        s"incremental golden diverged from full recompute after batch $ids")
      // replay: refolding the SAME pairs into the updated map is a no-op
      val (refold, remerge) = Linkage.foldClusters(folded, pairs)
      assert(refold.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        === folded.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap)
      assert(remerge.count() === 0L, "replayed pairs must contract to self-loops")
      prevMap = folded
    }
    // final survivorship equals the one-shot batch golden records
    val batch = Linkage.goldenRecords(all, Linkage.blockedPairs(all, 2)).collect().toSet
    assert(goldenState.collect().toSet === batch)
  }

  test("deletionVariants: exact ≤2-deletion set, degenerate lengths safe") {
    def vars(s: String, d: Int): Set[String] =
      Seq(s).toDF("nm")
        .select(Linkage.deletionVariants(col("nm"), d).as("v"))
        .head().getSeq[String](0).toSet
    assert(vars("abc", 1) === Set("abc", "bc", "ac", "ab"))
    assert(vars("abc", 2) === Set("abc", "bc", "ac", "ab", "a", "b", "c"))
    assert(vars("ab", 2) === Set("ab", "a", "b", ""))
    assert(vars("a", 2) === Set("a", ""))
    assert(vars("", 2) === Set(""))
  }

  test("boundedPairs equals exhaustive blockedPairs: substitutions, ins/del, shifts, blocks") {
    val c = cust(
      (1L, "acme corp", 1, "A", 1.0),
      (2L, "acme corp", 1, "A", 2.0),    // dist 0
      (3L, "acme c0rp", 1, "A", 3.0),    // dist 1 substitution
      (4L, "acme corps", 1, "A", 4.0),   // dist 1 insert (length differs)
      (5L, "acme co", 1, "A", 5.0),      // dist 2 deletes
      (6L, "abcdef", 1, "A", 6.0),
      (7L, "bcdefg", 1, "A", 7.0),       // dist 2 SHIFT (del head + append)
      (8L, "acme corp", 2, "A", 8.0),    // other block — excluded
      (9L, "zzz far away", 1, "A", 9.0), // same block, far — excluded
      (10L, "", 1, "A", 10.0),
      (11L, "ab", 1, "A", 11.0))         // ("", "ab") dist 2 via empty core
    for (d <- Seq(1, 2)) {
      val exh = Linkage.blockedPairs(c, d).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      val bnd = Linkage.boundedPairs(c, d).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(bnd === exh, s"bounded tier diverged at maxDist=$d")
    }
    // sanity: the fixture actually exercises ins/del + shift shapes
    val got = Linkage.boundedPairs(c, 2).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got.contains((1L, 4L, 1L)) && got.contains((1L, 5L, 2L)) &&
      got.contains((6L, 7L, 2L)) && got.contains((10L, 11L, 2L)))
    assert(!got.exists(p => p._1 == 8L || p._2 == 8L))
    assert(!got.exists(p => p._1 == 9L || p._2 == 9L))
  }

  test("boundedPairs completeness: randomized dense corpus equals exhaustive") {
    // short random names over a 2-letter alphabet make dist<=2 pairs
    // dense and full of insert/delete/shift cases the structured
    // fixtures miss — the completeness theorem, exercised in anger
    val rnd = new scala.util.Random(20260816L)
    val rows = (1L to 60L).map { id =>
      val nm = Seq.fill(rnd.nextInt(7))("ab".charAt(rnd.nextInt(2))).mkString
      (id, nm, 1 + rnd.nextInt(2), "A", 0.0)
    }
    val c = cust(rows: _*)
    val exh = Linkage.blockedPairs(c, 2).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val bnd = Linkage.boundedPairs(c, 2).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(exh.nonEmpty && bnd === exh)
  }

  test("graft_deletion_hashes: candidate tier equals the string-variant reference") {
    // r16: boundedCandidates joins on native deletion-core HASHES
    // (graft_deletion_hashes) instead of materialised variant strings.
    // Differential: on a dense corpus (plus multibyte names — deletions
    // are code-point level, matching substr/levenshtein), the candidate
    // PAIR set from the hash tier must equal the pair set from exact
    // string-core equality over deletionVariants.
    val rnd = new scala.util.Random(20260819L)
    val base = (1L to 50L).map { id =>
      val nm = Seq.fill(rnd.nextInt(6))("ab".charAt(rnd.nextInt(2))).mkString
      (id, nm, 1 + rnd.nextInt(2), "A", 0.0)
    }
    val uni = Seq(
      (101L, "héllo wörld", 1, "A", 0.0),
      (102L, "héllo wörl", 1, "A", 0.0),   // 1 code-point delete
      (103L, "héllo wörld!", 1, "A", 0.0), // 1 insert
      (104L, "日本語テスト", 1, "A", 0.0),
      (105L, "日本語テス", 1, "A", 0.0))   // 1 code-point delete
    val c = cust((base ++ uni): _*)
    val hashCand = Linkage.boundedCandidates(c, depth = 2)
      .select("cust_a", "cust_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    def varSide(p: String) = c.select(
      col("c_custkey").as(s"ck_$p"), col("c_nationkey").as(s"bn_$p"),
      col("c_mktsegment").as(s"bs_$p"),
      explode(Linkage.deletionVariants(col("c_name"), 2)).as(s"v_$p"))
    val strCand = varSide("a").join(varSide("b"),
        col("v_a") === col("v_b") && col("bn_a") === col("bn_b") &&
          col("bs_a") === col("bs_b") && col("ck_a") < col("ck_b"))
      .select(col("ck_a"), col("ck_b")).distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(hashCand === strCand)
    assert(hashCand.contains((101L, 102L)) && hashCand.contains((104L, 105L)))
  }

  test("boundedPairs: result is partitioning-invariant") {
    val c = cust((1L, "n1", 1, "A", 1.0), (2L, "n2", 1, "A", 2.0),
      (3L, "n3", 1, "A", 3.0), (4L, "m4", 2, "A", 4.0))
    val a = Linkage.boundedPairs(c.repartition(1), 2).collect().toSet
    val b = Linkage.boundedPairs(c.repartition(5), 2).collect().toSet
    assert(a === b)
  }

  test("boundedRecallCensus: recall 1.0 measured; anchor subuniverse counted") {
    val c = cust(
      (2L, "acme corp", 1, "A", 1.0), (3L, "acme corp", 1, "A", 2.0),
      (4L, "acme c0rp", 1, "A", 3.0), (5L, "beta llc", 2, "B", 4.0),
      (6L, "beta llp", 2, "B", 5.0), (7L, "unrelated zz", 1, "A", 6.0))
    // n=6 -> mod = max(1, 6/3) = 2 with targetAnchors=3: anchors are
    // EVEN custkeys, so truth = pairs whose smaller key is even
    val cs = Linkage.boundedRecallCensus(c, 2, targetAnchors = 3).head()
    val truthAnchored = Linkage.blockedPairs(c, 2)
      .filter(col("cust_a") % 2 === 0).count()
    assert(cs.getAs[Long]("n_true") === truthAnchored)
    assert(cs.getAs[Long]("n_found") === truthAnchored)
    assert(cs.getAs[Long]("n_cand") >= cs.getAs[Long]("n_found"))
    assert(cs.getAs[Long]("recall_ppm") === 1000000L)
  }

  test("intervalOverlap: exact pairs, no duplicates across buckets, touching excluded") {
    import graft.operators.RangeJoin
    val B = 100L // bucket width
    val a = Seq((1L, 50L, 250L), (2L, 300L, 320L)).toDF("id", "s", "e")
    val b = Seq(
      (10L, 240L, 400L),  // overlaps a1 by [240,250) = 10, a2 fully (20)
      (11L, 250L, 260L),  // TOUCHES a1 at 250 — strict overlap excludes
      (12L, 0L, 60L))     // overlaps a1 by [50,60) = 10
      .toDF("id", "s", "e")
    val out = RangeJoin.intervalOverlap(a, b, B).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(x => (x._1, x._2))
    // a1 spans buckets 0-2 and b10 spans 2-4: they meet in bucket 2 ONLY
    // via the overlap-start rule — exactly one row despite shared buckets
    assert(out.toSeq === Seq((1L, 10L, 10L), (1L, 12L, 10L), (2L, 10L, 20L)))
    // physical plan: hash equi-join on the bucket, no cartesian/BNL
    val plan = RangeJoin.intervalOverlap(a, b, B).queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoop"),
      s"range join must decompose to an equi-join:\n$plan")
  }

  test("cdcChunkStats: exact duplicate halves distinct chunks; edits only reshape local chunks") {
    import graft.operators.Dedup
    // deterministic pseudo-random text, long enough for ~30 chunks
    // (seeded Random: aperiodic, so window hashes actually hit % 64 = 0 —
    // a short-period generator yields zero boundaries and one mega-chunk)
    val rnd = new scala.util.Random(42)
    val txt = Seq.fill(2000)(('a' + rnd.nextInt(26)).toChar).mkString
    val dup = Seq((1L, "s1", txt), (2L, "s1", txt)).toDF("doc_id", "source", "text")
    val d = Dedup.cdcChunkStats(dup).head()
    assert(d.getAs[Long]("n_chunks") === 2 * d.getAs[Long]("n_distinct"),
      "identical docs chunk identically")
    assert(d.getAs[Long]("dup_ppm") === 500000L)
    assert(d.getAs[Long]("saved_chars") === d.getAs[Long]("total_chars") / 2)
    // content-DEFINED boundaries: a single inserted char near the head
    // must leave the tail chunks shared (the whole point vs fixed blocks)
    val edited = txt.substring(0, 10) + "X" + txt.substring(10)
    val near = Seq((1L, "s1", txt), (2L, "s1", edited)).toDF("doc_id", "source", "text")
    val e = Dedup.cdcChunkStats(near).head()
    assert(e.getAs[Long]("dup_ppm") > 400000L,
      s"most chunks must survive a 1-char insert, got ${e.getAs[Long]("dup_ppm")} ppm")
  }
}
