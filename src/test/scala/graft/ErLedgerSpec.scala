package graft

import org.apache.spark.sql.functions._
import graft.etl.ErLedger
import graft.operators.Linkage

/** The incremental ER ledger (PK-bucketed history + label-forwarding
  * table + bucket-refreshed golden store) must equal the one-shot batch
  * recompute at EVERY batch boundary — including a batch that bridges
  * two existing clusters (retires a label from each side) and a
  * redelivered batch (replay must be a complete no-op). */
class ErLedgerSpec extends SparkSpec {
  import spark.implicits._

  private def cust(rows: (Long, String, Int, String, Double)*) =
    rows.toDF("c_custkey", "c_name", "c_nationkey", "c_mktsegment", "c_acctbal")

  private def stores() = {
    val base = java.nio.file.Files.createTempDirectory("erledger").toString
    (s"$base/hist", s"$base/fwd", s"$base/golden")
  }

  test("ledger golden store equals batch recompute at every boundary; bridging + replay") {
    val all = cust(
      (1L, "acme corp", 1, "A", 1.0), (2L, "acme corp", 1, "A", 2.0),
      (3L, "acme c0rp", 1, "A", 3.0), (4L, "acme c0rpX", 1, "A", 4.0),
      (5L, "beta llc", 2, "B", 5.0), (6L, "beta llp", 2, "B", 6.0),
      (7L, "gamma gmbh", 3, "C", 7.0)) // never matches: must stay out of golden
    val batches = Seq(Seq(1L, 2L, 5L), Seq(4L, 6L), Seq(3L)) // 3 bridges {1,2} and {4}
    val (hist, fwd, golden) = stores()
    var seen = all.limit(0)
    batches.zipWithIndex.foreach { case (ids, i) =>
      val b = all.filter(col("c_custkey").isin(ids: _*))
      ErLedger.foldBatch(b, i.toLong, hist, fwd, golden)
      seen = seen.unionByName(b).localCheckpoint()
      val expect = Linkage
        .goldenRecords(seen, Linkage.blockedPairs(seen, maxDist = 2))
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3)))
        .toSet
      val got = ErLedger.readGolden(spark, golden)
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3)))
        .toSet
      assert(got === expect, s"golden store diverged from batch recompute after batch $i")
      // the materialized map equals batch CC over all pairs so far
      val batchCc = graft.operators.Graph.connectedComponents(
        Linkage.blockedPairs(seen, maxDist = 2)
          .select(col("cust_a").as("src"), col("cust_b").as("dst")))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val gotMap = ErLedger.readFullMap(spark, fwd)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(gotMap === batchCc, s"materialized map diverged after batch $i")
    }
    // at-least-once redelivery: refolding the LAST batch is a no-op
    val before = ErLedger.readGolden(spark, golden).collect().toSet
    val fwdBefore = ErLedger.readFwd(spark, fwd).collect().toSet
    ErLedger.foldBatch(all.filter(col("c_custkey").isin(3L)), 2L, hist, fwd, golden)
    assert(ErLedger.readGolden(spark, golden).collect().toSet === before)
    assert(ErLedger.readFwd(spark, fwd).collect().toSet === fwdBefore)
  }

  test("stored-index tier (forced crossover): golden equals batch recompute; backfill + replay") {
    // graft.er.minhist=2 forces the fold across the tier boundary mid-
    // ingest: batch 0 folds exhaustively (empty history), batches 1-2
    // run the stored-index tier — batch 1 must BACKFILL batch 0's _vars
    // partition (written before the ingest crossed), batch 2 finds the
    // store complete and appends only its own rows. Golden equality at
    // every boundary proves tier-switching changes nothing; it also
    // proves the underscore-prefixed _vars dir stays invisible to the
    // history reads (a leak would corrupt the recompute equality).
    val all = cust(
      (1L, "acme corp", 1, "A", 1.0), (2L, "acme corp", 1, "A", 2.0),
      (3L, "acme c0rp", 1, "A", 3.0), (4L, "acme c0rpX", 1, "A", 4.0),
      (5L, "beta llc", 2, "B", 5.0), (6L, "beta llp", 2, "B", 6.0),
      (7L, "gamma gmbh", 3, "C", 7.0))
    val batches = Seq(Seq(1L, 2L, 5L), Seq(4L, 6L), Seq(3L))
    val (hist, fwd, golden) = stores()
    sys.props("graft.er.minhist") = "2"
    try {
      var seen = all.limit(0)
      batches.zipWithIndex.foreach { case (ids, i) =>
        val b = all.filter(col("c_custkey").isin(ids: _*))
        ErLedger.foldBatch(b, i.toLong, hist, fwd, golden)
        seen = seen.unionByName(b).localCheckpoint()
        val expect = Linkage
          .goldenRecords(seen, Linkage.blockedPairs(seen, maxDist = 2))
          .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3)))
          .toSet
        val got = ErLedger.readGolden(spark, golden)
          .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3)))
          .toSet
        assert(got === expect, s"golden diverged from batch recompute after indexed batch $i")
      }
      // every batch's _vars partition exists: 0 backfilled by batch 1's
      // crossing fold, 1 and 2 written by their own folds
      (0 to 2).foreach { i =>
        assert(new java.io.File(s"$hist/_vars/ingest_batch=$i").exists(),
          s"_vars partition for batch $i missing")
      }
      // at-least-once redelivery in the indexed regime is still a no-op
      val before = ErLedger.readGolden(spark, golden).collect().toSet
      val fwdBefore = ErLedger.readFwd(spark, fwd).collect().toSet
      ErLedger.foldBatch(all.filter(col("c_custkey").isin(3L)), 2L, hist, fwd, golden)
      assert(ErLedger.readGolden(spark, golden).collect().toSet === before)
      assert(ErLedger.readFwd(spark, fwd).collect().toSet === fwdBefore)
    } finally sys.props -= "graft.er.minhist"
  }

  test("pkBucketLocal matches the Column pkBucket for any long id") {
    // a mismatch would silently corrupt the copy-on-write bucket
    // selection (wrong buckets read/swapped), so pin exact parity
    val ids = (Seq(0L, 1L, -1L, Long.MaxValue, Long.MinValue, 42L) ++
      (1 to 200).map(i => i * 982451653L - 7)).toDF("id")
    val viaColumn = ids.select(col("id"), ErLedger.pkBucket(col("id")).as("b"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    viaColumn.foreach { case (id, b) =>
      assert(ErLedger.pkBucketLocal(id) === b, s"bucket mismatch for id=$id")
    }
  }

  test("compactHistory folds batch dirs; subsequent folds match the uncompacted twin") {
    val all = cust(
      (1L, "acme corp", 1, "A", 1.0), (2L, "acme corp", 1, "A", 2.0),
      (3L, "acme c0rp", 1, "A", 3.0), (5L, "beta llc", 2, "B", 5.0),
      (6L, "beta llp", 2, "B", 6.0), (7L, "gamma gmbh", 3, "C", 7.0))
    val batches = Seq(Seq(1L, 5L), Seq(2L, 6L), Seq(3L, 7L))
    val (h1, f1, g1) = stores()
    val (h2, f2, g2) = stores()
    // fold batches 0-1 into both ledgers, compact only the first
    batches.take(2).zipWithIndex.foreach { case (ids, i) =>
      val b = all.filter(col("c_custkey").isin(ids: _*))
      ErLedger.foldBatch(b, i.toLong, h1, f1, g1)
      ErLedger.foldBatch(b, i.toLong, h2, f2, g2)
    }
    ErLedger.compactHistory(spark, h1, upTo = 1L)
    val dirs = new java.io.File(h1).listFiles()
      .filter(_.getName.startsWith("ingest_batch=")).map(_.getName).toSet
    assert(dirs === Set("ingest_batch=1"), s"expected one consolidated dir, got $dirs")
    // batch 2 folds identically over compacted and uncompacted history
    val b2 = all.filter(col("c_custkey").isin(batches(2): _*))
    ErLedger.foldBatch(b2, 2L, h1, f1, g1)
    ErLedger.foldBatch(b2, 2L, h2, f2, g2)
    assert(ErLedger.readGolden(spark, g1).collect().toSet ===
      ErLedger.readGolden(spark, g2).collect().toSet)
    assert(ErLedger.readFullMap(spark, f1).collect().toSet ===
      ErLedger.readFullMap(spark, f2).collect().toSet)
    // compaction preserved every history row
    val r1 = spark.read.option("basePath", h1).parquet(h1)
      .select("c_custkey").collect().map(_.getLong(0)).toSet
    assert(r1 === Set(1L, 2L, 3L, 5L, 6L, 7L))
  }

  test("fwd table stays single-hop and touched-scale; golden buckets prune") {
    // 1~2~3 merge stepwise: after all batches every retired label must
    // resolve to the final min label in ONE hop (no chain walk)
    val all = cust(
      (9L, "acme corp", 1, "A", 9.0), (8L, "acme corp", 1, "A", 8.0),
      (7L, "acme c0rp", 1, "A", 7.0))
    val (hist, fwd, golden) = stores()
    ErLedger.foldBatch(all.filter(col("c_custkey").isin(9L)), 0L, hist, fwd, golden)
    ErLedger.foldBatch(all.filter(col("c_custkey").isin(8L)), 1L, hist, fwd, golden)
    ErLedger.foldBatch(all.filter(col("c_custkey").isin(7L)), 2L, hist, fwd, golden)
    val f = ErLedger.readFwd(spark, fwd).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(f === Map(9L -> 7L, 8L -> 7L), "fwd must be compacted to current labels")
    val g = ErLedger.readGolden(spark, golden).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    assert(g === Set((7L, 3L)))
    // the golden store holds exactly one bucket dir (one live cluster):
    // retired-label buckets were dropped, untouched buckets never created
    val dirs = new java.io.File(golden).listFiles()
      .filter(_.getName.startsWith("g_bucket=")).map(_.getName).toSet
    assert(dirs.size === 1, s"expected exactly one live golden bucket, got $dirs")
  }
}
