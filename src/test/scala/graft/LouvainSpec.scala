package graft

import org.apache.spark.sql.functions._
import graft.operators.Graph

/** Louvain local moves must recover planted communities, beat LPA's
  * modularity on hub graphs (the operator's reason to exist), converge
  * to a parity-certified fixpoint, and compose across contraction
  * levels. */
class LouvainSpec extends SparkSpec {
  import spark.implicits._

  private def edgesDf(es: (Long, Long)*) =
    es.toDF("src", "dst")

  private def q(edges: org.apache.spark.sql.DataFrame,
      comm: org.apache.spark.sql.DataFrame): Double = {
    val rows = Graph.modularityCensus(edges, comm).collect()
    rows.map(r => r.getAs[Long]("q_num").toDouble / r.getAs[Long]("q_den")).sum
  }

  test("louvainMoves: two cliques joined by one bridge split exactly") {
    val k4a = for (a <- 1L to 4L; b <- (a + 1) to 4L) yield (a, b)
    val k4b = for (a <- 11L to 14L; b <- (a + 1) to 14L) yield (a, b)
    val g = edgesDf(k4a ++ k4b :+ (4L -> 11L): _*)
    val comm = Graph.louvainMovesFull(g).collect()
      .map(r => r.getAs[Long]("node") -> r.getAs[Long]("community")).toMap
    assert(comm.filterKeys(_ <= 4L).values.toSet.size === 1, s"clique A split: $comm")
    assert(comm.filterKeys(_ >= 11L).values.toSet.size === 1, s"clique B split: $comm")
    assert(comm(1L) !== comm(11L), s"cliques merged: $comm")
    assert(comm(1L) === 1L && comm(11L) === 11L, "community ids must be min members")
  }

  test("louvain beats LPA modularity on a hub graph LPA over-merges") {
    // two K5s, each clique member also tied to one shared hub: LPA's
    // plurality floods the hub label across both cliques in synchronous
    // rounds; Louvain's DeltaQ move keeps the cliques apart.
    val k5a = for (a <- 1L to 5L; b <- (a + 1) to 5L) yield (a, b)
    val k5b = for (a <- 11L to 15L; b <- (a + 1) to 15L) yield (a, b)
    val hub = (1L to 5L).map(n => (n, 50L)) ++ (11L to 15L).map(n => (n, 50L))
    val g = edgesDf((k5a ++ k5b ++ hub).distinct: _*).localCheckpoint()
    val lou = Graph.louvainMovesFull(g)
    val lpa = Graph.labelPropagation(g, 3)
    val qLou = q(g, lou)
    val qLpa = q(g, lpa)
    assert(qLou >= qLpa,
      s"louvain Q=$qLou must be >= LPA Q=$qLpa on the hub fixture")
    val comm = lou.collect()
      .map(r => r.getAs[Long]("node") -> r.getAs[Long]("community")).toMap
    assert(comm(1L) !== comm(11L), s"louvain merged the cliques: $comm")
  }

  test("fixed-round form reaches the full form's fixpoint and stays there") {
    val k4a = for (a <- 1L to 4L; b <- (a + 1) to 4L) yield (a, b)
    val k4b = for (a <- 11L to 14L; b <- (a + 1) to 14L) yield (a, b)
    val g = edgesDf(k4a ++ k4b :+ (4L -> 11L): _*).localCheckpoint()
    val full = Graph.louvainMovesFull(g).collect().toSet
    // rounds past the fixpoint are no-ops: any generous pinned unroll
    // equals the converged result (the oracle contract)
    assert(Graph.louvainMoves(g, 12).collect().toSet === full)
    assert(Graph.louvainMoves(g, 20).collect().toSet === full)
  }

  test("multi-level louvain contracts and still splits planted structure") {
    // ring of 4 cliques, consecutive cliques bridged once: level-1
    // moves find the cliques; contraction must not merge them all
    val cliques = (0L until 4L).flatMap { c =>
      val base = c * 10 + 1
      for (a <- base to base + 3; b <- (a + 1) to base + 3) yield (a, b)
    }
    val bridges = (0L until 4L).map { c =>
      (c * 10 + 4, ((c + 1) % 4) * 10 + 1)
    }.map { case (a, b) => (math.min(a, b), math.max(a, b)) }
    val g = edgesDf((cliques ++ bridges).distinct: _*).localCheckpoint()
    val comm = Graph.louvain(g).collect()
      .map(r => r.getAs[Long]("node") -> r.getAs[Long]("community")).toMap
    // every clique intact
    for (c <- 0L until 4L) {
      val ids = (c * 10 + 1 to c * 10 + 4).map(comm).toSet
      assert(ids.size === 1, s"clique $c split: $comm")
    }
    assert(comm.values.toSet.size >= 2, s"all cliques merged: $comm")
    // multi-level Q never below single-level Q (levels only accept merges)
    assert(q(g, Graph.louvain(g)) >= q(g, Graph.louvainMovesFull(g)) - 1e-12)
  }

  test("catalog ladder: louvain Q beats LPA Q on the thresholded co-part graph") {
    // the graph_louvain / graph_modularity keys share this graph — the
    // operator's reason to exist is a better partition on it
    val li = graft.queries.Staging.tbl(spark, sf, "lineitem")
    val g = Graph.coPartEdgesMin(li, 2L).localCheckpoint()
    val qLou = q(g, Graph.louvainMoves(g, 6))
    val qLpa = q(g, Graph.labelPropagation(g, 3)
      .select(col("node"), col("community")))
    assert(qLou >= qLpa, s"catalog louvain Q=$qLou < LPA Q=$qLpa")
  }

  test("randomWalks: every hop follows an edge, counts exact, bit-deterministic") {
    val es = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L), (1L, 3L))
    val g = edgesDf(es: _*)
    val adj = (es ++ es.map(_.swap)).groupBy(_._1).map { case (k, v) => k -> v.map(_._2).toSet }
    val rows = Graph.randomWalks(g, walksPerNode = 3, steps = 5).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // 4 nodes x 3 walks x 6 positions
    assert(rows.length === 4 * 3 * 6)
    val byWalk = rows.groupBy(t => (t._1, t._2)).values
    byWalk.foreach { w =>
      val seq = w.sortBy(_._3).map(_._4).toList
      assert(seq.head === w.head._1, "walk must start at its start node")
      seq.sliding(2).foreach { case List(a, b) =>
        assert(adj(a).contains(b), s"hop $a->$b is not an edge (walk $seq)")
      }
    }
    // rerun under a different partitioning: bit-identical corpus
    val again = Graph.randomWalks(g.repartition(7), 3, 5).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(again.toSet === rows.toSet)
  }

  test("louvainMoves is partitioning-invariant") {
    val k4a = for (a <- 1L to 4L; b <- (a + 1) to 4L) yield (a, b)
    val k4b = for (a <- 11L to 14L; b <- (a + 1) to 14L) yield (a, b)
    val es = k4a ++ k4b :+ (4L -> 11L)
    val g1 = edgesDf(es: _*).repartition(1)
    val g7 = edgesDf(scala.util.Random.shuffle(es): _*).repartition(7)
    assert(Graph.louvainMoves(g1, 8).collect().toSet ===
      Graph.louvainMoves(g7, 8).collect().toSet)
  }
}
