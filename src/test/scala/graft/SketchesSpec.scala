package graft

import org.apache.spark.sql.functions._
import graft.expressions.{GraftCms, GraftCmsHash}
import graft.operators.Sketches

/** Count-Min sketch aggregate + the sketch-prefiltered exact heavy
  * hitters built on it. */
class SketchesSpec extends SparkSpec {
  import spark.implicits._

  // skewed toy corpus: key 1 x 50, key 2 x 20, keys 100..139 x 1
  private lazy val skewed =
    (Seq.fill(50)(1L) ++ Seq.fill(20)(2L) ++ (100L until 140L)).toDF("k")

  private def sketchOf(df: org.apache.spark.sql.DataFrame, depth: Int, width: Int): GraftCms =
    new GraftCms(df
      .agg(call_function("graft_cms_sketch", col("k"), lit(depth), lit(width)))
      .head().getAs[Array[Byte]](0))

  test("cms estimates: exact on a wide sketch, never undercounts on a narrow one") {
    val wide = sketchOf(skewed, 4, 1 << 12)
    assert(wide.estimate(1L) === 50L)
    assert(wide.estimate(2L) === 20L)
    assert(wide.estimate(100L) === 1L)
    assert(wide.estimate(999L) === 0L) // unseen key, no collision at this width
    // width 16 forces collisions among 42 keys: estimates may inflate
    // but can never fall below the true count
    val narrow = sketchOf(skewed, 2, 16)
    assert(narrow.estimate(1L) >= 50L)
    assert(narrow.estimate(2L) >= 20L)
    (100L until 140L).foreach(k => assert(narrow.estimate(k) >= 1L))
  }

  test("sketch is partition-invariant (merge is a vector add)") {
    val a = sketchOf(skewed.repartition(1), 4, 256)
    val b = sketchOf(skewed.repartition(7, col("k")), 4, 256)
    val c = sketchOf(skewed.repartition(13), 4, 256)
    assert(a.bytes.sameElements(b.bytes) && b.bytes.sameElements(c.bytes))
  }

  test("heavyHitters is exact even when the sketch itself collides") {
    // narrow sketch -> candidate set may include false positives; the
    // exact tier must still produce precisely the true heavy hitters
    val got = Sketches.heavyHitters(skewed, "k", threshold = 20L, depth = 2, width = 16)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(1L -> 50L, 2L -> 20L))
  }

  test("plan size is independent of sketch bytes (reference object, not lit)") {
    // a production-sized bloom: 8M expected keys at 3% fpp ~ 7 MB of bits
    val keys = Seq(1L, 2L, 3L).toDF("o_orderkey")
    val fact = (1L to 100L).toDF("l_orderkey")
    val filtered = graft.operators.RuntimeFilter.bloomPrefilter(
      fact, "l_orderkey", keys, expectedItems = 8_000_000L, fpp = 0.03)
    // correctness: all true keys survive (no false negatives by construction)
    val got = filtered.collect().map(_.getLong(0)).toSet
    assert(Set(1L, 2L, 3L).subsetOf(got))
    // the 7 MB of filter bits must NOT appear in the logical plan as a
    // Literal the analyzer re-hashes each pass
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.types.BinaryType
    val binLits = filtered.queryExecution.optimizedPlan.expressions.flatMap(_.collect {
      case l @ Literal(_, BinaryType) => l
    })
    assert(binLits.isEmpty, s"binary literal leaked into the plan: ${binLits.size}")
    val explain = filtered.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("extended"))
    assert(explain.length < 20000,
      s"explain output should be sketch-size independent, got ${explain.length} chars")
    // same property for the CMS lookup path
    val hh = Sketches.heavyHitters(skewed, "k", threshold = 20L, depth = 4, width = 1 << 16)
    val hhLits = hh.queryExecution.optimizedPlan.expressions.flatMap(_.collect {
      case l @ Literal(_, BinaryType) => l
    })
    assert(hhLits.isEmpty, "cms bytes leaked into the plan as a literal")
  }

  test("CMS merge is the vector-add identity: merged batch sketches == one-shot sketch") {
    val parts = Seq(
      skewed.filter(col("k") < 2),
      skewed.filter(col("k") >= 2 && col("k") < 110),
      skewed.filter(col("k") >= 110))
    val merged = parts.map(p => sketchOf(p, 4, 256).bytes)
      .reduce(graft.expressions.GraftCms.merge)
    val oneShot = sketchOf(skewed, 4, 256).bytes
    assert(merged.sameElements(oneShot))
    // shape mismatch fails loudly instead of mis-merging
    intercept[IllegalArgumentException] {
      graft.expressions.GraftCms.merge(oneShot, sketchOf(skewed, 2, 256).bytes)
    }
  }

  test("heavyHitters equals plain groupBy/having on events") {
    val e = graft.queries.Staging.tbl(spark, sf, "events")
    val expected = e.groupBy("user_id").agg(count(lit(1)).as("n"))
      .filter(col("n") >= 80).orderBy("user_id").collect()
    val got = Sketches.heavyHitters(e, "user_id", 80L).orderBy("user_id").collect()
    assert(got.length === expected.length && got.sameElements(expected))
    assert(expected.nonEmpty, "threshold should catch some keys at sf0.001")
  }

  test("kmv values sketch is partition-invariant and bounded by k") {
    graft.expressions.GraftFunctions.register(spark)
    val df = (1L to 5000L).toDF("id")
      .withColumn("hv", graft.functions.CrossFns.scrambledHash(col("id").cast("string")))
    def sketch(parts: Int): Seq[Long] = df.repartition(parts)
      .agg(call_function("graft_kmv_values", col("hv"), lit(64)))
      .head().getSeq[Long](0)
    val s1 = sketch(1)
    assert(s1.length === 64)
    assert(s1 === s1.sorted)
    assert(sketch(7) === s1, "merge order must not change the sketch")
    // and it really is the 64 smallest distinct hashes
    val truth = df.select("hv").distinct().orderBy("hv").limit(64)
      .collect().map(_.getLong(0)).toSeq
    assert(s1 === truth)
  }

  test("kmv overlap estimates land near the exact intersections") {
    val out = graft.queries.ExtQueries.all("sketch_kmv_overlap")(spark, sf).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val est = r.getAs[Double]("est_inter")
      val exact = r.getAs[Long]("exact_inter").toDouble
      // k=64 theta sketch: expect the estimate within a factor ~2 of
      // truth for populations of this size (hundreds of users per type)
      assert(est >= exact * 0.5 && est <= exact * 2.0,
        s"${r.getAs[String]("type_a")}x${r.getAs[String]("type_b")}: est $est vs exact $exact")
    }
  }
}
