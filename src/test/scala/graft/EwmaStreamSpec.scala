package graft

import org.apache.spark.sql.functions._

/** The streaming EWMA must agree with an in-memory reference fold, and the
  * final-snapshot selection must survive users split across micro-batches. */
class EwmaStreamSpec extends SparkSpec {

  test("stream_ewma final values equal the sequential fold per user") {
    val out = graft.streaming.EwmaStream.run(spark, sf).collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getDouble(2)))).toMap

    // reference: sequential fold over each user's events in (ts, event_id) order
    val evs = graft.queries.Staging.tbl(spark, sf, "events")
      .select(col("user_id"), unix_micros(col("ts")).as("us"), col("event_id"), col("value"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    val expected = evs.groupBy(_._1).map { case (u, rows) =>
      val vs = rows.sortBy(r => (r._2, r._3)).map(_._4)
      u -> (vs.length.toLong, vs.reduceLeft((a, x) => a / 2 + x / 2))
    }
    assert(out.keySet === expected.keySet)
    for ((u, (n, e)) <- expected) {
      assert(out(u)._1 === n, s"user $u event count")
      assert(out(u)._2 === e, s"user $u ewma must be bit-identical to the sequential fold")
    }
  }
}
