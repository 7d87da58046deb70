package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.expressions.GraftBloom

/** Runtime join filters: cut the probe side of a big join down to
  * ~|matching keys| BEFORE its shuffle, the way Catalyst's own
  * `InjectRuntimeFilter` does for qualifying plans — exposed here as an
  * explicit operator so a pipeline can apply it when the optimizer's
  * heuristics don't fire (DSv2 sources, non-equi residuals, pre-bucketed
  * sinks).
  *
  * The scenario this exists for: the build side is too big to BROADCAST
  * as rows (so the join must shuffle both sides), but its key set fits a
  * bloom filter many orders of magnitude smaller — 100M keys at 3% fpp is
  * ~70 MB of bits vs many GB of rows. Prefiltering the probe side with
  * the bloom turns "shuffle 100 TB of lineitem" into "shuffle the ~1% of
  * lineitem whose orders qualify, plus fpp noise". False positives are
  * removed by the exact join that follows; false negatives cannot occur,
  * so results are identical by construction.
  */
object RuntimeFilter {

  /** Build a bloom over `keys`' single (bigint) column — a distributed
    * treeAggregate; only the filter's bits come back to the driver — and
    * return `fact` filtered to rows whose `factKey` might be in it.
    *
    * The filter is handed to [[graft.expressions.BloomMightContainExpr]]
    * as a driver-held reference object, NOT as a `lit(bytes)`: a
    * production-sized bloom (100M keys ≈ 70 MB) embedded as a Literal
    * would be re-hashed/compared/stringified by every analyzer and
    * optimizer pass and bloat every explain. With the reference object
    * the logical plan, codegen, and explain output are all independent
    * of the filter's bit width; the bits ride to executors once via the
    * task binary's referenced objects. (The `graft_bloom_might_contain`
    * SQL function keeps the literal doorway for SQL callers with small
    * sketches.) */
  def bloomPrefilter(fact: DataFrame, factKey: String, keys: DataFrame,
                     expectedItems: Long, fpp: Double): DataFrame = {
    val bf = keys.stat.bloomFilter(keys.columns.head, expectedItems, fpp)
    val bloom = GraftBloom(bf)
    import org.apache.spark.sql.GraftBridge
    import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
    fact.filter(GraftBridge.column(
      graft.expressions.BloomMightContainExpr(UnresolvedAttribute(factKey), bloom)))
  }
}
