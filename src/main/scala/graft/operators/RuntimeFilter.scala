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
    * return `fact` filtered to rows whose `factKey` might be in it. The
    * filter rides the task binary via a reference object (see
    * [[graft.expressions.BloomMightContainExpr]]): plan size and codegen
    * are independent of the filter's bit width. */
  def bloomPrefilter(fact: DataFrame, factKey: String, keys: DataFrame,
                     expectedItems: Long, fpp: Double): DataFrame = {
    val bf = keys.stat.bloomFilter(keys.columns.head, expectedItems, fpp)
    val bloom = GraftBloom(bf)
    graft.expressions.GraftFunctions.register(fact.sparkSession)
    fact.filter(call_function("graft_bloom_might_contain", col(factKey), lit(bloom.bytes)))
  }
}
