package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Manual skew mitigation for shuffle equi-joins: salt the skewed (big)
  * side with a deterministic per-row salt, replicate the small side across
  * all salt values, join on (key, salt). Results are identical to the
  * unsalted join — only the shuffle distribution changes: a hot key's rows
  * spread over `nsalt` reducers instead of one.
  *
  * AQE's skew-join handling (spark.sql.adaptive.skewJoin) covers the
  * sort-merge case automatically at runtime; this explicit form is for
  * plans AQE can't split (e.g. a skewed aggregate feeding a join) and as
  * the documented fallback knob. Salt is derived from a stable row column,
  * never rand(), so the plan stays deterministic and retry-safe.
  */
object SkewJoin {

  /** @param saltSrc stable numeric column on `big` to derive the salt from.
    *   A null saltSrc lands in salt bucket 0 (coalesce) — the row still
    *   joins exactly as in the unsalted join instead of silently dropping. */
  def saltedInnerJoin(big: DataFrame, small: DataFrame, key: String,
      saltSrc: Column, nsalt: Int): DataFrame = {
    val salted = big.withColumn("_salt",
      coalesce(pmod(saltSrc, lit(nsalt)).cast("int"), lit(0)))
    val replicated = small.withColumn("_salt",
      explode(sequence(lit(0), lit(nsalt - 1)).cast("array<int>")))
    salted.join(replicated, Seq(key, "_salt")).drop("_salt")
  }
}
