package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, AttributeSet, BoundReference, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.codegen.GenerateOrdering
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}

/** Sort-merge as-of join. Each side is hash-clustered by its key (one
  * shuffle each — EnsureRequirements inserts the exchanges and sorts from
  * the declared requirements, and AQE still re-plans those exchanges) and
  * sorted by (key, ts[, tie]); a single forward merge pass per partition
  * then carries the latest right row per key. Compared to the composed
  * union+window form this never widens left rows to the union schema,
  * never emits right rows through the window, and needs no
  * filter-back-to-left step — the merge is O(|L| + |R|) with two small
  * row copies per right row as the only allocation.
  *
  * Null grouping matches the window formulation: null keys cluster
  * together, null ts sorts first (so a null-ts left row can only match a
  * null-ts right row of the same key). */
case class AsOfJoinExec(
    leftKey: Attribute,
    leftTs: Attribute,
    rightKey: Attribute,
    rightTs: Attribute,
    rightTie: Attribute,
    matched: Seq[Attribute],
    matchedOut: Seq[Attribute],
    toleranceUs: Option[Long],
    left: SparkPlan,
    right: SparkPlan)
  extends BinaryExecNode {

  // the tolerance gap is computed on raw microsecond values
  require(toleranceUs.isEmpty ||
    leftTs.dataType == org.apache.spark.sql.types.TimestampType,
    "as-of tolerance requires timestamp event-time columns")

  override def output: Seq[Attribute] = left.output ++ matchedOut

  override def producedAttributes: AttributeSet = AttributeSet(matchedOut)

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKey :: Nil) :: ClusteredDistribution(rightKey :: Nil) :: Nil

  private def leftOrdering: Seq[SortOrder] =
    SortOrder(leftKey, Ascending) :: SortOrder(leftTs, Ascending) :: Nil

  // tie is in the right sort so the merge's "last consumed" row is the
  // max-tie row among equal timestamps — the deterministic tie rule
  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    leftOrdering,
    SortOrder(rightKey, Ascending) :: SortOrder(rightTs, Ascending) ::
      SortOrder(rightTie, Ascending) :: Nil)

  override def outputPartitioning: Partitioning = left.outputPartitioning

  override def outputOrdering: Seq[SortOrder] = leftOrdering

  protected override def doExecute(): RDD[InternalRow] = {
    val lOut = left.output
    val rOut = right.output
    val lKey = leftKey; val lTs = leftTs
    val rKey = rightKey; val rTs = rightTs
    val m = matched; val mOut = matchedOut
    val out = output
    val tol = toleranceUs.getOrElse(-1L) // -1 = unbounded lookback
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val lPairProj = UnsafeProjection.create(Seq(lKey, lTs), lOut)
      val rPairProj = UnsafeProjection.create(Seq(rKey, rTs), rOut)
      val lKeyProj = UnsafeProjection.create(Seq(lKey), lOut)
      val rKeyProj = UnsafeProjection.create(Seq(rKey), rOut)
      val rMatchProj = UnsafeProjection.create(m, rOut)
      // codegen'd comparators (same null-first ascending semantics the
      // required child ordering sorts by)
      val pairOrd = GenerateOrdering.generate(Seq(
        SortOrder(BoundReference(0, lKey.dataType, nullable = true), Ascending),
        SortOrder(BoundReference(1, lTs.dataType, nullable = true), Ascending)))
      val keyOrd = GenerateOrdering.generate(Seq(
        SortOrder(BoundReference(0, lKey.dataType, nullable = true), Ascending)))
      val resultProj = UnsafeProjection.create(out, lOut ++ mOut)
      val joined = new JoinedRow
      val nullMatch = new GenericInternalRow(m.size)
      val tolUs = tol
      val rBuf = rIter.buffered
      // latest right row consumed, valid only while its key equals the
      // current left key; copied because unsafe rows are reused
      var lastKey: UnsafeRow = null
      var lastMatch: UnsafeRow = null
      var lastTs = 0L
      var lastTsSet = false
      lIter.map { l =>
        val lp = lPairProj(l)
        while (rBuf.hasNext && pairOrd.compare(rPairProj(rBuf.head), lp) <= 0) {
          val r = rBuf.next()
          val rp = rPairProj(r)
          lastTsSet = !rp.isNullAt(1)
          if (lastTsSet) lastTs = rp.getLong(1)
          lastKey = rKeyProj(r).copy()
          lastMatch = rMatchProj(r).copy()
        }
        var useMatch = lastKey != null && keyOrd.compare(lastKey, lKeyProj(l)) == 0
        if (useMatch && tolUs >= 0L)
          // a match farther back than the tolerance is no match — and no
          // older right row could be closer, so null is correct
          useMatch = lastTsSet && !lp.isNullAt(1) && lp.getLong(1) - lastTs <= tolUs
        resultProj(joined(l, if (useMatch) lastMatch else nullMatch))
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)
}

/** Plans [[AsOfJoinPlan]] as [[AsOfJoinExec]]; everything under the node
  * is handed back to the planner via planLater. */
class AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case j: AsOfJoinPlan =>
      AsOfJoinExec(j.leftKey, j.leftTs, j.rightKey, j.rightTs, j.rightTie,
        j.matched, j.matchedOut, j.toleranceUs,
        planLater(j.left), planLater(j.right)) :: Nil
    case _ => Nil
  }
}
