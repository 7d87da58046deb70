package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeSet}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule

/** Logical as-of join: for each left row, the closest right row within
  * the same key, where "closest" depends on `direction`:
  *
  *  - `backward` (default): most recent right with `right.ts <= left.ts`
  *    (right rows AT the probe time match; among equal-ts right rows the
  *    largest `rightTie` wins — the same tie rule as the composed
  *    [[graft.operators.AsOfJoin]] and its DuckDB oracle).
  *  - `forward`: earliest right with `right.ts >= left.ts`; among
  *    equal-ts right rows the smallest `rightTie` wins.
  *  - `nearest`: whichever of the backward/forward candidates has the
  *    smaller |right.ts - left.ts|; an exact tie prefers backward (the
  *    pandas `merge_asof` rule). A candidate with a null ts loses to a
  *    timestamped one.
  *
  * This is the whole-operator tier of the custom-operator ladder — a
  * first-class plan node instead of the union+window composition — so the
  * planner can pick a dedicated sort-merge physical operator
  * ([[AsOfJoinExec]]) that shuffles each side once by key and never
  * materializes right rows as output rows. The node is built
  * pre-resolved (attributes taken from the children's analyzed plans),
  * so no analyzer rule is needed; [[PruneAsOfJoin]] restores the column
  * pruning Catalyst can't do through a node it doesn't know.
  *
  * @param matched    right-side attributes carried to output (ts, tie,
  *                   payload...), in `right.output` terms
  * @param matchedOut pre-allocated nullable output attributes for
  *                   `matched` — constructor-carried so exprIds stay
  *                   stable across tree copies
  */
case class AsOfJoinPlan(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKey: Attribute,
    leftTs: Attribute,
    rightKey: Attribute,
    rightTs: Attribute,
    rightTie: Attribute,
    matched: Seq[Attribute],
    matchedOut: Seq[Attribute],
    toleranceUs: Option[Long] = None,
    direction: String = "backward")
  extends BinaryNode {

  // mismatched types would silently mis-compare in the merge's codegen'd
  // pair comparator (bound to the LEFT side's types) — fail loudly instead
  require(leftKey.dataType == rightKey.dataType,
    s"as-of key types differ: ${leftKey.dataType} vs ${rightKey.dataType}")
  require(leftTs.dataType == rightTs.dataType,
    s"as-of event-time types differ: ${leftTs.dataType} vs ${rightTs.dataType}")
  require(Set("backward", "forward", "nearest")(direction),
    s"as-of direction must be backward|forward|nearest, got $direction")
  require(toleranceUs.isEmpty || {
    import org.apache.spark.sql.types.{LongType, TimestampType}
    leftTs.dataType == TimestampType || leftTs.dataType == LongType
  }, "as-of tolerance requires timestamp or long event-time columns " +
    s"(both sides), got ${leftTs.dataType}")

  override def output: Seq[Attribute] = left.output ++ matchedOut

  // matchedOut is minted here, not read from the children — without this
  // CheckAnalysis would flag the fresh attrs as missing inputs
  override def producedAttributes: AttributeSet = AttributeSet(matchedOut)

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinPlan =
    copy(left = newLeft, right = newRight)
}

/** Column pruning through [[AsOfJoinPlan]]: Catalyst's ColumnPruning rule
  * only understands built-in nodes, so without this a custom as-of join
  * forces both scans to read every column. When a Project sits on top of
  * the join, narrow each child to what the projection + the join itself
  * (keys, ts, tie, still-wanted matched columns) actually reference, and
  * drop matched columns nobody reads. Runs in the operator-optimization
  * fixed point (injected via
  * [[graft.expressions.GraftExtensions]]), so the inserted child Projects
  * are themselves pushed into the parquet scans. */
object PruneAsOfJoin extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case p @ Project(_, j: AsOfJoinPlan) =>
      val keep = (j.matched zip j.matchedOut).filter { case (_, out) => p.references.contains(out) }
      val needL = j.left.output.filter(a =>
        p.references.contains(a) || a.semanticEquals(j.leftKey) || a.semanticEquals(j.leftTs))
      val rightNeed = AttributeSet(j.rightKey +: j.rightTs +: j.rightTie +: keep.map(_._1))
      val needR = j.right.output.filter(rightNeed.contains)
      val shrinks = needL.size < j.left.output.size ||
        needR.size < j.right.output.size || keep.size < j.matched.size
      if (!shrinks) p
      else {
        val newLeft = if (needL.size < j.left.output.size) Project(needL, j.left) else j.left
        val newRight = if (needR.size < j.right.output.size) Project(needR, j.right) else j.right
        p.copy(child = j.copy(left = newLeft, right = newRight,
          matched = keep.map(_._1), matchedOut = keep.map(_._2)))
      }
  }
}
