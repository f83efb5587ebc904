package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, AttributeReference, BindReferences, Expression, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan}

/** Whole-operator custom Catalyst tier for the as-of join: a logical node,
  * a planner Strategy, and a sort-merge physical operator — the (c) tier
  * of the custom-operator preference order, demonstrated end-to-end.
  *
  * Semantics match [[graft.operators.AsOfJoin.asOf]] (for each left row,
  * the latest right row with ord <= left ord on the same key; null right
  * values are skipped, like `last(col, ignoreNulls=true)`), but the
  * physical plan is a direct sort-merge: each side shuffles ONCE on its
  * key and sorts by (key, ord); the merge walks both sorted streams with
  * O(1) state — no union of padded schemas, no window buffering, no
  * filter discarding half the rows. At 100 TB: one exchange per side,
  * streaming merge, AQE-skew-splittable.
  */
case class AsOfJoinPlan(left: LogicalPlan, right: LogicalPlan,
    leftKey: Expression, rightKey: Expression,
    leftOrd: Expression, rightOrd: Expression,
    rightVal: Expression, outAttr: AttributeReference) extends BinaryNode {
  override def output: Seq[Attribute] = left.output :+ outAttr
  override def producedAttributes: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(outAttr)
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinPlan =
    copy(left = newLeft, right = newRight)
}

object AsOfJoinStrategy extends org.apache.spark.sql.execution.SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case p: AsOfJoinPlan =>
      AsOfJoinExec(planLater(p.left), planLater(p.right), p.leftKey,
        p.rightKey, p.leftOrd, p.rightOrd, p.rightVal, p.outAttr) :: Nil
    case _ => Nil
  }
}

case class AsOfJoinExec(left: SparkPlan, right: SparkPlan,
    leftKey: Expression, rightKey: Expression,
    leftOrd: Expression, rightOrd: Expression,
    rightVal: Expression, outAttr: AttributeReference) extends BinaryExecNode {

  override def output: Seq[Attribute] = left.output :+ outAttr
  override def producedAttributes: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(outAttr)

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(Seq(leftKey)) :: ClusteredDistribution(Seq(rightKey)) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftOrd, Ascending)),
    Seq(SortOrder(rightKey, Ascending), SortOrder(rightOrd, Ascending)))

  override def outputOrdering: Seq[SortOrder] =
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftOrd, Ascending))

  override protected def doExecute(): RDD[InternalRow] = {
    val lKey = BindReferences.bindReference(leftKey, left.output)
    val lOrd = BindReferences.bindReference(leftOrd, left.output)
    val rKey = BindReferences.bindReference(rightKey, right.output)
    val rOrd = BindReferences.bindReference(rightOrd, right.output)
    val rVal = BindReferences.bindReference(rightVal, right.output)
    val keyOrdering = TypeUtils.getInterpretedOrdering(leftKey.dataType)
    val ordOrdering = TypeUtils.getInterpretedOrdering(leftOrd.dataType)
    val outAttrs = output
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val proj = UnsafeProjection.create(outAttrs, outAttrs)
      val valRow = new GenericInternalRow(1)
      val joined = new JoinedRow
      var lastKey: Any = null
      var lastVal: Any = null
      var hasLast = false
      var rRow: InternalRow = if (rIter.hasNext) rIter.next().copy() else null
      lIter.map { l =>
        val k = lKey.eval(l)
        val o = lOrd.eval(l)
        if (k == null || o == null) {
          // SQL join semantics: a null key/ord matches nothing — the left
          // row still flows through with a null carried value
          valRow.update(0, null)
        } else {
          // advance the right stream through every row at or before (k, o)
          var advance = rRow != null
          while (advance) {
            val rk = rKey.eval(rRow)
            val ro = if (rk == null) null else rOrd.eval(rRow)
            if (rk == null || ro == null) {
              // null-keyed right rows sort first (NULLS FIRST) and can
              // never match — skip them
              rRow = if (rIter.hasNext) rIter.next().copy() else null
              advance = rRow != null
            } else {
              val cmp = keyOrdering.compare(rk.asInstanceOf[AnyRef], k.asInstanceOf[AnyRef])
              val take = cmp < 0 || (cmp == 0 &&
                ordOrdering.compare(ro.asInstanceOf[AnyRef],
                  o.asInstanceOf[AnyRef]) <= 0)
              if (take) {
                val v = rVal.eval(rRow)
                if (v != null) { lastKey = rk; lastVal = v; hasLast = true }
                rRow = if (rIter.hasNext) rIter.next().copy() else null
                advance = rRow != null
              } else advance = false
            }
          }
          val visible = hasLast && keyOrdering.compare(
            lastKey.asInstanceOf[AnyRef], k.asInstanceOf[AnyRef]) == 0
          valRow.update(0, if (visible) lastVal else null)
        }
        proj(joined(l, valRow))
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)
}

object AsOfJoinExec {
  /** DataFrame-level entry point: plans through [[AsOfJoinPlan]] +
    * [[AsOfJoinStrategy]] (registered idempotently on the session's
    * experimental strategies; `GraftExtensions` also injects it).
    */
  def asOf(left: DataFrame, right: DataFrame, key: String, ord: String,
      valueCol: String, as: String): DataFrame = {
    val spark = left.sparkSession
    if (!spark.experimental.extraStrategies.contains(AsOfJoinStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ AsOfJoinStrategy
    // self-join safety: left and right may share attribute ids (both
    // derived from one source); re-alias the right side so every right
    // attribute gets a fresh exprId before the binary node is built
    val rightFresh = right.select(
      right.columns.map(c => right(c).as(c)).toIndexedSeq: _*)
    val lPlan = left.queryExecution.analyzed
    val rPlan = rightFresh.queryExecution.analyzed
    def attr(plan: LogicalPlan, name: String) =
      plan.output.find(_.name == name).getOrElse(
        throw new IllegalArgumentException(s"column $name not found"))
    val rv = attr(rPlan, valueCol)
    val node = AsOfJoinPlan(lPlan, rPlan,
      attr(lPlan, key), attr(rPlan, key),
      attr(lPlan, ord), attr(rPlan, ord),
      rv, AttributeReference(as, rv.dataType, nullable = true)())
    org.apache.spark.sql.graft.GraftSqlBridge.ofRows(spark, node)
  }
}
