package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan}

/** AS-OF JOIN — the time-series operator Spark genuinely lacks (pandas
  * `merge_asof`, kdb `aj`, DuckDB `ASOF JOIN`; the reference's "latest
  * embedding/state at query time" shape): for every left row, attach the
  * single right row with the LARGEST right-time <= left-time within the
  * same key, or nulls when none exists.
  *
  * Spark users emulate this with union-tagging + a window or a range join
  * that explodes candidate pairs; the right physical shape is a
  * SORT-MERGE with a single forward pass: co-partition both sides on the
  * key (declared via ClusteredDistribution, so EnsureRequirements plans
  * the exchanges), sort each partition by (key, time) (declared via
  * requiredChildOrdering), then zip partitions keeping one candidate
  * right row and the last match per key — O(n+m) per partition, no
  * candidate blowup, no window state. This is the §4(c) extension stack
  * applied to a genuinely missing operator (compare TopKPerGroup, which
  * subsumes a builtin): logical node + strategy + exec, driven through
  * the public `AsOfJoin.asof` helper.
  *
  * Contract: key expression types must match pairwise, time expressions
  * must share one orderable type, and the two sides' column names (and
  * attribute ids) must be disjoint — rename right-side columns with
  * `.as(...)` before joining (fresh exprIds), as any self-join derivation
  * requires. Right-side ties on (key, time) are broken arbitrarily —
  * pre-aggregate the right side to one row per (key, time) for
  * deterministic output, exactly as DuckDB ASOF JOIN users must.
  */
case class AsOfJoinPlan(
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTime: Expression,
    rightTime: Expression,
    left: LogicalPlan,
    right: LogicalPlan) extends BinaryNode {
  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinPlan =
    copy(left = newLeft, right = newRight)
}

object AsOfJoinStrategy extends org.apache.spark.sql.execution.SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinPlan(lk, rk, lt, rt, l, r) =>
      AsOfJoinExec(lk, rk, lt, rt, planLater(l), planLater(r)) :: Nil
    case _ => Nil
  }
}

case class AsOfJoinExec(
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTime: Expression,
    rightTime: Expression,
    left: SparkPlan,
    right: SparkPlan) extends BinaryExecNode {

  require(leftKeys.nonEmpty, "as-of join requires at least one key")
  require(leftKeys.map(_.dataType) == rightKeys.map(_.dataType),
    "as-of join key types must match pairwise")
  require(leftTime.dataType == rightTime.dataType,
    "as-of join time types must match")

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override def requiredChildDistribution: Seq[Distribution] =
    Seq(ClusteredDistribution(leftKeys), ClusteredDistribution(rightKeys))

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    leftKeys.map(SortOrder(_, Ascending)) :+ SortOrder(leftTime, Ascending),
    rightKeys.map(SortOrder(_, Ascending)) :+ SortOrder(rightTime, Ascending))

  override def outputPartitioning = left.outputPartitioning

  override protected def doExecute(): RDD[InternalRow] = {
    val lLeftKeys = leftKeys; val lRightKeys = rightKeys
    val lLeftTime = leftTime; val lRightTime = rightTime
    val lLeftOutput = left.output; val lRightOutput = right.output
    val lOutput = output
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val lKeyProj = UnsafeProjection.create(lLeftKeys, lLeftOutput)
      val rKeyProj = UnsafeProjection.create(lRightKeys, lRightOutput)
      val keyOrd = RowOrdering.createNaturalAscendingOrdering(lLeftKeys.map(_.dataType))
      val timeOrd = TypeUtils.getInterpretedOrdering(lLeftTime.dataType)
      val lTimeEval = BindReferences.bindReference(lLeftTime, lLeftOutput)
      val rTimeEval = BindReferences.bindReference(lRightTime, lRightOutput)
      val nullRight = new GenericInternalRow(lRightOutput.size)
      val joined = new JoinedRow
      val proj = UnsafeProjection.create(lOutput, lOutput)

      // one right candidate held at a time; last match retained per key
      var rRow: InternalRow = null; var rKey: UnsafeRow = null; var rTime: Any = null
      var matchRow: InternalRow = null; var matchKey: UnsafeRow = null
      def pullRight(): Unit =
        if (rIter.hasNext) {
          val raw = rIter.next()
          rRow = raw.copy()
          rKey = rKeyProj(rRow).copy()
          rTime = rTimeEval.eval(rRow)
        } else { rRow = null }

      lIter.map { lRow =>
        val lKey = lKeyProj(lRow)
        val lTime = lTimeEval.eval(lRow)
        var advance = true
        while (advance) {
          if (rRow == null) { pullRight(); if (rRow == null) advance = false }
          if (rRow != null) {
            val cmp = keyOrd.compare(rKey, lKey)
            if (cmp < 0) rRow = null // right key passed by; discard
            else if (cmp == 0 && rTime != null &&
                timeOrd.asInstanceOf[Ordering[Any]].compare(rTime, lTime) <= 0) {
              matchRow = rRow; matchKey = rKey
              rRow = null
            } else advance = false
          }
        }
        val matched = matchKey != null && keyOrd.compare(matchKey, lKey) == 0
        proj(joined(lRow, if (matched) matchRow else nullRight))
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)
}

/** Public construction surface for the as-of join. */
object AsOfJoin {
  /** `asof(left, right, keys, leftTimeCol, rightTimeCol)`: left columns
    * plus the latest-at-or-before right row's columns (nulls when none).
    * Column names of the two sides must be disjoint (rename with `.as`). */
  def asof(leftDf: DataFrame, rightDf: DataFrame,
           keys: Seq[(String, String)],
           leftTimeCol: String, rightTimeCol: String): DataFrame = {
    val overlap = leftDf.columns.toSet.intersect(rightDf.columns.toSet)
    require(overlap.isEmpty,
      s"as-of join requires disjoint column names; rename: ${overlap.mkString(", ")}")
    val lPlan = leftDf.queryExecution.analyzed
    val rPlan = rightDf.queryExecution.analyzed
    def attr(plan: LogicalPlan, name: String): Attribute =
      plan.output.find(_.name == name).getOrElse(
        throw new IllegalArgumentException(s"no column $name"))
    val node = AsOfJoinPlan(
      keys.map(k => attr(lPlan, k._1)), keys.map(k => attr(rPlan, k._2)),
      attr(lPlan, leftTimeCol), attr(rPlan, rightTimeCol), lPlan, rPlan)
    org.apache.spark.sql.graftbridge.GraftSqlBridge.ofRows(
      leftDf.sparkSession, node)
  }
}
