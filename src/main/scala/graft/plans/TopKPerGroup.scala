package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan, UnaryNode, Window}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, UnspecifiedDistribution}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.{SparkPlan, UnaryExecNode}

/** Whole-operator Catalyst extension (SURVEY.md §4 item (c) — custom
  * LogicalPlan + Rule + SparkStrategy + SparkPlan): top-k-per-group.
  *
  * The reference's hottest read shape is "rank within a group, keep the
  * first k" (top-N per customer/label — SURVEY W1/T1), which the
  * DataFrame idiom spells `row_number().over(partitionBy g orderBy o)`
  * then `filter(rank <= k)`. Spark executes that as a FULL shuffle of
  * every row, a per-partition SORT of every row, a Window pass, and only
  * then the filter. For k « rows/group the right plan is the aggregation
  * shape: per-input-partition bounded heaps keep at most k rows per group
  * (no sort — O(n log k)), the shuffle moves only those survivors, and a
  * final per-group heap merge emits ranks. Same result, shuffle volume
  * cut from n to ≤ groups·k per partition, full sort removed.
  *
  * [[RankFilterToTopK]] recognizes the idiom in the optimized plan and
  * swaps in the [[TopKPerGroup]] logical node — query authors keep
  * writing the declarative window form (every registry query using it is
  * re-verified against the DuckDB oracle under the rewrite), and
  * [[TopKPerGroupStrategy]] plans the two-phase [[TopKPerGroupExec]].
  *
  * Relationship to Spark's built-in: since 3.5 `InferWindowGroupLimit` +
  * `WindowGroupLimitExec` already prune rank filters map-side, so the
  * SHUFFLE-VOLUME win is also available natively; what this operator
  * additionally removes is the post-shuffle Sort + Window pass over the
  * survivors (heap emit O(n log k), no sort buffer). Measured at sf0.1
  * the two are near-parity (survivor counts are small); the operator is
  * kept as the engine's whole-operator extension-point demonstration and
  * as the scaffold for shapes the built-in cannot express (bounded
  * per-group state beyond rank: weighted reservoirs, per-group quantile
  * cuts). This rewrite intentionally REPLACES the builtin's
  * WindowGroupLimit nodes when it fires — one mechanism, not two.
  *
  * Tie semantics match `row_number`: ties at the k boundary are broken
  * arbitrarily — identical to the window form, whose tie order is an
  * implementation detail of the partition sort. Queries that need
  * deterministic output order totally (as every oracle-gated query here
  * does) must already carry tie-breaking sort keys.
  */
case class TopKPerGroup(
    groupExprs: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    rankAttr: Attribute,
    child: LogicalPlan) extends UnaryNode {
  override def output: Seq[Attribute] = child.output :+ rankAttr
  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerGroup =
    copy(child = newChild)
}

/** Optimizer rule: `Filter(rank cmp lit, Window(row_number() over (partition
  * by g order by o)))` → [[TopKPerGroup]]. Matches only the exact idiom —
  * a single row_number window expression whose rank is compared to an
  * integer literal (<=, <, =) directly above the Window node — and keeps
  * the rank attribute's exprId so downstream references resolve unchanged. */
object RankFilterToTopK extends Rule[LogicalPlan] {
  private def kOf(cond: Expression, rank: Attribute): Option[Int] = cond match {
    case LessThanOrEqual(a: Attribute, Literal(v: Int, _)) if a.semanticEquals(rank) => Some(v)
    case LessThan(a: Attribute, Literal(v: Int, _)) if a.semanticEquals(rank) => Some(v - 1)
    case EqualTo(a: Attribute, Literal(1, _)) if a.semanticEquals(rank) => Some(1)
    case GreaterThanOrEqual(Literal(v: Int, _), a: Attribute) if a.semanticEquals(rank) => Some(v)
    case GreaterThan(Literal(v: Int, _), a: Attribute) if a.semanticEquals(rank) => Some(v - 1)
    case _ => None
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond,
        Window(Seq(a @ Alias(WindowExpression(RowNumber(),
          WindowSpecDefinition(partitionSpec, orderSpec, _)), _)),
          _, _, child, _))
        if partitionSpec.nonEmpty && orderSpec.nonEmpty =>
      kOf(cond, a.toAttribute) match {
        case Some(k) if k >= 1 =>
          // InferWindowGroupLimit (main optimizer batch, Spark 3.5+) has
          // usually already inserted its WindowGroupLimit below the Window
          // by the time this rule runs; strip it — this operator subsumes
          // the same pruning, and leaving it would plan a redundant
          // sort+limit stack under the heaps.
          val base = child match {
            case org.apache.spark.sql.catalyst.plans.logical
              .WindowGroupLimit(_, _, _, _, grandchild) => grandchild
            case other => other
          }
          TopKPerGroup(partitionSpec, orderSpec, k, a.toAttribute, base)
        case Some(_) => // k <= 0: the filter is always false; keep Spark's path
          f
        case None => f
      }
  }
}

/** Planner strategy: two-phase exec — partial heaps on the child's native
  * partitioning, then a clustered-distribution final that emits ranks
  * (EnsureRequirements inserts the k-rows-per-group shuffle between). */
object TopKPerGroupStrategy extends org.apache.spark.sql.execution.SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerGroup(g, o, k, rank, child) =>
      val partialExec =
        TopKPerGroupExec(g, o, k, rank, partial = true, planLater(child))
      TopKPerGroupExec(g, o, k, rank, partial = false, partialExec) :: Nil
    case _ => Nil
  }
}

/** Physical top-k-per-group: per-partition bounded max-heaps (worst kept
  * row on top), one entry per group. The partial phase is advisory — it
  * only SHRINKS data (never emits more rows than it consumes) and flushes
  * its hash map wholesale if the buffered row count exceeds a cap, so
  * memory stays bounded without spill machinery (the final phase
  * re-filters, so early flushes cost shuffle bytes, never correctness). */
case class TopKPerGroupExec(
    groupExprs: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    rankAttr: Attribute,
    partial: Boolean,
    child: SparkPlan) extends UnaryExecNode {

  /** Buffered-row cap per partition before an advisory flush (partial only). */
  private val FlushRows = 1 << 20

  // the final phase GENERATES the rank attribute (it is not an input
  // requirement — without this the plan printer flags missing input)
  override def producedAttributes: AttributeSet =
    if (partial) AttributeSet.empty else AttributeSet(rankAttr)

  override def output: Seq[Attribute] =
    if (partial) child.output else child.output :+ rankAttr

  override def requiredChildDistribution: Seq[Distribution] =
    if (partial) Seq(UnspecifiedDistribution)
    else Seq(ClusteredDistribution(groupExprs))

  override def outputPartitioning = child.outputPartitioning

  override protected def doExecute(): RDD[InternalRow] = {
    // local copies: the closure must capture only serializable expression
    // trees, never `this` (SparkPlan) or driver-side generated classes —
    // projections/orderings are code-generated PER EXECUTOR inside the
    // partition closure (the standard physical-operator pattern)
    val lGroupExprs = groupExprs
    val lOrder = order
    val lChildOutput = child.output
    val lOutput = output
    val lK = k
    val lPartial = partial
    val lFlushRows = FlushRows
    child.execute().mapPartitions ({ iter =>
      val gp = UnsafeProjection.create(lGroupExprs, lChildOutput)
      val ord = RowOrdering.create(lOrder, lChildOutput)
      val heaps = new java.util.LinkedHashMap[UnsafeRow,
        java.util.PriorityQueue[InternalRow]]()
      var buffered = 0L
      val revOrd = ord.reverse // max-heap: worst kept row at the head

      def drain(): Iterator[InternalRow] = {
        val out = scala.collection.mutable.ArrayBuffer.empty[InternalRow]
        val it = heaps.values().iterator()
        while (it.hasNext) {
          val heap = it.next()
          val rows = new Array[InternalRow](heap.size())
          var i = rows.length - 1
          while (i >= 0) { rows(i) = heap.poll(); i -= 1 } // ascending
          if (lPartial) out ++= rows
          else {
            var r = 0
            while (r < rows.length) {
              out += new JoinedRow(rows(r), InternalRow(r + 1))
              r += 1
            }
          }
        }
        heaps.clear(); buffered = 0
        out.iterator
      }

      val flushes = scala.collection.mutable.ArrayBuffer.empty[Iterator[InternalRow]]
      while (iter.hasNext) {
        val row = iter.next()
        val key = gp(row)
        var heap = heaps.get(key)
        if (heap == null) {
          heap = new java.util.PriorityQueue[InternalRow](lK, revOrd)
          heaps.put(key.copy(), heap)
        }
        if (heap.size() < lK) { heap.add(row.copy()); buffered += 1 }
        else if (ord.compare(row, heap.peek()) < 0) {
          heap.poll(); heap.add(row.copy())
        }
        if (lPartial && buffered >= lFlushRows) flushes += drain()
      }
      flushes += drain()
      val proj =
        if (lPartial) UnsafeProjection.create(lChildOutput, lChildOutput)
        else UnsafeProjection.create(lOutput, lOutput)
      flushes.iterator.flatten.map(proj)
    }, preservesPartitioning = true)
  }

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerGroupExec =
    copy(child = newChild)
}
