package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame, GraftColumn, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Expression, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.codegen.GenerateOrdering
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}

/** Whole-operator extension path (the mandate's option (c), beyond the
  * expression kernels in `graft.functions` and the optimizer rule in
  * [[VecRules]]): per-group top-k as a first-class physical operator —
  * logical node → planner [[SparkStrategy]] → [[UnaryExecNode]] with a
  * declared child distribution, installable per-session.
  *
  * WHY an exec and not the window form: `row_number().over(partitionBy
  * (g).orderBy(o)) <= k` materializes and SORTS every group in full —
  * at 100 TB the sort is the job. A bounded heap per group needs
  * O(groups·k) memory and one pass, and because topk∘topk = topk the
  * strategy plans it TWICE: a partial pass before the exchange (map-side
  * prune, the aggregation-style trick — the shuffle then carries at most
  * partitions·groups·k rows instead of the corpus) and a final pass
  * after `ClusteredDistribution(group)`. The plan shows NO Sort below
  * the operator; `EnsureRequirements` inserts only the group-key
  * exchange (PlanSpec pins both).
  *
  * Correctness contract: the caller's `ordering` must be TOTAL (break
  * ties — e.g. value desc, id asc); the kept set per group is then
  * unique regardless of row arrival order, which is what makes the
  * result deterministic and oracle-checkable (q242's hash match vs the
  * window form proves partial∘final ≡ windowed top-k). Emission order
  * within a partition is heap order — callers add their own final sort
  * for presentation, as with any exchange.
  */
case class GroupTopKNode(
    groupExprs: Seq[Expression],
    ordering: Seq[SortOrder],
    k: Int,
    child: LogicalPlan) extends UnaryNode {
  override def output: Seq[Attribute] = child.output
  override protected def withNewChildInternal(newChild: LogicalPlan): GroupTopKNode =
    copy(child = newChild)
}

/** Plans the two-level (partial → exchange → final) exec pair. */
object GroupTopKStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case GroupTopKNode(g, o, k, child) =>
      GroupTopKExec(g, o, k, finalPass = true,
        GroupTopKExec(g, o, k, finalPass = false, planLater(child))) :: Nil
    case _ => Nil
  }
}

/** One pass of bounded-heap per-group top-k over the child's rows.
  * `finalPass = false` runs wherever the child's rows already are
  * (UnspecifiedDistribution — the map-side prune); `finalPass = true`
  * requires ClusteredDistribution(group), so EnsureRequirements plants
  * exactly one hash exchange between the two. Heap discipline: a
  * reverse-ordered priority queue whose head is the WORST kept row, so
  * admission is an O(log k) compare against the head; rows are copied
  * on admission only (the input iterator reuses its UnsafeRow). */
case class GroupTopKExec(
    groupExprs: Seq[Expression],
    ordering: Seq[SortOrder],
    k: Int,
    finalPass: Boolean,
    child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output
  override def outputPartitioning = child.outputPartitioning
  override def requiredChildDistribution: Seq[Distribution] =
    if (finalPass) ClusteredDistribution(groupExprs) :: Nil
    else UnspecifiedDistribution :: Nil

  override protected def doExecute(): RDD[InternalRow] = {
    val (g, o, out, kk) = (groupExprs, ordering, child.output, k)
    child.execute().mapPartitions({ iter =>
      val keyProj = UnsafeProjection.create(g, out)
      val ord = GenerateOrdering.generate(o, out)
      val rev: java.util.Comparator[InternalRow] = ord.reverse
      val heaps = new java.util.HashMap[UnsafeRow, java.util.PriorityQueue[InternalRow]]()
      while (iter.hasNext) {
        val row = iter.next()
        val key = keyProj(row)
        var heap = heaps.get(key)
        if (heap == null) {
          heap = new java.util.PriorityQueue[InternalRow](kk + 1, rev)
          heaps.put(key.copy(), heap)
        }
        if (heap.size < kk) heap.add(row.copy())
        else if (ord.compare(row, heap.peek()) < 0) {
          heap.poll(); heap.add(row.copy())
        }
      }
      import scala.jdk.CollectionConverters._
      heaps.values().iterator().asScala.flatMap(_.iterator().asScala)
    }, preservesPartitioning = true)
  }

  override protected def withNewChildInternal(newChild: SparkPlan): GroupTopKExec =
    copy(child = newChild)
}

object GroupTopK {
  /** Idempotently add the strategy to a live session's planner (the
    * post-build counterpart of `injectPlannerStrategy` — production
    * sessions get it from `spark.sql.extensions=graft.functions
    * .GraftExtensions`). */
  def install(spark: SparkSession): Unit =
    if (!spark.experimental.extraStrategies.contains(GroupTopKStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ GroupTopKStrategy

  /** Per-group top-k of `df`: the first `k` rows of each `groupCols`
    * group under `orderCols` (use `.desc`/`.asc` Columns; the ordering
    * must be total for a deterministic result). */
  def apply(df: DataFrame, groupCols: Seq[Column], orderCols: Seq[Column], k: Int): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    install(df.sparkSession)
    // Eager conversion (GraftColumn.expression, not .expr): a custom
    // node must carry plain catalyst expressions — the lazy
    // ColumnNodeExpression placeholder is analyzer-only and not
    // executor-serializable.
    val g = groupCols.map(GraftColumn.expression(df.sparkSession, _))
    val o = orderCols.map(GraftColumn.expression(df.sparkSession, _) match {
      case so: SortOrder => so
      case e => SortOrder(e, Ascending)
    })
    GraftColumn.ofRows(df.sparkSession,
      GroupTopKNode(g, o, k, GraftColumn.logicalPlan(df)))
  }
}
