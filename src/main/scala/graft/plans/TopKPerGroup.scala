package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.execution.SparkStrategy
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan, UnaryNode, Window}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, UnspecifiedDistribution}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.{SparkPlan, UnaryExecNode}
import org.apache.spark.sql.types.IntegerType

/** Top-k-per-group as a first-class operator — logical node,
  * optimizer rule, planner strategy, physical exec: the full custom-
  * operator ladder, for the one window pattern whose stock plan is
  * structurally wasteful at scale.
  *
  * `row_number() OVER (PARTITION BY g ORDER BY o) <= k`: since 3.5
  * Spark prunes this with WindowGroupLimit, which bounds SHUFFLE
  * volume but still FULLY SORTS every map and reduce partition
  * (Sort → WindowGroupLimit → Exchange → Sort → WindowGroupLimit →
  * Window → Filter). The heap form replaces both sorted passes with
  * bounded priority queues — O(n log k) comparisons, no sort
  * buffers/spill, memory O(k·groups-per-partition) — and subsumes
  * the stock pruning (the rule strips an already-inserted
  * WindowGroupLimit so its sorts disappear with it).
  *
  * [[TopKViaHeapRule]] rewrites the Filter-over-Window pattern into
  * the logical node automatically (same contract as row_number —
  * a non-total ORDER BY gives an arbitrary-but-valid tie order);
  * [[TopKStrategy]] plans it as partial+final [[TopKPerGroupExec]].
  * Install both with [[TopKPerGroup.install]] or via
  * `spark.sql.extensions = graft.plans.GraftExtensions`.
  */
case class TopKPerGroup(
    groupExprs: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    rankAttr: Attribute,
    child: LogicalPlan)
  extends UnaryNode {

  override def output: Seq[Attribute] = child.output :+ rankAttr
  override def producedAttributes: AttributeSet = AttributeSet(rankAttr)
  override def maxRows: Option[Long] = child.maxRows
  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerGroup =
    copy(child = newChild)
}

/** Rewrites `Filter(rank <= k, Window(row_number as rank over (g, o)))`
  * into [[TopKPerGroup]]. Fires only when the window computes exactly
  * the one row_number expression (extra window functions would need
  * the full frame anyway) and the filter bounds that attribute by a
  * literal.
  */
case class TopKViaHeapRule() extends Rule[LogicalPlan] {

  private def boundOf(cond: Expression, rank: Attribute): Option[Int] = cond match {
    case LessThanOrEqual(r: Attribute, Literal(v: Int, IntegerType)) if r.semanticEquals(rank) =>
      Some(v)
    case LessThan(r: Attribute, Literal(v: Int, IntegerType)) if r.semanticEquals(rank) =>
      Some(v - 1)
    case GreaterThanOrEqual(Literal(v: Int, IntegerType), r: Attribute) if r.semanticEquals(rank) =>
      Some(v)
    case GreaterThan(Literal(v: Int, IntegerType), r: Attribute) if r.semanticEquals(rank) =>
      Some(v - 1)
    // rank = 1 is exactly top-1: rank is row_number, so = 1 ⇔ <= 1.
    // (= v for v > 1 is NOT a top-k — it keeps only the v-th row.)
    case EqualTo(r: Attribute, Literal(1, IntegerType)) if r.semanticEquals(rank) =>
      Some(1)
    case EqualTo(Literal(1, IntegerType), r: Attribute) if r.semanticEquals(rank) =>
      Some(1)
    case _ => None
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case f @ Filter(
          cond,
          Window(
            Seq(a @ Alias(WindowExpression(RowNumber(), spec), _)),
            partitionSpec,
            orderSpec,
            child,
            _))
        // empty partitionSpec = GLOBAL top-k: ClusteredDistribution(Nil)
        // is not constructible, and the stock TakeOrdered path already
        // handles it — leave it alone
        if orderSpec.nonEmpty && partitionSpec.nonEmpty =>
      boundOf(cond, a.toAttribute) match {
        case Some(k) if k > 0 =>
          // Spark >= 3.5 may already have inserted its WindowGroupLimit
          // below the window; the heap subsumes that pruning, so strip
          // it (keeping it would re-add the full per-partition sorts)
          val base = child match {
            case wgl: org.apache.spark.sql.catalyst.plans.logical.WindowGroupLimit => wgl.child
            case other => other
          }
          TopKPerGroup(partitionSpec, orderSpec, k, a.toAttribute, base)
        case Some(_) => f // k <= 0: degenerate, leave to the stock plan
        case None => f
      }
  }
}

/** Plans [[TopKPerGroup]] as final(exchange(partial)). */
case class TopKStrategy(spark: SparkSession) extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerGroup(groupExprs, order, k, rankAttr, child) =>
      // partial prunes each map partition to k rows per group before
      // the shuffle; final (distribution-required → EnsureRequirements
      // inserts the exchange between them) merges heaps and ranks
      val partial = TopKPerGroupExec(
        groupExprs, order, k, rankAttr, partial = true, planLater(child))
      TopKPerGroupExec(groupExprs, order, k, rankAttr, partial = false, partial) :: Nil
    case _ => Nil
  }
}

case class TopKPerGroupExec(
    groupExprs: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    rankAttr: Attribute,
    partial: Boolean,
    child: SparkPlan)
  extends UnaryExecNode {

  override def output: Seq[Attribute] =
    if (partial) child.output else child.output :+ rankAttr

  // rankAttr appears in this node's expression list in BOTH modes
  // (it is a constructor field), so both must declare it produced or
  // the partial reads as missing-input
  override def producedAttributes: AttributeSet = AttributeSet(rankAttr)

  override def requiredChildDistribution: Seq[Distribution] =
    if (partial) UnspecifiedDistribution :: Nil
    else ClusteredDistribution(groupExprs) :: Nil

  override protected def doExecute(): RDD[InternalRow] = {
    // capture only serializable pieces; the codegen'd projection and
    // ordering must be instantiated per partition on the executor
    val groupExprsSer = groupExprs
    val orderSer = order
    val childOutput = child.output
    val outTypes = output.map(_.dataType).toArray
    val kk = k
    val isPartial = partial
    // memory contract: O(k · groups-per-partition) ON-HEAP, no spill
    // (same family as TakeOrderedAndProject's per-partition heap).
    // A near-unique group key would approach one heap per input row —
    // fail fast with guidance instead of an opaque executor OOM.
    val maxGroups =
      conf.getConfString("spark.graft.topk.maxGroupsPerPartition", "8388608").toLong
    child.execute().mapPartitions { iter =>
      val groupProj = UnsafeProjection.create(groupExprsSer, childOutput)
      val ordering = RowOrdering.create(orderSer, childOutput)
      val outProj = UnsafeProjection.create(outTypes)
      // group key -> max-heap (worst of the kept k on top, evicted on
      // a better candidate)
      val heaps = new java.util.HashMap[UnsafeRow, java.util.PriorityQueue[InternalRow]]()
      val reversed = new java.util.Comparator[InternalRow] {
        override def compare(x: InternalRow, y: InternalRow): Int = -ordering.compare(x, y)
      }
      while (iter.hasNext) {
        val row = iter.next()
        val key = groupProj(row)
        var heap = heaps.get(key)
        if (heap == null) {
          if (heaps.size() >= maxGroups)
            throw new org.apache.spark.SparkException(
              s"TopKPerGroup: more than $maxGroups distinct groups in one partition — " +
                "the bounded-heap operator holds k rows per group on heap with no spill. " +
                "Raise spark.graft.topk.maxGroupsPerPartition, repartition wider, or " +
                "skip the rewrite for this near-unique grouping key.")
          // initial capacity only — clamp it: a huge k (e.g. a
          // rank <= Int.MaxValue "keep everything" filter) must not
          // overflow kk + 1 into a negative capacity
          val cap = if (kk >= 1024) 1024 else kk + 1
          heap = new java.util.PriorityQueue[InternalRow](cap, reversed)
          heaps.put(key.copy(), heap)
        }
        if (heap.size() < kk) heap.add(row.copy())
        else if (ordering.compare(row, heap.peek()) < 0) {
          heap.poll()
          heap.add(row.copy())
        }
      }
      val groups = heaps.values().iterator()
      new Iterator[InternalRow] {
        private var current: Iterator[InternalRow] = Iterator.empty
        override def hasNext: Boolean = {
          while (!current.hasNext && groups.hasNext) {
            val heap = groups.next()
            current =
              if (isPartial)
                // the exchange destroys order and the final stage
                // re-heaps anyway: drain unsorted, skip the O(k log k)
                scala.jdk.CollectionConverters.IteratorHasAsScala(heap.iterator()).asScala
              else {
                val rows = new java.util.ArrayList[InternalRow](heap)
                java.util.Collections.sort(rows, new java.util.Comparator[InternalRow] {
                  override def compare(x: InternalRow, y: InternalRow): Int =
                    ordering.compare(x, y)
                })
                scala.jdk.CollectionConverters.ListHasAsScala(rows).asScala.iterator.zipWithIndex
                  .map { case (r, i) =>
                    new JoinedRow(r, InternalRow(i + 1)): InternalRow
                  }
              }
          }
          current.hasNext
        }
        override def next(): InternalRow = outProj(current.next())
      }
    }
  }

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerGroupExec =
    copy(child = newChild)
}

object TopKPerGroup {
  /** Install rule + strategy into an existing session (idempotent). */
  def install(spark: SparkSession): Unit = {
    if (!spark.experimental.extraOptimizations.exists(_.isInstanceOf[TopKViaHeapRule]))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ TopKViaHeapRule()
    if (!spark.experimental.extraStrategies.exists(_.isInstanceOf[TopKStrategy]))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ TopKStrategy(spark)
  }
}
