package graft.plans

import scala.collection.mutable

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, UnspecifiedDistribution}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.types.IntegerType

/** Per-key bounded TOP-K as a whole custom operator: logical node +
  * optimizer rule + planner strategy + physical exec, registered through
  * SparkSessionExtensions (graft.functions.GraftExtensions).
  *
  * Why: the declarative form —
  *   row_number().over(Window.partitionBy(keys).orderBy(ord)) <= k
  * — plans as sort-the-whole-partition-per-key (WindowExec requires a
  * full sort of every key group) even though only k rows per key
  * survive. At 100 TB that sort is the dominant cost. The rewrite keeps
  * the SAME declarative query (users still write the window form; if the
  * extension is absent the window plan runs unchanged) and swaps in a
  * bounded-heap physical operator:
  *
  *   partial TopKExec (map-side: ≤ k rows per key per input partition)
  *     → hash exchange on the keys (planner-inserted)
  *       → final TopKExec (≤ k rows per key, ranked)
  *
  * so the shuffle moves at most k·|keys present in partition| rows and
  * nothing is ever fully sorted — O(n log k) heap pushes instead of
  * O(n log n) sort, with memory bounded by k × distinct-keys-per-task
  * (strictly smaller than the rows WindowExec would buffer+sort).
  *
  * Scope guard: only fires on a single row_number window expression with
  * non-empty partition keys and a plain `rank <= lit` / `rank < lit`
  * conjunct. Ties follow the heap's arrival order, exactly as
  * row_number's ties follow sort instability — queries needing
  * determinism already order by a total key set (the repo's oracle
  * discipline).
  */
case class TopKPerKey(
    k: Int,
    partitionExprs: Seq[Expression],
    order: Seq[SortOrder],
    rankAttr: Attribute,
    child: LogicalPlan) extends logical.UnaryNode {
  override def output: Seq[Attribute] = child.output :+ rankAttr
  // rankAttr is produced here, not consumed — without this the planner
  // flags the node as missing an input attribute
  override def producedAttributes: AttributeSet = AttributeSet(rankAttr)
  override protected def withNewChildInternal(
      newChild: LogicalPlan): TopKPerKey = copy(child = newChild)
}

/** Filter(rank <= k, [Project,] Window(row_number ...)) → TopKPerKey. */
object TopKRewrite extends Rule[LogicalPlan] with PredicateHelper {

  private def limitOf(cond: Expression, rank: Attribute): Option[Int] =
    cond match {
      case LessThanOrEqual(a: Attribute, Literal(v: Int, IntegerType))
        if a.semanticEquals(rank) => Some(v)
      case LessThan(a: Attribute, Literal(v: Int, IntegerType))
        if a.semanticEquals(rank) => Some(v - 1)
      case _ => None
    }

  private def rewriteWindow(
      w: logical.Window, cond: Expression): Option[(LogicalPlan, Seq[Expression])] =
    w match {
      case logical.Window(
          Seq(a @ Alias(WindowExpression(RowNumber(),
            WindowSpecDefinition(part, order, _)), _)),
          _, _, child, _) if part.nonEmpty =>
        val rank = a.toAttribute
        val conjuncts = splitConjunctivePredicates(cond)
        val (rankPreds, rest) = conjuncts.partition(c =>
          limitOf(c, rank).isDefined)
        rankPreds.flatMap(limitOf(_, rank)).reduceOption(math.min).map {
          k => (TopKPerKey(k, part, order, rank, child), rest)
        }
      case _ => None
    }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case f @ logical.Filter(cond, w: logical.Window) =>
      rewriteWindow(w, cond).fold(f: LogicalPlan) { case (topk, rest) =>
        if (rest.isEmpty) topk
        else logical.Filter(rest.reduce(And), topk)
      }
    case f @ logical.Filter(cond, p @ logical.Project(_, w: logical.Window))
        if p.projectList.forall(_.isInstanceOf[AttributeReference]) =>
      // column-pruning Project between Filter and Window: rewrite below
      // it (the rank predicate references the window output, which the
      // pass-through Project preserves)
      rewriteWindow(w, cond).fold(f: LogicalPlan) { case (topk, rest) =>
        val pruned = logical.Project(p.projectList, topk)
        if (rest.isEmpty) pruned
        else logical.Filter(rest.reduce(And), pruned)
      }
  }
}

object TopKStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerKey(k, part, order, rankAttr, child) =>
      val partial = TopKPerKeyExec(k, part, order, None, planLater(child))
      TopKPerKeyExec(k, part, order, Some(rankAttr), partial) :: Nil
    case _ => Nil
  }
}

/** Bounded-heap per-key top-k. With `rankAttr` = None this is the
  * map-side partial (any input partitioning; prunes to ≤ k rows per key
  * seen locally — a superset of the global answer); with Some(rank) it
  * is the final pass, which requires clustering on the keys (the planner
  * inserts the hash exchange) and appends the 1-based rank. */
case class TopKPerKeyExec(
    k: Int,
    partitionExprs: Seq[Expression],
    order: Seq[SortOrder],
    rankAttr: Option[Attribute],
    child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] =
    child.output ++ rankAttr.toSeq

  override def producedAttributes: AttributeSet =
    AttributeSet(rankAttr.toSeq)

  override def requiredChildDistribution: Seq[Distribution] =
    if (rankAttr.isDefined) ClusteredDistribution(partitionExprs) :: Nil
    else UnspecifiedDistribution :: Nil

  override def outputPartitioning = child.outputPartitioning

  override protected def doExecute(): RDD[InternalRow] = {
    val kLocal = k
    val partExprs = partitionExprs
    val sortOrder = order
    val childOutput = child.output
    val isFinal = rankAttr.isDefined
    child.execute().mapPartitions({ iter =>
      val keyProj = UnsafeProjection.create(partExprs, childOutput)
      val cmp = org.apache.spark.sql.catalyst.expressions.codegen
        .GenerateOrdering.generate(sortOrder, childOutput)
      // max-heap by sort order: the head is the WORST surviving row,
      // evicted when a better one arrives
      implicit val rowOrd: Ordering[InternalRow] =
        (x: InternalRow, y: InternalRow) => cmp.compare(x, y)
      val heaps = mutable.LinkedHashMap.empty[
        UnsafeRow, mutable.PriorityQueue[InternalRow]]
      iter.foreach { row =>
        val key = keyProj(row)
        heaps.get(key) match {
          case Some(h) =>
            if (h.size < kLocal) h.enqueue(row.copy())
            else if (cmp.compare(row, h.head) < 0) {
              h.dequeue(); h.enqueue(row.copy())
            }
          case None =>
            val h = mutable.PriorityQueue.empty[InternalRow]
            h.enqueue(row.copy())
            heaps.put(key.copy(), h)
        }
      }
      if (!isFinal) {
        heaps.iterator.flatMap { case (_, h) => h.iterator }
      } else {
        val withRank = new JoinedRow
        val rankRow = new GenericInternalRow(1)
        val proj = UnsafeProjection.create(
          childOutput ++ rankAttr.toSeq, childOutput ++ rankAttr.toSeq)
        heaps.iterator.flatMap { case (_, h) =>
          val sorted = h.dequeueAll.reverse // ascending in sort order
          sorted.iterator.zipWithIndex.map { case (row, i) =>
            rankRow.setInt(0, i + 1)
            proj(withRank(row, rankRow))
          }
        }
      }
    }, preservesPartitioning = true)
  }

  override protected def withNewChildInternal(
      newChild: SparkPlan): TopKPerKeyExec = copy(child = newChild)
}
