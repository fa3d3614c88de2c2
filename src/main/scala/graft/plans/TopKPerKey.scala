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
        // v - 1 at Int.MinValue would wrap to Int.MaxValue and slip past
        // the k >= 1 guard below, turning "return nothing" into
        // "return everything per key"
        if a.semanticEquals(rank) && v > Int.MinValue => Some(v - 1)
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
        // k >= 1 only: a degenerate bound (rank < 1 → k = 0) must keep
        // the Filter+Window plan, which correctly returns zero rows —
        // the exec always keeps the first row it sees per key, so
        // rewriting would return one row per key instead of none.
        rankPreds.flatMap(limitOf(_, rank)).reduceOption(math.min)
          .filter(_ >= 1).map {
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
  /** Map-side row budget (buffered rows per task across all heaps) for
    * the partial pass; session-settable for tests / tuning. */
  val partialBudgetKey = "spark.graft.topk.partialRowBudget"
  val partialBudgetDefault: Long = 1L << 22 // ~4M rows ≈ tens of MB of refs

  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerKey(k, part, order, rankAttr, child) =>
      val budget = org.apache.spark.sql.internal.SQLConf.get
        .getConfString(partialBudgetKey, partialBudgetDefault.toString).toLong
      val partial =
        TopKPerKeyExec(k, part, order, None, planLater(child), budget)
      TopKPerKeyExec(k, part, order, Some(rankAttr), partial, budget) :: Nil
    case _ => Nil
  }
}

/** Bounded-heap per-key top-k. With `rankAttr` = None this is the
  * map-side partial (any input partitioning; prunes to ≤ k rows per key
  * seen locally — a superset of the global answer); with Some(rank) it
  * is the final pass, which requires clustering on the keys (the planner
  * inserts the hash exchange) and appends the 1-based rank.
  *
  * Memory contract: the partial buffers at most `partialRowBudget` rows
  * per task — once the heaps hold that many, rows of NOT-yet-seen keys
  * pass straight through to the exchange unpruned (the partial is purely
  * an optimization; the final pass is the correctness gate), so
  * near-unique keys degrade to a plain shuffle instead of an OOM. The
  * final pass necessarily holds k × (distinct keys in its partition)
  * rows — which is its own output, the same rows WindowExec would buffer
  * per key group; at extreme key cardinality the win over the window
  * plan is the avoided per-group sort, not the buffer. */
case class TopKPerKeyExec(
    k: Int,
    partitionExprs: Seq[Expression],
    order: Seq[SortOrder],
    rankAttr: Option[Attribute],
    child: SparkPlan,
    partialRowBudget: Long = TopKStrategy.partialBudgetDefault)
  extends UnaryExecNode {

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
    // the final pass must absorb every row (it IS the answer); only the
    // map-side partial may decline rows once the budget is spent
    val budget = if (isFinal) Long.MaxValue else partialRowBudget
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
      var buffered = 0L
      // true = row accounted for (kept or provably dominated); false =
      // budget exhausted, caller must pass the row through unpruned
      def absorb(row: InternalRow): Boolean = {
        val key = keyProj(row)
        heaps.get(key) match {
          case Some(h) if h.size >= kLocal =>
            // replacement never grows memory, and a dropped row is
            // beaten by k local rows of its key — safe at any budget
            if (cmp.compare(row, h.head) < 0) {
              h.dequeue(); h.enqueue(row.copy())
            }
            true
          case Some(h) =>
            if (buffered >= budget) false
            else { h.enqueue(row.copy()); buffered += 1; true }
          case None =>
            if (buffered >= budget) false
            else {
              val h = mutable.PriorityQueue.empty[InternalRow]
              h.enqueue(row.copy()); buffered += 1
              heaps.put(key.copy(), h)
              true
            }
        }
      }
      if (!isFinal) {
        // lazily stream pass-through rows to the exchange, then flush
        // the surviving heaps (`++` evaluates its right side only after
        // the input is exhausted, so the heaps are final by then)
        iter.filter(row => !absorb(row)) ++
          heaps.iterator.flatMap { case (_, h) => h.iterator }
      } else {
        iter.foreach(absorb)
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
