package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, BindReferences, Descending, Expression, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.codegen.LazilyGeneratedOrdering
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.graftbridge.Bridge

/** Grouped top-k as a first-class operator: LogicalPlan + Strategy +
  * SparkPlan (SURVEY.md §7.3 tier (c) — the one case where composing
  * built-ins is structurally wasteful at scale).
  *
  * The composable form — `row_number().over(partitionBy(g).orderBy(o desc))
  * <= k` — SORTS every partition completely: O(n log n) comparisons and a
  * full sort buffer per partition, even though only k rows per group
  * survive. This operator keeps a bounded k-element min-heap per group
  * instead: O(n log k) time, O(groups × k) memory, no sort spill. At
  * 100 TB with small k that's the difference between a sort of everything
  * and a streaming pass.
  *
  * Distribution: `requiredChildDistribution = ClusteredDistribution(group)`
  * — Spark plans the hash exchange (and AQE sizes it), so the operator
  * composes with the rest of the planner instead of hand-rolling a shuffle.
  *
  * Ordering: keeps the k rows per group that sort FIRST under `order`
  * (lexicographic over the [[SortOrder]]s, direction- and null-ordering-
  * aware — callers append a unique tie-break column for determinism).
  * [[GroupedTopK.apply]] wraps plain columns Descending = largest-first;
  * [[GroupedTopKRewrite]] passes a window's orderSpec through verbatim.
  */
case class GroupedTopKNode(
    groupExprs: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    child: LogicalPlan,
    withTies: Boolean = false) extends UnaryNode {
  override def output: Seq[Attribute] = child.output
  override protected def withNewChildInternal(c: LogicalPlan): GroupedTopKNode =
    copy(child = c)
}

/** `partial = true` is the map-side instance: it runs BEFORE the exchange
  * (no required distribution) and bounds what the shuffle carries to
  * ≤ groups × k rows per input partition — top-k of a union equals top-k
  * of per-partition top-k's, so the final instance sees equivalent input.
  * The same two-phase shape as partial aggregation.
  */
case class GroupedTopKExec(
    groupExprs: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    partial: Boolean,
    child: SparkPlan,
    withTies: Boolean = false) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output
  override def outputPartitioning: Partitioning = child.outputPartitioning
  override def requiredChildDistribution: Seq[Distribution] =
    if (partial) super.requiredChildDistribution
    else ClusteredDistribution(groupExprs) :: Nil

  override protected def doExecute(): RDD[InternalRow] = {
    val boundGroup = groupExprs.map(BindReferences.bindReference(_, child.output))
    val sortOrders = order.map(so =>
      SortOrder(BindReferences.bindReference(so.child, child.output),
        so.direction, so.nullOrdering, Seq.empty))
    child.execute().mapPartitions({ iter =>
      val groupProj = UnsafeProjection.create(boundGroup)
      // ordering.compare(a,b) < 0  ⟺  a sorts first (a is "better": it
      // would get the lower row_number). Heap head = the WORST kept row
      // (last under the ordering), evicted when a better row arrives.
      val ordering = new LazilyGeneratedOrdering(sortOrders)
      val worstFirst = new java.util.Comparator[InternalRow] {
        override def compare(a: InternalRow, b: InternalRow): Int =
          ordering.compare(b, a)
      }
      val heaps = new java.util.HashMap[UnsafeRow,
        java.util.PriorityQueue[InternalRow]]()
      // withTies: rows tying the CURRENT boundary (= heap head) live here;
      // `rank() <= k` keeps every row whose sort key equals the k-th row's.
      // Invariant: a buffer is nonempty only while all its rows compare
      // equal to its group's head — a strict boundary improvement clears it
      // (those rows now have > k rows ahead). Memory is heap k + however
      // many rows tie the boundary, which is exactly the extra output
      // WITH TIES must produce.
      val ties: java.util.HashMap[UnsafeRow, java.util.ArrayList[InternalRow]] =
        if (withTies) new java.util.HashMap() else null
      def tieBuf(g: UnsafeRow): java.util.ArrayList[InternalRow] = {
        var buf = ties.get(g)
        if (buf == null) {
          buf = new java.util.ArrayList[InternalRow]()
          ties.put(g.copy(), buf)
        }
        buf
      }
      iter.foreach { row =>
        val g = groupProj(row)
        var heap = heaps.get(g)
        if (heap == null) {
          heap = new java.util.PriorityQueue[InternalRow](k + 1, worstFirst)
          heaps.put(g.copy(), heap)
        }
        if (heap.size() < k) {
          heap.add(row.copy())
        } else {
          val cmp = ordering.compare(row, heap.peek())
          if (cmp < 0) {
            val evicted = heap.poll()
            heap.add(row.copy())
            if (withTies) {
              if (ordering.compare(evicted, heap.peek()) == 0) {
                tieBuf(g).add(evicted)
              } else {
                // boundary strictly improved: don't allocate a buffer just
                // to clear it — only touch one that already exists
                val buf = ties.get(g)
                if (buf != null && !buf.isEmpty) buf.clear()
              }
            }
          } else if (withTies && cmp == 0) {
            tieBuf(g).add(row.copy())
          }
        }
      }
      import scala.jdk.CollectionConverters._
      heaps.entrySet().asScala.iterator.flatMap { e =>
        val kept = e.getValue.asScala
        if (ties == null) kept
        else {
          val buf = ties.get(e.getKey)
          if (buf == null) kept else kept ++ buf.asScala
        }
      }
    }, preservesPartitioning = true)
  }

  override protected def withNewChildInternal(c: SparkPlan): GroupedTopKExec =
    copy(child = c)
}

object GroupedTopKStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case GroupedTopKNode(g, o, k, child, ties) =>
      // two-phase: map-side partial bounds the shuffle, final reduces.
      // WITH TIES composes: a row with final rank <= k has partition rank
      // <= k in its own partition, so the partial (which keeps ties too)
      // never drops a final survivor.
      GroupedTopKExec(g, o, k, partial = false,
        GroupedTopKExec(g, o, k, partial = true, planLater(child), ties),
        ties) :: Nil
    case _ => Nil
  }
}

object GroupedTopK {
  /** Top-k rows per group, largest-first lexicographically on `orderCols`
    * (append a unique column for a deterministic result). Installs the
    * planner strategy on the DataFrame's session idempotently, so it works
    * on any session without builder-time configuration.
    */
  def apply(df: DataFrame, groupCols: Seq[String], orderCols: Seq[String],
      k: Int): DataFrame = build(df, groupCols, orderCols, k, ties = false)

  /** `rank() <= k` semantics: additionally keeps every row tying the k-th
    * row's sort key (SQL's FETCH FIRST k ROWS WITH TIES, per group). Same
    * bounded-heap plan; memory grows only by the tie rows themselves.
    */
  def withTies(df: DataFrame, groupCols: Seq[String], orderCols: Seq[String],
      k: Int): DataFrame = build(df, groupCols, orderCols, k, ties = true)

  private def build(df: DataFrame, groupCols: Seq[String],
      orderCols: Seq[String], k: Int, ties: Boolean): DataFrame = {
    // k = 0 would NPE in the exec's heap (peek() on never-filled heap);
    // reject it at the API boundary instead
    require(k >= 1, s"grouped top-k needs k >= 1, got $k")
    val spark = df.sparkSession
    if (!spark.experimental.extraStrategies.contains(GroupedTopKStrategy)) {
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ GroupedTopKStrategy
    }
    val analyzed = df.queryExecution.analyzed
    def attr(name: String) = analyzed.output
      .find(_.name == name)
      .getOrElse(throw new IllegalArgumentException(
        s"column $name not in ${analyzed.output.map(_.name)}"))
    Bridge.ofRows(spark,
      GroupedTopKNode(groupCols.map(attr),
        orderCols.map(c => SortOrder(attr(c), Descending)), k, analyzed, ties))
  }
}
