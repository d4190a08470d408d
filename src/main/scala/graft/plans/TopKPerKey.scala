package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame, GraftSqlBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Expression, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.codegen.GenerateOrdering
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}

/** Grouped top-k as a first-class planner operator: for each distinct
  * key, emit the first `k` child rows under `order` — without ever
  * SORTING anything.
  *
  * Why a custom operator (builder-brief preference (c)): the
  * DataFrame formulation `row_number().over(partitionBy(key).orderBy
  * (o)) <= k` plans as Exchange → full SORT of every partition →
  * window walk. Spark's WindowGroupLimit (3.5+) prunes each
  * partition's input to k·groups rows but still pays the sort on both
  * sides of the shuffle. This operator keeps a size-k bounded heap
  * per key — O(n log k) comparisons, no sort buffers, no spill
  * pressure — and applies the SAME pass twice: once map-side
  * (partial, before the exchange — the rows crossing the wire drop
  * from n to ≤ partitions·keys·k) and once reduce-side (final, after
  * clustering by key). At 100 TB with a bounded key space the shuffle
  * shrinks by orders of magnitude; this is exactly the partial-
  * aggregate geometry, applied to a selection operator that Catalyst
  * has no primitive for.
  *
  * Caller contract: `order` must be a TOTAL order (include a unique
  * tiebreak column) — same requirement the deterministic-results
  * convention imposes on every ranked query in this repo.
  *
  * State bound: heaps hold ≤ |keys-in-partition|·k row copies. This
  * operator targets BOUNDED key spaces (status codes, languages,
  * shards); for unbounded keys the window/WindowGroupLimit form is
  * the right tool and [[graft.ops]] keeps using it.
  */
case class TopKPerKeyNode(keys: Seq[Expression], order: Seq[SortOrder], k: Int,
                          child: LogicalPlan) extends UnaryNode {
  require(k > 0, s"k must be positive, got $k")
  override def output: Seq[Attribute] = child.output
  override def maxRows: Option[Long] = child.maxRows
  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerKeyNode =
    copy(child = newChild)
}

/** Plans [[TopKPerKeyNode]] as final(partial(child)) — EnsureRequirements
  * inserts the key-clustered exchange between the two. */
object TopKPerKeyStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerKeyNode(keys, order, k, child) =>
      TopKPerKeyExec(keys, order, k, partial = false,
        TopKPerKeyExec(keys, order, k, partial = true, planLater(child))) :: Nil
    case _ => Nil
  }
}

case class TopKPerKeyExec(keys: Seq[Expression], order: Seq[SortOrder], k: Int,
                          partial: Boolean, child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output
  override def outputPartitioning: Partitioning = child.outputPartitioning
  override def nodeName: String =
    if (partial) "TopKPerKeyPartial" else "TopKPerKeyFinal"

  /** Partial runs wherever the child's rows already are; final needs
    * all rows of a key in one partition (ClusteredDistribution — the
    * exchange this induces is the operator's ONLY shuffle, fed by
    * partial's ≤ keys·k rows per map task). */
  override def requiredChildDistribution: Seq[Distribution] =
    if (partial) UnspecifiedDistribution :: Nil
    else ClusteredDistribution(keys) :: Nil

  protected override def doExecute(): RDD[InternalRow] = {
    val childOutput = child.output
    val (keyExprs, ord, limit) = (keys, order, k)
    child.execute().mapPartitions({ iter =>
      val keyProj = UnsafeProjection.create(keyExprs, childOutput)
      // identity projection, not a cast: most exec nodes do emit
      // UnsafeRows, but the InternalRow contract doesn't guarantee it
      // (non-codegen or RDD-backed children) — normalize like the
      // built-in sort/exchange operators do. For an already-unsafe
      // child this is a cheap pass-through copy into the projection
      // buffer (rows are copied into the heap anyway).
      val toUnsafe = UnsafeProjection.create(childOutput, childOutput)
      val rowOrd = GenerateOrdering.generate(ord, childOutput)
      // per-key bounded heap, head = worst retained row (reverse order)
      val heaps = new java.util.HashMap[UnsafeRow, java.util.PriorityQueue[UnsafeRow]]()
      val evict = new java.util.Comparator[UnsafeRow] {
        override def compare(a: UnsafeRow, b: UnsafeRow): Int = rowOrd.compare(b, a)
      }
      while (iter.hasNext) {
        val row = toUnsafe(iter.next())
        val key = keyProj(row)
        var heap = heaps.get(key)
        if (heap == null) {
          heap = new java.util.PriorityQueue[UnsafeRow](limit + 1, evict)
          heaps.put(key.copy(), heap)
        }
        if (heap.size() < limit) heap.add(row.copy())
        else if (rowOrd.compare(row, heap.peek()) < 0) {
          heap.poll()
          heap.add(row.copy())
        }
      }
      import scala.jdk.CollectionConverters._
      heaps.values().iterator().asScala.flatMap(_.iterator().asScala)
    }, preservesPartitioning = true)
  }

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerKeyExec =
    copy(child = newChild)
}

object TopKPerKey {
  /** Idempotent registration of the planner strategy on a session. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    if (!spark.experimental.extraStrategies.contains(TopKPerKeyStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ TopKPerKeyStrategy

  /** Registration of strategy + the declarative-form rewrite rule
    * ([[TopKWindowRewriteRule]]). Session-scoped on purpose: callers
    * that want the rewrite opt a session (usually a `newSession()`
    * child) into it rather than silently re-planning every window in
    * the JVM. */
  def registerRewrite(spark: org.apache.spark.sql.SparkSession): Unit = {
    register(spark)
    if (!spark.experimental.extraOptimizations.contains(TopKWindowRewriteRule))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ TopKWindowRewriteRule
  }

  /** First `k` rows per distinct `keys` value under `order` (pass
    * `col.desc`/`col.asc` Columns; bare Columns default ascending). */
  def topKPerKey(df: DataFrame, keys: Seq[Column], order: Seq[Column], k: Int): DataFrame = {
    val spark = df.sparkSession
    register(spark)
    val sortOrder = order.map(GraftSqlBridge.expression(_) match {
      case s: SortOrder => s
      case e => SortOrder(e, Ascending)
    })
    GraftSqlBridge.ofRows(spark,
      TopKPerKeyNode(keys.map(GraftSqlBridge.expression), sortOrder, k,
        df.queryExecution.analyzed))
  }
}
