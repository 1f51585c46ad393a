package graft.index

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeSet}
import org.apache.spark.sql.catalyst.expressions.codegen.UnsafeRowWriter
import org.apache.spark.sql.types.{DoubleType, LongType}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.execution.metric.{SQLMetric, SQLMetrics}
import org.apache.spark.sql.graft.GraftSqlBridge

/**
 * Map-side partial top-k as a first-class physical operator — the
 * partial/final shape of the reference's per-thread top-32 insertion
 * buffers feeding a k-way merge (reference engine/kernels.cuh:120-170,
 * ivf_flat_index.cpp:474-518), expressed as a narrow Catalyst node so the
 * surrounding plan (probe join, partition-pruned scan) stays visible in
 * `explain` instead of vanishing behind an opaque RDD boundary.
 *
 * Each partition's candidate stream `(qid LONG, id LONG, dist DOUBLE)` is
 * reduced to at most `distinct(qid) x k` rows in one pass, reading the
 * child's InternalRows with primitive getters and keying a primitive-long
 * open-addressing map ([[LongTopKMap]]): the per-candidate hot loop
 * allocates nothing. The typed-Dataset `mapPartitions` shape this replaces
 * paid a Tuple3 + two boxed Longs + a boxed Double (encoder decode) plus a
 * boxed HashMap key for every candidate — at tens of millions of
 * candidates per serving batch that allocation traffic, not the distance
 * kernel, dominated the profile.
 *
 * Memory stays bounded at any query cardinality: when a partition holds
 * more than `maxKeys` distinct qids the map drains to the output stream
 * and restarts (the final merge re-combines the fragments).
 */
case class PartialTopKNode(k: Int, maxKeys: Int, child: LogicalPlan)
    extends UnaryNode {
  override def output: Seq[Attribute] = child.output
  // consumes every child column — blocks column pruning from deleting the
  // pass-through attributes
  override def references: AttributeSet = child.outputSet
  override def maxRows: Option[Long] = child.maxRows
  override protected def withNewChildInternal(newChild: LogicalPlan): PartialTopKNode =
    copy(child = newChild)
}

case class PartialTopKExec(k: Int, maxKeys: Int, child: SparkPlan)
    extends UnaryExecNode {
  override def output: Seq[Attribute] = child.output
  override def outputPartitioning: org.apache.spark.sql.catalyst.plans.physical.Partitioning =
    child.outputPartitioning

  override lazy val metrics: Map[String, SQLMetric] = Map(
    "numOutputRows" -> SQLMetrics.createMetric(sparkContext, "number of output rows"))

  override protected def doExecute(): RDD[InternalRow] = {
    val kLocal = k
    val maxLocal = maxKeys
    require(output.map(_.dataType) == Seq(LongType, LongType, DoubleType),
      s"PartialTopKExec needs (LONG, LONG, DOUBLE) input, got ${output.map(_.dataType)}")
    val outRows = longMetric("numOutputRows")
    child.execute().mapPartitions({ rows =>
      new Iterator[InternalRow] {
        // buffer strategy by k: TopKBuf's sorted-array insert (one-compare
        // reject, O(k) arraycopy accept) wins for serving-sized k; above
        // the threshold a rerank-all shape (k >= candidates per query)
        // would pay O(n^2/4) shifts, so large k switches to the O(log k)
        // heap ([[TopKHeap]]) with one heapsort at drain
        private val useHeap = kLocal > PartialTopK.HeapThreshold
        private val bufMap =
          if (useHeap) null else new LongTopKMap[TopKBuf](1 << 10, maxLocal)
        private val heapMap =
          if (useHeap) new LongTopKMap[TopKHeap](1 << 10, maxLocal) else null
        // fixed 3-primitive schema -> hand-rolled UnsafeRow writer; an
        // UnsafeProjection.create here would re-run source generation +
        // codegen-cache lookup in EVERY task, which dominated small-batch
        // serving latency (measured ~2x task time at 100-query batches)
        private val writer = new UnsafeRowWriter(3)
        private var out: Iterator[InternalRow] = Iterator.empty
        private var exhausted = false

        override def hasNext: Boolean = {
          while (!out.hasNext && !exhausted) advance()
          out.hasNext
        }
        override def next(): InternalRow = { hasNext; out.next() }

        @inline private def mapSize: Int = if (useHeap) heapMap.size else bufMap.size

        private var debugT0 = 0L
        private def advance(): Unit = {
          if (debugT0 == 0) debugT0 = System.nanoTime()
          while (rows.hasNext && mapSize < maxLocal) {
            val r = rows.next()
            // null skip lives here, NOT as a Catalyst filter upstream: an
            // isnotnull on a computed distance column would be substituted
            // into the probe join's condition by predicate pushdown and
            // the distance kernel would evaluate twice per candidate
            if (!(r.isNullAt(0) || r.isNullAt(1) || r.isNullAt(2))) {
              val qid = r.getLong(0)
              if (useHeap) {
                var h = heapMap.get(qid)
                if (h == null) { h = new TopKHeap(kLocal); heapMap.put(qid, h) }
                h.insert(r.getDouble(2), r.getLong(1))
              } else {
                var buf = bufMap.get(qid)
                if (buf == null) { buf = TopKBuf.empty(kLocal); bufMap.put(qid, buf) }
                buf.insert(r.getDouble(2), r.getLong(1))
              }
            }
          }
          if (!rows.hasNext) {
            exhausted = true
            if (PartialTopK.debugEnabled)
              System.err.println(f"[ptopk-task] k=$kLocal heap=$useHeap " +
                f"wall=${(System.nanoTime() - debugT0) / 1e6}%.1f ms qids=$mapSize")
          }
          // the writer's UnsafeRow buffer is reused per row — fine for
          // every consumer (exchanges and object-deserializers copy
          // eagerly), same contract as codegen'd operators
          @inline def emit(qid: Long, id: Long, dist: Double): InternalRow = {
            writer.reset()
            writer.write(0, qid)
            writer.write(1, id)
            writer.write(2, dist)
            outRows += 1
            writer.getRow
          }
          out =
            if (useHeap) heapMap.drain().iterator.flatMap { case (qid, h) =>
              h.sortAscending()
              Iterator.range(0, h.size).map(j => emit(qid, h.ids(j), h.dists(j)))
            }
            else bufMap.drain().iterator.flatMap { case (qid, buf) =>
              Iterator.range(0, buf.size).map(j => emit(qid, buf.ids(j), buf.dists(j)))
            }
        }
      }
    }, preservesPartitioning = true)
  }

  override protected def withNewChildInternal(newChild: SparkPlan): PartialTopKExec =
    copy(child = newChild)
}

/** Plans [[PartialTopKNode]]; injected additively per session. */
object PartialTopKStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case PartialTopKNode(k, maxKeys, child) =>
      PartialTopKExec(k, maxKeys, planLater(child)) :: Nil
    case _ => Nil
  }
}

object PartialTopK {

  /** Task-side wall prints for the combine loop (diagnostics only). */
  private[index] val debugEnabled = sys.env.contains("GRAFT_TOPK_DEBUG")

  /** k above which the partial combine switches from [[TopKBuf]]'s
    * sorted-array insert to the [[TopKHeap]] max-heap — one step past the
    * reference's serving topk cap (1 <= topk <= 1000,
    * server/query_service.cpp:77), so every serving-shaped search keeps
    * the one-compare-reject buffer and only rerank-all style exhaustive
    * searches pay the heap's extra compare per accept. */
  val HeapThreshold = 1024

  /** Wrap `candidates` — already shaped (qid LONG, id LONG, dist DOUBLE);
    * rows with a null slot are skipped inside the operator — in the
    * partial top-k operator. */
  def apply(candidates: DataFrame, k: Int, maxKeys: Int): DataFrame = {
    val spark: SparkSession = candidates.sparkSession
    GraftSqlBridge.ensureStrategy(spark, PartialTopKStrategy)
    GraftSqlBridge.ofRows(spark,
      PartialTopKNode(k, maxKeys, candidates.queryExecution.analyzed))
  }
}
