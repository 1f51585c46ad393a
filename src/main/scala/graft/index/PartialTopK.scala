package graft.index

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeSet, GenericInternalRow, UnsafeProjection}
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
    val types = output.map(_.dataType).toArray
    val outRows = longMetric("numOutputRows")
    child.execute().mapPartitions({ rows =>
      new Iterator[InternalRow] {
        private val map = new LongTopKMap(1 << 10, maxLocal)
        private val proj = UnsafeProjection.create(types)
        private val reused = new GenericInternalRow(3)
        private var out: Iterator[InternalRow] = Iterator.empty
        private var exhausted = false

        override def hasNext: Boolean = {
          while (!out.hasNext && !exhausted) advance()
          out.hasNext
        }
        override def next(): InternalRow = { hasNext; out.next() }

        private def advance(): Unit = {
          while (rows.hasNext && map.size < maxLocal) {
            val r = rows.next()
            // null skip lives here, NOT as a Catalyst filter upstream: an
            // isnotnull on a computed distance column would be substituted
            // into the probe join's condition by predicate pushdown and
            // the distance kernel would evaluate twice per candidate
            if (!(r.isNullAt(0) || r.isNullAt(1) || r.isNullAt(2))) {
              val qid = r.getLong(0)
              var buf = map.get(qid)
              if (buf == null) { buf = TopKBuf.empty(kLocal); map.put(qid, buf) }
              buf.insert(r.getDouble(2), r.getLong(1))
            }
          }
          if (!rows.hasNext) exhausted = true
          out = map.drain().iterator.flatMap { case (qid, buf) =>
            Iterator.range(0, buf.size).map { j =>
              reused.setLong(0, qid)
              reused.setLong(1, buf.ids(j))
              reused.setDouble(2, buf.dists(j))
              outRows += 1
              // the projection's UnsafeRow buffer is reused per row — fine
              // for every consumer (exchanges and object-deserializers
              // copy eagerly), same contract as codegen'd operators
              proj(reused)
            }
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
