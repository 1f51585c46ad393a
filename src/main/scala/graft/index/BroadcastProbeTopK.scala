package graft.index

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, AttributeSet}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{BroadcastDistribution, Distribution, IdentityBroadcastMode, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.execution.metric.{SQLMetric, SQLMetrics}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.graft.GraftSqlBridge
import org.apache.spark.sql.types.{DoubleType, IntegerType, LongType}

/**
 * Deopt-immune BOUNDED flood search: [[ListScanTopK]] with the probe index
 * delivered through Spark's own lazy broadcast exchange instead of a
 * driver-built `SparkContext.broadcast`. The probed query rows
 * `(qid, qvec, list_id)` — one per (query, probe), computed DISTRIBUTED by
 * the probe expression — arrive as this operator's broadcast child
 * ([[IdentityBroadcastMode]]); each executor folds them into a
 * [[ProbeIndex]] once (memoized on the broadcast value) and the corpus
 * scan runs the exact [[TopKScanIterator]] loop of the static path.
 *
 * Why this exists (round-7 task 1): the join-path shape it replaces
 * (`corpus join broadcast(probed)` → distance-per-candidate-row →
 * [[PartialTopK]]) ran all per-candidate work inside whole-stage-generated
 * glue, which rounds 3–6 measured intermittently executing 10–18×
 * slower when the per-plan generated class deoptimized (the exposure
 * [[ListScanTopK]] shed for the static path). Here generated code touches
 * only corpus rows; per-candidate work is the distance kernel plus a
 * buffer insert in scalac-compiled classes.
 *
 * Scale properties (the reason this is the BELOW-gate path):
 *  - the corpus NEVER shuffles — same single-pass scan-in-place as the
 *    broadcast equi-join it replaces, the property that matters at 100 TB;
 *  - the broadcast ships each query vector ONCE (the equi-join's exchange
 *    shipped one copy per probe row, nprobe× more);
 *  - plan construction stays lazy (no driver jobs) — the ForceJoin /
 *    streaming-serve contract; the exchange collects the probed side only
 *    at execution, exactly like the hint-based join did internally.
 * Callers gate entry by [[IvfFlatIndex.fitsBroadcastGate]]; above the gate
 * the flood goes through [[CoGroupTopK]] (co-partitioned, nothing
 * broadcast). Reference semantics unchanged: engine/kernels.cuh:84-185
 * per-list scan into per-thread insertion buffers.
 *
 * Output: partial rows `(_1 qid, _2 id, _3 dist)` for
 * [[TopKAggregator.finalizePartial]].
 */
case class BroadcastProbeTopKNode(
    k: Int,
    maxKeys: Int,
    metric: Int,
    override val output: Seq[Attribute],
    probed: LogicalPlan,
    corpus: LogicalPlan) extends BinaryNode {
  override def left: LogicalPlan = probed
  override def right: LogicalPlan = corpus
  // consumes every child column — blocks column pruning from deleting the
  // positionally-read (qid, qvec, list_id) / (id, list_id, payload) inputs
  override def references: AttributeSet = left.outputSet ++ right.outputSet
  override def producedAttributes: AttributeSet = outputSet
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): BroadcastProbeTopKNode =
    copy(probed = newLeft, corpus = newRight)
}

case class BroadcastProbeTopKExec(
    k: Int,
    maxKeys: Int,
    metric: Int,
    override val output: Seq[Attribute],
    probed: SparkPlan,
    corpus: SparkPlan) extends BinaryExecNode {

  override def left: SparkPlan = probed
  override def right: SparkPlan = corpus
  override def producedAttributes: AttributeSet = outputSet

  /** The probed side materializes as one executor-shared row array; the
    * corpus side scans wherever it already lives (no shuffle). */
  override def requiredChildDistribution: Seq[Distribution] =
    Seq(BroadcastDistribution(IdentityBroadcastMode), UnspecifiedDistribution)

  override lazy val metrics: Map[String, SQLMetric] = Map(
    "numOutputRows" -> SQLMetrics.createMetric(sparkContext, "number of output rows"),
    "numCandidates" -> SQLMetrics.createMetric(sparkContext, "candidates scored"))

  override protected def doExecute(): RDD[InternalRow] = {
    val kLocal = k
    val maxLocal = maxKeys
    val metricLocal = metric
    val corpusTypes = corpus.output.map(_.dataType)
    require(corpusTypes.take(2) == Seq(LongType, IntegerType),
      s"BroadcastProbeTopKExec needs (LONG id, INT list_id, payload) corpus, got $corpusTypes")
    val probedTypes = probed.output.map(_.dataType)
    require(probedTypes.head == LongType && probedTypes(2) == IntegerType,
      s"BroadcastProbeTopKExec needs (LONG qid, qvec, INT list_id) probed side, got $probedTypes")
    val outRows = longMetric("numOutputRows")
    val cands = longMetric("numCandidates")
    val bcRows = probed.executeBroadcast[Array[InternalRow]]()
    corpus.execute().mapPartitions({ rows =>
      val pi = BroadcastProbeTopK.probeIndexFor(bcRows.value)
      new TopKScanIterator(rows, new LocalFlatScorer(pi, metricLocal),
        kLocal, maxLocal, outRows, cands)
    }, preservesPartitioning = true)
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): BroadcastProbeTopKExec =
    copy(probed = newLeft, corpus = newRight)
}

object BroadcastProbeTopK {

  /** Per-executor [[ProbeIndex]] memo, keyed on the broadcast's
    * deserialized row-array identity (one instance per executor, held by
    * the block manager): every task of every partition reuses one fold,
    * and the entry dies with the broadcast block. */
  private val piCache = new java.util.WeakHashMap[AnyRef, ProbeIndex]

  private[index] def probeIndexFor(rows: Array[InternalRow]): ProbeIndex =
    piCache.synchronized {
      val hit = piCache.get(rows)
      if (hit != null) hit
      else {
        val pi = build(rows)
        piCache.put(rows, pi)
        pi
      }
    }

  /** Fold broadcast probed rows (qid, qvec, list_id) into the static
    * path's [[ProbeIndex]] shape: each query's vector decoded ONCE (the
    * rows repeat it per probe), per-list positions into the batch. */
  private def build(rows: Array[InternalRow]): ProbeIndex = {
    var nlist = 0
    var i = 0
    while (i < rows.length) {
      val r = rows(i)
      if (!r.isNullAt(2)) {
        val l = r.getInt(2)
        if (l + 1 > nlist) nlist = l + 1
      }
      i += 1
    }
    val posOf = new java.util.HashMap[java.lang.Long, Integer]()
    val qids = new scala.collection.mutable.ArrayBuffer[Long]
    val qvecs = new scala.collection.mutable.ArrayBuffer[Array[Float]]
    val perList = Array.fill(nlist)(new scala.collection.mutable.ArrayBuilder.ofInt)
    i = 0
    while (i < rows.length) {
      val r = rows(i)
      // a null qvec query yields no rows (matches the old join path, where
      // its null distances were dropped inside the top-k)
      if (!(r.isNullAt(0) || r.isNullAt(1) || r.isNullAt(2))) {
        val qid = r.getLong(0)
        var p = posOf.get(qid)
        if (p == null) {
          p = Integer.valueOf(qids.length)
          posOf.put(qid, p)
          qids += qid
          qvecs += r.getArray(1).toFloatArray()
        }
        perList(r.getInt(2)) += p.intValue()
      }
      i += 1
    }
    ProbeIndex(qids.toArray, qvecs.toArray, perList.map { b =>
      val a = b.result(); if (a.isEmpty) null else a
    })
  }

  /**
   * Wrap a probed query stream and a corpus in the operator. `probed`
   * needs columns (qid, qvec, list_id) — one row per (query, probe);
   * `corpus` needs (id, list_id, vec). Output is the partial-rows
   * contract of [[TopKAggregator.finalizePartial]].
   */
  def apply(probed: DataFrame, corpus: DataFrame, k: Int, metric: Int,
      maxKeys: Int = TopKAggregator.MaxPartialKeys): DataFrame = {
    require(maxKeys > 0, s"maxKeys must be positive, got $maxKeys")
    val spark: SparkSession = probed.sparkSession
    GraftSqlBridge.ensureStrategy(spark, BroadcastProbeTopKStrategy)
    val out = Seq(
      AttributeReference("_1", LongType, nullable = false)(),
      AttributeReference("_2", LongType, nullable = false)(),
      AttributeReference("_3", DoubleType, nullable = false)())
    val probedPlan = probed
      .select(col("qid").cast("long"), col("qvec"), col("list_id").cast("int"))
      .queryExecution.analyzed
    val corpusPlan = corpus
      .select(col("id").cast("long"), col("list_id").cast("int"), col("vec"))
      .queryExecution.analyzed
    GraftSqlBridge.ofRows(spark,
      BroadcastProbeTopKNode(k, maxKeys, metric, out, probedPlan, corpusPlan))
  }
}

/** Plans [[BroadcastProbeTopKNode]]; injected additively per session. */
object BroadcastProbeTopKStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case BroadcastProbeTopKNode(k, maxKeys, metric, out, probed, corpus) =>
      BroadcastProbeTopKExec(k, maxKeys, metric, out,
        planLater(probed), planLater(corpus)) :: Nil
    case _ => Nil
  }
}
