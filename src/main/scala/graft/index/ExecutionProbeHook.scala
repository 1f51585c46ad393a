package graft.index

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.functions.{count, lit}
import org.apache.spark.sql.util.QueryExecutionListener

/**
 * Fires a callback when a search plan actually EXECUTES, not when it is
 * built. The reference counts a list access when a query runs against it
 * (engine/ivf_flat_index.cpp:227-229); recording at plan-construction time
 * (the round-3..5 shape) over-counts — a constructed-but-never-run
 * DataFrame would heat hot-list stats and steer `warmupHot` at phantom
 * partitions.
 *
 * Mechanism: the search result is wrapped with a uniquely-named
 * `observe()` metric (a CollectMetrics node above the top-k — the scans
 * and joins below are untouched), and ONE session-registered
 * [[QueryExecutionListener]] maps completed executions back to their
 * callbacks by metric name. Every successful execution fires once; a
 * failed action fires nothing; re-executing the same DataFrame fires
 * again (each execution served a real batch). Callbacks for plans that
 * are never executed age out of a bounded pending map instead of leaking.
 */
private[graft] object ExecutionProbeHook {

  private val Prefix = "graft_probe_"
  private val MaxPending = 4096
  private val counter = new java.util.concurrent.atomic.AtomicLong()

  // insertion-ordered with eldest-entry eviction: never-executed plans
  // (bounded at MaxPending) are the only entries that age out in practice
  private val pending = java.util.Collections.synchronizedMap(
    new java.util.LinkedHashMap[String, Long => Unit](64, 0.75f, false) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[String, Long => Unit]): Boolean = size() > MaxPending
    })

  private val registered = java.util.Collections.synchronizedMap(
    new java.util.WeakHashMap[SparkSession, java.lang.Boolean]())

  /** Wrap `df` so `fire` runs on each successful execution of the result. */
  def arm(df: DataFrame, fire: () => Unit): DataFrame =
    armTimed(df, _ => fire())

  /** [[arm]] flavor whose callback also receives the execution's wall
    * duration in nanoseconds (the listener's durationNs) — feeds the A10
    * per-index latency histograms without a second timing source. */
  def armTimed(df: DataFrame, fire: Long => Unit): DataFrame = {
    ensureListener(df.sparkSession)
    val name = Prefix + counter.incrementAndGet()
    pending.put(name, fire)
    df.observe(name, count(lit(1)))
  }

  private def ensureListener(spark: SparkSession): Unit =
    registered.synchronized {
      if (registered.get(spark) == null) {
        registered.put(spark, java.lang.Boolean.TRUE)
        spark.listenerManager.register(new QueryExecutionListener {
          override def onSuccess(funcName: String, qe: QueryExecution, durationNs: Long): Unit =
            qe.observedMetrics.keys.foreach { k =>
              if (k.startsWith(Prefix)) Option(pending.get(k)).foreach(_.apply(durationNs))
            }
          override def onFailure(funcName: String, qe: QueryExecution, exception: Exception): Unit = ()
        })
      }
    }
}
