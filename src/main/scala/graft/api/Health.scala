package graft.api

/**
 * A10 health + metrics surface (reference server/health_service.cpp:8-158,
 * metrics collector server/query_service.cpp:679-798) mapped to Spark:
 *
 *  - the reference's device check (CUDA present) becomes "the SparkContext
 *    is alive and block managers respond";
 *  - its memory check (>= 10% GPU memory free) becomes the same ratio over
 *    Spark storage memory per block manager;
 *  - its QueryService check ("any indices loaded") is unchanged;
 *  - its latency histogram (p50/95/99 per index, Prometheus exposition
 *    names from README.md:188-191) is fed by the execution-time hook's
 *    wall durations.
 */
object Health extends Enumeration {
  /** gRPC health-protocol statuses (grpc.health.v1.ServingStatus). */
  val Serving, NotServing, ServiceUnknown = Value
}

/**
 * Lock-free exponential-bucket latency histogram (powers of 2 from 1 ms),
 * the Spark-side stand-in for the reference's MetricsCollector histogram
 * (query_service.cpp:686-760). Percentiles resolve to a bucket's upper
 * bound — coarse but monotone, exactly what serving dashboards need.
 */
final class LatencyHistogram {
  import LatencyHistogram._

  private val buckets = new java.util.concurrent.atomic.AtomicLongArray(NumBuckets)
  private val total = new java.util.concurrent.atomic.AtomicLong()
  private val sumNs = new java.util.concurrent.atomic.AtomicLong()

  def record(durationNs: Long): Unit = {
    buckets.incrementAndGet(bucketOf(durationNs))
    total.incrementAndGet()
    sumNs.addAndGet(durationNs)
  }

  def count: Long = total.get()

  def meanMs: Double = {
    val n = total.get()
    if (n == 0) 0.0 else sumNs.get() / 1e6 / n
  }

  /** Upper bound (ms) of the bucket containing quantile `q` of samples. */
  def percentileMs(q: Double): Double = {
    require(q > 0 && q <= 1, s"quantile must be in (0, 1], got $q")
    val n = total.get()
    if (n == 0) return 0.0
    val target = math.ceil(q * n).toLong
    var seen = 0L
    var i = 0
    while (i < NumBuckets) {
      seen += buckets.get(i)
      if (seen >= target) return upperMs(i)
      i += 1
    }
    upperMs(NumBuckets - 1)
  }
}

object LatencyHistogram {
  /** Buckets: [0,1ms], (1,2], (2,4], ... doubling — 22 buckets cover
    * 1 ms to ~35 min, far past any sane search latency. */
  val NumBuckets = 22

  private def bucketOf(durationNs: Long): Int = {
    val ms = durationNs / 1000000L
    if (ms <= 1) 0
    else math.min(NumBuckets - 1, 64 - java.lang.Long.numberOfLeadingZeros(ms - 1))
  }

  private def upperMs(bucket: Int): Double = (1L << bucket).toDouble
}
