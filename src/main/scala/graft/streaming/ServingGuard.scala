package graft.streaming

/**
 * Serving-side admission control — the reference's LoadBalancer semantics
 * (reference server/load_balancer.cpp:8-120, 173-244) as a plain decorator
 * around batch handlers, with the same constants and transitions:
 *
 *  - **Concurrency cap** (`maxConcurrent`, default 100): a request
 *    arriving while the in-flight count is at the cap is rejected as
 *    overload AND counted as an error (load_balancer.cpp:47-52).
 *  - **Circuit breaker** per service name: cumulative error rate above
 *    `breakerThreshold` (0.5) opens the circuit (:238-241); an open
 *    circuit rejects without running the handler (:40-44) until
 *    `breakerTimeoutMs` (30 s) after the last failure, when ONE probe is
 *    let through (:196-203 "try to recover"); a success closes it only
 *    while the cumulative rate sits below the threshold (:227-230 — the
 *    reference's rates are cumulative, not windowed, so a long error
 *    burst needs a matching success run to close; mirrored as-is).
 *  - **EMA latency** (alpha 0.1, :218-225) feeding an adaptive timeout of
 *    3x average clamped to [1 s, 30 s], 5 s before any sample (:91-103).
 *  - **Adaptive batch size** by load factor (:76-86): 16 under 30 % load,
 *    32 under 70 %, 64 above.
 *
 * The clock is injectable so breaker-timeout transitions are unit-testable
 * without sleeping.
 */
class ServingGuard(
    val maxConcurrent: Int = 100,
    val breakerThreshold: Double = 0.5,
    val breakerTimeoutMs: Long = 30000L,
    now: () => Long = () => System.currentTimeMillis()) {

  /** Rejected WITHOUT running the handler: circuit open or overload. */
  final class RejectedException(val reason: String) extends RuntimeException(reason)

  private final class Metrics {
    var successCount = 0L
    var errorCount = 0L
    var circuitOpen = false
    var probing = false // half-open: ONE recovery probe in flight
    var lastFailureMs = 0L
    var avgLatencyMs = 0L
    def errorRate: Double = {
      val total = successCount + errorCount
      if (total == 0) 0.0 else errorCount.toDouble / total
    }
  }

  private val inFlight = new java.util.concurrent.atomic.AtomicInteger(0)
  private val metrics = new java.util.concurrent.ConcurrentHashMap[String, Metrics]()
  private def metricsFor(service: String): Metrics =
    metrics.computeIfAbsent(service, _ => new Metrics)

  /** In-flight request count (the load the batch sizing adapts to). */
  def currentLoad: Int = inFlight.get()

  /**
   * Run `body` under the guard: throws [[RejectedException]] when the
   * service's circuit is open or the server is at the concurrency cap
   * (the reference's UNAVAILABLE / RESOURCE_EXHAUSTED statuses); otherwise
   * executes, records success latency or failure, and rethrows the
   * handler's own exception after recording it.
   */
  def guarded[T](service: String)(body: => T): T = {
    val m = metricsFor(service)
    m.synchronized {
      if (m.circuitOpen) {
        // TRUE half-open: after the cool-down exactly ONE probe runs while
        // the circuit stays open — closing it on admission would flood the
        // still-failing backend with every queued request at once. The
        // probe's success closes the circuit (inside recordSuccess, only
        // once the cumulative rate allows); its failure restarts the
        // cool-down; concurrent arrivals during the probe are rejected.
        if (m.probing) throw new RejectedException(s"recovery probe in flight for $service")
        if (now() - m.lastFailureMs > breakerTimeoutMs) m.probing = true
        else throw new RejectedException(s"circuit open for $service")
      }
    }
    // increment-then-test: a check-then-increment pair lets N racing
    // threads all pass the check at cap-1 and overshoot the cap by N-1
    val load = inFlight.incrementAndGet()
    if (load > maxConcurrent) {
      inFlight.decrementAndGet()
      recordError(m) // also releases a probe slot this request may hold
      throw new RejectedException(s"server overloaded ($load/$maxConcurrent)")
    }
    val t0 = now()
    try {
      val r = body
      recordSuccess(m, now() - t0)
      r
    } catch {
      case e: Throwable => recordError(m); throw e
    } finally inFlight.decrementAndGet()
  }

  private def recordSuccess(m: Metrics, latencyMs: Long): Unit = m.synchronized {
    m.successCount += 1
    m.probing = false
    m.avgLatencyMs =
      if (m.avgLatencyMs == 0L) latencyMs
      else (m.avgLatencyMs * 0.9 + latencyMs * 0.1).toLong // EMA alpha 0.1
    if (m.errorRate < breakerThreshold) m.circuitOpen = false
  }

  private def recordError(m: Metrics): Unit = m.synchronized {
    m.errorCount += 1
    m.probing = false
    m.lastFailureMs = now()
    if (m.errorRate > breakerThreshold) m.circuitOpen = true
  }

  def isCircuitOpen(service: String): Boolean = {
    val m = metricsFor(service)
    m.synchronized(m.circuitOpen && now() - m.lastFailureMs <= breakerTimeoutMs)
  }

  /** Adaptive micro-batch sizing by load factor (16 / 32 / 64). */
  def optimalBatchSize: Int = {
    val loadFactor = inFlight.get().toDouble / maxConcurrent
    if (loadFactor < 0.3) 16 else if (loadFactor < 0.7) 32 else 64
  }

  /** 3x EMA latency clamped to [1 s, 30 s]; 5 s before any sample. */
  def requestTimeoutMs(service: String): Long = {
    val avg = metricsFor(service).synchronized(metricsFor(service).avgLatencyMs)
    if (avg == 0L) 5000L else math.max(1000L, math.min(30000L, avg * 3))
  }
}
