package graft.streaming

/**
 * Token-bucket rate limiter — the reference's RateLimiter semantics
 * (reference server/query_service.h:169-191, query_service.cpp:639-677;
 * defaults 10000 rps / burst 100 from query_service.h:172-173, production
 * deploys 10000/200 via configs/production.yaml:31-33): bucket starts
 * full at `burstSize`, each admit takes `n` tokens, refill adds
 * `elapsed / refillPeriod` tokens capped at the burst size. The refill
 * resets its anchor to `now` and floors the token count, dropping the
 * fractional remainder exactly as the reference does
 * (query_service.cpp:668-677) — sustained throughput lands marginally
 * under the nominal rate; mirrored as-is for parity.
 *
 * The reference DECLARES this class but never calls it from the request
 * path; here it is wired into [[ServingGuard.guarded]] as pre-admission
 * control, ahead of the breaker and the concurrency cap.
 */
final class TokenBucket(
    val requestsPerSecond: Long = 10000L,
    val burstSize: Long = 100L,
    nanoNow: () => Long = () => System.nanoTime()) {
  require(requestsPerSecond > 0, s"requestsPerSecond must be positive: $requestsPerSecond")
  require(burstSize > 0, s"burstSize must be positive: $burstSize")

  private[this] var tokens: Long = burstSize
  private[this] var lastRefillNs: Long = nanoNow()
  // >= 1 ns: at rates above 1e9 rps the integer period would floor to 0
  // and refill would divide by zero — clamp instead (≥1e9 rps is
  // effectively "refill every nanosecond", i.e. unlimited)
  private[this] var refillPeriodNs: Long = math.max(1L, 1000000000L / requestsPerSecond)

  /** Take `n` tokens if available; never blocks (query_service.cpp:646-656). */
  def tryAcquire(n: Long = 1L): Boolean = synchronized {
    refill()
    if (tokens >= n) { tokens -= n; true } else false
  }

  /** Live rate adjustment (query_service.cpp:663-666). Credits elapsed
    * time at the OLD rate first: without the refill, idle nanoseconds
    * accrued under a slow rate would be converted at the new period on
    * the next acquire — raising the limit after an idle stretch would
    * instantly mint a full burst the old rate never earned (and lowering
    * it would forfeit legitimately earned tokens). */
  def updateRate(rps: Long): Unit = synchronized {
    require(rps > 0, s"rate must be positive: $rps")
    refill()
    // reset the anchor even when refill() credited nothing (sub-period
    // elapse): the residual nanoseconds were earned at the old rate and
    // must not convert at the new period — dropping them matches the
    // bucket's documented floor-drop semantics (at most one old-rate
    // token forfeited)
    lastRefillNs = nanoNow()
    refillPeriodNs = math.max(1L, 1000000000L / rps)
  }

  /** Tokens currently in the bucket (post-refill); for metrics/specs. */
  def available: Long = synchronized { refill(); tokens }

  private def refill(): Unit = {
    val now = nanoNow()
    val elapsed = now - lastRefillNs
    if (elapsed >= refillPeriodNs) {
      tokens = math.min(burstSize, tokens + elapsed / refillPeriodNs)
      lastRefillNs = now
    }
  }
}

/**
 * Serving-side admission control — the reference's LoadBalancer semantics
 * (reference server/load_balancer.cpp:8-120, 173-244) as a plain decorator
 * around batch handlers, with the same constants and transitions:
 *
 *  - **Rate limit**: ONE [[TokenBucket]] per service name (minted lazily
 *    from the injected factory, mirroring the per-service breaker/metrics
 *    map — a flood on one service must not consume another's shed
 *    budget), at the reference's defaults (10k rps, burst 100), shedding
 *    requests before they touch the breaker or the in-flight counter. A
 *    shed request is NOT counted as a service error — it never reached
 *    the backend, and counting it would trip the breaker on exactly the
 *    floods the limiter is correctly absorbing.
 *  - **Concurrency cap** (`maxConcurrent`, default 100): a request
 *    arriving while the in-flight count is at the cap is rejected as
 *    overload AND counted as an error (load_balancer.cpp:47-52).
 *  - **Circuit breaker** per service name: cumulative error rate above
 *    `breakerThreshold` (0.5) opens the circuit (:238-241); an open
 *    circuit rejects without running the handler (:40-44) until
 *    `breakerTimeoutMs` (30 s) after the last failure. Recovery is an
 *    INTENTIONAL hardening over the reference: where the reference
 *    fully closes the circuit at cool-down and lets every queued
 *    request through at once (load_balancer.cpp:199-203), this guard
 *    goes true-half-open — exactly ONE probe runs while the circuit
 *    stays open, its success closes the circuit (only while the
 *    cumulative rate sits below the threshold, :227-230 — the
 *    reference's rates are cumulative, not windowed, so a long error
 *    burst needs a matching success run to close; that part mirrored
 *    as-is), its failure restarts the cool-down.
 *  - **EMA latency** (alpha 0.1, :218-225) feeding an adaptive timeout of
 *    3x average clamped to [1 s, 30 s], 5 s before any sample (:91-103).
 *  - **Adaptive batch size** by load factor (:76-86): 16 under 30 % load,
 *    32 under 70 %, 64 above.
 *
 * The clocks are injectable so breaker-timeout and bucket-refill
 * transitions are unit-testable without sleeping.
 */
class ServingGuard(
    val maxConcurrent: Int = 100,
    val breakerThreshold: Double = 0.5,
    val breakerTimeoutMs: Long = 30000L,
    now: () => Long = () => System.currentTimeMillis(),
    val rateLimiter: Option[() => TokenBucket] = Some(() => new TokenBucket())) {

  /** Rejected WITHOUT running the handler: circuit open or overload. */
  final class RejectedException(val reason: String) extends RuntimeException(reason)

  private final class Metrics {
    var successCount = 0L
    var errorCount = 0L
    var circuitOpen = false
    var probing = false // half-open: ONE recovery probe in flight
    var lastFailureMs = 0L
    // DOUBLE, with an explicit has-sample flag: a long EMA would truncate
    // sub-ms latencies to 0 and conflate "avg is 0 ms" with "no sample
    // yet" — a consistently-fast service would then read the 5 s
    // no-sample default timeout forever instead of the 1 s clamp, and a
    // decayed-to-0 average would RESET to the next raw latency instead
    // of averaging into it
    var avgLatencyMs = 0.0
    var hasLatencySample = false
    def errorRate: Double = {
      val total = successCount + errorCount
      if (total == 0) 0.0 else errorCount.toDouble / total
    }
  }

  private val inFlight = new java.util.concurrent.atomic.AtomicInteger(0)
  private val metrics = new java.util.concurrent.ConcurrentHashMap[String, Metrics]()
  private def metricsFor(service: String): Metrics =
    metrics.computeIfAbsent(service, _ => new Metrics)
  // per-service buckets, minted lazily from the factory — mirrors the
  // metrics map so shed budgets are isolated the same way breaker state is
  private val limiters = new java.util.concurrent.ConcurrentHashMap[String, TokenBucket]()

  /** The service's bucket (minted on first use), if rate limiting is on;
    * exposed for metrics/specs (e.g. publishing available tokens). */
  def rateLimiterFor(service: String): Option[TokenBucket] =
    rateLimiter.map(mk => limiters.computeIfAbsent(service, _ => mk()))

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
    // Rate limit first: shedding here costs no lock on the service metrics
    // and leaves breaker state untouched (see class doc).
    rateLimiterFor(service).foreach { rl =>
      if (!rl.tryAcquire()) throw new RejectedException(s"rate limited ($service)")
    }
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
      if (!m.hasLatencySample) latencyMs.toDouble
      else m.avgLatencyMs * 0.9 + latencyMs * 0.1 // EMA alpha 0.1
    m.hasLatencySample = true
    if (m.errorRate < breakerThreshold) m.circuitOpen = false
  }

  private def recordError(m: Metrics): Unit = m.synchronized {
    m.errorCount += 1
    m.probing = false
    m.lastFailureMs = now()
    if (m.errorRate > breakerThreshold) m.circuitOpen = true
  }

  /**
   * One pass of the reference's health-check loop
   * (load_balancer.cpp:247-269), caller-scheduled instead of owning a
   * background thread (injectable-clock testable; a serving deployment
   * calls it every health-check interval):
   *
   *  - decay both counters by 0.95 so the cumulative error rate can
   *    recover without needing a matching success run;
   *  - auto-close any circuit open longer than 2x the breaker timeout,
   *    resetting to (success=1, error=0) — the reference's "give it a
   *    chance" escape hatch for a circuit the cumulative-rate quirk
   *    would otherwise hold open forever.
   */
  def maintenanceTick(): Unit = {
    val it = metrics.values().iterator()
    while (it.hasNext) {
      val m = it.next()
      m.synchronized {
        m.successCount = (m.successCount * 0.95).toLong
        m.errorCount = (m.errorCount * 0.95).toLong
        // never auto-close while a recovery probe is in flight: the
        // probe's own completion decides the outcome, and closing here
        // would admit full traffic against a still-unproven backend AND
        // let a second concurrent "probe" start — the flood-on-recovery
        // the true-half-open design exists to prevent
        if (m.circuitOpen && !m.probing &&
          now() - m.lastFailureMs > breakerTimeoutMs * 2) {
          m.circuitOpen = false
          m.errorCount = 0
          m.successCount = 1 // reference: "Give it a chance"
        }
      }
    }
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
    val m = metricsFor(service)
    val (has, avg) = m.synchronized((m.hasLatencySample, m.avgLatencyMs))
    if (!has) 5000L else math.max(1000L, math.min(30000L, (avg * 3).toLong))
  }
}
