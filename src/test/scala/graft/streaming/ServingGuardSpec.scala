package graft.streaming

import org.scalatest.funsuite.AnyFunSuite

/** State-transition contract of [[ServingGuard]] vs the reference
  * LoadBalancer (server/load_balancer.cpp:8-120, 173-244). */
class ServingGuardSpec extends AnyFunSuite {

  /** Guard on a settable clock — breaker timeouts without sleeping. */
  private def clocked(maxConcurrent: Int = 100): (ServingGuard, () => Unit) = {
    var t = 0L
    val g = new ServingGuard(maxConcurrent = maxConcurrent, now = () => t)
    (g, () => t += 31000L) // one tick > the 30 s breaker timeout
  }

  test("errors above the 50% rate open the circuit; open circuit rejects without running") {
    val (g, _) = clocked()
    intercept[RuntimeException](g.guarded("s")(throw new RuntimeException("boom")))
    assert(g.isCircuitOpen("s")) // 1 error / 1 total = 100% > 50%
    var ran = false
    val e = intercept[g.RejectedException](g.guarded("s") { ran = true })
    assert(!ran && e.reason.contains("circuit open"))
  }

  test("successes keep the circuit closed while the rate stays under threshold") {
    val (g, _) = clocked()
    (1 to 3).foreach(_ => g.guarded("s")(42))
    intercept[RuntimeException](g.guarded("s")(throw new RuntimeException("boom")))
    // 1 error / 4 total = 25% < 50% -> still closed
    assert(!g.isCircuitOpen("s"))
    assert(g.guarded("s")(7) === 7)
  }

  test("after the cool-down one probe passes; cumulative-rate quirk needs a success run to close") {
    val (g, tick) = clocked()
    intercept[RuntimeException](g.guarded("s")(throw new RuntimeException("b1")))
    intercept[g.RejectedException](g.guarded("s")(1)) // open, inside cool-down
    tick() // past breakerTimeoutMs since last failure
    assert(g.guarded("s")(1) === 1) // recovery probe runs
    // reference semantics: rates are CUMULATIVE (1 err / 2 total = 50%,
    // not > threshold on error path, not < threshold on success path) —
    // the circuit stays closed now and more successes keep it closed
    assert(g.guarded("s")(2) === 2)
    assert(!g.isCircuitOpen("s"))
  }

  test("a failed recovery probe re-opens the circuit for another cool-down") {
    val (g, tick) = clocked()
    intercept[RuntimeException](g.guarded("s")(throw new RuntimeException("b1")))
    tick()
    intercept[RuntimeException](g.guarded("s")(throw new RuntimeException("b2")))
    assert(g.isCircuitOpen("s")) // 2/2 = 100% -> reopened
    intercept[g.RejectedException](g.guarded("s")(1))
  }

  test("the concurrency cap rejects as overload and counts it as an error") {
    val (g, _) = clocked(maxConcurrent = 1)
    val latch = new java.util.concurrent.CountDownLatch(1)
    val entered = new java.util.concurrent.CountDownLatch(1)
    val t = new Thread(() => g.guarded("s") { entered.countDown(); latch.await(); 1 })
    t.start()
    entered.await()
    assert(g.currentLoad === 1)
    val e = intercept[g.RejectedException](g.guarded("s")(2))
    assert(e.reason.contains("overloaded"))
    latch.countDown()
    t.join()
    assert(g.currentLoad === 0)
    // the overload rejection recorded an error BEFORE the in-flight call
    // could record its success (0 ok / 1 err at that instant = 100%), so
    // the breaker tripped — the reference's ordering does the same, and
    // the later success at exactly 50% does not close it (reset needs
    // rate strictly below threshold)
    assert(g.isCircuitOpen("s"))
  }

  test("racing admissions never exceed the cap (increment-then-test)") {
    val g = new ServingGuard(maxConcurrent = 4)
    val peak = new java.util.concurrent.atomic.AtomicInteger(0)
    val running = new java.util.concurrent.atomic.AtomicInteger(0)
    val admitted = new java.util.concurrent.atomic.AtomicInteger(0)
    val start = new java.util.concurrent.CountDownLatch(1)
    val threads = (1 to 32).map { _ =>
      val t = new Thread(() => {
        start.await()
        try g.guarded("s") {
          admitted.incrementAndGet()
          val r = running.incrementAndGet()
          peak.getAndUpdate(p => math.max(p, r))
          Thread.sleep(20)
          running.decrementAndGet()
        } catch { case _: g.RejectedException => () }
      })
      t.start(); t
    }
    start.countDown()
    threads.foreach(_.join())
    assert(peak.get() <= 4, s"cap exceeded: peak ${peak.get()}")
    assert(admitted.get() >= 1)
    assert(g.currentLoad === 0)
  }

  test("half-open: concurrent arrivals during the recovery probe are rejected") {
    var t = 0L
    val g = new ServingGuard(now = () => t)
    intercept[RuntimeException](g.guarded("s")(throw new RuntimeException("b")))
    assert(g.isCircuitOpen("s"))
    t += 31000L // past the cool-down: next request becomes THE probe
    val inProbe = new java.util.concurrent.CountDownLatch(1)
    val finish = new java.util.concurrent.CountDownLatch(1)
    val probe = new Thread(() => g.guarded("s") { inProbe.countDown(); finish.await(); 1 })
    probe.start()
    inProbe.await()
    // the circuit is still open and the probe slot is taken
    val e = intercept[g.RejectedException](g.guarded("s")(2))
    assert(e.reason.contains("probe"))
    finish.countDown()
    probe.join()
    // successful probe with rate now 1 err / 2 total = 50%: not < 0.5, so
    // the circuit needs one more successful probe to close (cumulative
    // quirk) — but the NEXT probe is admitted immediately
    assert(g.guarded("s")(3) === 3)
    assert(!g.isCircuitOpen("s"))
  }

  test("EMA latency (alpha 0.1) drives the adaptive timeout with [1s, 30s] clamps") {
    var t = 0L
    val g = new ServingGuard(now = () => t)
    assert(g.requestTimeoutMs("s") === 5000L) // no samples yet
    g.guarded("s") { t += 1000L; 1 } // first sample sets the average
    assert(g.requestTimeoutMs("s") === 3000L) // 3 x 1000
    g.guarded("s") { t += 11000L; 1 } // EMA: 1000*0.9 + 11000*0.1 = 2000
    assert(g.requestTimeoutMs("s") === 6000L)
    g.guarded("s") { t += 100L; 1 } // EMA: 2000*0.9 + 100*0.1 = 1810
    assert(g.requestTimeoutMs("s") === 5430L)
    // a zero-latency sample IS a sample: the sub-ms service gets the
    // documented 1 s clamp, not the 5 s no-sample default forever
    val fast = new ServingGuard(now = () => 0L)
    assert(fast.requestTimeoutMs("s") === 5000L) // truly no sample yet
    fast.guarded("s")(1)
    assert(fast.requestTimeoutMs("s") === 1000L)
  }

  // --- maintenance loop (reference load_balancer.cpp:247-269) -------------

  test("maintenanceTick decays counters so one probe success can close after an error burst") {
    val (g, tick) = clocked()
    (1 to 3).foreach(_ =>
      intercept[RuntimeException](g.guarded("s")(throw new RuntimeException("b"))))
    assert(g.isCircuitOpen("s")) // 3/3 = 100%
    // decay drives the cumulative counters down while the circuit is open
    (1 to 20).foreach(_ => g.maintenanceTick())
    tick() // past the cool-down: next request is THE probe
    assert(g.guarded("s")(1) === 1)
    // WITHOUT decay the probe success would sit at 3 err / 4 total = 75%
    // and the cumulative-rate quirk would hold the circuit open; decayed
    // to 0 errors, the single success closes it
    assert(!g.isCircuitOpen("s"))
  }

  test("maintenanceTick auto-closes a circuit open past 2x the breaker timeout") {
    var t = 0L
    val g = new ServingGuard(now = () => t)
    intercept[RuntimeException](g.guarded("s")(throw new RuntimeException("b")))
    assert(g.isCircuitOpen("s"))
    t += 61000L // > 2x30s since the failure -> auto-recovery fires
    g.maintenanceTick()
    assert(!g.isCircuitOpen("s"))
    // reference reset (success=1, error=0): requests flow directly — no
    // single-probe gating — and a fresh failure at 1/3 rate stays closed
    assert(g.guarded("s")(5) === 5)
    assert(g.guarded("s")(6) === 6)
    intercept[RuntimeException](g.guarded("s")(throw new RuntimeException("b2")))
    assert(!g.isCircuitOpen("s")) // 1 err / 4 total (1 seeded + 2 + 1) = 25%
  }

  // --- token-bucket rate limiter (reference query_service.cpp:639-677) ---

  test("token bucket: burst within budget passes, then sheds until refill") {
    var ns = 0L
    val b = new TokenBucket(requestsPerSecond = 1000L, burstSize = 5L, nanoNow = () => ns)
    assert((1 to 5).forall(_ => b.tryAcquire())) // full bucket = burst size
    assert(!b.tryAcquire()) // empty, no time passed
    ns += 1000000L // 1 ms at 1000 rps = exactly one refill period
    assert(b.tryAcquire() && !b.tryAcquire()) // one token back, no more
    ns += 3500000L // 3.5 periods -> floor to 3 tokens (reference flooring)
    assert(b.available === 3L)
    ns += 60000000000L // a minute: refill caps at the burst size
    assert(b.available === 5L)
  }

  test("token bucket: sub-period elapses add nothing and keep the anchor (reference quirk)") {
    var ns = 0L
    val b = new TokenBucket(requestsPerSecond = 10L, burstSize = 2L, nanoNow = () => ns)
    assert(b.tryAcquire() && b.tryAcquire() && !b.tryAcquire())
    ns += 99000000L // 99 ms < the 100 ms period: no refill, anchor unmoved
    assert(!b.tryAcquire())
    ns += 1000000L // total 100 ms from the ORIGINAL anchor -> one token
    assert(b.tryAcquire() && !b.tryAcquire())
  }

  test("token bucket: rates above 1e9 rps clamp to a 1 ns period instead of dividing by zero") {
    var ns = 0L
    val b = new TokenBucket(requestsPerSecond = 5000000000L, burstSize = 2L, nanoNow = () => ns)
    assert(b.tryAcquire() && b.tryAcquire() && !b.tryAcquire())
    ns += 3L // 3 ns at the clamped 1 ns period -> refill (capped at burst)
    assert(b.available === 2L)
    b.updateRate(2000000000L) // live update clamps the same way
    assert(b.tryAcquire())
  }

  test("token bucket: updateRate changes the refill period live") {
    var ns = 0L
    val b = new TokenBucket(requestsPerSecond = 1L, burstSize = 1L, nanoNow = () => ns)
    assert(b.tryAcquire() && !b.tryAcquire())
    b.updateRate(1000L) // 1 rps -> 1000 rps
    ns += 1000000L // 1 ms now refills one token
    assert(b.tryAcquire())
    intercept[IllegalArgumentException](b.updateRate(0L))
  }

  test("token bucket: updateRate never converts old-rate elapsed time at the new period") {
    var ns = 0L
    val b = new TokenBucket(requestsPerSecond = 1L, burstSize = 100L, nanoNow = () => ns)
    (1 to 100).foreach(_ => assert(b.tryAcquire()))
    assert(!b.tryAcquire())
    ns += 500000000L // 0.5 s at 1 rps: zero tokens earned (sub-period)
    b.updateRate(10000L)
    // old behavior: 0.5 s / 100 us = 5000 "tokens" -> instant full burst
    // the slow rate never earned; the refill+anchor reset forfeits the
    // residual instead (documented floor-drop semantics)
    assert(b.available === 0L, "old-rate residual minted tokens at the new rate")
    ns += 1000000L // 1 ms at the NEW rate -> 10 tokens
    assert(b.available === 10L)
    // and time credited BEFORE the switch stays credited at the old rate
    var ns2 = 0L
    val b2 = new TokenBucket(requestsPerSecond = 1L, burstSize = 100L, nanoNow = () => ns2)
    (1 to 100).foreach(_ => assert(b2.tryAcquire()))
    ns2 += 5000000000L // 5 s at 1 rps = 5 earned tokens
    b2.updateRate(10000L)
    assert(b2.available === 5L, "legitimately earned old-rate tokens were forfeited")
  }

  test("maintenanceTick never auto-closes while a recovery probe is in flight") {
    var t = 0L
    val g = new ServingGuard(now = () => t)
    intercept[RuntimeException](g.guarded("s")(throw new RuntimeException("b")))
    assert(g.isCircuitOpen("s"))
    t += 31000L // past the cool-down: next admit becomes the probe
    g.guarded("s") {
      // probe in flight; an overdue maintenance tick must NOT close the
      // circuit under it (that would admit full traffic against the
      // still-unproven backend and allow a second concurrent probe)
      t += 40000L // now > 2x breakerTimeout since the failure
      g.maintenanceTick()
      // the circuit must still be in probing state: a concurrent arrival
      // is rejected, not admitted as if the auto-close had fired
      intercept[g.RejectedException](g.guarded("s")(42))
      "probe-ok"
    }
    // the probe's own success closed the circuit
    assert(!g.isCircuitOpen("s"))
    assert(g.guarded("s")(7) === 7)
  }

  test("guarded sheds over-rps load as rejection without tripping the breaker") {
    var ns = 0L
    val bucket = new TokenBucket(requestsPerSecond = 1000L, burstSize = 3L, nanoNow = () => ns)
    val g = new ServingGuard(now = () => ns / 1000000L, rateLimiter = Some(() => bucket))
    // burst within budget passes
    (1 to 3).foreach(i => assert(g.guarded("s")(i) === i))
    // sustained flood past the burst sheds...
    val e = intercept[g.RejectedException](g.guarded("s")(99))
    assert(e.reason.contains("rate limited"))
    // ...and the shed is NOT a service error: breaker stays closed and the
    // next in-budget request runs normally
    assert(!g.isCircuitOpen("s"))
    ns += 2000000L // 2 ms at 1000 rps -> 2 tokens back
    assert(g.guarded("s")(7) === 7)
  }

  test("token bucket properties: admissions never exceed burst + refill budget") {
    // property over random (rps, burst, event sequence): at any point, the
    // number of admits can never exceed burst + floor-refilled tokens —
    // the token-conservation invariant of the reference's bucket
    import org.scalacheck.{Gen, Prop}
    val evGen = for {
      rps <- Gen.chooseNum(1L, 100000L)
      burst <- Gen.chooseNum(1L, 64L)
      steps <- Gen.listOfN(200, Gen.chooseNum(0L, 2000000L)) // ns gaps
    } yield (rps, burst, steps)
    val res = org.scalacheck.Test.check(
      org.scalacheck.Test.Parameters.default.withMinSuccessfulTests(100),
      Prop.forAll(evGen) { case (rps, burst, steps) =>
        var ns = 0L
        val b = new TokenBucket(rps, burst, () => ns)
        val period = 1000000000L / rps
        var admitted = 0L
        steps.foreach { gap =>
          ns += gap
          if (b.tryAcquire()) admitted += 1
        }
        // independent upper bound on refill: full elapsed time / period
        admitted <= burst + ns / period
      })
    assert(res.passed, res.status.toString)
  }

  test("rate-limit budgets are per service: a flood on one never sheds another") {
    // one bucket is minted PER service name from the factory — a shared
    // bucket would let a flood on service "a" consume "b"'s entire budget
    var ns = 0L
    val g = new ServingGuard(
      now = () => ns / 1000000L,
      rateLimiter = Some(() => new TokenBucket(requestsPerSecond = 1000L, burstSize = 2L, nanoNow = () => ns)))
    // exhaust a's burst and keep flooding past it
    (1 to 2).foreach(i => assert(g.guarded("a")(i) === i))
    intercept[g.RejectedException](g.guarded("a")(99))
    // b's budget is untouched by a's flood
    (1 to 2).foreach(i => assert(g.guarded("b")(i) === i))
    intercept[g.RejectedException](g.guarded("b")(99))
    // and the minted buckets are distinct, stable instances
    assert(g.rateLimiterFor("a").get ne g.rateLimiterFor("b").get)
    assert(g.rateLimiterFor("a").get eq g.rateLimiterFor("a").get)
  }

  test("rateLimiter = None disables shedding entirely") {
    val g = new ServingGuard(now = () => 0L, rateLimiter = None)
    (1 to 500).foreach(i => assert(g.guarded("s")(i) === i)) // > any burst
  }

  test("adaptive batch size follows load factor (16/32/64)") {
    val (g, _) = clocked(maxConcurrent = 10)
    assert(g.optimalBatchSize === 16) // 0% load
    val latch = new java.util.concurrent.CountDownLatch(1)
    val entered = new java.util.concurrent.CountDownLatch(5)
    val threads = (1 to 5).map { _ =>
      val t = new Thread(() => g.guarded("s") { entered.countDown(); latch.await(); 1 })
      t.start(); t
    }
    entered.await()
    assert(g.optimalBatchSize === 32) // 50% load
    latch.countDown()
    threads.foreach(_.join())
    assert(g.optimalBatchSize === 16)
  }
}
