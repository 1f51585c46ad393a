package graft.index

import graft.SparkSpec

/**
 * Per-owner eviction attribution (the round-11 "counters are JVM-global"
 * advisory): two VectorDB facades in one JVM must be able to tell WHOSE
 * serving loop outran the probe-map caps.
 *
 * This suite floods the PENDING map past its cap (4096) — safe because
 * sbt runs suites sequentially in the forked test JVM, so no other
 * suite's armed-but-not-yet-executed plan can be alive to lose its
 * callback to our flood.
 */
class ExecutionProbeHookSpec extends SparkSpec {

  test("pending-map evictions are attributed to the arming owner") {
    val s = spark
    import s.implicits._
    val df = Seq(1).toDF("x")
    val owner = "probe-owner-" + System.nanoTime()
    val bystander = "probe-bystander-" + System.nanoTime()

    val beforeOwner = ExecutionProbeHook.pendingEvictionsFor(owner)
    val beforeTotal = ExecutionProbeHook.pendingEvictions.get()
    assert(beforeOwner === 0L, "a never-armed owner starts at zero")

    // fill past the cap: the map keeps the LAST 4096 inserted, so at
    // least `overflow` of OUR entries are evicted regardless of how many
    // stale entries other suites left behind
    val overflow = 50
    (0 until 4096 + overflow).foreach { _ =>
      ExecutionProbeHook.arm(df, () => (), owner)
    }
    assert(ExecutionProbeHook.pendingEvictionsFor(owner) >= overflow.toLong,
      "owner must be charged for its own evicted callbacks")
    assert(ExecutionProbeHook.pendingEvictions.get() - beforeTotal >=
      ExecutionProbeHook.pendingEvictionsFor(owner) - beforeOwner,
      "the JVM total includes every per-owner count")
    assert(ExecutionProbeHook.pendingEvictionsFor(bystander) === 0L,
      "an uninvolved owner must not be charged")
    // the untagged default rolls into the JVM totals only
    assert(ExecutionProbeHook.pendingEvictionsFor("") === 0L)
  }

  test("a released owner's probes neither re-fire nor re-enter the re-fire map") {
    val s = spark
    import s.implicits._
    val owner = "probe-released-" + System.nanoTime()
    val fires = new java.util.concurrent.atomic.AtomicLong()
    val df = ExecutionProbeHook.arm(
      Seq(1).toDF("x"), () => { fires.incrementAndGet(); () }, owner)
    df.collect()
    org.apache.spark.sql.graftshims.drainListenerBus(spark)
    assert(fires.get() === 1L, "the armed probe fires on execution")
    // the facade checks out: its probe moved to the re-fire map on the
    // first execution, and the release must both purge it AND stop the
    // listener from re-admitting or re-firing it (the migration race's
    // deterministic half)
    ExecutionProbeHook.releaseOwner(owner)
    df.collect()
    org.apache.spark.sql.graftshims.drainListenerBus(spark)
    assert(fires.get() === 1L,
      "a released owner's callback must not fire after close")
    // and no eviction path can charge the released owner back into the
    // registry (bump skips released owners)
    val flood = Seq(2).toDF("y")
    (0 to 4096).foreach(_ =>
      ExecutionProbeHook.arm(flood, () => (), "probe-flooder"))
    assert(ExecutionProbeHook.firedEvictionsFor(owner) === 0L)
    assert(ExecutionProbeHook.pendingEvictionsFor(owner) === 0L)
    ExecutionProbeHook.releaseOwner("probe-flooder")
  }

  test("a released marker aging out of the 1024 bound re-purges its owner " +
      "(no counter resurrection after >1024 closes, concurrent eviction)") {
    val s = spark
    import s.implicits._
    val df = Seq(1).toDF("x")
    val owner = "probe-overflow-" + System.nanoTime()
    ExecutionProbeHook.releaseOwner(owner)
    // simulate the migration-race zombie (race (a) in the released-set
    // doc): a probe for the already-released owner resident in the
    // pending map after the release purge ran
    ExecutionProbeHook.arm(df, () => (), owner)
    // churn >1024 further closes on one thread (ages the owner's marker
    // out of the bounded set — the eviction-time re-purge must take the
    // zombie with it) while another thread floods the pending map (whose
    // evictions would `bump` the owner's counter back into the per-owner
    // registry if the zombie were still resident once the marker is gone)
    val churn = new Thread(() => (0 until 1200).foreach(i =>
      ExecutionProbeHook.releaseOwner(s"$owner-churn-$i")))
    val flood = new Thread(() => (0 to 4200).foreach(_ =>
      ExecutionProbeHook.arm(df, () => (), "probe-overflow-flooder")))
    churn.start(); flood.start(); churn.join(); flood.join()
    // one more flood AFTER the churn finished: by now the marker is
    // definitely evicted, so only the re-purge protects the owner
    (0 to 4200).foreach(_ =>
      ExecutionProbeHook.arm(df, () => (), "probe-overflow-flooder"))
    assert(ExecutionProbeHook.pendingEvictionsFor(owner) === 0L,
      "a released owner must stay out of the counter registry even after " +
        "its marker fell off the 1024-entry released set")
    assert(ExecutionProbeHook.firedEvictionsFor(owner) === 0L)
    ExecutionProbeHook.releaseOwner("probe-overflow-flooder")
  }
}
