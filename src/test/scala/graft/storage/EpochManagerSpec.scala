package graft.storage

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.{IndexConfig, Metric, NotFoundException}

class EpochManagerSpec extends AnyFunSuite {

  private def tmpDir() = Files.createTempDirectory("graft-em").toString

  /** Rewind every first-seen stamp in the orphan_suspects.json sidecar by
    * `ms` — tests would otherwise have to really wait SuspectMinAgeMs
    * between the recording and confirming sweeps. */
  private def ageSuspects(base: String, ms: Long): Unit = {
    import org.json4s._
    import org.json4s.jackson.JsonMethods
    val p = java.nio.file.Paths.get(s"$base/orphan_suspects.json")
    val aged = JsonMethods.parse(Files.readString(p)).transformField {
      case ("firstSeen", JInt(ts)) => ("firstSeen", JInt(ts - ms))
    }
    Files.writeString(p, JsonMethods.pretty(JsonMethods.render(aged)))
  }

  test("create/activate/list epochs with persisted state (storage.cpp:318-375)") {
    val base = tmpDir()
    val em = new EpochManager(base)
    val e1 = em.createEpoch()
    val e2 = em.createEpoch()
    assert(em.listEpochs.toSet === Set(e1, e2))
    assert(em.activeEpoch.isEmpty)
    em.activateEpoch(e2)
    assert(em.activeEpoch === Some(e2))
    // state survives a restart (epochs.json)
    val em2 = new EpochManager(base)
    assert(em2.listEpochs.toSet === Set(e1, e2))
    assert(em2.activeEpoch === Some(e2))
  }

  test("activate of unknown epoch throws NOT_FOUND") {
    val em = new EpochManager(tmpDir())
    intercept[NotFoundException](em.activateEpoch("epoch_nope"))
  }

  test("cleanup keeps newest N and NEVER deletes the active epoch (storage.cpp:450)") {
    val base = tmpDir()
    val em = new EpochManager(base)
    val ids = (1 to 5).map { i =>
      val id = em.createEpoch(); Thread.sleep(2); id
    }
    em.activateEpoch(ids.head) // oldest is active
    val deleted = em.cleanupOldEpochs(keepN = 2)
    assert(!deleted.contains(ids.head), "active epoch must survive cleanup")
    assert(em.contains(ids.head))
    // newest 2 survive
    assert(em.contains(ids(4)) && em.contains(ids(3)))
    assert(!em.contains(ids(1)) && !em.contains(ids(2)))
    assert(deleted.toSet === Set(ids(1), ids(2)))
    // directories of deleted epochs are gone
    deleted.foreach(id => assert(!Files.exists(java.nio.file.Paths.get(em.epochPath(id)))))
  }

  test("cleanup re-collects orphan epoch dirs no state references (crash between persist and delete)") {
    val base = tmpDir()
    val em = new EpochManager(base)
    val live = em.createEpoch()
    // simulate the crash window: a directory exists but epochs.json does
    // not reference it (state was persisted without it, JVM died before
    // the recursive delete)
    val orphan = s"$base/epoch_0000000000000_9999"
    Files.createDirectories(java.nio.file.Paths.get(orphan))
    Files.writeString(java.nio.file.Paths.get(s"$orphan/shard.parquet"), "x")
    // a FRESH unreferenced dir is inside the orphan grace window (it could
    // be a concurrent build between mkdir and persistState) — protected
    val kept = em.cleanupOldEpochs(keepN = 3)
    assert(!kept.contains("epoch_0000000000000_9999"))
    assert(Files.exists(java.nio.file.Paths.get(orphan)),
      "fresh unreferenced dir must survive the grace window")
    // age it past the grace window -> double-absence rule: the FIRST
    // sweep that observes it unreferenced only records a suspicion (a
    // defense-in-depth grace interval against a lock bypass, e.g. an NFS
    // deployment where FileChannel.lock is advisory-unreliable); only the
    // SECOND consecutive observation deletes
    val old = System.currentTimeMillis() - EpochManager.OrphanGraceMs - 1000
    java.nio.file.Paths.get(orphan).toFile.setLastModified(old)
    val firstSweep = em.cleanupOldEpochs(keepN = 3)
    assert(!firstSweep.contains("epoch_0000000000000_9999"),
      "an id seen missing ONCE must not be deleted")
    assert(Files.exists(java.nio.file.Paths.get(orphan)))
    // a second sweep BEFORE the suspect has aged SuspectMinAgeMs still
    // must not delete — two processes sweeping seconds apart must not
    // shortcut the grace window (the clock, not the sweep count, gates)
    assert(!em.cleanupOldEpochs(keepN = 3).contains("epoch_0000000000000_9999"),
      "a young suspect must survive a back-to-back confirming sweep")
    assert(Files.exists(java.nio.file.Paths.get(orphan)))
    ageSuspects(base, EpochManager.SuspectMinAgeMs + 1000)
    val deleted = em.cleanupOldEpochs(keepN = 3)
    assert(deleted.contains("epoch_0000000000000_9999"),
      "an id seen missing twice AND aged past SuspectMinAgeMs must be deleted")
    assert(!Files.exists(java.nio.file.Paths.get(orphan)), "orphan dir must be swept")
    assert(em.contains(live) &&
      Files.exists(java.nio.file.Paths.get(em.epochPath(live))))
  }

  test("orphan double-absence survives manager restarts (one-shot cron shape)") {
    // the common maintenance deployment constructs a FRESH EpochManager
    // per invocation; suspicion must persist across processes (the
    // orphan_suspects.json sidecar) or crash orphans would be "first
    // seen" forever and never reclaimed
    val base = tmpDir()
    new EpochManager(base).createEpoch()
    val orphan = s"$base/epoch_0000000000000_7777"
    Files.createDirectories(java.nio.file.Paths.get(orphan))
    val old = System.currentTimeMillis() - EpochManager.OrphanGraceMs - 1000
    java.nio.file.Paths.get(orphan).toFile.setLastModified(old)
    // invocation 1: a fresh manager records the suspect, deletes nothing
    assert(!new EpochManager(base).cleanupOldEpochs(keepN = 3)
      .contains("epoch_0000000000000_7777"))
    assert(Files.exists(java.nio.file.Paths.get(orphan)))
    // invocation 2 seconds later: still too young to confirm (the
    // persisted first-seen stamp gates, so a serving driver + cron job
    // sweeping back-to-back cannot shortcut the grace window)
    assert(!new EpochManager(base).cleanupOldEpochs(keepN = 3)
      .contains("epoch_0000000000000_7777"))
    assert(Files.exists(java.nio.file.Paths.get(orphan)))
    // invocation 3, after the suspect has aged: ANOTHER fresh manager
    // confirms and deletes — suspicion AND its clock persisted across
    // processes via the sidecar
    ageSuspects(base, EpochManager.SuspectMinAgeMs + 1000)
    assert(new EpochManager(base).cleanupOldEpochs(keepN = 3)
      .contains("epoch_0000000000000_7777"))
    assert(!Files.exists(java.nio.file.Paths.get(orphan)))
  }

  test("orphan suspect is acquitted when referenced again between sweeps") {
    val base = tmpDir()
    val em = new EpochManager(base)
    em.createEpoch()
    val orphan = s"$base/epoch_0000000000000_8888"
    Files.createDirectories(java.nio.file.Paths.get(orphan))
    val old = System.currentTimeMillis() - EpochManager.OrphanGraceMs - 1000
    java.nio.file.Paths.get(orphan).toFile.setLastModified(old)
    // sweep 1: suspect recorded
    assert(em.cleanupOldEpochs(keepN = 3).isEmpty)
    ageSuspects(base, EpochManager.SuspectMinAgeMs + 1000)
    // sweep 2: the id is referenced this time (a serving driver protects
    // it) -> acquitted, suspicion cleared — even though it had aged
    // enough that an unprotected sweep would have deleted it
    assert(em.cleanupOldEpochs(keepN = 3,
      protectedIds = Set("epoch_0000000000000_8888")).isEmpty)
    // sweep 3: unreferenced again — this must count as a FIRST
    // observation with a FRESH clock (the earlier suspicion was dropped),
    // so still no delete
    assert(!em.cleanupOldEpochs(keepN = 3).contains("epoch_0000000000000_8888"),
      "acquittal must reset the absence count")
    assert(Files.exists(java.nio.file.Paths.get(orphan)))
    // sweep 4: second absence, aged past the gate -> deleted
    ageSuspects(base, EpochManager.SuspectMinAgeMs + 1000)
    assert(em.cleanupOldEpochs(keepN = 3).contains("epoch_0000000000000_8888"))
    assert(!Files.exists(java.nio.file.Paths.get(orphan)))
  }

  test("orphan sweep never deletes epochs another manager registered, and skips without a state file") {
    val base = tmpDir()
    val a = new EpochManager(base)
    val b = new EpochManager(base) // loaded state BEFORE a's next epoch
    val fromA = a.createEpoch()
    // age the dir past the grace window: b still must not delete it,
    // because the DISK state file references it even though b's memory
    // doesn't
    val old = System.currentTimeMillis() - EpochManager.OrphanGraceMs - 1000
    java.nio.file.Paths.get(a.epochPath(fromA)).toFile.setLastModified(old)
    val swept = b.cleanupOldEpochs(keepN = 3)
    assert(!swept.contains(fromA))
    assert(Files.exists(java.nio.file.Paths.get(a.epochPath(fromA))),
      "a concurrently-registered epoch must never be swept as an orphan")
    // merge-on-write: b's persist (stale memory, no fromA) must not drop
    // a's registration from epochs.json — a plain overwrite would, and
    // the next sweep past the grace window would then delete a's LIVE
    // directory
    assert(Files.readString(java.nio.file.Paths.get(a.statePath)).contains(fromA),
      "a stale instance's persist dropped a concurrent registration")
    // a stale instance's persist must not REVERT another's activation:
    // a activates its epoch; b (stale active="" in memory) persists via
    // cleanup — the disk active pointer must survive
    a.activateEpoch(fromA)
    b.cleanupOldEpochs(keepN = 3)
    val a2 = new EpochManager(base) // fresh load sees the disk state
    assert(a2.activeEpoch === Some(fromA),
      "stale instance's persist reverted the active pointer")
    // and b's cleanup must never doom the DISK-active epoch even when
    // b's own memory considers it unprotected
    assert(Files.exists(java.nio.file.Paths.get(a.epochPath(fromA))))

    // lost state file: nothing is provably orphaned -> sweep is a no-op
    Files.delete(java.nio.file.Paths.get(a.statePath))
    val sweptNoState = b.cleanupOldEpochs(keepN = 3)
    assert(sweptNoState.isEmpty)
    assert(Files.exists(java.nio.file.Paths.get(a.epochPath(fromA))),
      "with no readable state file every dir must survive")
  }

  test("concurrent persists from two managers never drop a registration (state-lock)") {
    // The lost-update race: A reads epochs.json, B reads the same bytes,
    // A writes (with A's new epoch), B writes over it from its stale read
    // -> A's epoch vanishes from disk state, and an orphan sweep past the
    // grace window would delete A's LIVE directory. withStateLock
    // serializes the whole read->merge->write, so every id must survive.
    val base = tmpDir()
    val a = new EpochManager(base)
    val b = new EpochManager(base)
    val pool = java.util.concurrent.Executors.newFixedThreadPool(8)
    val created = java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
    try {
      val tasks = (0 until 40).map { i =>
        pool.submit(new Runnable {
          def run(): Unit = created.add((if (i % 2 == 0) a else b).createEpoch())
        })
      }
      tasks.foreach(_.get())
    } finally pool.shutdown()
    assert(created.size === 40)
    val disk = Files.readString(java.nio.file.Paths.get(a.statePath))
    created.forEach { id =>
      assert(disk.contains(id), s"epoch $id lost from disk state by a concurrent persist")
    }
    // a fresh manager (restart) must load every registration
    val fresh = new EpochManager(base)
    assert(fresh.listEpochs.toSet === {
      val s = scala.collection.mutable.Set.empty[String]
      created.forEach(id => s += id); s.toSet
    })
  }

  test("deactivate clears the active pointer") {
    val em = new EpochManager(tmpDir())
    val e = em.createEpoch()
    em.activateEpoch(e)
    em.deactivateEpoch(e)
    assert(em.activeEpoch.isEmpty)
  }

  test("manifest JSON roundtrip preserves all fields (storage.h:15-42)") {
    val m = Manifest(
      IndexConfig("idx", 64, Metric.Cosine, nlist = 32, m = 8, nbits = 8),
      epoch = "epoch_1", createdAt = 12345L, numVectors = 999L,
      shards = Seq(ShardInfo(0, "p0", 500L), ShardInfo(1, "p1", 499L)))
    val p = tmpDir() + "/manifest.json"
    m.save(p)
    val back = Manifest.load(p)
    assert(back === m)
  }
}
