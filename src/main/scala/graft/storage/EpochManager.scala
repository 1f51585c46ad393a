package graft.storage

import java.nio.file.{Files, Paths}
import java.util.Comparator

import scala.collection.concurrent.TrieMap

import org.json4s._
import org.json4s.jackson.JsonMethods

import graft.NotFoundException

/**
 * Versioned-epoch lifecycle for one index (reference EpochManager,
 * format/storage.cpp:304-579): epochs live under `<base>/epoch_*`;
 * `epochs.json` persists {active, epochs[{id, created_at}]}; activation is
 * an atomic state-file swap; cleanup keeps the newest `keepN`, never
 * deleting the active epoch (storage.cpp:450).
 *
 * Epoch ids are `epoch_<millis>_<rand>` (storage.cpp:466-476).
 */
class EpochManager(basePath: String) {

  private val epochs = TrieMap.empty[String, Long] // id -> createdAt
  // ids THIS instance doomed: persistState merges with the on-disk state
  // (another manager on the same base path registers epochs this
  // instance never loads — overwriting with our stale memory would drop
  // them and the orphan sweep would later delete their live directories),
  // and the local tombstones are the only ids the merge may remove
  private val locallyDeleted = TrieMap.empty[String, Unit]
  // Double-absence rule for the orphan sweep: a directory must be
  // observed unreferenced on TWO sweeps, the second at least
  // SuspectMinAgeMs after the first recorded it (the persisted first-seen
  // stamp, not the sweep count, carries the guarantee — multiple
  // processes sweeping seconds apart must not shortcut the window).
  // The state lock already closes the read-merge-write race, but this is
  // cheap defense-in-depth against any future lock bypass (e.g. an NFS
  // deployment where FileChannel.lock is advisory-unreliable): a
  // concurrently-registering manager whose epochs.json write we somehow
  // failed to see gets a whole grace window for its write to land
  // before anything is deleted. An id that becomes referenced again
  // between sweeps is acquitted (removed from the suspect set).
  // The suspect set is PERSISTED (orphan_suspects.json, sibling of
  // epochs.json) — in-memory suspicion would mean a one-shot maintenance
  // job (fresh manager per invocation, the common cron shape) observes
  // every orphan as "first seen" forever and crash orphans never get
  // reclaimed. The two observations may come from DIFFERENT processes;
  // what matters is two consecutive sweeps over the shared state.
  @volatile private var activeId: String = ""
  // has THIS instance ever changed the active pointer? persistState only
  // writes our activeId when true — otherwise a stale instance's persist
  // would REVERT an activation another manager performed on the same
  // base path
  @volatile private var activeDirty = false
  private val rnd = new java.security.SecureRandom()

  Files.createDirectories(Paths.get(basePath))
  loadState()

  def epochPath(id: String): String = s"$basePath/$id"
  def statePath: String = s"$basePath/epochs.json"
  def lockPath: String = s"$basePath/epochs.lock"

  /** Serialize every read->merge->write of epochs.json across BOTH
    * threads and processes sharing this base path. Two layers because
    * `FileChannel.lock` is process-scoped: the JVM throws
    * OverlappingFileLockException if a second channel in the SAME process
    * tries to lock the file, so in-process callers (two EpochManager
    * instances in one driver) first serialize on a per-canonical-path
    * ReentrantLock, and only the winner takes the OS file lock that
    * excludes OTHER processes (the maintenance job racing the serving
    * driver). The lock file is a sibling — never epochs.json itself,
    * whose atomic-rename replacement would drop the lock's inode. */
  private def withStateLock[T](body: => T): T = {
    val jvm = EpochManager.processLock(basePath)
    jvm.lock()
    try {
      val ch = java.nio.channels.FileChannel.open(
        Paths.get(lockPath),
        java.nio.file.StandardOpenOption.CREATE,
        java.nio.file.StandardOpenOption.WRITE)
      try {
        // BOUNDED wait, never ch.lock(): this frame holds the instance
        // monitor AND the per-path JVM lock, so an indefinite block on a
        // wedged lock-holder process (NFS stall, SIGSTOP, long GC in the
        // maintenance job) would freeze EVERY epoch operation of this
        // driver with no diagnostic. Poll tryLock, warn once at 5 s,
        // fail loudly at the deadline — persistState's caller sees WHICH
        // path is wedged instead of a silent hang.
        val deadlineNs = System.nanoTime() + EpochManager.StateLockTimeoutMs * 1000000L
        var warned = false
        var fl: java.nio.channels.FileLock = null
        while (fl == null) {
          fl = ch.tryLock()
          if (fl == null) {
            val leftMs = (deadlineNs - System.nanoTime()) / 1000000L
            if (leftMs <= 0) throw new IllegalStateException(
              s"timed out after ${EpochManager.StateLockTimeoutMs} ms waiting for " +
                s"the epoch state lock $lockPath — another process holds it and is " +
                "not releasing (wedged maintenance job?)")
            if (!warned && EpochManager.StateLockTimeoutMs - leftMs > 5000) {
              warned = true
              System.err.println(
                s"[graft] still waiting for the epoch state lock $lockPath " +
                  "(another process holds it)")
            }
            Thread.sleep(100)
          }
        }
        try body
        finally fl.release()
      } finally ch.close()
    } finally jvm.unlock()
  }

  def createEpoch(): String = synchronized {
    // regenerate on collision: same millisecond + same 1-in-10000 draw
    // (or a directory left by another manager on this base path) would
    // otherwise silently mix two epochs' shards in one directory
    var id = ""
    do id = f"epoch_${System.currentTimeMillis()}%d_${rnd.nextInt(10000)}%04d"
    while (epochs.contains(id) || Files.exists(Paths.get(epochPath(id))))
    Files.createDirectories(Paths.get(epochPath(id)))
    epochs.put(id, System.currentTimeMillis())
    persistState()
    id
  }

  def activateEpoch(id: String): Unit = synchronized {
    if (!epochs.contains(id)) throw new NotFoundException(s"Epoch not found: $id")
    activeId = id
    activeDirty = true
    persistState()
  }

  def deactivateEpoch(id: String): Unit = synchronized {
    if (activeId == id) { activeId = ""; activeDirty = true }
    persistState()
  }

  def activeEpoch: Option[String] = Option(activeId).filter(_.nonEmpty)

  def listEpochs: Seq[String] = epochs.keys.toSeq.sorted

  def contains(id: String): Boolean = epochs.contains(id)

  /** Keep the newest `keepN` epochs; the active epoch — and any id in
    * `protectedIds` (e.g. an epoch currently loaded for serving) — is
    * never deleted. */
  def cleanupOldEpochs(keepN: Int = 3, protectedIds: Set[String] = Set.empty): Seq[String] = synchronized {
    val byAgeDesc = epochs.toSeq.sortBy { case (id, ts) => (-ts, id) }
    // ALSO protect the active id the DISK state names: another manager on
    // this base path may have activated an epoch this instance's stale
    // memory considers old — deleting it would break that manager's
    // serving (and the next loadState everywhere)
    val diskActive = diskActiveId()
    val doomed = byAgeDesc.drop(keepN)
      .filterNot { case (id, _) =>
        id == activeId || diskActive.contains(id) || protectedIds.contains(id) }
      .map(_._1)
    doomed.foreach { id =>
      // state first, directory second: a crash between the two leaves an
      // orphan directory (harmless, re-collected by the orphan sweep
      // below) — the reverse order would leave state pointing at a
      // DELETED epoch, which activateEpoch would then happily activate
      epochs.remove(id)
      locallyDeleted.put(id, ())
      persistState()
      EpochManager.deleteRecursively(epochPath(id))
    }
    // Orphan sweep: epoch_* directories no state references (a crash
    // landed between persistState() and the delete above on a previous
    // run). The in-memory map alone is NOT a safe reference — another
    // manager on the same base path (serving driver + maintenance job)
    // registers epochs this instance never loads, and a lost/partial
    // epochs.json would make EVERY live epoch look orphaned. So:
    //  - re-read the persisted state from disk and union it in; if the
    //    state file is missing or unreadable, skip the sweep entirely
    //    (fail safe — orphans are only disk waste);
    //  - age-gate: never delete a directory younger than the grace
    //    window, because createEpoch creates the dir BEFORE persisting
    //    state, so a concurrent build's fresh dir is briefly unreferenced.
    val diskKnown = diskStateIds()
    val orphans = diskKnown match {
      case None => Seq.empty // no readable state file -> nothing is provably orphaned
      case Some(persisted) =>
        val known = epochs.keySet ++ persisted ++ protectedIds + activeId
        val cutoff = System.currentTimeMillis() - EpochManager.OrphanGraceMs
        val candidates = Option(new java.io.File(basePath).listFiles())
          .getOrElse(Array.empty[java.io.File])
          .filter(f => f.isDirectory && f.getName.startsWith("epoch_") &&
            !known.contains(f.getName) && f.lastModified() < cutoff)
          .map(_.getName).toSeq.sorted
        // Double-absence + minimum suspect AGE: deletion requires (a) the
        // id was already a suspect on a previous sweep AND (b) it has been
        // on the books at least SuspectMinAgeMs. Counting sweeps alone is
        // not enough in the multi-process shape this feature targets: a
        // serving driver and a cron job sweeping seconds apart would
        // record and then confirm a suspect almost immediately, defeating
        // the "whole sweep interval for a concurrent registrant's
        // epochs.json write to land" guarantee — so each suspect persists
        // its first-seen timestamp and the clock, not the sweep count, is
        // the gate. Ids no longer candidate (referenced again, or deleted
        // meanwhile) are acquitted, and the saved set is exactly the
        // still-pending candidates with their ORIGINAL first-seen stamps —
        // so the file cannot grow stale entries and repeated sweeps do
        // not reset the clock.
        val prior = loadSuspects()
        val now = System.currentTimeMillis()
        val confirmed = candidates.filter(id =>
          prior.get(id).exists(ts => now - ts >= EpochManager.SuspectMinAgeMs))
        saveSuspects(candidates.filterNot(confirmed.contains)
          .map(id => id -> prior.getOrElse(id, now)).toMap)
        confirmed
    }
    orphans.foreach(id => EpochManager.deleteRecursively(epochPath(id)))
    if (doomed.isEmpty) persistState()
    doomed ++ orphans
  }

  /** The active epoch id the on-disk state file names, if any. */
  private def diskActiveId(): Option[String] =
    try {
      val p = Paths.get(statePath)
      if (!Files.exists(p)) None
      else JsonMethods.parse(Files.readString(p)) \ "active" match {
        case JString(a) if a.nonEmpty => Some(a)
        case _ => None
      }
    } catch { case scala.util.control.NonFatal(_) => None }

  private def suspectsPath: String = s"$basePath/orphan_suspects.json"

  /** Orphan-sweep suspects recorded by a PREVIOUS sweep (possibly by
    * another process — the cron-job shape constructs a fresh manager per
    * invocation), as id -> first-seen millis. Missing/unreadable file ->
    * empty map, the fail-safe direction: every candidate counts as
    * first-seen and nothing is deleted this sweep. A legacy id-only entry
    * (pre-timestamp sidecar format) restarts its clock at now — also the
    * fail-safe direction (one extra grace window, never an early delete). */
  private def loadSuspects(): Map[String, Long] =
    try {
      val p = Paths.get(suspectsPath)
      if (!Files.exists(p)) Map.empty
      else JsonMethods.parse(Files.readString(p)) \ "suspects" match {
        case JArray(items) => items.flatMap {
          case JString(id) => Some(id -> System.currentTimeMillis())
          case o: JObject => (o \ "id", o \ "firstSeen") match {
            case (JString(id), JInt(ts)) => Some(id -> ts.toLong)
            case _ => None
          }
          case _ => None
        }.toMap
        case _ => Map.empty
      }
    } catch { case scala.util.control.NonFatal(_) => Map.empty }

  private def saveSuspects(ids: Map[String, Long]): Unit =
    Manifest.atomicWrite(Paths.get(suspectsPath),
      JsonMethods.pretty(JsonMethods.render(JObject(
        "suspects" -> JArray(ids.toList.sortBy(_._1).map { case (id, ts) =>
          JObject("id" -> JString(id), "firstSeen" -> JInt(ts)) })))))

  /** Epoch ids the on-disk state file references, or None if the file is
    * missing/unreadable (in which case nothing can be declared orphaned). */
  private def diskStateIds(): Option[Set[String]] =
    try {
      val p = Paths.get(statePath)
      if (!Files.exists(p)) None
      else JsonMethods.parse(Files.readString(p)) \ "epochs" match {
        case JArray(items) => Some(items.collect {
          case e if (e \ "id").isInstanceOf[JString] =>
            (e \ "id").asInstanceOf[JString].s
        }.toSet)
        case _ => None
      }
    } catch { case scala.util.control.NonFatal(_) => None }

  /** Merge-on-write: union the on-disk epoch list (another manager's
    * registrations) with this instance's map, minus only the ids THIS
    * instance doomed. A plain overwrite from a stale instance would drop
    * concurrent registrations, and the orphan sweep — which trusts this
    * file — would then delete their live directories an hour later. A
    * deletion performed by ANOTHER instance may be resurrected as a
    * ghost entry (its directory is gone; activation of it fails loudly);
    * that is the safe direction.
    *
    * The read->merge->write runs under [[withStateLock]]: without mutual
    * exclusion two managers (serving driver + maintenance job) can BOTH
    * read the same disk state, each merge only its own registrations, and
    * the second write silently drops the first's new epoch from
    * epochs.json — after which the other manager's orphan sweep, which
    * trusts the disk state, deletes the live epoch directory once the
    * grace window passes. The merge logic alone cannot close that race;
    * only serializing the whole read-merge-write does. */
  private def persistState(): Unit = withStateLock {
    val diskEpochs: Map[String, Long] =
      try {
        val p = Paths.get(statePath)
        if (!Files.exists(p)) Map.empty
        else JsonMethods.parse(Files.readString(p)) \ "epochs" match {
          case JArray(items) => items.flatMap { e =>
            ((e \ "id"), (e \ "created_at")) match {
              case (JString(id), JLong(ts)) => Some(id -> ts)
              case (JString(id), JInt(ts)) => Some(id -> ts.toLong)
              case _ => None
            }
          }.toMap
          case _ => Map.empty
        }
      } catch { case scala.util.control.NonFatal(_) => Map.empty }
    val merged = (diskEpochs ++ epochs.toMap) -- locallyDeleted.keys
    // our active pointer only if WE set it; otherwise preserve whatever
    // the disk names (another instance's activation must survive our
    // unrelated persists)
    val act = if (activeDirty) activeId else diskActiveId().getOrElse(activeId)
    val j = JObject(
      "active" -> JString(act),
      "epochs" -> JArray(merged.toList.sortBy(_._1).map { case (id, ts) =>
        JObject("id" -> JString(id), "created_at" -> JLong(ts))
      }))
    Manifest.atomicWrite(Paths.get(statePath), JsonMethods.pretty(JsonMethods.render(j)))
  }

  private def loadState(): Unit = {
    val p = Paths.get(statePath)
    if (Files.exists(p)) {
      val j = JsonMethods.parse(Files.readString(p))
      (j \ "epochs") match {
        case JArray(items) => items.foreach { e =>
          val id = (e \ "id") match { case JString(s) => s; case _ => "" }
          val ts = (e \ "created_at") match {
            case JLong(l) => l; case JInt(i) => i.toLong; case _ => 0L
          }
          if (id.nonEmpty) epochs.put(id, ts)
        }
        case _ =>
      }
      (j \ "active") match {
        case JString(a) if epochs.contains(a) => activeId = a
        case _ =>
      }
    }
  }
}

object EpochManager {
  /** One in-process lock per canonical base path: the gate that lets
    * [[EpochManager.withStateLock]] take an OS file lock without tripping
    * OverlappingFileLockException when two instances in the same JVM
    * share a base path. Never removed — a handful of ReentrantLocks per
    * distinct index path is bounded by the number of indexes served. */
  private val processLocks =
    new java.util.concurrent.ConcurrentHashMap[String, java.util.concurrent.locks.ReentrantLock]()
  private def processLock(basePath: String): java.util.concurrent.locks.ReentrantLock = {
    val key =
      try new java.io.File(basePath).getCanonicalPath
      catch { case scala.util.control.NonFatal(_) => basePath }
    processLocks.computeIfAbsent(key, _ => new java.util.concurrent.locks.ReentrantLock())
  }

  /** Orphan directories younger than this are left alone: createEpoch
    * creates the directory before persisting state, so a concurrent
    * manager's fresh epoch is briefly unreferenced on disk. */
  val OrphanGraceMs: Long = 60L * 60 * 1000

  /** Minimum time an orphan suspect must sit on the books
    * (orphan_suspects.json first-seen stamp) before a confirming sweep
    * may delete it. Sweep COUNT alone is not a time guarantee — two
    * managers sweeping back-to-back (serving driver + cron job seconds
    * later) would record then confirm almost immediately; the age gate
    * restores the intended "a concurrent registrant gets a full grace
    * window for its epochs.json write to land" semantics regardless of
    * how many processes sweep. */
  val SuspectMinAgeMs: Long = OrphanGraceMs

  /** Cross-process state-lock acquisition deadline. Generous — a healthy
    * holder keeps the lock for one small-file read-merge-write — but
    * finite, so a wedged holder surfaces as a loud error instead of
    * freezing every epoch operation of this driver. */
  val StateLockTimeoutMs: Long = 60L * 1000

  /** Recursive delete shared by the storage stack (epoch cleanup, radii
    * invalidation). Files.walk holds open directory handles until
    * closed — a long-lived driver running periodic cleanups would leak
    * fds — and a failure surfaces WHICH path failed, unlike the
    * deprecated scala.reflect.io boolean API. No-op on a missing path. */
  private[graft] def deleteRecursively(path: String): Unit = {
    val p = Paths.get(path)
    if (Files.exists(p)) {
      val walk = Files.walk(p)
      try walk.sorted(Comparator.reverseOrder[java.nio.file.Path]())
        .forEach(f => Files.delete(f))
      finally walk.close()
    }
  }
}
