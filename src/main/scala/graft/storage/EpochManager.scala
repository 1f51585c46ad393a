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
  @volatile private var activeId: String = ""
  private val rnd = new java.security.SecureRandom()

  Files.createDirectories(Paths.get(basePath))
  loadState()

  def epochPath(id: String): String = s"$basePath/$id"
  def statePath: String = s"$basePath/epochs.json"

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
    persistState()
  }

  def deactivateEpoch(id: String): Unit = synchronized {
    if (activeId == id) activeId = ""
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
    val doomed = byAgeDesc.drop(keepN)
      .filterNot { case (id, _) => id == activeId || protectedIds.contains(id) }
      .map(_._1)
    doomed.foreach { id =>
      // state first, directory second: a crash between the two leaves an
      // orphan directory (harmless, re-collected by the orphan sweep
      // below) — the reverse order would leave state pointing at a
      // DELETED epoch, which activateEpoch would then happily activate
      epochs.remove(id)
      persistState()
      deleteRecursively(epochPath(id))
    }
    // orphan sweep: epoch_* directories no state references (a crash
    // landed between persistState() and the delete above on a previous
    // run). Both mutation paths hold this instance's lock, so a dir
    // absent from the map here is never a create in flight.
    val known = epochs.keySet ++ protectedIds + activeId
    val orphans = Option(new java.io.File(basePath).listFiles())
      .getOrElse(Array.empty[java.io.File])
      .filter(f => f.isDirectory && f.getName.startsWith("epoch_") &&
        !known.contains(f.getName))
      .map(_.getName).toSeq.sorted
    orphans.foreach(id => deleteRecursively(epochPath(id)))
    if (doomed.isEmpty) persistState()
    doomed ++ orphans
  }

  private def deleteRecursively(path: String): Unit = {
    val p = Paths.get(path)
    if (Files.exists(p)) {
      // Files.walk holds open directory handles until closed — a
      // long-lived driver running periodic cleanups would leak fds
      val walk = Files.walk(p)
      try walk.sorted(Comparator.reverseOrder[java.nio.file.Path]())
        .forEach(f => Files.delete(f))
      finally walk.close()
    }
  }

  private def persistState(): Unit = {
    val j = JObject(
      "active" -> JString(activeId),
      "epochs" -> JArray(epochs.toList.sortBy(_._1).map { case (id, ts) =>
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
