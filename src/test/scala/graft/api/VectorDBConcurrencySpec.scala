package graft.api

import org.apache.spark.sql.functions._

import graft.{IndexConfig, SparkSpec}

/**
 * Two facades in one SparkSession driving full lifecycles CONCURRENTLY —
 * the multi-tenant serving shape the per-instance eviction attribution
 * (round 12) and `close()` exist for, previously only exercised
 * single-facade. Asserts: both lifecycles complete against their own
 * data, per-owner probe-eviction counters never cross-attribute, one
 * facade's close() neither disturbs the survivor's counters nor its
 * serving, and both indices' epoch state files come out of the concurrent
 * run uncorrupted (re-loadable by a fresh EpochManager with the right
 * active pointer).
 */
class VectorDBConcurrencySpec extends SparkSpec {

  private val Dim = 8

  test("two facades build/search/close concurrently: no cross-talk, no leaks, clean state") {
    val base = java.nio.file.Files.createTempDirectory("graft-mt").toString
    val dbs = new Array[VectorDB](2)
    val tops = new Array[Long](2)
    val errs = new java.util.concurrent.CopyOnWriteArrayList[Throwable]()

    // ids are disjoint per facade (t*1000 offset): a search result from
    // the wrong index is unmistakable
    def lifecycle(t: Int): Unit = {
      val db = new VectorDB(spark, s"$base/tenant$t")
      dbs(t) = db
      db.createIndex(IndexConfig(s"idx$t", Dim, nlist = 4))
      val vecs = vectorsDF(randomVectors(200, Dim, seed = 42 + t)
        .map { case (i, v) => (i + t * 1000L, v) })
      val ep = db.buildEpoch(s"idx$t", vecs)
      db.activateEpoch(s"idx$t", ep)
      db.loadIndex(s"idx$t")
      val probe = randomVectors(1, Dim, seed = 42 + t).head._2
      (0 until 5).foreach { _ =>
        val hits = db.search(s"idx$t", queriesDF(Seq(7L -> probe)),
          topk = 5, nprobe = 4).collect()
        assert(hits.length === 5)
        hits.foreach(h => assert(h.getLong(1) / 1000L === t.toLong,
          s"facade $t got id ${h.getLong(1)} from the other tenant's index"))
      }
      tops(t) = db.search(s"idx$t", queriesDF(Seq(7L -> probe)),
        topk = 1, nprobe = 4).collect().head.getLong(1)
      // charge pending evictions to THIS owner (the attribution shape):
      // 4096-cap overflow of armed-but-never-executed probes
      val df = { val s = spark; import s.implicits._; Seq(t).toDF("x") }
      (0 to 4096).foreach(_ =>
        graft.index.ExecutionProbeHook.arm(df, () => (), db.instanceId))
    }

    val threads = (0 until 2).map { t =>
      new Thread(() => {
        try lifecycle(t)
        catch { case e: Throwable => errs.add(e); () }
      }, s"facade-$t")
    }
    threads.foreach(_.start())
    threads.foreach(_.join(300000))
    // a hung lifecycle must be reported AS a hang, not surface later as a
    // null-facade NPE or a half-charged counter assertion
    assert(threads.forall(!_.isAlive),
      s"lifecycle thread(s) still running after 300s: " +
        threads.filter(_.isAlive).map(_.getName).mkString(","))
    assert(errs.isEmpty, s"concurrent lifecycles failed: ${errs}")

    // per-owner attribution, not a shared pot: each facade carries ITS
    // eviction charge, and the Prometheus text exposes only its own label
    val Seq(o0, o1) = dbs.toSeq.map(_.instanceId)
    assert(o0 !== o1)
    val p0 = graft.index.ExecutionProbeHook.pendingEvictionsFor(o0)
    val p1 = graft.index.ExecutionProbeHook.pendingEvictionsFor(o1)
    assert(p0 >= 1L && p1 >= 1L, s"both owners must be charged, got $p0/$p1")
    assert(dbs(0).metricsText().contains(s"""facade="$o0""""))
    assert(!dbs(0).metricsText().contains(s"""facade="$o1""""))

    // close facade 0: its registry entries check out; facade 1's survive
    // untouched and it KEEPS SERVING
    dbs(0).close()
    assert(graft.index.ExecutionProbeHook.pendingEvictionsFor(o0) === 0L)
    assert(graft.index.ExecutionProbeHook.pendingEvictionsFor(o1) === p1,
      "closing one facade must not disturb the survivor's counters")
    val probe1 = randomVectors(1, Dim, seed = 43).head._2
    val after = dbs(1).search("idx1", queriesDF(Seq(9L -> probe1)),
      topk = 1, nprobe = 4).collect().head.getLong(1)
    assert(after === tops(1), "the surviving facade must serve identically after the peer's close")
    dbs(1).close()
    assert(graft.index.ExecutionProbeHook.pendingEvictionsFor(o1) === 0L)

    // epoch state files survived the concurrent run: a FRESH manager per
    // index loads them, lists exactly one epoch, and the active pointer
    // names it (the EpochManager lock's real-world shape)
    for (t <- 0 until 2) {
      val em = new graft.storage.EpochManager(s"$base/tenant$t/idx$t/epochs")
      assert(em.listEpochs.size === 1, s"tenant $t epoch list corrupted")
      assert(em.activeEpoch === Some(em.listEpochs.head),
        s"tenant $t active pointer corrupted")
      assert(java.nio.file.Files.exists(
        java.nio.file.Paths.get(em.epochPath(em.listEpochs.head))))
    }
  }
}
