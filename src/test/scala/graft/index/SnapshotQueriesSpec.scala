package graft.index

import graft.SparkSpec

/**
 * Pins [[IvfFlatIndex.snapshotQueries]] after the r9 rewrite from
 * `limit(n+1).collect()` to `rdd.take(n+1)`.
 *
 * Why the rewrite: Spark's `BaseLimitExec` names its loop-state variable
 * with a JVM-global counter (`_limit_counter_N`), so a plan containing a
 * limit produces DIFFERENT generated source on every build and can never
 * hit the codegen cache — each snapshot paid a fresh Janino compile plus
 * JIT warm-in, re-paid on every plan construction (measured as the
 * r8 bench's flood-family instability: +2 codegen compiles per run on
 * exactly the three floodQuerySet entries).
 *
 * The contract that must survive the rewrite: one lazy evaluation, a
 * bounded prefix of at most MaxStaticBatch+1 rows on the driver, bounded
 * iff the set fits MaxStaticBatch, and the sample IS the serving input.
 */
class SnapshotQueriesSpec extends SparkSpec {

  private val Max = IvfFlatIndex.MaxStaticBatch

  test("bounded set: snapshot holds every row and reports bounded") {
    val qs = queriesDF(randomVectors(37, 8))
    val snap = IvfFlatIndex.snapshotQueries(qs)
    assert(snap.bounded)
    assert(snap.batch.isDefined)
    assert(snap.sample.length === 37)
    assert(snap.sample.map(_._1).sorted === (0L until 37L).toArray)
  }

  test("flood set: snapshot stops at the probe prefix and reports unbounded") {
    val qs = queriesDF(randomVectors(Max + 50, 8))
    val snap = IvfFlatIndex.snapshotQueries(qs)
    assert(!snap.bounded)
    assert(snap.batch.isEmpty)
    // the probe never drags the whole flood onto the driver
    assert(snap.sample.length === Max + 1)
  }

  test("exact boundary: MaxStaticBatch rows stay on the static path") {
    val qs = queriesDF(randomVectors(Max, 8))
    val snap = IvfFlatIndex.snapshotQueries(qs)
    assert(snap.bounded)
    assert(snap.sample.length === Max)
  }

  test("null qvec rows survive the snapshot for the callers' validation") {
    val s = spark
    import s.implicits._
    val qs = Seq((1L, Array(1.0f, 2.0f)), (2L, null.asInstanceOf[Array[Float]]))
      .toDF("qid", "qvec")
    val snap = IvfFlatIndex.snapshotQueries(qs)
    assert(snap.bounded)
    assert(snap.sample.length === 2)
    assert(snap.sample.find(_._1 == 2L).get._2 == null)
  }

  test("snapshot plan compiles no run-varying limit stage (codegen cache stays warm)") {
    val qs = queriesDF(randomVectors(64, 8))
    IvfFlatIndex.snapshotQueries(qs) // first build: may compile
    def n = org.apache.spark.metrics.source.CodegenMetrics
      .METRIC_COMPILATION_TIME.getCount
    val before = n
    IvfFlatIndex.snapshotQueries(queriesDF(randomVectors(64, 8)))
    assert(n - before === 0,
      "re-snapshotting an identically-shaped query set recompiled generated " +
        "code — a limit-shaped (or otherwise run-varying) stage is back in the plan")
  }
}
