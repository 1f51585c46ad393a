package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.api.VectorDB
import graft.streaming.StreamingIngest

/**
 * Whole-system integration: a vector stream lands in an epoch staging area
 * (Structured Streaming), a periodic BuildEpoch re-clusters the staged
 * corpus, activation swaps serving, and search reads the new epoch — the
 * streaming-ingest -> reindex -> serve loop of SURVEY §7.5, stitched from
 * the same parts a production deployment would use.
 */
class IntegrationSpec extends SparkSpec {

  test("driver contract: SparkEntry.entry returns rows at sf0.001") {
    // the driver smoke-checks exactly this; pin it so a refactor of the
    // flagship query can never silently break the per-round gate
    assume(new java.io.File("/root/testdata/sf0.001").isDirectory)
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("stream -> staging -> BuildEpoch -> ActivateEpoch -> Search loop") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = spark.sqlContext
    val tmp = java.nio.file.Files.createTempDirectory("graft-e2e").toString

    // 1. stream vector rows into staging (vectors ride as event payloads)
    val mem = MemoryStream[(Long, Array[Float])]
    val ingest = mem.toDF().toDF("id", "vec").writeStream
      .format("parquet")
      .option("path", s"$tmp/staging")
      .option("checkpointLocation", s"$tmp/ckpt")
      .start()
    val batch1 = randomVectors(300, 16)
    val batch2 = randomVectors(200, 16, seed = 9).map { case (i, v) => (i + 1000L, v) }
    try {
      mem.addData(batch1: _*)
      ingest.processAllAvailable()
      mem.addData(batch2: _*)
      ingest.processAllAvailable()

      // 2. periodic reindex: BuildEpoch over everything staged so far
      // (the ingest query keeps running — one continuous file sink)
      val db = new VectorDB(spark, s"$tmp/db")
      db.createIndex(IndexConfig("stream_idx", dimension = 16, nlist = 8))
      val staged = VectorDB.readVectorParquet(spark, s"$tmp/staging")
      assert(staged.count() === 500)
      val epoch = db.buildEpoch("stream_idx", staged)
      db.activateEpoch("stream_idx", epoch)

      // 3. serve: a query drawn from EACH batch finds itself at dist 0
      val probe = Seq(batch1.head, batch2.last)
      val q = queriesDF(probe.map { case (i, v) => (i, v) })
      val hits = db.search("stream_idx", q, topk = 1, nprobe = 8).collect()
      assert(hits.length === 2)
      assert(hits.forall(_.getDouble(2) === 0.0))
      assert(hits.map(_.getLong(1)).toSet === probe.map(_._1).toSet)

      // 4. next cycle: more data streams in, rebuild, swap, verify counts
      mem.addData((5000L, Array.fill(16)(0.25f)))
      ingest.processAllAvailable()
      val epoch2 = db.buildEpoch("stream_idx",
        VectorDB.readVectorParquet(spark, s"$tmp/staging"))
      db.activateEpoch("stream_idx", epoch2)
      assert(db.stats("stream_idx")("num_vectors") === 501L)
      assert(db.stats("stream_idx")("epoch") === epoch2)
      // old epoch still on disk until cleanup; active never deleted
      val deleted = db.cleanupOldEpochs("stream_idx", keepN = 1)
      assert(deleted.contains(epoch) && !deleted.contains(epoch2))
    } finally ingest.stop()
  }
}
