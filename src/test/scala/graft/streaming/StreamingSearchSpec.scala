package graft.streaming

import java.util.concurrent.ConcurrentLinkedQueue

import org.apache.spark.sql.Row
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.{SearchParams, SparkSpec}
import graft.index.IvfFlatIndex

class StreamingSearchSpec extends SparkSpec {

  test("streaming serving loop batches queued queries through one search per micro-batch") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = spark.sqlContext
    val index = IvfFlatIndex.build(spark, vectorsDF(randomVectors(300, 8)), nlist = 4)
    val mem = MemoryStream[(Long, Array[Float])]
    val results = new ConcurrentLinkedQueue[Row]()
    val batches = new ConcurrentLinkedQueue[Long]()
    val tmp = java.nio.file.Files.createTempDirectory("graft-serve").toString
    val q = StreamingSearch.serve(
      index,
      mem.toDF().toDF("qid", "qvec"),
      SearchParams(k = 3, nprobe = 4),
      checkpointPath = s"$tmp/ckpt",
      triggerMs = 50L) { (res, batchId) =>
      res.collect().foreach(results.add)
      batches.add(batchId)
    }
    try {
      val queries = randomVectors(4, 8, seed = 5)
      mem.addData(queries.take(2): _*)
      q.processAllAvailable()
      mem.addData(queries.drop(2): _*)
      q.processAllAvailable()
      import scala.jdk.CollectionConverters._
      val rows = results.asScala.toSeq
      // every query got k=3 ranked hits
      val perQ = rows.groupBy(_.getLong(0)).view.mapValues(_.size).toMap
      assert(perQ.keySet === queries.map(_._1).toSet)
      assert(perQ.values.forall(_ === 3))
      // coalescing: 4 queries arrived in 2 micro-batches, not 4 calls
      assert(batches.asScala.toSet.size <= 3)
    } finally q.stop()
  }

  test("a flood micro-batch (> MaxStaticBatch) takes the distributed path, same results") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = spark.sqlContext
    val corpus = vectorsDF(randomVectors(300, 8))
    val index = IvfFlatIndex.build(spark, corpus, nlist = 4)
    val mem = MemoryStream[(Long, Array[Float])]
    val results = new ConcurrentLinkedQueue[Row]()
    val tmp = java.nio.file.Files.createTempDirectory("graft-serve-flood").toString
    val q = StreamingSearch.serve(
      index,
      mem.toDF().toDF("qid", "qvec"),
      SearchParams(k = 2, nprobe = 4),
      checkpointPath = s"$tmp/ckpt",
      triggerMs = 50L) { (res, _) => res.collect().foreach(results.add) }
    try {
      val flood = randomVectors(IvfFlatIndex.MaxStaticBatch + 30, 8, seed = 6)
      mem.addData(flood: _*)
      q.processAllAvailable()
      import scala.jdk.CollectionConverters._
      val rows = results.asScala.toSeq
      val perQ = rows.groupBy(_.getLong(0)).view.mapValues(_.size).toMap
      assert(perQ.keySet === flood.map(_._1).toSet)
      assert(perQ.values.forall(_ === 2))
      // spot-check a query against the exact oracle (nprobe=nlist)
      val sample = flood.take(3)
      val exact = index.searchExact(queriesDF(sample), 2)
        .collect().map(r => (r.getLong(0), r.getInt(3), r.getLong(1))).toSet
      val served = rows.filter(r => sample.exists(_._1 == r.getLong(0)))
        .map(r => (r.getLong(0), r.getInt(3), r.getLong(1))).toSet
      assert(served === exact)
    } finally q.stop()
  }
}
