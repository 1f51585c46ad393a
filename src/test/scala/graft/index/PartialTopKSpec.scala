package graft.index

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

class LongTopKMapSpec extends AnyFunSuite {

  test("put/get round-trips keys including 0, negatives, and Long extremes") {
    val m = new LongTopKMap[TopKBuf](4, 1 << 20)
    val keys = Seq(0L, -1L, 1L, Long.MaxValue, Long.MinValue, 42L)
    keys.foreach(k => m.put(k, TopKBuf.empty(3).insert(k.toDouble, k)))
    assert(m.size === keys.size)
    keys.foreach(k => assert(m.get(k).ids(0) === k, s"key $k"))
    assert(m.get(999L) === null)
  }

  test("grows past the initial capacity without losing entries") {
    val m = new LongTopKMap[TopKBuf](4, 1 << 20)
    val n = 10000
    (0 until n).foreach(i => m.put(i.toLong * 7919, TopKBuf.empty(1).insert(i, i)))
    assert(m.size === n)
    (0 until n).foreach { i =>
      val buf = m.get(i.toLong * 7919)
      assert(buf != null && buf.ids(0) === i, s"entry $i")
    }
  }

  test("drain empties the map and returns every entry exactly once") {
    val m = new LongTopKMap[TopKBuf](4, 1 << 20)
    (0 until 100).foreach(i => m.put(i, TopKBuf.empty(1).insert(i, i)))
    val drained = m.drain()
    assert(drained.map(_._1).sorted.toSeq === (0L until 100L))
    assert(m.size === 0)
    assert(m.get(5L) === null)
    // reusable after drain
    m.put(7L, TopKBuf.empty(1).insert(7, 7))
    assert(m.get(7L).ids(0) === 7L)
  }
}

class TopKHeapSpec extends AnyFunSuite {

  test("heap keep-set and drain order equal TopKBuf for random streams with ties") {
    // random pairs INCLUDING exact duplicates (distance is a function of
    // id here, so a repeated id repeats its distance — the self-join
    // producer shape): buffer and heap must agree on the keep-set, the
    // drain order, AND the duplicate collapse
    val rnd = new scala.util.Random(7)
    for (k <- Seq(1, 2, 7, 64); n <- Seq(0, 1, 5, 500)) {
      val buf = TopKBuf.empty(k)
      val heap = new TopKHeap(k)
      val ids = (0 until n).map(_ => rnd.nextInt(200).toLong) // repeats = dups
      val pairs = ids.map(id => ((id * 7 % 20).toDouble, id))
      pairs.foreach { case (d, id) =>
        buf.insert(d, id)
        heap.insert(d, id)
      }
      heap.sortAscending()
      val a = (0 until buf.size).map(j => (buf.dists(j), buf.ids(j)))
      val b = (0 until heap.size).map(j => (heap.dists(j), heap.ids(j)))
      assert(a === b, s"k=$k n=$n")
    }
  }

  test("TopKHeap drops exact (dist, id) duplicates like TopKBuf (round 7)") {
    val heap = new TopKHeap(3)
    heap.insert(1.0, 10L); heap.insert(1.0, 10L); heap.insert(2.0, 20L)
    heap.sortAscending()
    assert((0 until heap.size).map(j => (heap.dists(j), heap.ids(j))) ===
      Seq((1.0, 10L), (2.0, 20L)))
    // ties on dist with DIFFERENT ids are distinct candidates, kept; a
    // duplicate arriving AFTER an eviction of its twin is a fresh insert
    val h2 = new TopKHeap(2)
    h2.insert(1.0, 1L); h2.insert(1.0, 2L); h2.insert(1.0, 1L)
    h2.sortAscending()
    assert((0 until h2.size).map(j => (h2.dists(j), h2.ids(j))) ===
      Seq((1.0, 1L), (1.0, 2L)))
    val h3 = new TopKHeap(1)
    h3.insert(2.0, 9L) // evicted next
    h3.insert(1.0, 1L); h3.insert(2.0, 9L) // duplicate of the EVICTED entry: rejected on order anyway
    h3.sortAscending()
    assert((0 until h3.size).map(j => (h3.dists(j), h3.ids(j))) === Seq((1.0, 1L)))
  }

  test("TopKBuf drops exact (dist, id) duplicates — top-k is over the candidate set") {
    val buf = TopKBuf.empty(3)
    buf.insert(1.0, 10L).insert(1.0, 10L).insert(2.0, 20L)
    assert(buf.toSeq === Seq((1.0, 10L), (2.0, 20L)))
    // a duplicate of a NON-adjacent entry also collapses (binary search
    // lands after the equal pair wherever it sits)
    buf.insert(0.5, 5L).insert(1.0, 10L)
    assert(buf.toSeq === Seq((0.5, 5L), (1.0, 10L), (2.0, 20L)))
    // ties on dist with DIFFERENT ids are distinct candidates, kept
    val tied = TopKBuf.empty(3)
    tied.insert(1.0, 1L).insert(1.0, 2L).insert(1.0, 1L)
    assert(tied.toSeq === Seq((1.0, 1L), (1.0, 2L)))
    // merge (S5) also collapses duplicates arriving from another partition
    val other = TopKBuf.empty(3).insert(1.0, 1L).insert(0.1, 9L)
    tied.merge(other)
    assert(tied.toSeq === Seq((0.1, 9L), (1.0, 1L), (1.0, 2L)))
  }

  test("NaN never enters; k larger than the stream keeps everything sorted") {
    val heap = new TopKHeap(1000)
    heap.insert(Double.NaN, 1L)
    assert(heap.size === 0)
    Seq(3.0 -> 3L, 1.0 -> 1L, 2.0 -> 2L).foreach { case (d, i) => heap.insert(d, i) }
    heap.sortAscending()
    assert((0 until heap.size).map(heap.ids(_)).toSeq === Seq(1L, 2L, 3L))
  }
}

class PartialTopKSpec extends SparkSpec {

  private def candidates(nq: Int, perQ: Int) = {
    // deterministic scored stream with shuffled-ish dist order
    spark.range(nq.toLong * perQ).select(
      (col("id") % nq).as("qid"),
      col("id").as("id"),
      (pmod(col("id") * 2654435761L, lit(100000)) / lit(10.0)).as("dist"))
  }

  private def windowTopK(scored: org.apache.spark.sql.DataFrame, k: Int) = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("qid").orderBy(col("dist").asc, col("id").asc)
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
      .select("qid", "id", "dist", "rank")
  }

  test("operator top-k equals the Window reference on a multi-partition stream") {
    val scored = candidates(97, 500).repartition(7)
    val a = TopKAggregator.topKPerQuery(scored, 10)
    val b = windowTopK(scored, 10)
    assert(a.exceptAll(b).count() === 0)
    assert(b.exceptAll(a).count() === 0)
  }

  test("large k (heap path) equals the Window reference") {
    val scored = candidates(11, 400).repartition(3)
    val a = TopKAggregator.topKPerQuery(scored, 2000) // k > HeapThreshold, k > stream
    val b = windowTopK(scored, 2000)
    assert(a.exceptAll(b).count() === 0)
    assert(b.exceptAll(a).count() === 0)
  }

  test("a tiny flush budget (mid-partition drains) changes nothing") {
    val scored = candidates(97, 200).repartition(3)
    val tight = TopKAggregator.topKPerQuery(scored, 5, maxPartialKeys = 2)
    val ref = windowTopK(scored, 5)
    assert(tight.exceptAll(ref).count() === 0)
    assert(ref.exceptAll(tight).count() === 0)
  }

  test("null qid/id/dist candidates are skipped, not ranked or crashed") {
    val s = spark
    import s.implicits._
    val rows = Seq[(java.lang.Long, java.lang.Long, java.lang.Double)](
      (1L, 10L, 1.0), (1L, 11L, 2.0),
      (null, 12L, 0.1), (1L, null, 0.2), (1L, 13L, null))
      .toDF("qid", "id", "dist")
    val out = TopKAggregator.topKPerQuery(rows, 10).collect()
    assert(out.map(_.getLong(1)).sorted.toSeq === Seq(10L, 11L))
  }

  test("the plan shows PartialTopK with the child scan visible beneath it") {
    val scored = candidates(5, 10)
    val plan = TopKAggregator.topKPerQuery(scored, 3)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PartialTopK"))
    assert(plan.contains("Range")) // the child source survives in the same tree
  }
}
