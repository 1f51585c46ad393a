package graft.index

import org.apache.spark.sql.{DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/**
 * Typed bounded top-k aggregator — the partial/final-aggregation shape of
 * the reference's per-thread top-32 insertion buffer + k-way merge
 * (reference engine/kernels.cuh:120-170, ivf_flat_index.cpp:474-518),
 * with a mutable fixed-array [[TopKBuf]] (zero allocation per candidate).
 */
class TopKAggregator(k: Int)
    extends Aggregator[(Long, Long, Double), TopKBuf, Seq[(Double, Long)]] {

  override def zero: TopKBuf = TopKBuf.empty(k)

  /** in = (qid, id, dist); qid is the grouping key, ignored here. */
  override def reduce(buf: TopKBuf, in: (Long, Long, Double)): TopKBuf =
    buf.insert(in._3, in._2)

  override def merge(a: TopKBuf, b: TopKBuf): TopKBuf = a.merge(b)

  override def finish(buf: TopKBuf): Seq[(Double, Long)] = buf.toSeq

  // buffers only serialize when partial aggregates cross the shuffle —
  // k-bounded, so the payload is tiny
  override def bufferEncoder: Encoder[TopKBuf] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[TopKBuf]()
  override def outputEncoder: Encoder[Seq[(Double, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Double, Long)]]()
}

object TopKAggregator {

  /** Flush threshold for the partial map: with more distinct query ids than
    * this in one partition, the partial stage emits and resets instead of
    * growing (bounded memory at any query cardinality). */
  val MaxPartialKeys = 1 << 18

  /**
   * Aggregator-based drop-in for [[Knn.topKPerQuery]]: same output schema
   * (qid, id, dist, rank) and the same (dist, id) ordering.
   *
   * Two-level shape: a `mapPartitions` partial top-k first reduces each
   * partition's candidate stream to <= nQueries x k rows in bounded memory
   * (map-side combine that can never degrade to a sort-based fallback —
   * the previous ObjectHashAggregate-only plan silently re-sorted the full
   * candidate stream once a partition saw >128 query ids, unless a
   * session-global conf was rewritten), then the typed aggregator merges
   * the tiny partial stream into final buffers.
   */
  def topKPerQuery(scored: DataFrame, k: Int,
      queryCol: String = "qid", idCol: String = "id",
      distCol: String = "dist",
      maxPartialKeys: Int = MaxPartialKeys): DataFrame = {
    require(maxPartialKeys > 0, // a 0 budget would spin the flush loop forever
      s"maxPartialKeys must be positive, got $maxPartialKeys")
    val spark = scored.sparkSession
    import spark.implicits._
    val ds = scored
      .filter(col(distCol).isNotNull)
      .select(col(queryCol).as("qid"), col(idCol).as("id"), col(distCol).as("dist"))
      .as[(Long, Long, Double)]
    val partial = ds.mapPartitions { rows =>
      // incremental partial combine: consume candidates into a bounded map,
      // and when the key budget fills, STREAM the drained buffers out
      // before building the next map — memory stays O(MaxPartialKeys * k)
      // no matter how many distinct query ids one partition holds
      new Iterator[(Long, Long, Double)] {
        private val map = new java.util.HashMap[Long, TopKBuf]()
        private var out: Iterator[(Long, Long, Double)] = Iterator.empty
        private var exhausted = false

        override def hasNext: Boolean = {
          while (!out.hasNext && !exhausted) advance()
          out.hasNext
        }
        override def next(): (Long, Long, Double) = { hasNext; out.next() }

        private def advance(): Unit = {
          while (rows.hasNext && map.size < maxPartialKeys) {
            val (qid, id, dist) = rows.next()
            var buf = map.get(qid)
            if (buf == null) { buf = TopKBuf.empty(k); map.put(qid, buf) }
            buf.insert(dist, id)
          }
          if (!rows.hasNext) exhausted = true
          out = snapshot()
        }

        /** Copy the map's buffers out, clear it, and stream the rows. */
        private def snapshot(): Iterator[(Long, Long, Double)] = {
          val arr = new Array[(Long, TopKBuf)](map.size)
          var i = 0
          map.forEach { (qid, buf) => arr(i) = (qid, buf); i += 1 }
          map.clear()
          arr.iterator.flatMap { case (qid, buf) =>
            Iterator.range(0, buf.size).map(j => (qid, buf.ids(j), buf.dists(j)))
          }
        }
      }
    }
    val agg = new TopKAggregator(k).toColumn
    partial
      .groupByKey(_._1)
      .agg(agg.name("topk").as[Seq[(Double, Long)]](
        org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Double, Long)]]()))
      .toDF("qid", "topk")
      .select(col("qid"), posexplode(col("topk")).as(Seq("pos", "hit")))
      .select(
        col("qid"),
        col("hit._2").as("id"),
        col("hit._1").as("dist"),
        (col("pos") + 1).cast("int").as("rank"))
  }
}
