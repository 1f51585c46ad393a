package graft.index

import org.apache.spark.sql.{DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/**
 * Typed bounded top-k aggregator — the partial/final-aggregation shape of
 * the reference's per-thread top-32 insertion buffer + k-way merge
 * (reference engine/kernels.cuh:120-170, ivf_flat_index.cpp:474-518):
 * each partition reduces its candidates into a k-bounded buffer (map-side
 * combine), buffers merge pairwise, and only nQueries x k rows ever cross
 * the shuffle — vs. the Window path, which sorts candidates within each
 * partition before its WindowGroupLimit prune.
 *
 * Buffer is a descending-sorted Array[(dist, id)] capped at k; merge keeps
 * the reference's (dist, id) tie order.
 */
class TopKAggregator(k: Int)
    extends Aggregator[(Long, Long, Double), Seq[(Double, Long)], Seq[(Double, Long)]] {

  override def zero: Seq[(Double, Long)] = Vector.empty

  /** in = (qid, id, dist); qid is the grouping key, ignored here. NaN
    * distances are excluded — under ordLt a NaN would win every
    * comparison and sit at rank 1, where the Window path sorts it last. */
  override def reduce(buf: Seq[(Double, Long)], in: (Long, Long, Double)): Seq[(Double, Long)] =
    if (in._3.isNaN) buf else insert(buf, (in._3, in._2))

  private def insert(buf: Seq[(Double, Long)], cand: (Double, Long)): Seq[(Double, Long)] =
    if (buf.size >= k && ordGte(cand, buf.last)) buf
    else {
      val (lt, gte) = buf.partition(b => ordLt(b, cand))
      (lt :+ cand) ++ gte.take(k - lt.size - 1)
    }

  private def ordLt(a: (Double, Long), b: (Double, Long)): Boolean =
    a._1 < b._1 || (a._1 == b._1 && a._2 < b._2)
  private def ordGte(a: (Double, Long), b: (Double, Long)): Boolean = !ordLt(a, b)

  override def merge(a: Seq[(Double, Long)], b: Seq[(Double, Long)]): Seq[(Double, Long)] =
    b.foldLeft(a)(insert)

  override def finish(buf: Seq[(Double, Long)]): Seq[(Double, Long)] = buf

  override def bufferEncoder: Encoder[Seq[(Double, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Double, Long)]]()
  override def outputEncoder: Encoder[Seq[(Double, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Double, Long)]]()
}

object TopKAggregator {

  /**
   * Aggregator-based drop-in for [[Knn.topKPerQuery]]: same output schema
   * (qid, id, dist, rank) and the same (dist, id) ordering.
   */
  def topKPerQuery(scored: DataFrame, k: Int,
      queryCol: String = "qid", idCol: String = "id",
      distCol: String = "dist"): DataFrame = {
    val spark = scored.sparkSession
    import spark.implicits._
    // ObjectHashAggregate falls back to SORT-BASED aggregation once a
    // partition sees >128 distinct keys (objectHashAggregate.sortBased.
    // fallbackThreshold) — with hundreds of query groups that means
    // sorting and spilling the full candidate stream on every search.
    // The hash map only ever holds nQueries k-bounded buffers, so a large
    // threshold is safe.
    val key = "spark.sql.objectHashAggregate.sortBased.fallbackThreshold"
    if (spark.conf.get(key, "128").toLong < 1048576L)
      spark.conf.set(key, "1048576")
    val agg = new TopKAggregator(k).toColumn
    scored
      .filter(col(distCol).isNotNull)
      .select(col(queryCol).as("qid"), col(idCol).as("id"), col(distCol).as("dist"))
      .as[(Long, Long, Double)]
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
