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
   * Two-level shape: a partial top-k first reduces each partition's
   * candidate stream to <= nQueries x k rows in bounded memory (map-side
   * combine that can never degrade to a sort-based fallback — the previous
   * ObjectHashAggregate-only plan silently re-sorted the full candidate
   * stream once a partition saw >128 query ids, unless a session-global
   * conf was rewritten), then the typed aggregator merges the tiny partial
   * stream into final buffers.
   *
   * The partial stage is a first-class physical operator
   * ([[PartialTopKExec]]): it consumes the child plan's InternalRows with
   * primitive getters and keys a primitive-long open-addressing map, so
   * the per-candidate hot loop allocates nothing — and the surrounding
   * plan (probe join, partition-pruned scan) stays visible in `explain`.
   */
  def topKPerQuery(scored: DataFrame, k: Int,
      queryCol: String = "qid", idCol: String = "id",
      distCol: String = "dist",
      maxPartialKeys: Int = MaxPartialKeys): DataFrame = {
    require(maxPartialKeys > 0, // a 0 budget would spin the flush loop forever
      s"maxPartialKeys must be positive, got $maxPartialKeys")
    val spark = scored.sparkSession
    import spark.implicits._
    // long/double casts are no-ops (optimizer-removed) on already-typed
    // plans, and pin the InternalRow accessor types for the exec's getters.
    // Null candidates are skipped INSIDE the operator (a null-bit check per
    // row) instead of via `filter(dist.isNotNull)`: on a computed distance
    // column that filter gets substituted through the Project into the join
    // condition by predicate pushdown, and the whole distance kernel runs
    // TWICE per candidate row — the dominant cost of every search plan.
    // tuple field names up front: the typed decode below resolves _1/_2/_3
    // and naming them here avoids a rename Project above the operator
    val prepared = scored
      .select(
        col(queryCol).cast("long").as("_1"),
        col(idCol).cast("long").as("_2"),
        col(distCol).cast("double").as("_3"))
    finalizePartial(PartialTopK(prepared, k, maxPartialKeys), k)
  }

  /**
   * Final merge over an already-partial candidate stream `(_1 qid LONG,
   * _2 id LONG, _3 dist DOUBLE)` — the output contract of BOTH partial
   * operators ([[PartialTopKExec]] and [[ListScanTopKExec]]). The partial
   * stream is tiny (<= nQueries x k per partition), so the typed decode
   * here is off the hot path.
   */
  def finalizePartial(partial: DataFrame, k: Int): DataFrame = {
    val spark = partial.sparkSession
    import spark.implicits._
    val agg = new TopKAggregator(k).toColumn
    partial.as[(Long, Long, Double)]
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
