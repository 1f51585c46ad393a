package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.SearchParams
import graft.index.IvfFlatIndex

/**
 * Streaming query serving — the Spark-native analog of the reference's
 * request-coalescing loop (reference server/query_service.cpp:267-401,
 * 586-636: queue RPCs for <= 2 ms or <= 64 requests, run one batched
 * engine call, scatter results). Structured Streaming's micro-batch IS
 * that coalescing window: each trigger drains the queued query rows and
 * runs ONE batched `search`, so batching comes from the execution model
 * instead of hand-rolled queues/condition variables.
 *
 * Unlike the reference — which applies the FIRST request's params to the
 * whole batch ("Assuming uniform search params", :351-352) — params here
 * are an explicit argument: one serving loop per param profile, with no
 * silent mixing (SURVEY A8: "do NOT replicate the first-params bug").
 */
object StreamingSearch {

  /**
   * Start a serving loop: `queryStream` is a streaming DataFrame of
   * (qid LONG, qvec ARRAY<FLOAT>); each micro-batch is searched as one
   * batch and handed to `sink` with the batch id.
   */
  def serve(
      index: IvfFlatIndex,
      queryStream: DataFrame,
      params: SearchParams,
      checkpointPath: String,
      triggerMs: Long = 100L)(
      sink: (DataFrame, Long) => Unit): StreamingQuery =
    queryStream.writeStream
      .option("checkpointLocation", checkpointPath)
      .trigger(Trigger.ProcessingTime(triggerMs))
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        // ONE bounded snapshot answers emptiness AND serves as the batch —
        // a separate isEmpty probe would double the per-trigger job count
        // on the serving hot loop
        IvfFlatIndex.snapshotQueries(batch).batch match {
          case Some(b) if b.isEmpty => // idle trigger: nothing to serve
          case Some(b) => sink(index.searchBatch(b, params), batchId)
          case None => // flood between triggers: stay fully distributed
            sink(index.searchWhere(batch, params, None, IvfFlatIndex.ForceJoin), batchId)
        }
      }
      .start()
}
