package graft.index

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Metric
import graft.functions.vector

/**
 * Exact brute-force k-NN (reference S1, engine/kernels.cuh:84-185) as a
 * composed DataFrame plan: the query batch is broadcast (the kernel's
 * shared-memory query cache, SURVEY §4) and every stored vector is scanned
 * once — a nested-loop theta-join, which is exactly what brute force *is*.
 * Top-k runs through [[TopKAggregator.topKPerQuery]]'s partial-combine
 * operator: the Window variant's null/NaN pre-filter on the computed
 * distance column was substituted into the cross-join's condition by
 * predicate pushdown, evaluating the full distance kernel THREE times per
 * (query, vector) pair; the operator skips null/NaN candidates internally
 * and the kernel evaluates once.
 */
object Knn {

  /** Scoring-work target per flood task, in PAIR-BYTES (query-side bytes x
    * corpus-side bytes, both from free plan-time stats): brute force
    * evaluates one distance kernel per (query, corpus) pair, so work per
    * task ∝ the byte product. 4e11 pair-bytes ≈ 1.5M 128-D float pairs
    * ≈ ~100 ms of kernel time — tasks in the hundreds of milliseconds,
    * far above the per-task scheduling + shuffle-writer fixed cost the
    * r20 stage profiles attributed (guide §2.5), without the flat
    * full-parallelism fan-out that made 8 cores beat 32 on KB floods. */
  private[index] val TargetPairBytes: BigInt = BigInt(400L) * 1000000000L

  /** Plan-stats-derived partition count for the unbounded flood's scoring
    * stage: ceil(qBytes x cBytes / TargetPairBytes) clamped to
    * [1, spark.sql.shuffle.partitions]. Unknown stats estimate huge and
    * saturate the cap — the safe default for a genuine flood. */
  private[index] def floodParts(queries: DataFrame, corpus: DataFrame): Int = {
    val n = queries.sparkSession.sessionState.conf.numShufflePartitions
    val qB = queries.queryExecution.optimizedPlan.stats.sizeInBytes
    val cB = corpus.queryExecution.optimizedPlan.stats.sizeInBytes
    val want = (qB * cB + TargetPairBytes - 1) / TargetPairBytes
    want.min(BigInt(n)).max(BigInt(1)).toInt
  }

  /**
   * @param queries  (qid: LONG, qvec: ARRAY<FLOAT>) — small batch, broadcast
   * @param vectors  (id: LONG, vec: ARRAY<FLOAT>) — the scanned corpus
   * @return (qid, id, dist: DOUBLE, rank: INT), rank 1..k by (dist, id)
   *
   * A bounded batch (<= [[IvfFlatIndex.MaxStaticBatch]]) runs through
   * [[ListScanTopK]] with ONE virtual list covering the whole corpus: each
   * stored vector decodes once and scores against every query inside the
   * stable kernel — the cross-join formulation paid a `toFloatArray` per
   * (query, vector) PAIR through per-query generated code (batch x more
   * copies, plus the deopt exposure the operator was built to shed). An
   * unbounded query set keeps the broadcast nested-loop join, which is
   * what brute force over a stream of queries IS.
   */
  def exact(
      queries: DataFrame,
      vectors: DataFrame,
      k: Int,
      metric: Metric.Value = Metric.L2): DataFrame =
    exactManaged(queries, vectors, k, metric)._1

  /** [[exact]] plus a release handle for the bounded-batch path's query
    * broadcast — same managed contract as [[IvfFlatIndex
    * .searchBatchManaged]]: a long-lived driver (recall monitoring loop)
    * calls release() after the result is consumed; one-shot callers use
    * [[exact]] and let the ContextCleaner reclaim it. The plan must not
    * run again after release(). */
  def exactManaged(
      queries: DataFrame,
      vectors: DataFrame,
      k: Int,
      metric: Metric.Value = Metric.L2): (DataFrame, () => Unit) = {
    val qdf = queries.select(col("qid"), col("qvec"))
    IvfFlatIndex.snapshotQueries(qdf).batch match {
      case Some(batch) =>
        // null query vectors yield no rows either way (the join path's
        // null distance is skipped inside the top-k) — drop them here
        val live = batch.filter(_._2 != null)
        val bc = qdf.sparkSession.sparkContext.broadcast(
          ProbeIndex(live, live.map(q => (q._1, 0)), nlist = 1))
        val corpus = vectors.select(
          col("id").cast("long"), lit(0).cast("int").as("list_id"), col("vec"))
        (TopKAggregator.finalizePartial(
          ListScanTopK(corpus, new FlatListScorer(bc, metric.id), k), k)
          .select("qid", "id", "dist", "rank"),
          () => bc.destroy())
      case None =>
        // unbounded query set. Below the size gate the batch ships through
        // the lazy broadcast exchange into the same stable scan operator
        // (one virtual list spanning the corpus — each stored vector
        // decodes once and scores every query in scalac-compiled code);
        // above it nothing is broadcast — this branch fires precisely
        // because the batch is large, so an unconditional hint would
        // bypass autoBroadcastJoinThreshold for an arbitrarily big set
        // (round-7 fix): the plain cross join lets AQE plan the flood.
        if (IvfFlatIndex.fitsBroadcastGate(qdf, 1)) {
          val probed = qdf.withColumn("list_id", lit(0))
          val corpus = IvfFlatIndex.widenScan(vectors.select(
            col("id").cast("long"), lit(0).cast("int").as("list_id"), col("vec")))
          (TopKAggregator.finalizePartial(
            BroadcastProbeTopK.flat(probed, corpus, k, metric.id), k)
            .select("qid", "id", "dist", "rank"), () => ())
        } else {
          // r21: the above-gate flood scores through CoGroupTopK's
          // deopt-immune co-partition loops over ONE virtual list with
          // the salt pinned to the plan-stats-derived scoring
          // parallelism. This replaces the r20 cross-join + per-pair
          // codegen shape, which was wrong twice over:
          //  - its repartition(n, qid) pre-satisfied finalizePartial's
          //    exchange; the optimizer elided it and the WHOLE quadratic
          //    scoring pipeline landed on the map side of a consumer's
          //    range-partitioning exchange — whose bounds-sampling job
          //    re-executes its child, so the scoring ran TWICE per
          //    action (measured: two identical 32-task stages each
          //    reading the query shuffle; guide §2.4);
          //  - every (query, vector) pair materialized as a generated-
          //    code candidate row (measured ~1.9 us/pair vs ~0.1 us for
          //    the same kernel inside the scalac scan loop — the exact
          //    overhead ListScanTopK removed from the static path).
          // The salt (corpus sub-buckets = scoring tasks) comes from the
          // query x corpus byte product, not a flat constant (r20
          // verdict #2, guide §2.5): a KB flood takes few tasks — no
          // shuffle-writer file-matrix tax for microseconds of work —
          // while any production-sized flood saturates the session cap.
          // One row per qid BEFORE scoring: two duplicate rows would
          // both replicate into the salt buckets, and per-bucket
          // first-wins could score DIFFERENT qvecs of one qid in
          // different buckets — same invariant as every other path.
          val probed = IvfFlatIndex.onePerQid(qdf).withColumn("list_id", lit(0))
          val corpus = vectors.select(
            col("id").cast("long"), lit(0).cast("int").as("list_id"), col("vec"))
          (CoGroupTopK.flatSearch(probed, corpus, k, metric.id,
            nlist = 1, saltHint = floodParts(qdf, vectors))
            .select("qid", "id", "dist", "rank"),
            () => ())
        }
    }
  }

  /**
   * Range search: ALL (qid, id, dist) pairs with dist <= radius, exact —
   * the fixed-radius sibling of top-k (FAISS `range_search`; the
   * reference's top-k-only surface has no analog, so this is extension
   * surface). Unlike top-k there is no per-query state to bound: the
   * result IS the filtered candidate set, so the plan is a single corpus
   * scan against the broadcast query batch with the codegen'd distance
   * kernel inside the scan's filter — no shuffle, no aggregation, output
   * cardinality is the only data-dependent cost. At 100 TB this is the
   * cheapest possible shape (embarrassingly parallel over corpus splits);
   * callers bound the radius, not the engine.
   *
   * The radius predicate is the ONLY filter on purpose: `dist <= radius`
   * already rejects NaN (NaN compares greatest) and null, and a separate
   * null/NaN pre-filter would be substituted into the join condition by
   * CollapseProject + pushdown, re-evaluating the distance kernel once
   * per conjunct per (query, vector) pair (the 3x-evaluation trap this
   * file's top-k paths were rebuilt to avoid — pinned by the plan spec).
   */
  def range(
      queries: DataFrame,
      vectors: DataFrame,
      radius: Double,
      metric: Metric.Value = Metric.L2): DataFrame = {
    val qdf = queries.select(col("qid"), col("qvec"))
    // broadcast only under the size gate (same contract as exact():
    // an unconditional hint would bypass autoBroadcastJoinThreshold
    // for an arbitrarily large query set)
    val q = if (IvfFlatIndex.fitsBroadcastGate(qdf, 1)) broadcast(qdf) else qdf
    vectors.select(col("id"), col("vec"))
      .crossJoin(q)
      .withColumn("dist", vector.distance(col("qvec"), col("vec"), metric))
      .filter(col("dist") <= radius)
      .select("qid", "id", "dist")
  }

  /**
   * Rank-limit per query with the reference's deterministic
   * (dist, id) tie order (std::sort on pair<float,uint64>,
   * ivf_flat_index.cpp:493). Input needs columns qid, id, dist.
   */
  def topKPerQuery(scored: DataFrame, k: Int,
      queryCol: String = "qid", idCol: String = "id",
      distCol: String = "dist"): DataFrame = {
    val w = Window.partitionBy(queryCol).orderBy(col(distCol).asc, col(idCol).asc)
    scored
      // null distances (null input vectors) must not win the nulls-first
      // ascending sort, and NaN (NaN vector components) must not rank at
      // all — mirror the reference's id-validity filter
      // (server/query_service.cpp:150)
      .filter(col(distCol).isNotNull && !isnan(col(distCol)))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  /**
   * S5 merge (ivf_flat_index.cpp:474-518): union of per-list candidates →
   * dedup by id keeping the best (dist, id) — min over the pair preserves
   * the reference's sort-then-first-seen order — then global top-k.
   * In IVF-Flat each id lives in exactly one list so dedup is usually a
   * no-op; it matters when candidates come from overlapping sources.
   */
  def mergeResults(candidates: DataFrame, k: Int,
      queryCol: String = "qid", idCol: String = "id",
      distCol: String = "dist"): DataFrame = {
    val deduped = candidates
      .groupBy(col(queryCol), col(idCol))
      .agg(min(col(distCol)).as(distCol))
    topKPerQuery(deduped, k, queryCol, idCol, distCol)
  }
}
