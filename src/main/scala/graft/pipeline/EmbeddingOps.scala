package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.vector

/**
 * Embedding-column utilities for training-data pipelines. The reference
 * stores raw fp32 vectors only (format/storage.cpp — flat float pages);
 * int8 quantization is the standard 4x storage/bandwidth saver bolted on
 * here as pipeline-extension surface.
 *
 * Everything is per-row array arithmetic over codegen'd higher-order
 * functions — zero shuffle, scales linearly with the scan. The arithmetic
 * is restricted to operations that are bit-reproducible across engines
 * (float->double promotion, double multiply, floor), so the DuckDB oracle
 * can replay it exactly; round() is avoided because half-way tie rules
 * differ across engines.
 */
object EmbeddingOps {

  /** Symmetric per-vector int8 quantization: scale = 127/max|x|,
    * code_i = floor(x_i * scale). Codes land in [-128, 127] (floor of a
    * value in [-127, 127] can reach -128 only when max|x| is the unique
    * negative extreme; the decoder divides by the same scale, so range
    * asymmetry is harmless). */
  def quantizeInt8(vec: Column): Column = {
    val scale = lit(127.0) / array_max(transform(vec, v => abs(v.cast("double"))))
    transform(vec, v => floor(v.cast("double") * scale).cast("long"))
  }

  /**
   * Norm-outlier screen: vectors whose L2 norm falls outside the corpus
   * [p_lo, p_hi] percentile band — the cheap filter for broken embeddings
   * (zeroed rows, exploded values) before any similarity work. Norms are
   * one narrow codegen'd pass (the same sequential-double dot kernel as
   * the distance expressions); the two percentiles are ONE 1-row
   * aggregate broadcast back, so the plan is two scans and no wide
   * shuffle. Spark `percentile` and DuckDB `quantile_cont` share exact
   * linear interpolation, making the flags oracle-replayable.
   */
  def normOutliers(emb: DataFrame, vecCol: String = "embedding",
      lo: Double = 0.01, hi: Double = 0.99): DataFrame = {
    val norms = emb.select(
      col("vec_id"),
      sqrt(-vector.ip_distance(col(vecCol), col(vecCol))).as("norm"))
    val bounds = norms.agg(
      expr(s"percentile(norm, $lo)").as("p_lo"),
      expr(s"percentile(norm, $hi)").as("p_hi"))
    norms.crossJoin(broadcast(bounds))
      .select(col("vec_id"), col("norm"),
        (col("norm") < col("p_lo") || col("norm") > col("p_hi"))
          .as("is_outlier"))
  }

  /**
   * Quantization summary per vector: the scale (as floor(scale*1e6) so
   * the oracle compares an exact integer) and exact-integer stats of the
   * code distribution. `sum_codes` near 0 and `min/max` pinned at the
   * int8 edges are the standard sanity probes for a symmetric quantizer.
   */
  def quantizeStats(emb: DataFrame, vecCol: String = "embedding"): DataFrame = {
    val x = col(vecCol)
    val scale = lit(127.0) / array_max(transform(x, v => abs(v.cast("double"))))
    val codes = transform(x, v => floor(v.cast("double") * scale).cast("long"))
    emb.select(
      col("vec_id"),
      col("label"),
      floor(scale * 1e6).cast("long").as("scale_m"),
      aggregate(codes, lit(0L), (acc, c) => acc + c).as("sum_codes"),
      array_min(codes).as("min_code"),
      array_max(codes).as("max_code"))
  }

  /**
   * Per-label centroid summaries (class prototypes): the per-dimension
   * mean of every label's vectors, the standard cluster-summary /
   * nearest-class-mean building block. Components are fixed-pointed to
   * exact integer micros (floor(x * 1e6) as LONG) before the aggregate,
   * so the sums are partial-aggregation-order independent — a plain
   * double mean would differ run to run under Spark's combine order —
   * and the mean is derived deterministically from (sum, n) at the end.
   * Plan: posexplode (narrow fan-out) + one two-stage aggregation on
   * (label, pos); output is |labels| x dim rows.
   */
  def labelCentroids(emb: DataFrame, labelCol: String = "label",
      vecCol: String = "embedding"): DataFrame =
    emb
      .select(col(labelCol).cast("int").as("label"),
        posexplode(col(vecCol)).as(Seq("pos", "component")))
      .select(col("label"), col("pos"),
        floor(col("component").cast("double") * 1e6).cast("long").as("micros"))
      .groupBy("label", "pos")
      .agg(
        count(lit(1)).as("n"),
        sum("micros").as("sum_micros"))
      .withColumn("mean_component",
        col("sum_micros").cast("double") / col("n") / 1e6)

  /**
   * Sign-bit binary quantization, word `w` of the code: bit `b` is set
   * iff `vec[w*32 + b] > 0` — 32 dims per word, held in a LONG so the
   * word is always non-negative (and the DuckDB oracle's BIGINT shifts
   * agree bit for bit). 32x scan-byte reduction vs fp32; Hamming over
   * the packed words is the standard binary-quantized ANN first pass.
   * Native codegen'd kernel — the aggregate-HOF formulation ran
   * INTERPRETED with a POWER call per element on the corpus-side scan.
   */
  def signPackWord(vec: Column, word: Int): Column =
    vector.sign_pack_word(vec, word)
}
