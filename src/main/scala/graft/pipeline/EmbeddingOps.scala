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
    * asymmetry is harmless).
    *
    * Evaluation shape: the scale is computed ONCE per row and zipped in —
    * referencing sq8Scale(vec) inside a transform() lambda would
    * re-evaluate the O(d) max-scan per ELEMENT (higher-order lambdas get
    * no subexpression hoisting), turning the quantizer O(d^2). */
  def quantizeInt8(vec: Column): Column = quantizeInt8(vec, sq8Scale(vec))

  /** [[quantizeInt8]] against a PRECOMPUTED scale column — for plans that
    * already carry the scale (quantizeStats), so the O(d) max-scan isn't
    * re-run inside the quantize expression. */
  private[graft] def quantizeInt8(vec: Column, scale: Column): Column =
    zip_with(vec, array_repeat(scale, size(vec)),
      (v, s) => floor(v.cast("double") * s).cast("long"))

  /** THE symmetric-quantizer scale, shared by every SQ8 producer
    * (quantizeInt8, quantizeStats, Similarity.sq8SearchRerank) so the
    * stored codes and their oracles can never drift apart. All-zero
    * vectors get scale 1 — 127/0 would be Infinity and every code NaN;
    * with scale 1 the codes and their dequantized values are exactly 0. */
  private[graft] def sq8Scale(vec: Column): Column = {
    val mx = array_max(transform(vec, v => abs(v.cast("double"))))
    when(mx === 0.0, lit(1.0)).otherwise(lit(127.0) / mx)
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
   *
   * `exact = true` (the oracle-parity default) uses exact `percentile`,
   * whose buffer holds every distinct norm — fine up to the hundreds of
   * millions of rows a single aggregate task can absorb, NOT at 100 TB
   * (norms are near-all-distinct doubles). A full-corpus screen passes
   * `exact = false` for GK approx_percentile: bounded sketch state, at
   * the cost of DuckDB bit-parity on the two bounds (the outlier band is
   * a heuristic screen, so approximate bounds are semantically fine).
   */
  def normOutliers(emb: DataFrame, vecCol: String = "embedding",
      lo: Double = 0.01, hi: Double = 0.99,
      exact: Boolean = true, accuracy: Int = 10000): DataFrame = {
    val norms = emb.select(
      col("vec_id"),
      sqrt(-vector.ip_distance(col(vecCol), col(vecCol))).as("norm"))
    val fn = if (exact) "percentile(norm, %s)"
             else s"approx_percentile(norm, %s, $accuracy)"
    val bounds = norms.agg(
      expr(fn.format(lo.toString)).as("p_lo"),
      expr(fn.format(hi.toString)).as("p_hi"))
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
    // staged selects: the O(d) max-|x| scale scan runs ONCE (scale_m and
    // the codes both read the `scale` column — inlining sq8Scale twice in
    // one projection re-runs the scan per reference, Project has no
    // intra-operator CSE for it), and the codes array materializes once
    // before the three aggregates read it (CollapseProject keeps the
    // boundary for non-cheap repeated exprs)
    emb.select(
      col("vec_id"),
      col("label"),
      x.as("v"),
      sq8Scale(x).as("scale"))
      .select(
        col("vec_id"),
        col("label"),
        floor(col("scale") * 1e6).cast("long").as("scale_m"),
        quantizeInt8(col("v"), col("scale")).as("codes"))
      .select(
        col("vec_id"),
        col("label"),
        col("scale_m"),
        aggregate(col("codes"), lit(0L), (acc, c) => acc + c).as("sum_codes"),
        array_min(col("codes")).as("min_code"),
        array_max(col("codes")).as("max_code"))
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

  /** Per-partition exact-moment partial: row count, fixed-point component
    * sums, and the upper-triangle Gram matrix (length d*(d+1)/2, row-major
    * over i <= j). One of these per task — the shuffle that follows is
    * partitions x d^2/2 small rows, independent of corpus size. */
  private case class MomentPartial(n: Long, sums: Array[Long], gram: Array[Long])

  /** Hard |q| bound of the exact-moment fixed point: products stay
    * <= 1e10, so same-sign sums are exact past 9.2e8 rows. */
  val MomentsMaxAbsQ: Long = 100000L

  /**
   * Corpus second moments in EXACT fixed-point arithmetic: components
   * quantize to floor(x * scale) micros, and every statistic is an
   * integer sum — associative, partial-aggregation-order-proof, and
   * replayable bit-for-bit by a SQL oracle (a plain double covariance
   * would differ in the last ulp per partitioning). Output: one row per
   * upper-triangle (i, j), 1-based, with (n, s_i, s_j, s_ij); mean and
   * covariance derive exactly as cov = (n*s_ij - s_i*s_j) / n^2 scaled.
   *
   * Overflow contract, enforced not hoped-for: every |q| is required
   * <= MaxAbsQ = 1e5 (|x| <= 10 at the default scale 1e4 — raw encoder
   * outputs are within that; normalize first if not), so each product is
   * <= 1e10 and the all-same-sign worst case stays exact past 9.2e8 rows
   * (Long.MaxValue / 1e10). Null or wrong-length vectors THROW rather
   * than silently diverging from the SQL oracle's count(*). The 1e4
   * scale resolves covariance entries to ~1e-8 — far below anything
   * whitening can feel.
   *
   * Plan shape: one narrow mapPartitions pass (stable compiled loop, no
   * per-row allocation beyond the reused accumulators), then a
   * partitions x d^2/2-row exact groupBy — never an n x d^2 explode.
   */
  def momentsFixedPoint(
      emb: DataFrame,
      vecCol: String = "embedding",
      scale: Long = 10000L): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    // dimension probe must itself survive dirty data: a null first row
    // gives size() = -1 and an empty frame has no head() — both deserve
    // the documented contract error, not NegativeArraySizeException
    val d = emb.select(size(col(vecCol)).as("_d"))
      .filter(col("_d") >= 0)
      .head(1).headOption
      .map(_.getInt(0))
      .getOrElse(throw new IllegalArgumentException(
        "momentsFixedPoint: no non-null vectors to infer the dimension from"))
    val tri = (for { i <- 0 until d; j <- i until d } yield (i, j)).toArray
    val maxAbsQ = MomentsMaxAbsQ
    val partials = emb.select(col(vecCol)).as[Seq[Float]]
      .mapPartitions { rows =>
        val sums = new Array[Long](d)
        val gram = new Array[Long](d * (d + 1) / 2)
        val q = new Array[Long](d)
        var n = 0L
        while (rows.hasNext) {
          val v = rows.next()
          require(v != null && v.length == d,
            s"momentsFixedPoint: null or wrong-length vector (expected dim $d, " +
              s"got ${if (v == null) "null" else v.length.toString}) — clean the column first")
          var i = 0
          while (i < d) {
            val x = math.floor(v(i).toDouble * scale)
            require(math.abs(x) <= maxAbsQ,
              s"component ${v(i)} exceeds the exact fixed-point range " +
                s"(|x| <= ${maxAbsQ / scale.toDouble} at scale $scale) — " +
                "normalize the embeddings or lower the scale")
            q(i) = x.toLong
            i += 1
          }
          var t = 0
          i = 0
          while (i < d) {
            sums(i) += q(i)
            var j = i
            while (j < d) { gram(t) += q(i) * q(j); t += 1; j += 1 }
            i += 1
          }
          n += 1
        }
        if (n == 0) Iterator.empty
        else Iterator.single(MomentPartial(n, sums, gram))
      }
    partials
      .flatMap { p =>
        var t = -1
        tri.iterator.map { case (i, j) =>
          t += 1
          (i + 1, j + 1, p.n, p.sums(i), p.sums(j), p.gram(t))
        }
      }
      .toDF("i", "j", "n", "s_i", "s_j", "s_ij")
      .groupBy("i", "j")
      .agg(sum("n").as("n"), sum("s_i").as("s_i"),
        sum("s_j").as("s_j"), sum("s_ij").as("s_ij"))
  }

  /**
   * ZCA whitening transform from the exact moments: W = V diag(1/sqrt(
   * lambda + eps)) V^T over the sample covariance — the embedding-pipeline
   * normalization that turns anisotropic encoder output into unit
   * covariance (retrieval post-processing a la Su et al.'s whitening-BERT).
   * The eigenproblem is d x d DRIVER-side math on the collected moment
   * rows (bounded metadata — d^2/2 longs — like centroids); applying W is
   * a per-row mat-vec in the scan, no shuffle. Returns (W, mean) in the
   * original float space.
   */
  def whiteningTransform(
      moments: DataFrame,
      scale: Long = 10000L,
      eps: Double = 1e-5): (Array[Array[Double]], Array[Double]) = {
    val rows = moments.select("i", "j", "n", "s_i", "s_j", "s_ij").collect()
    require(rows.nonEmpty, "empty moments")
    val d = rows.iterator.map(_.getInt(1)).max
    val n = rows.head.getLong(2).toDouble
    val s = scale.toDouble
    val cov = Array.ofDim[Double](d, d)
    val mean = new Array[Double](d)
    rows.foreach { r =>
      val (i, j) = (r.getInt(0) - 1, r.getInt(1) - 1)
      val c = (n * r.getLong(5) - r.getLong(3).toDouble * r.getLong(4)) / (n * n * s * s)
      cov(i)(j) = c; cov(j)(i) = c
      if (i == j) mean(i) = r.getLong(3) / (n * s)
    }
    val (vals, vecs) = jacobiEigen(cov)
    // W = V diag(1/sqrt(l+eps)) V^T
    val w = Array.ofDim[Double](d, d)
    var i = 0
    while (i < d) {
      var j = 0
      while (j < d) {
        var acc = 0.0
        var k = 0
        while (k < d) {
          acc += vecs(i)(k) * vecs(j)(k) / math.sqrt(math.max(vals(k), 0.0) + eps)
          k += 1
        }
        w(i)(j) = acc
        j += 1
      }
      i += 1
    }
    (w, mean)
  }

  /**
   * End-to-end distributed whitening of an embedding column: exact
   * moments (one narrow pass + tiny shuffle) -> driver-side eigen ->
   * broadcast (W, mean) applied as a codegen'd per-row mat-vec in the
   * scan. No shuffle touches the vectors themselves.
   */
  def whitenEmbeddings(
      emb: DataFrame,
      vecCol: String = "embedding",
      eps: Double = 1e-5): DataFrame = {
    val (w, mean) = whiteningTransform(momentsFixedPoint(emb, vecCol), eps = eps)
    val d = mean.length
    val flat = new Array[Double](d * d)
    var i = 0
    while (i < d) {
      var j = 0
      while (j < d) { flat(i * d + j) = w(i)(j); j += 1 }
      i += 1
    }
    val bc = emb.sparkSession.sparkContext.broadcast((flat, mean))
    emb.withColumn(vecCol, vector.whiten_vector(col(vecCol), bc))
  }

  /** Cyclic Jacobi eigendecomposition of a symmetric matrix: returns
    * (eigenvalues, eigenvector COLUMNS as vecs(row)(col)). O(d^3) per
    * sweep, fine for d <= a few hundred on the driver. */
  private[pipeline] def jacobiEigen(
      a0: Array[Array[Double]], sweeps: Int = 32): (Array[Double], Array[Array[Double]]) = {
    val d = a0.length
    val a = a0.map(_.clone())
    val v = Array.tabulate(d, d)((i, j) => if (i == j) 1.0 else 0.0)
    var sweep = 0
    var off = Double.MaxValue
    while (sweep < sweeps && off > 1e-14) {
      off = 0.0
      var p = 0
      while (p < d - 1) {
        var q = p + 1
        while (q < d) {
          off += a(p)(q) * a(p)(q)
          if (math.abs(a(p)(q)) > 1e-18) {
            val theta = (a(q)(q) - a(p)(p)) / (2.0 * a(p)(q))
            // theta == 0 (equal diagonal) still needs the 45-degree
            // rotation: signum(0) would silently skip it
            val sgn = if (theta >= 0.0) 1.0 else -1.0
            val t = sgn / (math.abs(theta) + math.sqrt(theta * theta + 1.0))
            val c = 1.0 / math.sqrt(t * t + 1.0)
            val s = t * c
            var k = 0
            while (k < d) {
              val akp = a(k)(p); val akq = a(k)(q)
              a(k)(p) = c * akp - s * akq
              a(k)(q) = s * akp + c * akq
              k += 1
            }
            k = 0
            while (k < d) {
              val apk = a(p)(k); val aqk = a(q)(k)
              a(p)(k) = c * apk - s * aqk
              a(q)(k) = s * apk + c * aqk
              val vkp = v(k)(p); val vkq = v(k)(q)
              v(k)(p) = c * vkp - s * vkq
              v(k)(q) = s * vkp + c * vkq
              k += 1
            }
          }
          q += 1
        }
        p += 1
      }
      sweep += 1
    }
    (Array.tabulate(d)(i => a(i)(i)), v)
  }
}
