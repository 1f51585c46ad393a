package graft.kmeans

import scala.concurrent.{Await, Future}
import scala.concurrent.duration.Duration
import scala.concurrent.ExecutionContext.Implicits.global

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

import graft.functions.VectorKernels

/**
 * IVF coarse-quantizer training: k-means++ seeding (seed 42) followed by 10
 * Lloyd's iterations, mirroring the reference procedure
 * (reference engine/ivf_flat_index.cpp:49-145).
 *
 * Scale design: like the reference (bench/benchmark.cpp:69 trains on a 100k
 * subset of 1M vectors), training runs on a BOUNDED, DETERMINISTIC sample —
 * the `maxTrain` lowest-id rows — collected to the driver (~50 MB at
 * 100k x 128D). That keeps centroids bit-reproducible across runs (a
 * distributed FP reduction would not be, SURVEY §7.4.3) while the
 * full-corpus work — assignment and the partitioned epoch write — stays
 * distributed via [[graft.functions.ArgMinCentroid]]. The iteration work is
 * parallelized over fixed-size chunks merged in chunk order, so parallelism
 * never changes the result.
 */
object Lloyd {

  val Seed = 42
  val Iterations = 10
  val DefaultMaxTrain = 100000

  /** Driver-memory budget for the training sample's float payload (Row
    * decode overhead adds a transient ~2-3x on top): 256 MB caps a
    * dim=2048 sample at ~32k rows instead of collecting maxTrain x dim x
    * 4 B (~800 MB at 100k x 2048D) into the driver — same spirit as the
    * broadcast-size bound in SURVEY §7.4.7. At the reference's canonical
    * dim=128 the cap (524k rows) never binds. */
  val MaxTrainBytes: Long = 256L << 20

  /** Deterministic driver-side training sample: lowest `maxTrain` ids,
    * additionally capped so the sample fits `maxBytes` of float payload
    * (one limit(1) probe reads the dimension first). */
  def trainSample(
      vectors: DataFrame,
      idCol: String = "id",
      vecCol: String = "vec",
      maxTrain: Int = DefaultMaxTrain,
      maxBytes: Long = MaxTrainBytes): Array[Array[Float]] = {
    val src = vectors.select(col(idCol), col(vecCol))
    // Option-wrap the vector too: limit(1) can surface ANY row, and a
    // null vec would NPE here with no context instead of falling through
    // to the byte-cap default
    val dim = src.limit(1).collect()
      .headOption.flatMap(r => Option(r.getSeq[Float](1)).map(_.length))
      .getOrElse(0)
    val capped =
      if (dim <= 0) maxTrain
      else math.min(maxTrain.toLong, math.max(1L, maxBytes / (dim * 4L))).toInt
    // null vecs are skipped like every search path skips them — without
    // the filter one null row in the id-prefix sample would NPE the
    // whole build with no context
    val nonNull = src.filter(col(vecCol).isNotNull)
    // SCALE (round 19, caught by the 5M SqlPqScale run): a root-level
    // orderBy+limit+collect plans TakeOrderedAndProject, whose
    // per-partition top-K PARTIALS all land on the driver — that is
    // partitions x capped full vectors (1.7 GiB at 5M x 128d x 32 tasks,
    // over spark.driver.maxResultSize; ~50 GiB at 1000 executors), for a
    // sample whose final size is one partition's worth. Two phases
    // instead: (1) the capped-th smallest id, computed DISTRIBUTED over
    // the ids alone (the vec column is pruned from that scan; the
    // non-root limit shuffles at most partitions x capped 8-byte ids,
    // never vectors, never to the driver); (2) the same
    // orderBy+limit+collect, but over the <= cutoff PREFIX — the
    // partial-top-K blowup disappears because the pre-filtered input IS
    // the sample. For unique ids the selected rows are bit-identical to
    // the single-phase plan's (same id-prefix semantics, same sorted
    // order for the seeded k-means++ indexing).
    val cutoff = nonNull.select(col(idCol))
      .orderBy(col(idCol)).limit(capped)
      .agg(org.apache.spark.sql.functions.max(col(idCol)))
      .head().get(0)
    // NULL ids sort FIRST under the ascending prefix, so they belong to
    // the sample whenever the prefix reaches them — and max() IGNORES
    // them, so a null `cutoff` means the whole prefix was null-id rows
    // (or the table is empty), not "no sample" (own review, round 19:
    // the first cut returned empty here and failed builds the
    // single-phase plan trained fine)
    if (cutoff == null) {
      // the whole prefix is null-id rows: selection among them was
      // arbitrary under the single-phase plan too (orderBy ties break by
      // partition order), so a plain CollectLimit — which stops early and
      // never ships partitions x capped partials — matches the semantics
      // class while staying bounded even when MOST ids are null
      nonNull.filter(col(idCol).isNull).limit(capped).collect()
        .map(_.getSeq[Float](1).toArray)
    } else {
      // ADVICE r19: `id <= cutoff OR id IS NULL` can hold far MORE than
      // `capped` rows when ids are heavily duplicated (every tie at the
      // cutoff qualifies), and orderBy+limit over such a prefix re-creates
      // the partitions x capped TakeOrdered partial blowup the two-phase
      // rewrite exists to avoid. Split the prefix instead:
      //  - STRICT (id < cutoff, plus nulls, which sort first): by the
      //    cutoff's definition (max over the capped-row ascending prefix)
      //    every such row precedes some cutoff-valued prefix row, so there
      //    are at most capped-1 of them REGARDLESS of ties — the
      //    TakeOrdered partials are bounded by the strict total itself;
      //  - TIES (id == cutoff): fill the remainder via an unordered
      //    CollectLimit (early-stopping, driver transfer bounded by the
      //    remainder). Tie selection was already arbitrary under the
      //    single-phase plan, so unique ids stay bit-identical and tied
      //    ids keep the same semantics class.
      // Appending ties after the sorted strict rows preserves the global
      // ascending (nulls-first) order the seeded k-means++ indexes into.
      val strict = nonNull.filter(
          col(idCol) < org.apache.spark.sql.functions.lit(cutoff) ||
            col(idCol).isNull)
        .orderBy(col(idCol)).limit(capped).collect()
      val need = capped - strict.length
      val ties =
        if (need <= 0) Array.empty[org.apache.spark.sql.Row]
        else nonNull.filter(
          col(idCol) === org.apache.spark.sql.functions.lit(cutoff))
          .limit(need).collect()
      (strict ++ ties).map(_.getSeq[Float](1).toArray)
    }
  }

  /** k-means++ D^2-weighted seeding, seed 42 (ivf_flat_index.cpp:52-105). */
  def kmeansPlusPlusInit(
      sample: Array[Array[Float]],
      nlist: Int,
      seed: Int = Seed): Array[Array[Float]] = {
    require(sample.nonEmpty, "cannot train on an empty sample")
    val rnd = new scala.util.Random(seed)
    val n = sample.length
    val k = math.min(nlist, n)
    val centroids = new Array[Array[Float]](k)
    centroids(0) = sample(rnd.nextInt(n)).clone()

    // minDist(v) = distance to nearest already-chosen centroid, updated
    // incrementally as each centroid is added (same semantics as the
    // reference's rescan, O(kn) instead of O(k^2 n)).
    val minDist = Array.fill(n)(Double.MaxValue)
    var c = 1
    while (c < k) {
      val newest = centroids(c - 1)
      var total = 0.0
      var v = 0
      while (v < n) {
        val d = VectorKernels.l2(sample(v), newest)
        if (d < minDist(v)) minDist(v) = d
        total += minDist(v)
        v += 1
      }
      val target = rnd.nextDouble() * total
      var cumsum = 0.0
      var chosen = n - 1
      var i = 0
      var done = false
      while (i < n && !done) {
        cumsum += minDist(i)
        if (cumsum >= target) { chosen = i; done = true }
        i += 1
      }
      centroids(c) = sample(chosen).clone()
      c += 1
    }
    // if nlist > n (degenerate), pad by cycling the sample like extra seeds
    if (k < nlist) centroids ++ (k until nlist).map(i => sample(i % n).clone())
    else centroids
  }

  /**
   * 10 Lloyd iterations over the sample (ivf_flat_index.cpp:107-144):
   * assign to nearest centroid (L2), recompute means, empty clusters keep
   * their previous centroid. Chunk-parallel with ordered merge.
   */
  def train(
      sample: Array[Array[Float]],
      nlist: Int,
      iterations: Int = Iterations,
      seed: Int = Seed): Array[Array[Float]] = {
    var centroids = kmeansPlusPlusInit(sample, nlist, seed)
    val dim = sample.head.length
    val chunks = sample.grouped(8192).toArray

    var iter = 0
    while (iter < iterations) {
      val cents = centroids
      val partials: Array[(Array[Array[Double]], Array[Long])] =
        Await.result(
          Future.sequence(chunks.toSeq.map { chunk =>
            Future {
              val sums = Array.fill(nlist)(new Array[Double](dim))
              val counts = new Array[Long](nlist)
              chunk.foreach { v =>
                val a = VectorKernels.argminCentroid(v, cents)
                val s = sums(a)
                var d = 0
                while (d < dim) { s(d) += v(d); d += 1 }
                counts(a) += 1
              }
              (sums, counts)
            }
          }),
          Duration.Inf).toArray

      val sums = Array.fill(nlist)(new Array[Double](dim))
      val counts = new Array[Long](nlist)
      partials.foreach { case (ps, pc) =>
        var c = 0
        while (c < nlist) {
          val s = sums(c); val p = ps(c)
          var d = 0
          while (d < dim) { s(d) += p(d); d += 1 }
          counts(c) += pc(c)
          c += 1
        }
      }
      centroids = Array.tabulate(nlist) { c =>
        if (counts(c) > 0) {
          val out = new Array[Float](dim)
          var d = 0
          while (d < dim) { out(d) = (sums(c)(d) / counts(c)).toFloat; d += 1 }
          out
        } else centroids(c) // empty cluster keeps old centroid (:135-141)
      }
      iter += 1
    }
    centroids
  }

  /** End-to-end: sample -> k-means++ -> Lloyd. */
  def trainFromDataFrame(
      vectors: DataFrame,
      nlist: Int,
      idCol: String = "id",
      vecCol: String = "vec",
      maxTrain: Int = DefaultMaxTrain): Array[Array[Float]] =
    train(trainSample(vectors, idCol, vecCol, maxTrain), nlist)
}
