package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.index.{IvfFlatIndex, Knn}

/**
 * Recall@10 at the reference's OWN sizing guidance (reference
 * README.md:154-167: nlist 128 / nprobe 16 for 100k-1M vectors; nlist 4096
 * / nprobe 32 for > 1M; nlist 1024 / nprobe 10 is the canonical bench
 * point, bench/benchmark.cpp:28-43). The reference measures recall nowhere
 * (its bench/recall_test.cpp is referenced by CMake but absent) — this
 * sweep is the honest algorithmic comparable BASELINE.md names.
 *
 * THREE corpora, because IVF recall is a property of the DATA's cluster
 * structure, not just the engine: (1) uniform synthetic noise — the
 * worst case for IVF, centroids carve arbitrary Voronoi cells and true
 * neighbors scatter across them; (2) clustered synthetic at the same
 * 1M x 128D shape — 1024 planted centers + 5% noise, the regime ANN
 * indexes are built for; (3) the real embeddings table (sf0.1,
 * 2000 x 64D). Reading the uniform point alone as an engine defect is
 * the misread this file's caveat line exists to prevent — the engine is
 * hash-proven exact at nprobe = nlist in the correctness gate.
 *
 * Ground truth per corpus is ONE exact brute-force pass
 * (index-independent); each sizing point trains its own index and sweeps
 * nprobe around the reference's recommended value. Prints one JSON line
 * and writes it to RECALL.json (or argv(0)).
 */
object RecallSweep {

  private def timed[T](label: String)(f: => T): T = {
    val t0 = System.nanoTime()
    val r = f
    println(f"[recall] $label: ${(System.nanoTime() - t0) / 1e9}%.1f s")
    r
  }

  /** Recall of `got` against the exact set; -1 (valid JSON, impossible as
    * a real recall) when the ground truth is empty — 0/0 = NaN is not JSON
    * and would poison the emitted RECALL line, and reporting 0.0 would
    * make a misconfigured/empty query set indistinguishable from a
    * genuinely catastrophic recall collapse. A stderr warning rides along
    * so the config error is visible even to a reader who only eyeballs
    * the JSON for small numbers. */
  private[graft] def recallVs(exact: Set[(Long, Long)], got: Set[(Long, Long)]): Double =
    if (exact.isEmpty) {
      System.err.println(
        "[recall] WARNING: empty exact ground-truth set — emitting -1 " +
          "(config error marker, NOT a recall measurement)")
      -1.0
    } else (got & exact).size.toDouble / exact.size

  /** Exact ground truth for one (queries, corpus, k) — computed ONCE per
    * corpus and shared by the flat and PQ sweeps (it is a full
    * brute-force O(n x q x d) pass; recomputing it per sweep doubled the
    * most expensive jobs of the run). */
  private def groundTruth(
      name: String, queries: DataFrame, corpus: DataFrame, k: Int): Set[(Long, Long)] =
    timed(s"$name: exact ground truth") {
      Knn.exact(queries, corpus, k, Metric.L2).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    }

  /** Per-(nlist, nprobe) recall for one corpus against a precomputed
    * ground truth. */
  private def sweepCorpus(
      spark: SparkSession,
      name: String,
      corpus: DataFrame,
      queries: DataFrame,
      exact: Set[(Long, Long)],
      points: Seq[(Int, Int, Seq[Int])],
      maxTrain: Int,
      k: Int): String = {
    val results = points.map { case (nlist, rec, sweep) =>
      val index = timed(s"$name: build nlist=$nlist") {
        val idx = IvfFlatIndex.build(spark, corpus, nlist, maxTrain = maxTrain)
        idx.vectors.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK).count()
        idx
      }
      val recalls = sweep.map { nprobe =>
        val got = timed(s"$name: search nlist=$nlist nprobe=$nprobe") {
          index.search(queries, SearchParams(k, nprobe)).collect()
            .map(r => (r.getLong(0), r.getLong(1))).toSet
        }
        nprobe -> recallVs(exact, got)
      }
      index.vectors.unpersist(blocking = false)
      val rs = recalls.map { case (np, r) => s""""$np":$r""" }.mkString("{", ",", "}")
      s"""{"nlist":$nlist,"reference_nprobe":$rec,"recall":$rs}"""
    }
    results.mkString("[", ",", "]")
  }

  /** PQ recall at one sizing point: ADC-only top-k and ADC + exact rerank
    * vs brute-force ground truth. Quantization loss rides ON TOP of the
    * IVF probe loss, so the honest points pair each flat number with its
    * PQ counterpart at the identical (nlist, nprobe). */
  private def sweepPq(
      spark: SparkSession,
      name: String,
      corpus: DataFrame,
      queries: DataFrame,
      exact: Set[(Long, Long)],
      nlist: Int,
      m: Int,
      nprobes: Seq[Int],
      rerankK: Int,
      maxTrain: Int,
      k: Int): String = {
    val index = timed(s"$name: pq build nlist=$nlist m=$m") {
      val idx = graft.index.IvfPqIndex.build(spark, corpus, nlist, m, maxTrain = maxTrain)
      idx.codes.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK).count()
      idx
    }
    val rows = nprobes.map { nprobe =>
      def recallOf(df: DataFrame): Double =
        recallVs(exact, df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet)
      val adc = timed(s"$name: pq adc nlist=$nlist nprobe=$nprobe") {
        recallOf(index.search(queries, SearchParams(k, nprobe)))
      }
      val rr = timed(s"$name: pq rerank($rerankK) nlist=$nlist nprobe=$nprobe") {
        recallOf(index.search(queries, SearchParams(k, nprobe), rerankK = rerankK))
      }
      s""""$nprobe":{"adc":$adc,"rerank":$rr}"""
    }
    index.codes.unpersist(blocking = false)
    s"""{"nlist":$nlist,"m":$m,"rerank_k":$rerankK,"recall":${rows.mkString("{", ",", "}")}}"""
  }

  def main(args: Array[String]): Unit = {
    val out = args.headOption.getOrElse("RECALL.json")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val dim = 128
    val n = 1000000
    val nq = 1000
    val k = 10

    def persisted(df: DataFrame): DataFrame = {
      val p = df.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      p.count()
      p
    }

    // --- corpus 1: uniform synthetic noise (IVF worst case) --------------
    val uniformExpr = transform(
      sequence(lit(0), lit(dim - 1)),
      d => (pmod(xxhash64(col("id") * dim + d), lit(2000)) / 1000.0 - 1.0).cast("float"))
    val uniform = persisted(spark.range(n).select(col("id"), uniformExpr.as("vec")))
    val uniformQ = persisted(spark.range(nq)
      .select((col("id") + 5000000L).as("id"))
      .select(col("id").as("qid"), uniformExpr.as("qvec")))
    val uniformExact = groundTruth("uniform", uniformQ, uniform, k)
    val uniformJson = sweepCorpus(spark, "uniform", uniform, uniformQ, uniformExact,
      Seq(
        (128, 16, Seq(4, 8, 16, 32)),   // README: 100k-1M sizing
        (1024, 10, Seq(10)),            // canonical bench shape
        (4096, 32, Seq(8, 16, 32, 64))), // README: >1M sizing
      maxTrain = 100000, k)
    uniform.unpersist(blocking = false)
    uniformQ.unpersist(blocking = false)

    // --- corpus 2: clustered synthetic, same shape -----------------------
    // 1024 planted centers + 5% per-component noise: the data regime IVF
    // is designed for, at the identical 1M x 128D sizing — recall deltas
    // vs corpus 1 are pure data-distribution effects.
    val ncenters = 1024
    def clusteredExpr(idCol: org.apache.spark.sql.Column) = {
      val cluster = pmod(xxhash64(idCol), lit(ncenters))
      transform(
        sequence(lit(0), lit(dim - 1)),
        d => ((pmod(xxhash64(cluster * dim + d + lit(1000000)), lit(2000)) / 1000.0 - 1.0) +
          (pmod(xxhash64(idCol * dim + d + lit(2000000)), lit(2000)) / 1000.0 - 1.0) * 0.05)
          .cast("float"))
    }
    val clustered = persisted(spark.range(n).select(col("id"), clusteredExpr(col("id")).as("vec")))
    val clusteredQ = persisted(spark.range(nq)
      .select((col("id") + 5000000L).as("id"))
      .select(col("id").as("qid"), clusteredExpr(col("id")).as("qvec")))
    val clusteredExact = groundTruth("clustered", clusteredQ, clustered, k)
    val clusteredJson = sweepCorpus(spark, "clustered", clustered, clusteredQ, clusteredExact,
      Seq(
        (128, 16, Seq(4, 8, 16, 32)),
        (1024, 10, Seq(10))),
      maxTrain = 100000, k)
    // PQ at the canonical shape on the designed-for corpus: ADC-only vs
    // ADC + exact rerank at the same (nlist, nprobe) as the flat points
    val clusteredPqJson = sweepPq(spark, "clustered", clustered, clusteredQ, clusteredExact,
      nlist = 1024, m = 16, nprobes = Seq(10, 32), rerankK = 100,
      maxTrain = 100000, k = k)
    clustered.unpersist(blocking = false)
    clusteredQ.unpersist(blocking = false)

    // --- corpus 3: the real embeddings table (clustered real data) ------
    val e = Tables(spark, sfDir, "embeddings")
    val emb = persisted(e.select(col("vec_id").as("id"), col("embedding").as("vec")))
    val embN = emb.count()
    val embQ = persisted(e.filter(col("vec_id") < 100)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec")))
    val embExact = groundTruth("embeddings", embQ, emb, k)
    val embJson = sweepCorpus(spark, "embeddings", emb, embQ, embExact,
      Seq(
        (16, 8, Seq(1, 2, 4, 8, 16)),  // the shape VERDICT's 0.80 point used
        (128, 16, Seq(4, 8, 16, 32)),
        (1024, 10, Seq(10, 32))),      // reference sizing on a tiny corpus
      maxTrain = 100000, k)
    val embPqJson = sweepPq(spark, "embeddings", emb, embQ, embExact,
      nlist = 16, m = 8, nprobes = Seq(8, 16), rerankK = 100,
      maxTrain = 100000, k = k)
    emb.unpersist(blocking = false)
    embQ.unpersist(blocking = false)

    val caveat = "IVF recall tracks the data's cluster structure, not engine " +
      "correctness (exactness is hash-proven at nprobe=nlist in the " +
      "correctness gate): uniform noise is the worst case, the clustered " +
      "corpus at the same shape and the real embeddings table show the " +
      "designed-for regime. PQ on the clustered corpus is the OPPOSITE " +
      "degenerate case: ~1000 near-identical points per center collapse to " +
      "the same m-byte code, ADC ties break by id (~k/1000 recall) and " +
      "rerank(100) recovers only the ~100/1000 pool odds — real embeddings " +
      "(the pq block on the last corpus) show PQ's actual behavior."
    val line =
      s"""{"k":$k,"caveat":"$caveat","corpora":[""" +
        s"""{"corpus":"uniform-synthetic 1Mx128D","train":100000,"queries":$nq,"points":$uniformJson},""" +
        s"""{"corpus":"clustered-synthetic 1Mx128D (1024 centers, 5% noise)","train":100000,"queries":$nq,"points":$clusteredJson,"pq":$clusteredPqJson},""" +
        s"""{"corpus":"embeddings $sfDir (${embN}x64D real)","queries":100,"points":$embJson,"pq":$embPqJson}]}"""
    println(line)
    java.nio.file.Files.writeString(java.nio.file.Paths.get(out), line + "\n")
    spark.stop()
  }
}
