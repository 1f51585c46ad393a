package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.index.{IvfFlatIndex, Knn}

/**
 * Recall@10 at the reference's OWN sizing guidance (reference
 * README.md:154-167: nlist 128 / nprobe 16 for 100k-1M vectors; nlist 4096
 * / nprobe 32 for > 1M) on the reference's canonical synthetic shape
 * (bench/benchmark.cpp:28-43: 1M x 128D, train subset 100k), plus the
 * canonical bench point (nlist 1024 / nprobe 10). The reference measures
 * recall nowhere (its bench/recall_test.cpp is referenced by CMake but
 * absent) — this sweep is the honest algorithmic comparable BASELINE.md
 * names.
 *
 * Ground truth is ONE exact brute-force pass (index-independent); each
 * sizing point then trains its own index and sweeps nprobe around the
 * reference's recommended value. Prints one JSON line and writes it to
 * RECALL.json (or argv(0)) next to the bench artifacts.
 */
object RecallSweep {
  def main(args: Array[String]): Unit = {
    val out = args.headOption.getOrElse("RECALL.json")
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
    val vecExpr = transform(
      sequence(lit(0), lit(dim - 1)),
      d => (pmod(xxhash64(col("id") * dim + d), lit(2000)) / 1000.0 - 1.0).cast("float"))
    val corpus = spark.range(n).select(col("id"), vecExpr.as("vec"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    corpus.count()
    val queries = spark.range(nq)
      .select((col("id") + 5000000L).as("id"))
      .select(col("id").as("qid"), vecExpr.as("qvec"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    queries.count()

    def timed[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[recall] $label: ${(System.nanoTime() - t0) / 1e9}%.1f s")
      r
    }

    val exact = timed("exact ground truth (1k x 1M)") {
      Knn.exact(queries, corpus, k, Metric.L2).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    }

    // (nlist, reference-recommended nprobe, sweep values)
    val points = Seq(
      (128, 16, Seq(4, 8, 16, 32)),   // README: 100k-1M sizing
      (1024, 10, Seq(10)),            // canonical bench shape
      (4096, 32, Seq(8, 16, 32, 64))) // README: >1M sizing

    val results = points.map { case (nlist, rec, sweep) =>
      val index = timed(s"build nlist=$nlist (train 100k + assign 1M)") {
        val idx = IvfFlatIndex.build(spark, corpus, nlist, maxTrain = 100000)
        idx.vectors.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK).count()
        idx
      }
      val recalls = sweep.map { nprobe =>
        val got = timed(s"search nlist=$nlist nprobe=$nprobe") {
          index.search(queries, SearchParams(k, nprobe)).collect()
            .map(r => (r.getLong(0), r.getLong(1))).toSet
        }
        nprobe -> (got & exact).size.toDouble / exact.size
      }
      index.vectors.unpersist(blocking = false)
      (nlist, rec, recalls)
    }

    val json = results.map { case (nlist, rec, recalls) =>
      val rs = recalls.map { case (np, r) => s""""$np":$r""" }.mkString("{", ",", "}")
      s"""{"nlist":$nlist,"reference_nprobe":$rec,"recall":$rs}"""
    }.mkString("[", ",", "]")
    val line = s"""{"shape":"1Mx128D","k":$k,"train":100000,"queries":$nq,"points":$json}"""
    println(line)
    java.nio.file.Files.writeString(java.nio.file.Paths.get(out), line + "\n")
    spark.stop()
  }
}
