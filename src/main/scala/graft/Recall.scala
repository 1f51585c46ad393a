package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.index.IvfFlatIndex

/**
 * Recall report: recall@10 of the IVF path vs the exact brute-force oracle
 * across an nprobe sweep — the algorithmic comparable BASELINE.md names
 * ("recall@10 vs exact oracle at the reference's nlist/nprobe sizing
 * points"; the reference itself measures recall nowhere, its
 * bench/recall_test.cpp is referenced by CMake but absent).
 *
 * Prints one JSON line: {"nlist":N,"k":10,"recall":{"1":r,...,"N":1.0}}.
 */
object Recall {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val nlist = sys.env.getOrElse("SPARK_GRAFT_NLIST", "16").toInt
    val k = 10
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val e = Tables(spark, sfDir, "embeddings")
    val queries = e.filter(col("vec_id") < 100)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val index = IvfFlatIndex.build(spark,
      e.select(col("vec_id").as("id"), col("embedding").as("vec")), nlist)

    val exact = index.searchExact(queries, k).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

    val sweep = Seq(1, 2, 4, 8, nlist).distinct.filter(_ <= nlist)
    val recalls = sweep.map { nprobe =>
      val got = index.search(queries, SearchParams(k, nprobe)).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      // empty ground truth -> -1 marker + stderr warning (config error,
      // distinguishable from a real recall collapse; NaN is not JSON) —
      // same contract as RecallSweep.recallVs
      nprobe -> RecallSweep.recallVs(exact, got)
    }
    val json = recalls.map { case (np, r) => s""""$np":$r""" }.mkString("{", ",", "}")
    println(s"""{"nlist":$nlist,"k":$k,"sf":"$sfDir","recall":$json}""")
    spark.stop()
  }
}
