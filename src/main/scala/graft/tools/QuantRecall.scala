package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.Tables
import graft.pipeline.Similarity

/**
 * Recall@10 of the quantized first passes (binary/Hamming, SQ8) and their
 * exact-rerank pipelines vs exact L2, on the real embeddings table — the
 * honest accuracy/bytes trade-off table for the quantization family
 * (RECALL.json's "quantization" block). Rerank only reorders a candidate
 * set, so first-pass recall is measured from the same pipeline with
 * candK = k.
 */
object QuantRecall {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
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
    val corpus = e.select(col("vec_id").as("id"), col("embedding").as("vec"))

    def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.select("qid", "id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    val exact = pairs(graft.index.Knn.exact(queries, corpus, k))
    def recall(got: Set[(Long, Long)]): Double =
      // empty ground truth -> -1 marker + stderr warning (config error,
      // distinguishable from a real recall collapse) — same contract as
      // RecallSweep.recallVs; math.round(NaN) would silently yield 0
      if (exact.isEmpty) graft.RecallSweep.recallVs(exact, got)
      else math.round(10000.0 * (got & exact).size / exact.size) / 10000.0

    val hamming10 = recall(pairs(Similarity.hammingSearch(queries, corpus, 64, k)))
    val hammingR100 = recall(pairs(Similarity.hammingSearchRerank(queries, corpus, 64, 100, k)))
    val sq8First = recall(pairs(Similarity.sq8SearchRerank(queries, corpus, k, k)))
    val sq8R50 = recall(pairs(Similarity.sq8SearchRerank(queries, corpus, 50, k)))

    println(s"""{"sf":"$sfDir","k":$k,"queries":100,""" +
      s""""hamming":{"first_pass":$hamming10,"rerank_100":$hammingR100,"bits_per_dim":1},""" +
      s""""sq8":{"first_pass":$sq8First,"rerank_50":$sq8R50,"bits_per_dim":8}}""")
    spark.stop()
  }
}
