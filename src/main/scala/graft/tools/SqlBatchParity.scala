package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/**
 * Same-workload parity probe: the batch SQL shape (rewritten by
 * [[graft.plans.SqlAnn]] into probe equi-join + WindowGroupLimit
 * partial/final top-k) vs the facade's two batch paths over the IDENTICAL
 * query set, k, and index at nprobe = nlist — so all three do the same
 * scoring work and differ only in plan mechanics:
 *
 *  - `facade static`: driver probe + pruned scan + fused
 *    [[graft.index.ListScanTopK]] (the serving hot path);
 *  - `facade join`: ForceJoin — probe explode + broadcast +
 *    [[graft.index.BroadcastProbeTopK]] (the unbounded-batch path);
 *  - `sql window`: the rewritten batch SQL — same probe explode +
 *    broadcast-hash equi-join, but top-k via WindowGroupLimit
 *    (per-partition partial limit, exchange on qid, final limit).
 *
 * Usage: SqlBatchParity [nQueries] [k] [iters]
 */
object SqlBatchParity {
  def main(args: Array[String]): Unit = {
    val nq = if (args.nonEmpty) args(0).toInt else 300
    val k = if (args.length > 1) args(1).toInt else 10
    val iters = if (args.length > 2) args(2).toInt else 5
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val e = graft.Tables(spark, sfDir, "embeddings")
    val index = graft.index.IvfFlatIndex.build(spark,
      e.select(col("vec_id").as("id"), col("embedding").as("vec")), 16)
    val dir = java.nio.file.Files
      .createTempDirectory("graft-sqlparity").toFile.getAbsolutePath
    index.vectors.write.partitionBy("list_id").mode("overwrite").parquet(dir)
    graft.plans.SqlAnn.registerIndex(spark, dir, index.centroids.value, nprobe = 16)
    spark.read.parquet(dir).createOrReplaceTempView("parity_t")
    val src = e.filter(col("vec_id") < nq)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val rows = src.collect()
    spark.createDataFrame(java.util.Arrays.asList(rows: _*), src.schema)
      .createOrReplaceTempView("parity_q")
    val queries = spark.table("parity_q")
    val batch = rows.map(r => (r.getLong(0),
      r.getSeq[Float](1).toArray))

    val sqlDf = spark.sql(
      s"""SELECT qid, id, dist, rank FROM (
         |  SELECT q.qid, t.id, l2_distance(t.vec, q.qvec) AS dist,
         |    CAST(row_number() OVER (PARTITION BY q.qid
         |      ORDER BY l2_distance(t.vec, q.qvec), t.id) AS INT) AS rank
         |  FROM parity_q q, parity_t t)
         |WHERE rank <= $k""".stripMargin)
    require(graft.plans.SqlAnn.fileSourceScan(sqlDf)
      .flatMap(_.metadata.get("PartitionFilters")).exists(_.contains("list_id")),
      "parity run is meaningless if the rewrite did not fire")

    import graft.SearchParams
    def run(label: String)(mk: => org.apache.spark.sql.DataFrame): Unit = {
      val counts = (1 to iters).map { _ =>
        val t0 = System.nanoTime()
        val n = mk.count()
        (n, (System.nanoTime() - t0) / 1e9)
      }
      val times = counts.map(_._2)
      // scalastyle:off println
      println(f"[sql-parity] $label%-14s rows=${counts.head._1}%7d " +
        f"times=${times.map(t => f"$t%.2f").mkString(",")} " +
        f"best=${times.min}%.2f s (nq=$nq k=$k nprobe=nlist=16)")
      // scalastyle:on println
    }
    run("sql window")(sqlDf)
    run("facade static")(index.searchBatch(batch, SearchParams(k = k, nprobe = 16)))
    run("facade join")(index.searchWhere(queries, SearchParams(k = k, nprobe = 16),
      None, graft.index.IvfFlatIndex.ForceJoin))
    spark.stop()
  }
}
