package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch stage-level profile of the PQ flood entries (test scope, not
  * part of the library): isolates probe-explode, ADC cogroup, finalize,
  * and rerank costs at the sf0.1 bench shape. */
object DevFloodProfile {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("PROF_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(
          sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val ms = for {
          a <- si.completionTime; b <- si.submissionTime
        } yield a - b
        if (ms.exists(_ > 100))
          println(f"[stage] ${si.stageId}%3d ${ms.get}%6d ms tasks=${si.numTasks}%3d " +
            si.name.take(90))
      }
    })
    def timed[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[prof] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    val e = spark.read.parquet(s"$dir/embeddings.parquet")
    val vectors = e.select(col("vec_id").as("id"), col("embedding").as("vec"))
    val index = timed("PQ build")(graft.index.IvfPqIndex.build(spark, vectors, 16, 16))
    val offs = {
      import spark.implicits._
      Seq(0L, 10000L, 20000L, 30000L).toDF("off")
    }
    val queries = e.filter(col("vec_id") < 300).crossJoin(offs)
      .select((col("vec_id") + col("off")).as("qid"), col("embedding").as("qvec"))
      .persist()
    queries.count()

    val nprobe = 16
    val preK = 600
    val probed = queries
      .withColumn("list_id",
        explode(graft.functions.vector.probe_lists(col("qvec"), index.centroids, nprobe,
          Metric.L2)))
      .select("qid", "qvec", "list_id")

    (1 to 3).foreach { i =>
      timed(s"probe-explode count run $i")(probed.count())
    }
    (1 to 3).foreach { i =>
      timed(s"ADC cogroup k=5 run $i") {
        graft.index.CoGroupTopK.pqSearch(probed, index.codes, index.codebooks,
          Metric.L2.id, 5).count()
      }
    }
    (1 to 3).foreach { i =>
      timed(s"ADC cogroup k=$preK run $i") {
        graft.index.CoGroupTopK.pqSearch(probed, index.codes, index.codebooks,
          Metric.L2.id, preK).count()
      }
    }
    (1 to 3).foreach { i =>
      timed(s"full search w/ rerank run $i") {
        spark.conf.set(graft.index.IvfFlatIndex.BroadcastGateKey, "1")
        val r = index.search(queries, SearchParams(k = 5, nprobe = nprobe), rerankK = preK)
        spark.conf.unset(graft.index.IvfFlatIndex.BroadcastGateKey)
        r.count()
      }
    }
    for (name <- Seq("ivfpq_flood_rerank", "ivfpq_flood_cogroup"); i <- 1 to 3) {
      timed(s"bench entry $name run $i") {
        SparkEntry.queries(name)(spark, dir).count()
      }
    }

    // repeated rerank-entry runs: hunt the unstable mode the 32-cpu bench
    // JVM shows (med 10.8 / max 23 s) with GC + JIT correlation
    def gcMs: Long = {
      import scala.jdk.CollectionConverters._
      java.lang.management.ManagementFactory.getGarbageCollectorMXBeans.asScala
        .map(_.getCollectionTime).sum
    }
    def jitMs: Long = {
      val c = java.lang.management.ManagementFactory.getCompilationMXBean
      if (c != null && c.isCompilationTimeMonitoringSupported) c.getTotalCompilationTime else -1
    }
    for (i <- 1 to 8) {
      val g0 = gcMs; val j0 = jitMs
      timed(s"rerank entry run $i")(
        SparkEntry.queries("ivfpq_flood_rerank")(spark, dir).count())
      println(s"[jvm] run $i: gc=${gcMs - g0} ms jit=${jitMs - j0} ms")
    }
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    for (i <- 1 to 8) {
      val g0 = gcMs; val j0 = jitMs
      timed(s"rerank NOCODEGEN run $i")(
        SparkEntry.queries("ivfpq_flood_rerank")(spark, dir).count())
      println(s"[jvm] nc run $i: gc=${gcMs - g0} ms jit=${jitMs - j0} ms")
    }
    spark.conf.unset("spark.sql.codegen.wholeStage")
    spark.stop()
  }
}
