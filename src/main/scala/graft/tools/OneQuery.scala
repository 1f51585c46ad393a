package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch: run one SparkEntry query N times and print timings. */
object OneQuery {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val iters = if (args.length > 1) args(1).toInt else 6
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val fn = graft.SparkEntry.queries(name)
    (1 to iters).foreach { i =>
      val t0 = System.nanoTime()
      val n = fn(spark, sfDir).count()
      println(f"[onequery] $name iter$i ${(System.nanoTime() - t0) / 1e9}%7.3f s rows=$n")
    }
    if (sys.env.contains("ONEQUERY_EXPLAIN")) {
      val df = fn(spark, sfDir)
      df.count()
      println("[onequery-plan-begin]")
      println(df.queryExecution.executedPlan.toString)
      println("[onequery-plan-end]")
    }
    spark.stop()
  }
}
