package graft

import org.apache.spark.sql.SparkSession

/**
 * Diagnostic main: print the executed-plan skeleton (joins, exchanges,
 * scans, aggregates, pushed/partition filters) of the named driver
 * entries — the audit loop for "is this still the plan we want".
 * Usage: ExplainPlans [sfDir] query1 query2 ...
 */
object ExplainPlans {
  def main(args: Array[String]): Unit = {
    val (dir, names) =
      if (args.nonEmpty && args.head.startsWith("/")) (args.head, args.tail)
      else ("/root/testdata/sf0.01", args)
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { name =>
      println(s"===== $name =====")
      val df = SparkEntry.queries(name)(spark, dir)
      println(df.queryExecution.executedPlan.toString.linesIterator
        .filter(l => Seq("Exchange", "Scan", "Join", "Aggregate", "Window",
          "PartitionFilters", "PushedFilters", "Generate", "Broadcast")
          .exists(l.contains))
        .map(_.take(220)).mkString("\n"))
    }
    spark.stop()
  }
}
