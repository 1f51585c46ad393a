package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch: print the executed plan (subqueries included) of the PQ
  * range-join refinement entry, to verify the codes build scan prunes
  * its columns. */
object PqJoinProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val name = if (args.nonEmpty) args(0) else "sql_pq_range_join"
    val df =
      try graft.SparkEntry.queries(name)(spark, sfDir)
      catch {
        case e: IllegalArgumentException =>
          println(s"[probe] entry require failed (expected while debugging): ${e.getMessage.take(200)}")
          null
      }
    if (df != null) df.collect()
    // re-run the underlying SQL without the entry's require to inspect
    val df2 = spark.sql(
      s"""SELECT q.qid, t.id, l2_distance(t.vec, q.qvec) AS dist
         |FROM graft_sqlann_pqjq q, graft_sqlann_pq t
         |WHERE l2_distance(t.vec, q.qvec) <= 1.35
         |ORDER BY qid, id""".stripMargin)
    println("==== executedPlan ====")
    println(df2.queryExecution.executedPlan.toString.take(8000))
    println("==== scans ====")
    graft.plans.SqlAnn.fileSourceScans(df2).foreach { s =>
      println(s"scan: ${s.output.map(_.name)} pf=${s.metadata.getOrElse("PartitionFilters", "")}")
    }
    spark.stop()
  }
}
