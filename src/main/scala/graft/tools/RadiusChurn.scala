package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch diagnostic (round 20, r19 verdict #4): how many codegen
  * classes compile for a warmed SQL range query when ONLY the radius
  * changes? Prints the per-run codegen compile delta for a repeated
  * radius and for a fresh one; set RADIUSCHURN_DEBUG=1 to dump the
  * compiled source of the churning class(es). */
object RadiusChurn {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.codegen.useIdInClassName", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // setup: the entry registers graft_sqlann_pq (pq + radii + errs)
    graft.SparkEntry.queries("sql_pq_range")(spark, sfDir)
      .queryExecution.toRdd.count()
    def codegenN: Long = org.apache.spark.metrics.source.CodegenMetrics
      .METRIC_COMPILATION_TIME.getCount
    val dim = spark.sql("SELECT size(vec) AS d FROM graft_sqlann_pq LIMIT 1")
      .head.getInt(0)
    val qlit = s"CAST(array(${Seq.fill(dim)("0.5").mkString(",")}) AS ARRAY<FLOAT>)"
    def run(r: String): Long = {
      val sql = s"SELECT id, l2_distance(vec, $qlit) AS dist " +
        s"FROM graft_sqlann_pq WHERE l2_distance(vec, $qlit) <= $r ORDER BY id"
      val cg0 = codegenN
      spark.sql(sql).queryExecution.toRdd.count()
      codegenN - cg0
    }
    println(s"[churn] r=2.0 run1 codegen+${run("2.0")}")
    println(s"[churn] r=2.0 run2 codegen+${run("2.0")}")
    if (sys.env.contains("RADIUSCHURN_DEBUG"))
      org.apache.logging.log4j.core.config.Configurator.setLevel(
        "org.apache.spark.sql.catalyst.expressions.codegen.CodeGenerator",
        org.apache.logging.log4j.Level.DEBUG)
    println(s"[churn] r=2.5 run1 codegen+${run("2.5")}")
    println(s"[churn] r=2.5 run2 codegen+${run("2.5")}")
    println(s"[churn] r=1.9 run1 codegen+${run("1.9")}")
    // the JOIN shape (registers the parquet queries view as a side
    // effect of the entry)
    graft.SparkEntry.queries("sql_pq_range_join")(spark, sfDir)
      .queryExecution.toRdd.count()
    def runJoin(r: String): Long = {
      val sql = "SELECT q.qid, t.id, l2_distance(t.vec, q.qvec) AS dist " +
        "FROM graft_sqlann_pqjq q, graft_sqlann_pq t " +
        s"WHERE l2_distance(t.vec, q.qvec) <= $r ORDER BY qid, id"
      val cg0 = codegenN
      spark.sql(sql).queryExecution.toRdd.count()
      codegenN - cg0
    }
    println(s"[churn] join r=2.0 run1 codegen+${runJoin("2.0")}")
    println(s"[churn] join r=2.0 run2 codegen+${runJoin("2.0")}")
    println(s"[churn] join r=2.5 run1 codegen+${runJoin("2.5")}")
    println(s"[churn] join r=1.9 run1 codegen+${runJoin("1.9")}")
    spark.stop()
  }
}
