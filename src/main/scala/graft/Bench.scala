package graft

import org.apache.spark.sql.SparkSession

/**
 * Driver-contract benchmark: runs every SparkEntry query against
 * SPARK_GRAFT_SF_DIR and prints ONE JSON line with per-query seconds.
 * Each query gets one untimed warm-up execution (plan compilation, codegen,
 * JIT, file-index caching) and one timed run — the steady-state number a
 * serving deployment would see.
 */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def runOnce(name: String, fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Boolean =
      try { fn(spark, sfDir).count(); true }
      catch {
        case e: Throwable =>
          System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
          false
      }

    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      // one warm-up (plan + codegen + JIT), then the MEDIAN of three timed
      // runs — single-run numbers on a shared box carry multi-second
      // scheduler/IO spikes that a median shrugs off. min/max ride along
      // so a bimodal query (r3-r5's vector_scale_bench cache race) shows
      // its spread instead of hiding behind a lucky median.
      runOnce(name, fn)
      val times = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        val ok = runOnce(name, fn)
        if (ok) (System.nanoTime() - t0) / 1e9 else -1.0
      }
      // a crashed query reports -1, never a healthy-looking near-zero time
      if (times.exists(_ < 0)) (name, -1.0, -1.0, -1.0)
      else (name, times.sorted.apply(1), times.min, times.max)
    }
    def jsonMap(f: ((String, Double, Double, Double)) => Double) =
      results.map(r => "\"" + r._1 + "\":" + f(r)).mkString("{", ",", "}")
    val qs = jsonMap(_._2)
    val mins = jsonMap(_._3)
    val maxs = jsonMap(_._4)
    // max/min > 3x on a healthy query = unstable measurement (caching or
    // box contention) — flag it so a round-over-round delta isn't misread
    val unstable = results
      .filter(r => r._2 >= 0 && r._3 > 0 && r._4 / r._3 > 3.0)
      .map("\"" + _._1 + "\"").mkString("[", ",", "]")
    // a crashed query must poison the headline, not shrink it: with any
    // failure the total reports -1 and `failed` carries the count
    val failed = results.count(_._2 < 0)
    val total = if (failed > 0) -1.0 else results.map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","failed":$failed,""" +
      s""""queries":$qs,"min":$mins,"max":$maxs,"unstable":$unstable,"sf":"$sfDir"}""")
    spark.stop()
  }
}
