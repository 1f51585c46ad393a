package graft.tools

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

/** Dump `.explain("formatted")` for driver entries to files — the plan
  * evidence the optimization rounds commit under plans/rNN/.
  * Usage: ExplainFormatted <outDir> <suffix> [--dir <sfDir>] [query ...]
  * (no query names = every SparkEntry entry). The data dir rides an
  * explicit --dir flag: the old leading-'/' heuristic misread a relative
  * data dir as a query name (r20 advice). */
object ExplainFormatted {
  def main(args: Array[String]): Unit = {
    if (args.length < 2) {
      System.err.println(
        "usage: ExplainFormatted <outDir> <suffix> [--dir <sfDir>] [query ...]")
      sys.exit(2)
    }
    val outDir = args(0)
    val suffix = args(1)
    val (dir, names) = args.drop(2).toSeq match {
      case "--dir" +: d +: qs => (d, qs)
      case qs => ("/root/testdata/sf0.01", qs)
    }
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Files.createDirectories(Paths.get(outDir))
    val all = graft.SparkEntry.queries
    val todo = if (names.nonEmpty) names else all.keys.toSeq.sorted
    todo.foreach { name =>
      val plan =
        try all(name)(spark, dir).queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        catch { case e: Throwable => s"EXPLAIN FAILED: $e" }
      Files.write(Paths.get(outDir, s"${name}_$suffix.txt"),
        plan.getBytes(StandardCharsets.UTF_8))
      println(s"wrote $name")
    }
    spark.stop()
  }
}
