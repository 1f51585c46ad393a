package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared local SparkSession for all suites (one JVM, forked by sbt). */
object SparkSpec {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}

trait SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSpec.spark

  /** Deterministic pseudo-random vectors, seed mirrors the reference's
    * test fixtures (seed 42, test/simple_test.cpp:127). */
  def randomVectors(n: Int, dim: Int, seed: Int = 42): Seq[(Long, Array[Float])] = {
    val rnd = new scala.util.Random(seed)
    (0L until n).map(i => (i, Array.fill(dim)(rnd.nextFloat() * 2f - 1f)))
  }

  def vectorsDF(rows: Seq[(Long, Array[Float])]) = {
    val s = spark
    import s.implicits._
    rows.toDF("id", "vec")
  }

  def queriesDF(rows: Seq[(Long, Array[Float])]) = {
    val s = spark
    import s.implicits._
    rows.toDF("qid", "qvec")
  }
}
