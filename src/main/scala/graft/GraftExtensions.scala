package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.Expression

import graft.functions._

/**
 * SQL surface: registers the engine's scalar expressions as SQL functions
 * so `spark.sql("SELECT l2_distance(a, b) ...")` works alongside the
 * programmatic API. Usable either via `GraftExtensions.register(spark)`
 * or as a `spark.sql.extensions` class
 * (`SparkSessionExtensions` injection).
 */
class GraftExtensions extends (org.apache.spark.sql.SparkSessionExtensions => Unit) {
  override def apply(ext: org.apache.spark.sql.SparkSessionExtensions): Unit =
    GraftExtensions.injections.foreach { case (name, builder) =>
      ext.injectFunction(
        (org.apache.spark.sql.catalyst.FunctionIdentifier(name),
          new org.apache.spark.sql.catalyst.expressions.ExpressionInfo("graft", name),
          builder))
    }
}

object GraftExtensions {

  private val injections: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "l2_distance" -> (es => VectorDistance(es(0), es(1), Metric.L2)),
    "ip_distance" -> (es => VectorDistance(es(0), es(1), Metric.InnerProduct)),
    "cosine_distance" -> (es => VectorDistance(es(0), es(1), Metric.Cosine)),
    "normalize_vector" -> (es => NormalizeVector(es(0))),
    "minhash_signature" -> (es => MinHashSignature(es(0), 64, 42L)),
    "simhash64" -> (es => SimHash64(es(0), 42L)))

  /** Register on an existing session (temp functions, same expressions). */
  def register(spark: SparkSession): Unit =
    injections.foreach { case (name, builder) =>
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        name, builder, "scala_udf")
    }
}
