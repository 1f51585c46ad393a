package graft.functions

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftshims
import org.apache.spark.sql.types._

import graft.Metric

/**
 * Catalyst expressions for the vector kernels (reference
 * engine/kernels.cuh:36-80, 314-385). Each generates a static call into
 * [[VectorKernels]] so the surrounding plan stays inside whole-stage
 * codegen with zero boxing: the only per-row cost is one primitive
 * `float[]` copy out of the columnar `ArrayData`.
 */
case class VectorDistance(left: Expression, right: Expression, metric: Metric.Value)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[graftshims.AbstractDataType] =
    Seq(ArrayType(FloatType), ArrayType(FloatType))
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = metric match {
    case Metric.InnerProduct => "ip_distance"
    case Metric.Cosine       => "cosine_distance"
    case _                   => "l2_distance"
  }

  private val metricId = metric.id

  override def nullSafeEval(a: Any, b: Any): Any =
    VectorKernels.distance(
      a.asInstanceOf[ArrayData].toFloatArray(),
      b.asInstanceOf[ArrayData].toFloatArray(),
      metricId)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.VectorKernels.distance(" +
        s"$a.toFloatArray(), $b.toFloatArray(), $metricId);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VectorDistance =
    copy(left = newLeft, right = newRight)
}

/** L2-normalize an ARRAY<FLOAT> (kernels.cuh:357-385, eps 1e-8). */
case class NormalizeVector(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[graftshims.AbstractDataType] = Seq(ArrayType(FloatType))
  override def dataType: DataType = ArrayType(FloatType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "normalize_vector"

  override def nullSafeEval(v: Any): Any =
    new GenericArrayData(
      VectorKernels.normalize(v.asInstanceOf[ArrayData].toFloatArray()))

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(" +
        s"graft.functions.VectorKernels.normalize($v.toFloatArray()));")

  override protected def withNewChildInternal(c: Expression): NormalizeVector =
    copy(child = c)
}

/**
 * Nearest-centroid assignment (always squared L2, ties -> lowest index;
 * kernels.cuh:314-354, ivf_flat_index.cpp:259-295). The centroid matrix
 * rides along as a `Broadcast` handle: the expression serializes into each
 * task as a few bytes and the executors fetch the matrix once from the
 * BlockManager — the plan itself never embeds the centroids, which is what
 * keeps this scalable to nlist=16384 x dim=2048 (~128 MB, SURVEY §7.4).
 */
case class ArgMinCentroid(child: Expression, centroids: Broadcast[Array[Array[Float]]])
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[graftshims.AbstractDataType] = Seq(ArrayType(FloatType))
  override def dataType: DataType = IntegerType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "argmin_centroid"

  override def nullSafeEval(v: Any): Any =
    VectorKernels.argminCentroid(
      v.asInstanceOf[ArrayData].toFloatArray(), centroids.value)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bc = ctx.addReferenceObj("centroidsBc", centroids,
      classOf[Broadcast[Array[Array[Float]]]].getName)
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.functions.VectorKernels.argminCentroid(" +
        s"$v.toFloatArray(), (float[][]) $bc.value());")
  }

  override protected def withNewChildInternal(c: Expression): ArgMinCentroid =
    copy(child = c)
}

/**
 * Coarse-quantizer probe: ids of the `nprobe` nearest centroids, ordered by
 * (distance, id) (ivf_flat_index.cpp:298-336). Emitting ARRAY<INT> lets the
 * caller `explode` into (query, list_id) probe pairs — the Spark shape of
 * the reference's per-query probe loop.
 */
case class ProbeLists(
    child: Expression,
    centroids: Broadcast[Array[Array[Float]]],
    nprobe: Int,
    metric: Metric.Value)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[graftshims.AbstractDataType] = Seq(ArrayType(FloatType))
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "probe_lists"

  private val metricId = metric.id

  override def nullSafeEval(v: Any): Any =
    new GenericArrayData(VectorKernels.probeLists(
      v.asInstanceOf[ArrayData].toFloatArray(), centroids.value, nprobe, metricId))

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bc = ctx.addReferenceObj("centroidsBc", centroids,
      classOf[Broadcast[Array[Array[Float]]]].getName)
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(" +
        s"graft.functions.VectorKernels.probeLists($v.toFloatArray(), " +
        s"(float[][]) $bc.value(), $nprobe, $metricId));")
  }

  override protected def withNewChildInternal(c: Expression): ProbeLists =
    copy(child = c)
}

/** Column-level entry points (the `functions._` of this engine). */
object vector {
  private def col(e: Expression): Column = graftshims.column(e)
  private def expr(c: Column): Expression = graftshims.expression(c)

  /** Squared L2 distance (no sqrt), computed in double. */
  def l2_distance(a: Column, b: Column): Column =
    col(VectorDistance(expr(a), expr(b), Metric.L2))

  /** Negated dot product — smaller is closer. */
  def ip_distance(a: Column, b: Column): Column =
    col(VectorDistance(expr(a), expr(b), Metric.InnerProduct))

  /** 1 - cosine similarity, with the reference's 1e-8 epsilon. */
  def cosine_distance(a: Column, b: Column): Column =
    col(VectorDistance(expr(a), expr(b), Metric.Cosine))

  def distance(a: Column, b: Column, metric: Metric.Value): Column =
    col(VectorDistance(expr(a), expr(b), metric))

  def normalize_vector(v: Column): Column = col(NormalizeVector(expr(v)))

  def argmin_centroid(v: Column, centroids: Broadcast[Array[Array[Float]]]): Column =
    col(ArgMinCentroid(expr(v), centroids))

  def probe_lists(
      v: Column,
      centroids: Broadcast[Array[Array[Float]]],
      nprobe: Int,
      metric: Metric.Value = Metric.L2): Column =
    col(ProbeLists(expr(v), centroids, nprobe, metric))
}
