package graft.functions

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression, TernaryExpression, UnaryExpression}
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

  // distanceCols: thread-local scratch decode instead of two fresh
  // float[] per PAIR (r21) — at rerank/cross-join candidate cardinality
  // the copies were hundreds of MB of garbage per run (stage profiles:
  // multi-second GC on scans whose runtime was 3x their CPU)
  override def nullSafeEval(a: Any, b: Any): Any =
    VectorKernels.distanceCols(
      a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData], metricId)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.VectorKernels.distanceCols(" +
        s"$a, $b, $metricId);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VectorDistance =
    copy(left = newLeft, right = newRight)
}

/**
 * A non-foldable double constant whose VALUE rides the references array
 * instead of the generated source (round 20, r19 verdict #4). A
 * primitive `Literal` inlines its value into every generated class that
 * evaluates it (`... <= 2.5D`), so a serving workload issuing range
 * queries with per-request radii compiles one filter-stage class per
 * DISTINCT radius even after PlanWarmup — Janino churn with no upper
 * bound. The SQL-ANN range rewrite substitutes the matched radius
 * literal with this expression: the generated source becomes
 * radius-invariant (`references[i]`, same index for same plan shape),
 * so the second distinct radius is codegen+0. Non-foldable BY DESIGN —
 * constant folding would turn it back into the inlining literal;
 * deterministic, so partition-pruning and filter placement treat it
 * like the constant it is. Interpreted eval returns the value directly.
 */
case class DoubleRef(value: Double)
    extends org.apache.spark.sql.catalyst.expressions.LeafExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = false
  override def foldable: Boolean = false
  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any =
    value
  override def toString: String = s"double_ref($value)"
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("graftRadius",
      java.lang.Double.valueOf(value), "java.lang.Double")
    ev.copy(
      code = org.apache.spark.sql.catalyst.expressions.codegen.EmptyBlock,
      isNull = org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral,
      value = org.apache.spark.sql.catalyst.expressions.codegen.JavaCode
        .expression(s"$ref.doubleValue()", DoubleType))
  }
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
    // per-task deref, NOT per row: TorrentBroadcast.getValue() is a
    // synchronized method (Spark 4.x), so a per-row $bc.value() would
    // contend on one monitor across every task of the full-corpus assign
    val cm = ctx.addMutableState("float[][]", "centroidsArr",
      v => s"$v = (float[][]) $bc.value();")
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.functions.VectorKernels.argminCentroid(" +
        s"$v.toFloatArray(), $cm);")
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
    // per-task deref, not per row (see ArgMinCentroid)
    val cm = ctx.addMutableState("float[][]", "centroidsArr",
      v => s"$v = (float[][]) $bc.value();")
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(" +
        s"graft.functions.VectorKernels.probeLists($v.toFloatArray(), " +
        s"$cm, $nprobe, $metricId));")
  }

  override protected def withNewChildInternal(c: Expression): ProbeLists =
    copy(child = c)
}

/**
 * Fixed-radius coarse prune for the SQL range-JOIN rewrite
 * ([[graft.plans.SqlAnn]]): ids of every list whose covering ball
 * intersects the query ball — EXACT (reverse triangle inequality,
 * [[graft.index.IvfFlatIndex.rangeProbe]]'s bound), unlike the top-k
 * probe's nprobe approximation. Centroids AND per-list covering radii
 * ship via broadcast (both are registration state —
 * [[graft.plans.SqlAnn.Registration]]).
 */
case class RangeProbeLists(
    child: Expression,
    centroids: Broadcast[Array[Array[Float]]],
    radii: Broadcast[Array[Double]],
    radius: Double)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[graftshims.AbstractDataType] = Seq(ArrayType(FloatType))
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "range_probe_lists"

  override def nullSafeEval(v: Any): Any =
    new GenericArrayData(VectorKernels.rangeProbeLists(
      v.asInstanceOf[ArrayData].toFloatArray(),
      centroids.value, radii.value, radius))

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bc = ctx.addReferenceObj("centroidsBc", centroids,
      classOf[Broadcast[Array[Array[Float]]]].getName)
    val rb = ctx.addReferenceObj("radiiBc", radii,
      classOf[Broadcast[Array[Double]]].getName)
    // per-task deref, not per row (see ArgMinCentroid)
    val cm = ctx.addMutableState("float[][]", "centroidsArr",
      v => s"$v = (float[][]) $bc.value();")
    val rm = ctx.addMutableState("double[]", "radiiArr",
      v => s"$v = (double[]) $rb.value();")
    // the radius rides the references array, NOT the source (round 20,
    // r19 verdict #4): an inlined `${radius}D` made every distinct
    // per-request radius compile a fresh Generate-stage class — with the
    // reference the generated source is radius-invariant and the warmed
    // family serves new radii at codegen+0
    val rr = ctx.addReferenceObj("rangeRadius",
      java.lang.Double.valueOf(radius), "java.lang.Double")
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(" +
        s"graft.functions.VectorKernels.rangeProbeLists($v.toFloatArray(), " +
        s"$cm, $rm, $rr.doubleValue()));")
  }

  override protected def withNewChildInternal(c: Expression): RangeProbeLists =
    copy(child = c)
}

/**
 * [[RangeProbeLists]] for a COSINE bound over a unit-norm-attested table
 * (the cosine→L2 bridge, [[VectorKernels.cosineL2Bound]]): the per-row
 * norm check happens HERE, at runtime — a degenerate query row (the
 * bridge bound doesn't hold for it) emits EVERY list instead of a pruned
 * set, so the rewrite stays exact per row. `radius` is the ORIGINAL
 * cosine radius; the kernel derives the L2 ball.
 */
case class CosineRangeProbeLists(
    child: Expression,
    centroids: Broadcast[Array[Array[Float]]],
    radii: Broadcast[Array[Double]],
    radius: Double,
    tol: Double)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[graftshims.AbstractDataType] = Seq(ArrayType(FloatType))
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "cosine_range_probe_lists"

  override def nullSafeEval(v: Any): Any =
    new GenericArrayData(VectorKernels.cosineRangeProbeLists(
      v.asInstanceOf[ArrayData].toFloatArray(),
      centroids.value, radii.value, radius, tol))

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bc = ctx.addReferenceObj("centroidsBc", centroids,
      classOf[Broadcast[Array[Array[Float]]]].getName)
    val rb = ctx.addReferenceObj("radiiBc", radii,
      classOf[Broadcast[Array[Double]]].getName)
    // per-task deref, not per row (see ArgMinCentroid)
    val cm = ctx.addMutableState("float[][]", "centroidsArr",
      v => s"$v = (float[][]) $bc.value();")
    val rm = ctx.addMutableState("double[]", "radiiArr",
      v => s"$v = (double[]) $rb.value();")
    // radius via references (see RangeProbeLists — radius-invariant
    // source); ${tol}D stays inlined: it is the UnitNormTol constant,
    // identical across queries, and a finite Java literal by definition
    val rr = ctx.addReferenceObj("rangeRadius",
      java.lang.Double.valueOf(radius), "java.lang.Double")
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(" +
        s"graft.functions.VectorKernels.cosineRangeProbeLists($v.toFloatArray(), " +
        s"$cm, $rm, $rr.doubleValue(), ${tol}D));")
  }

  override protected def withNewChildInternal(c: Expression): CosineRangeProbeLists =
    copy(child = c)
}

/**
 * [[RangeProbeLists]] for an INNER-PRODUCT bound: the Cauchy–Schwarz
 * ball bound (list survives iff `c_l·q + R_l·‖q‖ ≥ −radius`,
 * [[VectorKernels.ipRangeProbeLists]]) — IP is not a metric, but the
 * covering BALL is an L2 fact and bounds the dot exactly, so the prune
 * is exact per row with no attestation needed.
 */
case class IpRangeProbeLists(
    child: Expression,
    centroids: Broadcast[Array[Array[Float]]],
    radii: Broadcast[Array[Double]],
    radius: Double)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[graftshims.AbstractDataType] = Seq(ArrayType(FloatType))
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "ip_range_probe_lists"

  override def nullSafeEval(v: Any): Any =
    new GenericArrayData(VectorKernels.ipRangeProbeLists(
      v.asInstanceOf[ArrayData].toFloatArray(),
      centroids.value, radii.value, radius))

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bc = ctx.addReferenceObj("centroidsBc", centroids,
      classOf[Broadcast[Array[Array[Float]]]].getName)
    val rb = ctx.addReferenceObj("radiiBc", radii,
      classOf[Broadcast[Array[Double]]].getName)
    // per-task deref, not per row (see ArgMinCentroid)
    val cm = ctx.addMutableState("float[][]", "centroidsArr",
      v => s"$v = (float[][]) $bc.value();")
    val rm = ctx.addMutableState("double[]", "radiiArr",
      v => s"$v = (double[]) $rb.value();")
    // radius via references (see RangeProbeLists — radius-invariant
    // source)
    val rr = ctx.addReferenceObj("rangeRadius",
      java.lang.Double.valueOf(radius), "java.lang.Double")
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(" +
        s"graft.functions.VectorKernels.ipRangeProbeLists($v.toFloatArray(), " +
        s"$cm, $rm, $rr.doubleValue()));")
  }

  override protected def withNewChildInternal(c: Expression): IpRangeProbeLists =
    copy(child = c)
}

/**
 * Distance between a stored vector and a query looked up BY ID from a
 * broadcast map — the probe join then carries only an 8-byte qid per
 * candidate row instead of materializing the full query vector into every
 * joined row (at 128D that is ~512 bytes/row of copying saved; the
 * reference gets the same effect from its shared-memory query cache,
 * kernels.cuh:111-117). The query batch is broadcast either way; this
 * just stops it riding through the row stream.
 */
case class DistanceToQuery(
    vec: Expression,
    qid: Expression,
    queries: Broadcast[java.util.HashMap[java.lang.Long, Array[Float]]],
    metric: Metric.Value)
    extends BinaryExpression with ExpectsInputTypes {

  override def left: Expression = vec
  override def right: Expression = qid
  override def inputTypes: Seq[graftshims.AbstractDataType] =
    Seq(ArrayType(FloatType), LongType)
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "distance_to_query"

  private val metricId = metric.id

  override def nullSafeEval(v: Any, q: Any): Any =
    VectorKernels.distanceToQuery(
      v.asInstanceOf[ArrayData], q.asInstanceOf[Long], queries.value, metricId)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bc = ctx.addReferenceObj("queriesBc", queries,
      classOf[Broadcast[java.util.HashMap[java.lang.Long, Array[Float]]]].getName)
    // deref the broadcast ONCE per generated instance (= per task), not
    // per row; raw-type cast: Janino's generics support is limited and a
    // failed codegen compile silently disables whole-stage codegen
    val qm = ctx.addMutableState("java.util.HashMap", "queriesMap",
      v => s"$v = (java.util.HashMap) $bc.value();")
    nullSafeCodeGen(ctx, ev, (v, q) =>
      s"${ev.value} = graft.functions.VectorKernels.distanceToQuery(" +
        s"$v, $q, $qm, $metricId);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DistanceToQuery =
    copy(vec = newLeft, qid = newRight)
}

/**
 * Threshold pairs against a broadcast probe index — the near-dup broadcast
 * fast path's scorer ([[graft.pipeline.Dedup.embeddingNearDup]]): for one
 * corpus row (vec, id, list_id), every probe-index entry of that list with
 * a_id < id and distance <= maxDist, as ARRAY<STRUCT<a_id, dist>> ready
 * for explode. The inner loop runs in [[graft.index.ProbeIndex]] (stable,
 * compiled once per JVM); only matches materialize.
 */
case class NearPairs(
    vec: Expression,
    rowId: Expression,
    listId: Expression,
    probeIdx: Broadcast[graft.index.ProbeIndex],
    metric: Metric.Value,
    maxDist: Double)
    extends TernaryExpression with ExpectsInputTypes {

  override def first: Expression = vec
  override def second: Expression = rowId
  override def third: Expression = listId
  override def inputTypes: Seq[graftshims.AbstractDataType] =
    Seq(ArrayType(FloatType), LongType, IntegerType)
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("a_id", LongType, nullable = false),
      StructField("dist", DoubleType, nullable = false))),
    containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "near_pairs"

  private val metricId = metric.id

  override def nullSafeEval(v: Any, id: Any, list: Any): Any =
    graft.index.ProbeIndex.nearPairsInList(
      v.asInstanceOf[ArrayData], id.asInstanceOf[Long], list.asInstanceOf[Int],
      probeIdx.value, metricId, maxDist)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bc = ctx.addReferenceObj("probeIdxBc", probeIdx,
      classOf[Broadcast[graft.index.ProbeIndex]].getName)
    // per-task deref, raw type (Janino generics limits — see DistanceToQuery)
    val pi = ctx.addMutableState("graft.index.ProbeIndex", "probeIdx",
      v => s"$v = (graft.index.ProbeIndex) $bc.value();")
    nullSafeCodeGen(ctx, ev, (v, id, list) =>
      s"${ev.value} = graft.index.ProbeIndex.nearPairsInList(" +
        s"$v, $id, $list, $pi, $metricId, $maxDist);")
  }

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): NearPairs =
    copy(vec = f, rowId = s, listId = t)
}

/** Sign-bit pack, one 32-dim word per call (codegen'd — the builtin
  * aggregate-HOF formulation runs interpreted with a POWER per element). */
case class SignPackWord(child: Expression, word: Int)
    extends UnaryExpression with ExpectsInputTypes {

  require(word >= 0, s"word must be non-negative, got $word")

  override def inputTypes: Seq[graftshims.AbstractDataType] = Seq(ArrayType(FloatType))
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "sign_pack_word"

  override def nullSafeEval(v: Any): Any =
    VectorKernels.signPackWord(v.asInstanceOf[ArrayData], word)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.functions.VectorKernels.signPackWord($v, $word);")

  override protected def withNewChildInternal(c: Expression): SignPackWord =
    copy(child = c)
}

/**
 * Affine whitening of an ARRAY<FLOAT>: W (v − mean) with the (matrix,
 * mean) pair riding as a Broadcast handle like the centroid expressions —
 * the plan never embeds the d² doubles, executors fetch once.
 */
case class WhitenVector(
    child: Expression,
    wm: Broadcast[(Array[Double], Array[Double])])
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[graftshims.AbstractDataType] = Seq(ArrayType(FloatType))
  override def dataType: DataType = ArrayType(FloatType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "whiten_vector"

  override def nullSafeEval(v: Any): Any =
    new GenericArrayData(VectorKernels.whiten(
      v.asInstanceOf[ArrayData].toFloatArray(), wm.value._1, wm.value._2))

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bc = ctx.addReferenceObj("whitenBc", wm,
      classOf[Broadcast[(Array[Double], Array[Double])]].getName)
    // per-task deref, raw Tuple2 (Janino generics limits — see DistanceToQuery)
    val pair = ctx.addMutableState("scala.Tuple2", "whitenPair",
      v => s"$v = (scala.Tuple2) $bc.value();")
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(" +
        s"graft.functions.VectorKernels.whiten($v.toFloatArray(), " +
        s"(double[]) $pair._1(), (double[]) $pair._2()));")
  }

  override protected def withNewChildInternal(c: Expression): WhitenVector =
    copy(child = c)
}

/** SQ8 pack: ARRAY<FLOAT> x DOUBLE scale -> BINARY int8 codes (one byte
  * per dim — the true 4x scan-byte reduction the quantizer exists for). */
case class Sq8Pack(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[graftshims.AbstractDataType] =
    Seq(ArrayType(FloatType), DoubleType)
  override def dataType: DataType = BinaryType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "sq8_pack"

  override def nullSafeEval(v: Any, s: Any): Any =
    VectorKernels.sq8Pack(v.asInstanceOf[ArrayData].toFloatArray(), s.asInstanceOf[Double])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (v, s) =>
      s"${ev.value} = graft.functions.VectorKernels.sq8Pack($v.toFloatArray(), $s);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Sq8Pack =
    copy(left = newLeft, right = newRight)
}

/** Fused SQ8 distance: float query x BINARY codes x scale -> double,
  * dequantizing per element exactly as the SQL oracle ((code/scale)
  * rounded to FLOAT) — no scratch array per pair, stable compiled loop. */
case class Sq8Distance(
    query: Expression,
    codes: Expression,
    scale: Expression,
    metric: Metric.Value)
    extends TernaryExpression with ExpectsInputTypes {

  override def first: Expression = query
  override def second: Expression = codes
  override def third: Expression = scale
  override def inputTypes: Seq[graftshims.AbstractDataType] =
    Seq(ArrayType(FloatType), BinaryType, DoubleType)
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "sq8_distance"

  private val metricId = metric.id

  override def nullSafeEval(q: Any, c: Any, s: Any): Any =
    VectorKernels.sq8Distance(
      q.asInstanceOf[ArrayData].toFloatArray(),
      c.asInstanceOf[Array[Byte]],
      s.asInstanceOf[Double], metricId)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (q, c, s) =>
      s"${ev.value} = graft.functions.VectorKernels.sq8Distance(" +
        s"$q.toFloatArray(), $c, $s, $metricId);")

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): Sq8Distance =
    copy(query = f, codes = s, scale = t)
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

  def distance_to_query(
      v: Column,
      qid: Column,
      queries: Broadcast[java.util.HashMap[java.lang.Long, Array[Float]]],
      metric: Metric.Value): Column =
    col(DistanceToQuery(expr(v), expr(qid), queries, metric))

  def near_pairs(
      v: Column,
      rowId: Column,
      listId: Column,
      probeIdx: Broadcast[graft.index.ProbeIndex],
      metric: Metric.Value,
      maxDist: Double): Column =
    col(NearPairs(expr(v), expr(rowId), expr(listId), probeIdx, metric, maxDist))

  def sign_pack_word(v: Column, word: Int): Column =
    col(SignPackWord(expr(v), word))

  def sq8_pack(v: Column, scale: Column): Column =
    col(Sq8Pack(expr(v), expr(scale)))

  /** Affine whitening W(v − mean); pair from
    * [[graft.pipeline.EmbeddingOps.whiteningTransform]], flattened row-major. */
  def whiten_vector(v: Column,
      wm: Broadcast[(Array[Double], Array[Double])]): Column =
    col(WhitenVector(expr(v), wm))

  def sq8_distance(q: Column, codes: Column, scale: Column,
      metric: Metric.Value = Metric.L2): Column =
    col(Sq8Distance(expr(q), expr(codes), expr(scale), metric))
}
