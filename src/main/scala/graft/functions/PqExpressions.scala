package graft.functions

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression, TernaryExpression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftshims
import org.apache.spark.sql.types._

/**
 * Product-quantization kernels (reference engine/kernels.cuh:186-312 —
 * declared in the reference's host API but never wired there; implemented
 * for real here). Codebooks are `(m)(ks)(dsub)`; a code is `m` bytes;
 * the ADC table for a query is `m x ks` squared-L2 distances between each
 * query subvector and each codeword; a candidate's distance is the sum of
 * `m` table lookups.
 */
object PqKernels {

  /** Nearest-codeword index per subspace (encode, kernels.cuh analog). */
  def encode(v: Array[Float], codebooks: Array[Array[Array[Float]]]): Array[Byte] = {
    val m = codebooks.length
    val out = new Array[Byte](m)
    var s = 0
    while (s < m) {
      val cb = codebooks(s)
      val dsub = cb(0).length
      val off = s * dsub
      var best = 0
      var bestDist = Double.MaxValue
      var c = 0
      while (c < cb.length) {
        val cw = cb(c)
        var d = 0.0
        var i = 0
        while (i < dsub) {
          val diff = v(off + i).toDouble - cw(i).toDouble
          d += diff * diff
          i += 1
        }
        if (d < bestDist) { bestDist = d; best = c }
        c += 1
      }
      out(s) = best.toByte
      s += 1
    }
    out
  }

  /**
   * ADC lookup table for one query as raw primitive arrays: [m][ks], per
   * `metric` (reference kernels.cuh:188-223 are L2-only; IP/Cosine are the
   * metric-generic variants its host API declares, ivf_flat_index.h:119-137):
   *
   *  - L2: squared L2 between each query subvector and each codeword;
   *    lookup-sum = ||q - decode(code)||².
   *  - InnerProduct: negated dot per subspace; lookup-sum =
   *    -dot(q, decode(code)) — same ascending order as the flat IP metric.
   *  - Cosine: the query is L2-normalized IN DOUBLES (1/√(‖q‖²+1e-8), the
   *    D4 epsilon), tables are negated dots against the codewords, and the
   *    constant 1 is folded into subspace 0 — lookup-sum =
   *    1 - dot(q̂, decode(code)). REQUIRES codes encoded from normalized
   *    vectors (build(metric = Cosine) does this): then decode(code) ≈ v̂
   *    and the lookup-sum approximates the flat cosine distance 1 - cos.
   */
  def adcTableRaw(
      q: Array[Float],
      codebooks: Array[Array[Array[Float]]],
      metric: Int = VectorKernels.METRIC_L2): Array[Array[Double]] =
    adcTableFromPrepped(prepQuery(q, metric), codebooks, metric)

  /**
   * Query prep shared by the table and direct ADC paths: a doubles copy,
   * L2-normalized for cosine (1/√(‖q‖²+1e-8), the D4 epsilon). Codewords
   * are already float-rounded normalized components; the query stays
   * full-precision, exactly like the flat metric's double accumulation.
   * One definition so the table path and [[adcDistanceDirect]] are
   * bit-identical by construction.
   */
  def prepQuery(q: Array[Float], metric: Int): Array[Double] = {
    val qd = new Array[Double](q.length)
    if (metric == VectorKernels.METRIC_COSINE) {
      var s = 0.0
      var i = 0
      while (i < q.length) { val x = q(i).toDouble; s += x * x; i += 1 }
      val inv = 1.0 / math.sqrt(s + 1e-8)
      i = 0
      while (i < q.length) { qd(i) = q(i).toDouble * inv; i += 1 }
    } else {
      var i = 0
      while (i < q.length) { qd(i) = q(i).toDouble; i += 1 }
    }
    qd
  }

  /** [[adcTableRaw]] over an already-prepped query (see [[prepQuery]]). */
  def adcTableFromPrepped(
      qd: Array[Double],
      codebooks: Array[Array[Array[Float]]],
      metric: Int): Array[Array[Double]] = {
    val m = codebooks.length
    val rows = new Array[Array[Double]](m)
    val cosine = metric == VectorKernels.METRIC_COSINE
    val dot = cosine || metric == VectorKernels.METRIC_IP
    var s = 0
    while (s < m) {
      val cb = codebooks(s)
      val dsub = cb(0).length
      val off = s * dsub
      val row = new Array[Double](cb.length)
      var c = 0
      while (c < cb.length) {
        val cw = cb(c)
        var d = 0.0
        var i = 0
        if (dot) {
          while (i < dsub) { d += qd(off + i) * cw(i).toDouble; i += 1 }
          row(c) = if (cosine && s == 0) 1.0 + -d else -d
        } else {
          while (i < dsub) {
            val diff = qd(off + i) - cw(i).toDouble
            d += diff * diff
            i += 1
          }
          row(c) = d
        }
        c += 1
      }
      rows(s) = row
      s += 1
    }
    rows
  }

  /** Catalyst-typed wrapper of [[adcTableRaw]] for the distributed path. */
  def adcTable(q: Array[Float], codebooks: Array[Array[Array[Float]]], metric: Int): ArrayData =
    new GenericArrayData(
      adcTableRaw(q, codebooks, metric).map(new GenericArrayData(_)).asInstanceOf[Array[Any]])

  /** ADC distance: sum of per-subspace table lookups (kernels.cuh:280-287). */
  def adcDistance(table: ArrayData, codes: ArrayData): Double = {
    var d = 0.0
    val m = codes.numElements()
    var i = 0
    while (i < m) {
      d += table.getArray(i).getDouble(codes.getByte(i) & 0xff)
      i += 1
    }
    d
  }

  /** Lookup-sum over a raw (non-Catalyst) table — same accumulation order
    * as [[adcDistance]], for the streaming scorer's table mode. */
  def adcDistanceRaw(table: Array[Array[Double]], codes: ArrayData): Double = {
    var d = 0.0
    val m = codes.numElements()
    var i = 0
    while (i < m) {
      d += table(i)(codes.getByte(i) & 0xff)
      i += 1
    }
    d
  }

  /** Lookup-sum over a raw table and a plain byte-array code row — the
    * typed-Dataset twin of [[adcDistanceRaw]] for the cogroup flood path,
    * where codes arrive as `Array[Byte]` through the encoder rather than
    * as Catalyst ArrayData. Same accumulation order. */
  def adcDistanceBytes(table: Array[Array[Double]], codes: Array[Byte]): Double = {
    var d = 0.0
    val m = codes.length
    var i = 0
    while (i < m) {
      d += table(i)(codes(i) & 0xff)
      i += 1
    }
    d
  }

  /**
   * Direct per-candidate ADC distance from a prepped query, without a
   * table: per subspace, score ONLY the codeword the code byte names.
   * O(dim) per candidate instead of a 16 KB-per-query table — the join
   * path's above-gate fallback. Bit-identical to the lookup-sum over
   * [[adcTableFromPrepped]]'s rows: same per-subspace inner loop, same
   * ascending-subspace accumulation order.
   */
  def adcDistanceDirect(
      qd: Array[Double],
      codebooks: Array[Array[Array[Float]]],
      metric: Int,
      codes: ArrayData): Double = {
    val m = codebooks.length
    val cosine = metric == VectorKernels.METRIC_COSINE
    val dot = cosine || metric == VectorKernels.METRIC_IP
    var total = 0.0
    var s = 0
    while (s < m) {
      val cb = codebooks(s)
      val dsub = cb(0).length
      val off = s * dsub
      val cw = cb(codes.getByte(s) & 0xff)
      var d = 0.0
      var i = 0
      if (dot) {
        while (i < dsub) { d += qd(off + i) * cw(i).toDouble; i += 1 }
        total += (if (cosine && s == 0) 1.0 + -d else -d)
      } else {
        while (i < dsub) {
          val diff = qd(off + i) - cw(i).toDouble
          d += diff * diff
          i += 1
        }
        total += d
      }
      s += 1
    }
    total
  }

  /** Decode a PQ code back to its codeword concatenation (for tests). */
  def decode(code: Array[Byte], codebooks: Array[Array[Array[Float]]]): Array[Float] = {
    val m = codebooks.length
    val dsub = codebooks(0)(0).length
    val out = new Array[Float](m * dsub)
    var s = 0
    while (s < m) {
      System.arraycopy(codebooks(s)(code(s) & 0xff), 0, out, s * dsub, dsub)
      s += 1
    }
    out
  }
}

object AdcStreamScorer {
  /** Rows of one query seen consecutively before the scorer builds the
    * full m x ks table: build costs ~ks x dim madds, direct rows cost dim
    * each, so the table pays for itself after ~ks rows — 32 keeps the
    * wasted prefix small while still capturing long per-(qid, list) runs. */
  val DefaultBuildAfter = 32
}

/**
 * Per-task streaming ADC scorer for the distributed join path. Candidate
 * rows arrive in whatever order the join produces; the scorer adapts:
 *
 *  - qid-clustered runs (probed side streamed through the join — each
 *    probed row emits all its list's codes consecutively): after
 *    `buildAfter` rows of one query it builds that query's ADC table once
 *    and the rest of the run is m lookups per candidate — full ADC speed.
 *  - adversarial order (qids alternating row to row): it never builds a
 *    table and scores each candidate directly at O(dim) — the flat-scan
 *    cost, never the O(ks x dim) table-per-row catastrophe.
 *
 * Either mode produces bit-identical distances (both derive from the same
 * [[PqKernels.prepQuery]] output and the same per-subspace arithmetic).
 * State is per-instance; instances live one-per-task (deserialized plan
 * copies / per-partition codegen instances), never shared across threads.
 */
final class AdcStreamScorer(
    codebooks: Array[Array[Array[Float]]],
    metric: Int,
    buildAfter: Int) extends Serializable {

  def this(codebooks: Array[Array[Array[Float]]], metric: Int) =
    this(codebooks, metric, AdcStreamScorer.DefaultBuildAfter)

  private var lastQid = 0L
  private var qd: Array[Double] = null
  private var table: Array[Array[Double]] = null
  private var run = 0

  def score(qid: Long, qvec: ArrayData, codes: ArrayData): Double = {
    if (qd == null || qid != lastQid) {
      lastQid = qid
      qd = PqKernels.prepQuery(qvec.toFloatArray(), metric)
      table = null
      run = 0
    }
    run += 1
    if (table == null && run >= buildAfter)
      table = PqKernels.adcTableFromPrepped(qd, codebooks, metric)
    if (table != null) PqKernels.adcDistanceRaw(table, codes)
    else PqKernels.adcDistanceDirect(qd, codebooks, metric, codes)
  }
}

/** Encode an ARRAY<FLOAT> vector into m PQ code bytes. */
case class PqEncode(child: Expression, codebooks: Broadcast[Array[Array[Array[Float]]]])
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[org.apache.spark.sql.graftshims.AbstractDataType] =
    Seq(ArrayType(FloatType))
  override def dataType: DataType = ArrayType(ByteType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "pq_encode"

  override def nullSafeEval(v: Any): Any =
    new GenericArrayData(
      PqKernels.encode(v.asInstanceOf[ArrayData].toFloatArray(), codebooks.value))

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bc = ctx.addReferenceObj("pqCodebooks", codebooks,
      classOf[Broadcast[Array[Array[Array[Float]]]]].getName)
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(" +
        s"graft.functions.PqKernels.encode($v.toFloatArray(), (float[][][]) $bc.value()));")
  }

  override protected def withNewChildInternal(c: Expression): PqEncode = copy(child = c)
}

/** Per-query ADC table: ARRAY<ARRAY<DOUBLE>> of m x ks per-metric costs. */
case class PqAdcTable(child: Expression, codebooks: Broadcast[Array[Array[Array[Float]]]],
    metric: graft.Metric.Value = graft.Metric.L2)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[org.apache.spark.sql.graftshims.AbstractDataType] =
    Seq(ArrayType(FloatType))
  override def dataType: DataType =
    ArrayType(ArrayType(DoubleType, containsNull = false), containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "pq_adc_table"

  private val metricId = metric.id

  override def nullSafeEval(v: Any): Any =
    PqKernels.adcTable(v.asInstanceOf[ArrayData].toFloatArray(), codebooks.value, metricId)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bc = ctx.addReferenceObj("pqCodebooks", codebooks,
      classOf[Broadcast[Array[Array[Array[Float]]]]].getName)
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.functions.PqKernels.adcTable(" +
        s"$v.toFloatArray(), (float[][][]) $bc.value(), $metricId);")
  }

  override protected def withNewChildInternal(c: Expression): PqAdcTable = copy(child = c)
}

/** Sum of table lookups: distance between a query's ADC table and a code. */
case class PqAdcDistance(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[org.apache.spark.sql.graftshims.AbstractDataType] =
    Seq(ArrayType(ArrayType(DoubleType, containsNull = false)), ArrayType(ByteType))
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "pq_adc_distance"

  override def nullSafeEval(table: Any, codes: Any): Any =
    PqKernels.adcDistance(table.asInstanceOf[ArrayData], codes.asInstanceOf[ArrayData])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (t, c) =>
      s"${ev.value} = graft.functions.PqKernels.adcDistance($t, $c);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PqAdcDistance =
    copy(left = newLeft, right = newRight)
}

/**
 * Join-path ADC distance fused with per-task query prep: scores a
 * candidate's codes against the row's (qid, qvec) through an
 * [[AdcStreamScorer]], so probed rows carry the dim x 4 B query vector —
 * never a 16 KB m x ks table — across the join, and no per-row table is
 * ever broadcast or shuffled. See the scorer for the adaptive
 * table-vs-direct policy and the bit-exactness argument.
 */
case class PqAdcDistanceFused(
    first: Expression, // qid LONG
    second: Expression, // qvec ARRAY<FLOAT>
    third: Expression, // codes ARRAY<BYTE>
    codebooks: Broadcast[Array[Array[Array[Float]]]],
    metric: graft.Metric.Value)
    extends TernaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[org.apache.spark.sql.graftshims.AbstractDataType] =
    Seq(LongType, ArrayType(FloatType), ArrayType(ByteType))
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "pq_adc_distance_fused"

  private val metricId = metric.id

  // one scorer per deserialized plan copy = per task (interpreted path)
  @transient private lazy val scorer = new AdcStreamScorer(codebooks.value, metricId)

  override def nullSafeEval(qid: Any, qvec: Any, codes: Any): Any =
    scorer.score(qid.asInstanceOf[Long],
      qvec.asInstanceOf[ArrayData], codes.asInstanceOf[ArrayData])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bc = ctx.addReferenceObj("pqCodebooks", codebooks,
      classOf[Broadcast[Array[Array[Array[Float]]]]].getName)
    // per-generated-instance scorer = per partition (codegen classes are
    // instantiated once per task); raw-type cast for Janino
    val scorer = ctx.addMutableState("graft.functions.AdcStreamScorer", "adcScorer",
      v => s"$v = new graft.functions.AdcStreamScorer((float[][][]) $bc.value(), $metricId);")
    nullSafeCodeGen(ctx, ev, (q, v, c) =>
      s"${ev.value} = $scorer.score($q, $v, $c);")
  }

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): PqAdcDistanceFused =
    copy(first = newFirst, second = newSecond, third = newThird)
}

object pq {
  private def col(e: Expression): Column = graftshims.column(e)
  private def ex(c: Column): Expression = graftshims.expression(c)

  def pq_encode(v: Column, codebooks: Broadcast[Array[Array[Array[Float]]]]): Column =
    col(PqEncode(ex(v), codebooks))

  def pq_adc_table(q: Column, codebooks: Broadcast[Array[Array[Array[Float]]]],
      metric: graft.Metric.Value = graft.Metric.L2): Column =
    col(PqAdcTable(ex(q), codebooks, metric))

  def pq_adc_distance(table: Column, codes: Column): Column =
    col(PqAdcDistance(ex(table), ex(codes)))

  def pq_adc_distance_fused(qid: Column, qvec: Column, codes: Column,
      codebooks: Broadcast[Array[Array[Array[Float]]]],
      metric: graft.Metric.Value = graft.Metric.L2): Column =
    col(PqAdcDistanceFused(ex(qid), ex(qvec), ex(codes), codebooks, metric))
}
