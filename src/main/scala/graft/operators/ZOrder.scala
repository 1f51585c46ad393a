package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftshims
import org.apache.spark.sql.types.{DataType, LongType}

/**
 * Z-order (Morton) clustering — the space-filling-curve layout technique
 * for multi-dimensional pruning at 100 TB: sort/range-partition by the
 * interleaved key before writing and parquet row-group min/max statistics
 * become selective on BOTH dimensions, where a lexicographic sort prunes
 * only its leading column. (The technique Delta/Iceberg expose as
 * `OPTIMIZE ... ZORDER BY`; here as a first-class expression + layout
 * helper.)
 */
object ZOrderKernels {
  /** Morton interleave of the low `bits` bits of two non-negative longs:
    * bit b of x lands at 2b, bit b of y at 2b+1. */
  def interleave(x: Long, y: Long, bits: Int): Long = {
    var z = 0L
    var b = 0
    while (b < bits) {
      z |= ((x >>> b) & 1L) << (2 * b)
      z |= ((y >>> b) & 1L) << (2 * b + 1)
      b += 1
    }
    z
  }
}

/** Codegen'd Morton key of two LONG columns (low `bits` bits each). */
case class ZValue(left: Expression, right: Expression, bits: Int)
    extends BinaryExpression with ExpectsInputTypes {

  require(bits > 0 && bits <= 32, s"bits must be in [1, 32], got $bits")

  override def inputTypes: Seq[graftshims.AbstractDataType] = Seq(LongType, LongType)
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "zvalue"

  override def nullSafeEval(x: Any, y: Any): Any =
    ZOrderKernels.interleave(x.asInstanceOf[Long], y.asInstanceOf[Long], bits)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) =>
      s"${ev.value} = graft.operators.ZOrderKernels.interleave($x, $y, $bits);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ZValue =
    copy(left = newLeft, right = newRight)
}

object ZOrder {

  def zvalue(x: Column, y: Column, bits: Int = 16): Column =
    graftshims.column(ZValue(
      graftshims.expression(x.cast("long")),
      graftshims.expression(y.cast("long")), bits))

  /**
   * Cluster a DataFrame for 2-D pruning: range-partition + sort by the
   * Morton key, so each output file covers a compact (x, y) tile instead
   * of a full-width stripe. Written this way the downstream
   * `filter(x BETWEEN ... AND y BETWEEN ...)` prunes row groups on both
   * predicates (see ZOrderSpec's bounding-box measurement).
   *
   * Values are min/max-NORMALIZED into the `bits`-wide bucket range
   * first (one tiny 1-row aggregate): interleaving the raw low bits
   * would alias values 2^bits apart into the same Morton key — on
   * ordinary inputs (ms epochs ~1.7e12, snowflake ids) every file would
   * then span nearly the full domain and the min/max pruning this
   * operator exists for silently stops working. The double division is
   * exact enough for bucketing (2^bits buckets, bits <= 32); span 0
   * collapses the dimension to bucket 0, which is correct (nothing to
   * prune on a constant column).
   */
  def cluster(df: DataFrame, x: Column, y: Column, partitions: Int,
      bits: Int = 16, bounds: Option[(Long, Long, Long, Long)] = None): DataFrame = {
    require(!df.columns.contains("_z"),
      "input already has a '_z' column (reserved working name)")
    import org.apache.spark.sql.functions.{floor, greatest, least, lit, max, min, when}
    // Caller-supplied bounds skip the bounds scan entirely — a layout job
    // over 100 TB usually KNOWS its domain (epoch ranges, id ranges), and
    // the fallback aggregate is a full extra pass over the input, eagerly
    // at compose time.
    bounds.foreach { case (bx0, bx1, by0, by1) =>
      // reversed bounds would make every span negative and every bucket
      // clamp to 0 — clustering silently collapses to one tile, the
      // exact failure this operator exists to prevent; only the caller
      // parameter can produce this (the scan path computes min <= max)
      require(bx1 >= bx0 && by1 >= by0,
        s"bounds must be ordered (lo <= hi): x=($bx0, $bx1) y=($by0, $by1)")
    }
    val (x0, x1, y0, y1) = bounds.getOrElse {
      val Array(b) = df.agg(
        min(x.cast("long")).as("x0"), max(x.cast("long")).as("x1"),
        min(y.cast("long")).as("y0"), max(y.cast("long")).as("y1")).collect()
      // empty input (or all-null coordinates): nothing to cluster — the
      // min/max row is all null and any bucketing would be arbitrary
      if (b.isNullAt(0) || b.isNullAt(2)) return df
      (b.getLong(0), b.getLong(1), b.getLong(2), b.getLong(3))
    }
    val top = (1L << bits) - 1
    def norm(c: Column, lo: Long, hi: Long): Column = {
      val cl = c.cast("long")
      // span arithmetic in BigDecimal/decimal(38,0): a domain containing
      // both a Long.MinValue sentinel and large positive values wraps a
      // long subtraction (the same wrap class RangeJoin.band's decimal
      // check guards), silently destroying the clustering
      val span = (BigDecimal(hi) - BigDecimal(lo)).toDouble
      // clamp BOTH ends: caller-supplied bounds can be slightly stale vs
      // the data, and an un-clamped below-lo value yields a NEGATIVE
      // bucket whose sign-extended low bits interleave into the
      // max-corner Morton tile — inflating that tile's bounding box, the
      // exact pruning failure this operator exists to prevent
      val bucket =
        if (hi == lo) lit(0L)
        else greatest(lit(0L), least(lit(top), floor(
          (cl.cast("decimal(38,0)") - lit(lo).cast("decimal(38,0)"))
            .cast("double") / span * top)))
          .cast("long")
      // null coordinates keep a null bucket (-> null _z, ranged together
      // at the null end); least() would otherwise SKIP the null operand
      // and drop such rows into the hottest max-corner tile, inflating
      // that tile's bounding box
      when(cl.isNotNull, bucket)
    }
    val keyed = df.withColumn("_z", zvalue(
      norm(x, x0, x1), norm(y, y0, y1), bits))
    keyed
      .repartitionByRange(partitions, keyed.col("_z"))
      .sortWithinPartitions("_z")
      .drop("_z")
  }
}
