package graft.operators

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftshims
import org.apache.spark.sql.types.{BooleanType, DataType, LongType}
import org.apache.spark.util.sketch.BloomFilter

/**
 * Membership probe against a broadcast Bloom filter. The filter rides
 * along as a `Broadcast` handle (same pattern as
 * [[graft.functions.ArgMinCentroid]]): the expression serializes into
 * each task as a few bytes and executors fetch the bitset once from the
 * BlockManager — the plan never embeds the (possibly tens-of-MB) filter,
 * and whole-stage codegen calls straight into the sketch's primitive
 * `mightContainLong`, so the probe costs two hashes per row with zero
 * boxing.
 */
case class BloomMightContain(child: Expression, bloom: Broadcast[BloomFilter])
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[graftshims.AbstractDataType] = Seq(LongType)
  override def dataType: DataType = BooleanType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "bloom_might_contain"

  override def nullSafeEval(v: Any): Any =
    bloom.value.mightContainLong(v.asInstanceOf[Long])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bc = ctx.addReferenceObj("bloomBc", bloom,
      classOf[Broadcast[BloomFilter]].getName)
    // per-task deref, not per row: TorrentBroadcast.getValue() is
    // synchronized, and this probe runs once per fact row pre-shuffle
    val bf = ctx.addMutableState("org.apache.spark.util.sketch.BloomFilter",
      "bloomFilter",
      v => s"$v = (org.apache.spark.util.sketch.BloomFilter) $bc.value();")
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = $bf.mightContainLong($v);")
  }

  override protected def withNewChildInternal(c: Expression): BloomMightContain =
    copy(child = c)
}

/**
 * Runtime Bloom-filter join pruning — the semi-join-pushdown technique a
 * 100 TB fact-to-dim join needs when the dim side is too big to broadcast
 * as a hash join but its KEY SET still fits a sketch: build a Bloom filter
 * over the dim keys (distributed `treeAggregate`, driver holds only the
 * final bitset), broadcast it, and drop non-matching fact rows BEFORE the
 * shuffle. The exact join that follows removes the false positives, so
 * results are bit-identical to the plain join while the shuffle carries
 * only ~selectivity + fpp of the fact table.
 *
 * Sizing: the bitset is ~1.2 bytes/key at fpp=1% — 100M dim keys ≈ 120 MB
 * broadcast, far beyond hash-join broadcast budgets but fine as a one-shot
 * torrent broadcast. `expectedItems` defaults to the dim side's exact
 * count (one cheap count job on a key-only projection); pass it explicitly
 * to skip that job when the cardinality is known.
 *
 * Reference has no relational joins (single-table ANN engine,
 * `engine/ivf_flat_index.h:24-36`); this is pipeline-extension surface
 * for the TPC-H-ish tables (SURVEY §7.5).
 */
object BloomJoin {

  /** Integral-dtype guard shared by build and probe: the probe hashes
    * LONGs (`mightContainLong`), while `df.stat.bloomFilter` on a string
    * column would build over binary hashes — the two never agree, and the
    * cast("long") on the probe side nulls non-numeric strings, so a
    * non-integral key would SILENTLY filter out every row. Fail loudly. */
  private def requireIntegralKey(df: DataFrame, key: String): Unit = {
    val dt = df.schema(df.schema.fieldIndex(key)).dataType
    require(Seq("byte", "short", "integer", "long").contains(dt.typeName),
      s"BloomJoin keys must be integral (ids); column '$key' is $dt — " +
        "a string key would build binary hashes the long probe never matches")
  }

  /** Build a Bloom filter over `df`'s long key column. */
  def keyFilter(
      df: DataFrame,
      key: String,
      expectedItems: Long = -1L,
      fpp: Double = 0.01): Broadcast[BloomFilter] = {
    requireIntegralKey(df, key)
    val keys = df.select(key)
    val n =
      if (expectedItems > 0) expectedItems
      else math.max(keys.count(), 1L)
    val bf = keys.stat.bloomFilter(key, n, fpp)
    df.sparkSession.sparkContext.broadcast(bf)
  }

  /** `large` reduced to rows whose `largeKey` might appear in the filter
    * (no false negatives: every matching row survives). */
  def prefilter(
      large: DataFrame,
      largeKey: Column,
      bloom: Broadcast[BloomFilter]): DataFrame =
    large.filter(graftshims.column(BloomMightContain(
      graftshims.expression(largeKey.cast("long")), bloom)))

  /**
   * Exact inner join with the fact side Bloom-pruned first. Join keys are
   * LONGs (ids everywhere in this engine). The join itself is left to
   * Catalyst/AQE — after pruning, the surviving fact slice often collapses
   * to a broadcast join at runtime.
   */
  def innerJoin(
      fact: DataFrame,
      factKey: String,
      dim: DataFrame,
      dimKey: String,
      expectedDimKeys: Long = -1L,
      fpp: Double = 0.01): DataFrame = {
    requireIntegralKey(fact, factKey)
    val bf = keyFilter(dim, dimKey, expectedDimKeys, fpp)
    prefilter(fact, fact(factKey), bf)
      .join(dim, fact(factKey) === dim(dimKey))
  }
}
