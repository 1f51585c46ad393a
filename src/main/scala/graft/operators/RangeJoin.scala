package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Band (range) join: all pairs sharing `keys` whose ordering values lie
 * within `radius` of each other (`|leftVal - rightVal| <= radius`,
 * inclusive both ends).
 *
 * Spark plans a raw inequality join as a per-key nested loop — with hot
 * keys that is |L|x|R| comparisons per key, which is exactly what kills
 * event-correlation queries at 100 TB. This operator uses the standard
 * binning decomposition instead: right rows land in ONE bin of width
 * `radius` (`floor(val / radius)`), left rows explode to the THREE bins
 * any in-band partner can occupy (b-1, b, b+1), and the pair space
 * becomes a plain equi-join on (keys, bin) followed by the exact band
 * filter. Shuffle volume is 3|L| + |R| rows — linear, partition-pruned
 * by Catalyst like any equi-join, AQE-skew-splittable — and each bin
 * compares only rows at most 2 bins apart instead of the whole key group.
 *
 * Every candidate pair appears exactly once (the right row's bin is
 * unique, and each (left, rightBin) candidate is generated once), so no
 * downstream dedup is needed.
 *
 * No analog in the reference engine — pipeline-extension surface for
 * event-log correlation, like [[AsOfJoin]].
 */
object RangeJoin {

  /**
   * @param left         probe side (all its columns are preserved)
   * @param right        build side
   * @param keys         equi-join keys present on both sides
   * @param leftVal      long-valued ordering column on `left`
   * @param rightVal     long-valued ordering column on `right`
   * @param radius       inclusive band half-width (same unit as the vals)
   * @param rightPayload right column -> output name; names must not
   *                     collide with `left` columns
   */
  def band(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftVal: String,
      rightVal: String,
      radius: Long,
      rightPayload: Map[String, String]): DataFrame = {
    require(radius > 0, s"radius must be positive, got $radius")
    val payloadOut = rightPayload.toSeq.sortBy(_._2)
    require(payloadOut.forall { case (_, out) => !left.columns.contains(out) },
      s"payload output names ${payloadOut.map(_._2)} collide with left columns")
    // an output named like rightVal (or a key) would be silently removed
    // by the drop(rightVal)/internal-column cleanup below
    require(payloadOut.forall { case (_, out) =>
      out != rightVal && !keys.contains(out) },
      s"payload output names ${payloadOut.map(_._2)} collide with rightVal/keys")
    // ... and an output named like the reserved working columns would be
    // OVERWRITTEN by binned()'s withColumn and then dropped — requested
    // payload silently missing from the join output
    require(payloadOut.forall { case (_, out) =>
      out != "_range_bin" && out != "_range_rv" },
      s"payload output names ${payloadOut.map(_._2)} collide with reserved '_range_bin'/'_range_rv'")

    val bin = "_range_bin"
    val rv = "_range_rv"
    // the working names are overwritten by withColumn and dropped at the
    // end — a user column with either name would be silently destroyed
    require(!left.columns.contains(bin) && !left.columns.contains(rv) &&
      !right.columns.contains(bin) && !right.columns.contains(rv),
      s"'$bin'/'$rv' are reserved working column names")

    // Exact floor division by `radius` on a pinned column name: `div` is
    // integer division (a DOUBLE round-trip via `/` would mis-bin values
    // beyond 2^53, e.g. nanosecond epochs); `div` truncates toward zero,
    // so correct negatives down to floor semantics like Math.floorDiv.
    def binned(df: DataFrame, valCol: String): DataFrame = {
      val q = expr(s"$rv div $radius")
      df.withColumn(rv, col(valCol))
        .withColumn(bin, when(col(rv) % radius < 0, q - 1).otherwise(q))
    }

    val r = binned(
      right.select(
        keys.map(col) ++
          Seq(col(rightVal)) ++
          payloadOut.map { case (c, out) => col(c).as(out) }: _*),
      rightVal).drop(rightVal)
    val l = binned(left, leftVal)
      .withColumn(bin, explode(array(col(bin) - 1, col(bin), col(bin) + 1)))
      .drop(rv)

    // DECIMAL(38,0) band check: long subtraction wraps silently at the
    // domain extremes under non-ANSI arithmetic (MaxValue - MinValue
    // = -1, |.| = 1 <= radius — a false match for a pair 2^64-1 apart;
    // the bin+1 explode wraps the same way, minting the colliding bin).
    // Decimal is exact over the full long range; it runs only on the
    // band-limited candidate pairs, not the scan.
    l.join(r, keys :+ bin)
      .filter(abs(col(leftVal).cast("decimal(38,0)") -
        col(rv).cast("decimal(38,0)")) <= lit(radius).cast("decimal(38,0)"))
      .drop(bin, rv)
  }
}
