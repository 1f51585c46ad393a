package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DataType

/**
 * Backward as-of join: for each left row, attach the right row with the
 * greatest `rightTs <= leftTs` (inclusive, DuckDB `ASOF JOIN` semantics)
 * within the same key group, or nulls when no right row precedes it.
 *
 * Spark has no native as-of join, and the naive encodings are
 * scale-hostile: an inequality theta-join degenerates to a per-key cross
 * product, and "join all pairs then pick max(rightTs)" shuffles the
 * candidate pairs (|left| x |right| per key) instead of the rows. This
 * implementation is the sort-merge formulation: tag both sides, union
 * them (a zero-shuffle concat of the two scans), and run ONE window over
 * (keys, ts) in which each left row picks up the last-seen right payload
 * via `last(_, ignoreNulls)` over an unbounded-preceding frame. Exactly
 * one shuffle (the window's hash partitioning on `keys`) and one sort per
 * partition — the same data movement as a plain equi-join on the keys, so
 * it survives a 100 TB scale-up as long as the key (e.g. user_id) has
 * cluster-scale cardinality. Hot keys cost one sorted partition each, the
 * standard skew profile for windowed sessionization.
 *
 * The payload travels as ONE struct column, so every output column comes
 * from the SAME matched right row even when individual payload values are
 * null (per-column `last(ignoreNulls)` would tear the row by skipping
 * back to an older right row for just the null field).
 *
 * Determinism under timestamp ties: right rows sort BEFORE left rows at
 * equal ts (inclusive match), and among right rows with identical ts the
 * `rightTieBreak` columns order them so "last seen" is the max tie-break
 * row regardless of partitioning.
 *
 * No analog in the reference engine (its only temporal data is manifest
 * metadata, format/storage.cpp:51-53) — this is pipeline-extension
 * surface for event-log feature joins.
 */
object AsOfJoin {

  /**
   * @param left          rows to enrich (all its columns are preserved)
   * @param right         rows providing the as-of payload
   * @param keys          equi-join keys present on both sides
   * @param leftTs        ordering column on `left`
   * @param rightTs       ordering column on `right`
   * @param rightPayload  right column -> output column name; output names
   *                      must not collide with `left` columns
   * @param rightTieBreak right columns ordering equal-ts right rows
   *                      (ascending; the max combination wins)
   */
  def backward(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTs: String,
      rightTs: String,
      rightPayload: Map[String, String],
      rightTieBreak: Seq[String] = Nil): DataFrame = {
    val payloadOut = rightPayload.toSeq.sortBy(_._2)
    val leftOther = left.columns.filterNot(keys.contains).toSeq
    require(payloadOut.forall { case (_, out) => !left.columns.contains(out) },
      s"payload output names ${payloadOut.map(_._2)} collide with left columns")

    def nullOf(df: DataFrame, c: String): Column =
      lit(null).cast(df.schema(c).dataType)

    val ts = "_asof_ts"
    val tag = "_asof_tag"
    val pay = "_asof_payload"
    val tb = rightTieBreak.zipWithIndex.map { case (_, i) => s"_asof_tb_$i" }
    // working names are selected into the union and consumed at the end —
    // a user column with one of these names would be silently destroyed
    require(!left.columns.exists(c => c.startsWith("_asof_")) &&
      !right.columns.exists(c => c.startsWith("_asof_")),
      "'_asof_*' column names are reserved working names")

    val payloadStruct: Column =
      struct(payloadOut.map { case (c, out) => col(c).as(out) }: _*)
    val payloadNull: Column = lit(null).cast(
      org.apache.spark.sql.types.StructType(payloadOut.map { case (c, out) =>
        org.apache.spark.sql.types.StructField(out, right.schema(c).dataType)
      }))

    // Union schema: keys, ts, tag, tie-breaks, left payload, right payload.
    // A null rightTs can never satisfy rightTs <= leftTs — but under the
    // window's ascending (nulls-first) ts order it would sort before
    // EVERY row and become a spurious "preceding" match for left rows
    // that have no true predecessor; drop such rows up front.
    // Null equi-keys likewise never match in equi-join (and DuckDB ASOF)
    // semantics, but Window.partitionBy groups null keys into ONE
    // partition where they would match each other — drop null-key right
    // rows too (null-key LEFT rows then share a partition with no right
    // rows and correctly come back with null payload).
    // foldLeft over lit(true), not reduce: an empty key list (global
    // as-of join over one timeline) is valid — Window.partitionBy() with
    // no columns is the global window — and reduce would throw on it
    val rightKeysLive = keys.map(col(_).isNotNull).foldLeft(lit(true))(_ && _)
    val rightRows = right.filter(col(rightTs).isNotNull && rightKeysLive).select(
      keys.map(col) ++
        Seq(col(rightTs).as(ts), lit(0).as(tag)) ++
        rightTieBreak.zip(tb).map { case (c, a) => col(c).as(a) } ++
        leftOther.map(c => nullOf(left, c).as(c)) :+
        payloadStruct.as(pay): _*)
    val leftRows = left.select(
      keys.map(col) ++
        Seq(col(leftTs).as(ts), lit(1).as(tag)) ++
        rightTieBreak.zip(tb).map { case (c, a) => nullOf(right, c).as(a) } ++
        leftOther.map(col) :+
        payloadNull.as(pay): _*)

    val w = Window
      .partitionBy(keys.map(col): _*)
      // plain asc (nulls FIRST) on the tie-breaks: `last()` picks the
      // final right row of an equal-ts run, so the max tie-break wins as
      // documented — nulls_last would let a null-tie-break right row
      // beat every real one. (tag already separates left rows, whose
      // tie-break columns are all null, from this ordering.)
      .orderBy(col(ts).asc +: col(tag).asc +: tb.map(col(_).asc): _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val carried = rightRows.unionByName(leftRows)
      .withColumn("_asof_hit", last(col(pay), ignoreNulls = true).over(w))

    carried
      .filter(col(tag) === 1)
      .select(
        keys.map(col) ++
          Seq(col(ts).as(leftTs)) ++
          leftOther.filterNot(_ == leftTs).map(col) ++
          payloadOut.map { case (_, out) => col(s"_asof_hit.$out").as(out) }: _*)
  }
}
