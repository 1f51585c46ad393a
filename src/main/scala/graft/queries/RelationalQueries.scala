package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, LongType}

import graft.Tables

/**
 * Relational coverage queries over the TPC-H-ish tables.
 *
 * Cross-engine float determinism: money columns are 2-dp decimals stored as
 * doubles, so they cast to DECIMAL exactly; all arithmetic then stays in
 * DECIMAL (exact, associative — immune to partial-aggregation order) and
 * only the final value is cast to DOUBLE. Arbitrary doubles (events.value)
 * are summed as integer "cents" via floor(), which both engines compute
 * identically. Never cast a computed DOUBLE to DECIMAL: Spark routes that
 * cast through the shortest string representation while DuckDB rounds the
 * binary value, and the results can differ in the last place.
 */
object RelationalQueries {

  private def dec(c: String) = col(c).cast(DecimalType(18, 2))

  /** l_extendedprice * (1 - l_discount), computed exactly in decimal. */
  private def discPrice =
    dec("l_extendedprice") * (lit(1).cast(DecimalType(3, 2)) - dec("l_discount"))

  private val sqlDiscPrice =
    "CAST(l_extendedprice AS DECIMAL(18,2)) * " +
      "(CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(18,2)))"

  /** TPC-H Q1-style pricing summary. */
  private def q1Agg(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "lineitem")
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        sum(dec("l_quantity")).cast("double").as("sum_qty"),
        sum(dec("l_extendedprice")).cast("double").as("sum_base_price"),
        sum(discPrice).cast("double").as("sum_disc_price"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")

  /** Join + group: revenue per nation of the supplier (broadcast-join shape). */
  private def q3Join(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables(spark, dir, "lineitem")
    val sup = Tables(spark, dir, "supplier")
    val nat = Tables(spark, dir, "nation")
    li.join(broadcast(sup), li("l_suppkey") === sup("s_suppkey"))
      .join(broadcast(nat), sup("s_nationkey") === nat("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(
        sum(discPrice).cast("double").as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy("n_name")
  }

  /**
   * Runtime Bloom-filter join pruning ([[graft.operators.BloomJoin]]): the
   * fact scan drops lineitems whose order key cannot match the filtered
   * dim side BEFORE the join shuffle — at 100 TB the sketch (~1.2 B/key)
   * replaces ~80% of the shuffle with a two-hash probe per row, and the
   * exact join that follows removes the false positives, so results are
   * bit-identical to the plain join the oracle runs.
   */
  private def qBloomJoin(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables(spark, dir, "lineitem")
    val hot = Tables(spark, dir, "orders")
      .filter(col("o_totalprice") > 400000.0)
    graft.operators.BloomJoin.innerJoin(li, "l_orderkey", hot, "o_orderkey")
      .groupBy("o_orderpriority")
      .agg(
        sum(discPrice).cast("double").as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy("o_orderpriority")
  }

  /** Window/top-n per group: top 3 orders by price within each priority. */
  private def topOrders(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables(spark, dir, "orders")
    val w = Window.partitionBy("o_orderpriority")
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
    o.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .select(col("o_orderpriority"), col("o_orderkey"), col("o_totalprice"),
        col("rn").as("rank_in_priority"))
      .orderBy("o_orderpriority", "rank_in_priority")
  }

  /**
   * events.ts is TIMESTAMP(NANOS) parquet. How Spark reads it is
   * version-dependent: 3.x only reads it as a nanosecond LONG (behind
   * spark.sql.legacy.parquet.nanosAsLong); 4.1+ ignores that conf and
   * resolves it as TIMESTAMP_NTZ (micros, wall clock). Branch on the
   * dtype actually read rather than trusting any conf. Session timezone
   * is UTC everywhere (Verify/Bench/tests), so NTZ wall-clock arithmetic
   * matches DuckDB's naive-timestamp oracle exactly.
   */
  private def eventsWithTs(spark: SparkSession, dir: String): (DataFrame, Boolean) = {
    // harmless on Spark 4.1+ (inert); required for the read to succeed on 3.x
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val ev = Tables(spark, dir, "events")
    (ev, ev.schema("ts").dataType == LongType)
  }

  /**
   * Hourly event rollup; the hour bucket is formatted as a string so both
   * engines compare the same value. value is an arbitrary double -> summed
   * as floor() cents.
   */
  /** Hour bucket of events.ts under either read dtype (see eventsWithTs). */
  private def hourBucket(tsIsLong: Boolean): Column =
    if (tsIsLong)
      // integer div: `/` on LONGs is DOUBLE division, and nanosecond epochs
      // exceed 2^53 — a double round-trip mis-buckets events near boundaries
      timestamp_seconds(expr("ts div 3600000000000") * 3600)
    else
      date_trunc("hour", col("ts"))

  private def eventsHourly(spark: SparkSession, dir: String): DataFrame = {
    val (ev, tsIsLong) = eventsWithTs(spark, dir)
    val hourTs: Column = hourBucket(tsIsLong)
    ev
      .withColumn("hour", date_format(hourTs, "yyyy-MM-dd HH:mm:ss"))
      .groupBy("hour", "event_type")
      .agg(
        count(lit(1)).as("n_events"),
        sum(floor(col("value") * 100).cast("long")).as("sum_value_cents"))
      .orderBy("hour", "event_type")
  }

  /**
   * Rank-family window coverage: dense_rank / percent_rank / cume_dist
   * over a deliberately tie-rich bucket ordering (rank semantics over
   * peers are the point), and ntile over a fully deterministic
   * (price, key) order — ntile splits peer groups by physical row order,
   * so a tie-rich ordering would be nondeterministic across engines.
   */
  private def qRankFamily(spark: SparkSession, dir: String): DataFrame = {
    // r21 rewrite (guide §2.3 "shuffle keys and metadata instead of
    // payloads", §2.5 low-cardinality partition keys): the direct
    // formulation stacked TWO full sorts + window passes over every order
    // row, hash-partitioned on the 5-value o_orderpriority — parallelism
    // capped at 5 tasks at ANY scale, and the hot priority a guaranteed
    // straggler at 100 TB.
    //
    // Every requested value is a closed-form function of per-(priority,
    // price_bucket) ROW COUNTS plus an in-bucket row_number, because the
    // wb ordering (price_bucket DESC) has tie groups = buckets and the wt
    // ordering (o_totalprice DESC, key) never interleaves buckets
    // (floor(price/1e4) is monotone in price, so bucket order IS coarse
    // price order; ties in price share a bucket):
    //   dense_rank   = position of the bucket among the priority's
    //                  distinct buckets in DESC order
    //   percent_rank = n_before / (n_total - 1)    [0 when n_total = 1]
    //   cume_dist    = (n_before + cnt) / n_total
    //   ntile(4)     = the SQL ntile closed form over the global
    //                  rn = n_before + row_number-within-bucket
    // with n_before = rows in strictly-higher buckets of the same
    // priority. Both engines DEFINE the rank family by exactly these
    // integer formulas (same integer operands -> same double division ->
    // bit-identical), and the driver's DuckDB oracle re-gates that.
    //
    // Plan shape: the counts aggregate map-side to |priority| x |bucket|
    // rows (bounded: buckets are price/1e4 steps), the window machinery
    // runs over THAT tiny frame, and the fact rows take ONE sort,
    // partitioned on (priority, bucket) — two orders of magnitude more
    // partition keys than the 5-value key the wb window forced.
    val o = Tables(spark, dir, "orders")
      .withColumn("price_bucket", floor(col("o_totalprice") / 10000).cast("long"))
      .select("o_orderpriority", "o_orderkey", "o_totalprice", "price_bucket")
    val wS = Window.partitionBy("o_orderpriority").orderBy(col("price_bucket").desc)
    val stats = o.groupBy("o_orderpriority", "price_bucket")
      .agg(count(lit(1)).as("cnt"))
      .select(
        col("o_orderpriority").as("p_priority"), col("price_bucket").as("p_bucket"),
        col("cnt"),
        coalesce(
          sum("cnt").over(wS.rowsBetween(Window.unboundedPreceding, -1)), lit(0L))
          .as("n_before"),
        row_number().over(wS).as("drk"),
        sum("cnt").over(Window.partitionBy("o_orderpriority")).as("n_total"))
    // null-safe join keys: equality join would silently drop a null
    // bucket/priority row the window formulation kept as a peer group
    val joined = o.join(broadcast(stats),
      col("o_orderpriority") <=> col("p_priority") &&
        col("price_bucket") <=> col("p_bucket"))
    val wIn = Window.partitionBy("o_orderpriority", "price_bucket")
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
    joined
      .withColumn("rn", col("n_before") + row_number().over(wIn))
      .selectExpr(
        "o_orderpriority", "o_orderkey", "price_bucket",
        "drk",
        "CASE WHEN n_total > 1 THEN CAST(n_before AS DOUBLE) / CAST(n_total - 1 AS DOUBLE) ELSE CAST(0 AS DOUBLE) END AS prk",
        "CAST(n_before + cnt AS DOUBLE) / CAST(n_total AS DOUBLE) AS cd",
        // ntile(4) closed form: the first (n % 4) buckets hold
        // (n div 4 + 1) rows, the rest (n div 4); n < 4 always lands in
        // the THEN arm (threshold = n), so the ELSE's div-by-zero branch
        // is never evaluated
        """CAST(CASE WHEN rn <= (n_total % 4) * ((n_total div 4) + 1)
          |     THEN (rn - 1) div ((n_total div 4) + 1) + 1
          |     ELSE (n_total % 4) +
          |          (rn - (n_total % 4) * ((n_total div 4) + 1) - 1) div (n_total div 4) + 1
          |     END AS INT) AS quartile""".stripMargin)
      .orderBy("o_orderpriority", "o_orderkey")
  }

  /**
   * Sliding (hopping) windows — the third time-window family next to
   * tumbling (events_hourly) and session (q_sessions): 1-hour windows
   * every 30 minutes, so each event lands in exactly two windows. The
   * NTZ path uses Spark's own `window()` (the TimeWindowing rule expands
   * the slide into the per-row window set); the legacy LONG-nanos path
   * derives the two window starts arithmetically. Window starts align to
   * the epoch 30-minute grid in both engines.
   */
  private def eventsSliding(spark: SparkSession, dir: String): DataFrame = {
    val (ev, tsIsLong) = eventsWithTs(spark, dir)
    val agged =
      if (tsIsLong)
        ev.withColumn("k", explode(array(lit(0L), lit(1L))))
          .withColumn("win_start",
            date_format(
              timestamp_seconds((expr("ts div 1800000000000") - col("k")) * 1800),
              "yyyy-MM-dd HH:mm:ss"))
          .groupBy(col("win_start"), col("event_type"))
      else
        ev.groupBy(window(col("ts"), "1 hour", "30 minutes").as("win"),
          col("event_type"))
    val out = agged.agg(
      count(lit(1)).as("n_events"),
      sum(floor(col("value") * 100).cast("long")).as("sum_value_cents"))
    val named =
      if (tsIsLong) out
      else out
        .withColumn("win_start", date_format(col("win.start"), "yyyy-MM-dd HH:mm:ss"))
        .drop("win")
    named.select("win_start", "event_type", "n_events", "sum_value_cents")
      .orderBy("win_start", "event_type")
  }

  /** Semi/anti join coverage: customers with vs without any order. */
  private def qSemiAnti(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables(spark, dir, "customer")
    val o = Tables(spark, dir, "orders")
    val withO = c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
      .select(col("c_custkey"), lit("has_orders").as("status"))
    val withoutO = c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
      .select(col("c_custkey"), lit("no_orders").as("status"))
    withO.unionAll(withoutO).orderBy("c_custkey")
  }

  /**
   * Correlated-subquery coverage: orders priced above their customer's
   * average, expressed as actual correlated scalar subqueries through the
   * SQL surface — Catalyst decorrelates them into the aggregate+join the
   * DataFrame formulation would write by hand. The comparison is
   * "n·price > sum" in exact integer cents, never "price > sum/n": an
   * average divides, and decimal-vs-double division rounding could flip
   * boundary rows (every single-order customer IS a boundary row) between
   * engines.
   */
  private def qAboveAvg(spark: SparkSession, dir: String): DataFrame = {
    Tables(spark, dir, "orders").createOrReplaceTempView("graft_orders_sub")
    spark.sql(
      """SELECT o_orderkey, o_custkey, o_totalprice
        |FROM graft_orders_sub o
        |WHERE CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) *
        |    (SELECT count(*) FROM graft_orders_sub i
        |     WHERE i.o_custkey = o.o_custkey)
        |  > (SELECT CAST(sum(CAST(i.o_totalprice AS DECIMAL(18,2)) * 100) AS BIGINT)
        |     FROM graft_orders_sub i WHERE i.o_custkey = o.o_custkey)""".stripMargin)
      .orderBy("o_orderkey")
  }

  /** Full-outer-join coverage (completes the join-type family): nations'
    * customer counts vs their HIGH-BALANCE supplier counts — the balance
    * filter guarantees unmatched rows on both null-filled sides. */
  private def qFullOuter(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables(spark, dir, "customer")
      .groupBy("c_nationkey").agg(count(lit(1)).as("n_cust"))
    val s = Tables(spark, dir, "supplier")
      .filter(col("s_acctbal") > 9000.0)
      .groupBy("s_nationkey").agg(count(lit(1)).as("n_supp"))
    c.join(s, c("c_nationkey") === s("s_nationkey"), "full_outer")
      .select(
        coalesce(c("c_nationkey"), s("s_nationkey")).as("nationkey"),
        col("n_cust"), col("n_supp"))
      .orderBy("nationkey")
  }

  /** Finest-level (flag, status) aggregate feeding the rollup/cube
    * rewrites: exact decimal sums + counts, re-aggregable losslessly
    * (decimal addition is associative; count re-sums). Bounded output:
    * both keys are tiny enumerated domains (|flag| x |status| <= 6 at any
    * scale). */
  private def qtyByFlagStatus(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "lineitem")
      .groupBy("l_returnflag", "l_linestatus")
      .agg(sum(dec("l_quantity")).as("q"), count(lit(1)).as("n0"))

  /** Rollup coverage: subtotal + grand-total rows with grouping ids.
    *
    * r21 (guide §2.3 "aggregate before you shuffle"): rollup over the raw
    * table ran the Expand BELOW the partial aggregate — every input row
    * tripled (one copy per grouping set) before any reduction, so the
    * scan stage did 3x the aggregate updates. Rolling up the finest
    * (flag, status) aggregate instead is exact (decimal sums re-add
    * associatively; counts re-sum) and uses the SAME rollup/grouping_id
    * machinery, so gids, null-filled group columns and output types are
    * identical by construction — the Expand now multiplies <= 6 rows. */
  private def qRollup(spark: SparkSession, dir: String): DataFrame =
    qtyByFlagStatus(spark, dir)
      .rollup("l_returnflag", "l_linestatus")
      .agg(
        grouping_id().cast("int").as("gid"),
        sum(col("q")).cast("double").as("sum_qty"),
        sum(col("n0")).as("n"))
      .orderBy(col("gid"),
        col("l_returnflag").asc_nulls_first,
        col("l_linestatus").asc_nulls_first)
      .select("gid", "l_returnflag", "l_linestatus", "sum_qty", "n")

  /** Cube coverage: all four grouping combinations with grouping ids —
    * completes the rollup/cube pair in the §2.8 checklist. Same
    * finest-aggregate-first shape as [[qRollup]] (r21, guide §2.3): the
    * cube's 4-way Expand multiplies the 6-row fine aggregate, not the
    * fact table. */
  private def qCube(spark: SparkSession, dir: String): DataFrame =
    qtyByFlagStatus(spark, dir)
      .cube("l_returnflag", "l_linestatus")
      .agg(
        grouping_id().cast("int").as("gid"),
        sum(col("q")).cast("double").as("sum_qty"),
        sum(col("n0")).as("n"))
      .orderBy(col("gid"),
        col("l_returnflag").asc_nulls_first,
        col("l_linestatus").asc_nulls_first)
      .select("gid", "l_returnflag", "l_linestatus", "sum_qty", "n")

  /** Set-operator coverage: INTERSECT / EXCEPT between two derived key
    * sets (customers with orders vs customers in the first ten nations),
    * tagged and unioned so one result carries both. */
  private def qSetOps(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables(spark, dir, "customer")
    val o = Tables(spark, dir, "orders")
    val withOrders = c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
      .select(col("c_custkey"))
    val lowNation = c.filter(col("c_nationkey") < 10).select(col("c_custkey"))
    val both = withOrders.intersect(lowNation)
      .select(col("c_custkey"), lit("both").as("tag"))
    val onlyOrders = withOrders.except(lowNation)
      .select(col("c_custkey"), lit("orders_only").as("tag"))
    both.unionAll(onlyOrders).orderBy("c_custkey", "tag")
  }

  /**
   * Sessionization as a batch window query: per user, a session break is a
   * gap > 30 min from the previous event; session count = 1 + number of
   * breaks. ts dtype is version-dependent (see eventsWithTs).
   */
  private def qSessions(spark: SparkSession, dir: String): DataFrame = {
    val (ev, tsIsLong) = eventsWithTs(spark, dir)
    val gapExceeded: Column =
      if (tsIsLong) col("ts") - col("prev_ts") > lit(30L * 60 * 1000000000L)
      else
        // micros difference is timezone-invariant; NTZ nanos were already
        // truncated to micros by the read, matching the 30-min threshold
        unix_micros(col("ts").cast("timestamp")) -
          unix_micros(col("prev_ts").cast("timestamp")) > lit(30L * 60 * 1000000L)
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ev
      .withColumn("prev_ts", lag(col("ts"), 1).over(w))
      .withColumn("brk",
        when(col("prev_ts").isNull || gapExceeded, 1)
          .otherwise(0))
      .groupBy("user_id")
      .agg(
        sum(col("brk")).as("n_sessions"),
        count(lit(1)).as("n_events"))
      .orderBy("user_id")
  }

  /**
   * HLL++ approximate distinct per group — the sketch every 100 TB
   * distinct-count rolls through (exact countDistinct shuffles every
   * distinct value; the sketch shuffles a fixed-size buffer per group).
   * DuckDB's approx_count_distinct is a different sketch, so the raw
   * estimates can't hash-match; instead the entry emits the exact counts
   * plus a tolerance predicate (|apx - exact| / exact <= 0.05) and the
   * oracle recomputes the exact counts and asserts literal TRUE — the
   * hash gate then passes iff the HLL++ estimate stays in-band, a real
   * accuracy gate rather than a rows-only check. The ScalaTest spec pins
   * the tighter <2% error envelope. Bench note: this entry DELIBERATELY
   * times sketch + exact together (the tolerance gate needs both
   * in-plan); the exact-only cost is the separate q_distinct entry, so
   * sketch-vs-exact remains readable from the pair.
   */
  private def qApproxDistinct(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables(spark, dir, "lineitem")
    // The sketches run in a SEPARATE aggregation from the exact distinct
    // counts: mixed into the multi-distinct Expand plan, each ~5.5 KB HLL
    // buffer is carried per (group, gid, distinct-value) PARTIAL group —
    // hundreds of thousands of sketch buffers built, spilled and shuffled
    // (measured 6x the runtime of the exact counts alone at sf0.1).
    // Split, the sketches live per final group only and the two 5-row
    // aggregates broadcast-join back. At 100 TB this is the only shape
    // that survives: sketch buffers must never ride a distinct Expand.
    val exact = li.groupBy("l_returnflag").agg(
      countDistinct(col("l_partkey")).as("n_parts_exact"),
      countDistinct(col("l_suppkey")).as("n_supps_exact"))
    val approx = li.groupBy("l_returnflag").agg(
      approx_count_distinct(col("l_partkey"), rsd = 0.02).as("apx_parts"),
      approx_count_distinct(col("l_suppkey"), rsd = 0.02).as("apx_supps"))
    exact.join(approx, Seq("l_returnflag"))
      .select(col("l_returnflag"),
        col("n_parts_exact"), col("n_supps_exact"),
        (abs(col("apx_parts") - col("n_parts_exact")) /
          col("n_parts_exact") <= 0.05).as("parts_within_5pct"),
        (abs(col("apx_supps") - col("n_supps_exact")) /
          col("n_supps_exact") <= 0.05).as("supps_within_5pct"))
      .orderBy("l_returnflag")
  }

  /** Distinct aggregation: exact distinct counts per group. */
  private def qDistinct(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "lineitem")
      .groupBy("l_returnflag")
      .agg(
        countDistinct(col("l_partkey")).as("n_parts"),
        countDistinct(col("l_suppkey")).as("n_supps"),
        count(lit(1)).as("n_rows"))
      .orderBy("l_returnflag")

  /** Ordered-set aggregation: exact linear-interpolated percentiles —
    * Spark `percentile` and DuckDB `quantile_cont` share the
    * interpolation, so doubles match bitwise on sorted exact values. */
  private def qPercentiles(spark: SparkSession, dir: String): DataFrame = {
    val (ev, tsIsLong) = eventsWithTs(spark, dir)
    ev
      .groupBy("event_type")
      .agg(
        expr("percentile(value, 0.5)").as("p50"),
        expr("percentile(value, 0.95)").as("p95"),
        // touches the ts read path so a Spark dtype change breaks THIS
        // oracle row too, not just the events_hourly/q_sessions pair
        countDistinct(hourBucket(tsIsLong)).as("n_hours"),
        count(lit(1)).as("n"))
      .orderBy("event_type")
  }

  /**
   * As-of join: every purchase picks up the user's most recent click at or
   * before it ([[graft.operators.AsOfJoin]] — one shuffle on user_id).
   * Timestamps are emitted as epoch micros so both engines compare exact
   * integers under either read dtype.
   */
  /** Epoch-micros projection of a ts column under either read dtype. */
  private def tsUs(tsIsLong: Boolean)(c: String): Column =
    if (tsIsLong) expr(s"$c div 1000")
    else unix_micros(col(c).cast("timestamp"))

  /**
   * Pivot: event_type rotated into wide columns of exact cent sums per
   * user — the wide-format export surface. Pivot values are pinned (the
   * five known types) so plan construction needs no distinct-scan job;
   * absent (user, type) combinations stay NULL, matching SQL
   * FILTER-aggregate semantics. One shuffle on user_id, partial
   * aggregation map-side.
   */
  private def eventsPivot(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "events")
      .groupBy("user_id")
      .pivot("event_type", Seq("click", "error", "purchase", "signup", "view"))
      .agg(sum(floor(col("value") * 100).cast("long")))
      .orderBy("user_id")

  /**
   * Unpivot (melt) coverage — the long-format export surface and the
   * inverse of [[eventsPivot]]: the wide per-user cent matrix rotates
   * back to (user_id, event_type, cents) rows, absent combinations
   * (NULL cells) dropped. The oracle is the roundtrip identity:
   * unpivot(pivot(events)) must equal the plain groupBy — pinning both
   * rotations against each other and the raw data at once.
   */
  private def eventsUnpivot(spark: SparkSession, dir: String): DataFrame =
    eventsPivot(spark, dir)
      .unpivot(
        Array(col("user_id")),
        Array(col("click"), col("error"), col("purchase"),
          col("signup"), col("view")),
        "event_type", "cents")
      .filter(col("cents").isNotNull)
      .orderBy("user_id", "event_type")

  /**
   * RANGE-frame window: per-customer rolling 30-day spend over orders —
   * the time-bounded running aggregate (RANGE, not ROWS, so tied order
   * dates aggregate as peers identically in both engines). The ordering
   * key is exact epoch micros; money stays decimal until the final cast.
   */
  private def qRangeWindow(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables(spark, dir, "orders")
      .withColumn("ts_us", unix_micros(col("o_orderdate").cast("timestamp")))
    val w = Window.partitionBy("o_custkey").orderBy(col("ts_us"))
      .rangeBetween(-30L * 86400 * 1000000, 0)
    o.withColumn("spend_30d", sum(dec("o_totalprice")).over(w).cast("double"))
      .withColumn("n_30d", count(lit(1)).over(w))
      .select("o_orderkey", "o_custkey", "ts_us", "spend_30d", "n_30d")
      .orderBy("o_orderkey")
  }

  /**
   * Conversion funnel: first view -> first click strictly after it ->
   * first purchase strictly after that, per user — ordered event-pattern
   * matching as three aggregate passes (each a map-side-combined min on
   * the user key, so the fact table never sorts). Broadcastable
   * stage-to-stage joins: each stage's output is one row per surviving
   * user.
   */
  private def eventsFunnel(spark: SparkSession, dir: String): DataFrame = {
    val (ev0, tsIsLong) = eventsWithTs(spark, dir)
    val ev = ev0.select(col("user_id"), col("event_type"),
      tsUs(tsIsLong)("ts").as("ts_us"))
    val views = ev.filter(col("event_type") === "view")
      .groupBy("user_id").agg(min("ts_us").as("t_view"))
    val clicks = ev.filter(col("event_type") === "click")
      .join(broadcast(views), "user_id")
      .filter(col("ts_us") > col("t_view"))
      .groupBy("user_id").agg(min("ts_us").as("t_click"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .join(broadcast(clicks), "user_id")
      .filter(col("ts_us") > col("t_click"))
      .groupBy("user_id").agg(min("ts_us").as("t_purchase"))
    views
      .join(clicks, Seq("user_id"), "left")
      .join(purchases, Seq("user_id"), "left")
      .select(col("user_id"), col("t_view"), col("t_click"), col("t_purchase"),
        col("t_purchase").isNotNull.as("converted"))
      .orderBy("user_id")
  }

  /**
   * Cohort retention: users bucketed by first-seen hour; for each
   * (cohort, hour-offset) the distinct returning users — the standard
   * retention triangle. Two aggregations ((user, hour) distinct, then
   * the triangle) plus one broadcastable first-seen join.
   */
  private def eventsRetention(spark: SparkSession, dir: String): DataFrame = {
    val (ev0, tsIsLong) = eventsWithTs(spark, dir)
    val activity = ev0
      .select(col("user_id"), tsUs(tsIsLong)("ts").as("ts_us"))
      // integer div — `/` on longs is double division, and a quotient
      // landing on a representability boundary could round into the
      // next hour bucket
      .select(col("user_id"), expr("ts_us div 3600000000").as("hour"))
      .distinct()
    val firsts = activity.groupBy("user_id").agg(min("hour").as("cohort_hour"))
    activity.join(broadcast(firsts), "user_id")
      .groupBy(col("cohort_hour"), (col("hour") - col("cohort_hour")).as("offset_hours"))
      .agg(countDistinct(col("user_id")).as("n_users"))
      .orderBy("cohort_hour", "offset_hours")
  }

  /**
   * Statistical aggregates from EXACT integer moments: variance and
   * Pearson correlation derived at the very end from long-typed sums
   * (quantity cents <= 5e3, discount permille <= 1e2 — every
   * intermediate stays far under 2^53, so the final double arithmetic
   * is bit-identical across engines; a plain `corr()` over doubles
   * would be partial-aggregation-order dependent).
   */
  private def qStats(spark: SparkSession, dir: String): DataFrame = {
    val q = (dec("l_quantity") * 100).cast("long")
    val d = (dec("l_discount") * 1000).cast("long")
    Tables(spark, dir, "lineitem")
      .select(col("l_returnflag"), q.as("q"), d.as("d"))
      .groupBy("l_returnflag")
      .agg(
        count(lit(1)).as("n"),
        sum("q").as("sum_q"), sum("d").as("sum_d"),
        sum(col("q") * col("q")).as("sum_q2"),
        sum(col("d") * col("d")).as("sum_d2"),
        sum(col("q") * col("d")).as("sum_qd"))
      .select(
        col("l_returnflag"), col("n"), col("sum_q"), col("sum_d"),
        (col("sum_q").cast("double") / col("n")).as("mean_q_cents"),
        ((col("n") * col("sum_q2") - col("sum_q") * col("sum_q")).cast("double") /
          (col("n") * col("n")).cast("double")).as("var_q"),
        ((col("n") * col("sum_qd") - col("sum_q") * col("sum_d")).cast("double") /
          (sqrt((col("n") * col("sum_q2") - col("sum_q") * col("sum_q")).cast("double")) *
            sqrt((col("n") * col("sum_d2") - col("sum_d") * col("sum_d")).cast("double"))))
          .as("corr_qd"))
      .orderBy("l_returnflag")
  }

  /** GROUPING SETS — the explicit-combination sibling of rollup/cube
    * (here: by flag, by status, and the grand total, but NOT the pair).
    * Same finest-aggregate-first shape as [[qRollup]] (r21, guide §2.3):
    * the 3-way grouping-sets Expand multiplies the 6-row (flag, status)
    * aggregate instead of tripling every fact row below the partial
    * aggregate. Exact: decimal sums re-add associatively, counts re-sum,
    * and grouping_id comes from the same GROUPING SETS machinery. */
  private def qGroupingSets(spark: SparkSession, dir: String): DataFrame = {
    Tables(spark, dir, "lineitem").createOrReplaceTempView("graft_li_gs")
    spark.sql(
      """WITH fine AS (
        |  SELECT l_returnflag, l_linestatus,
        |    sum(CAST(l_quantity AS DECIMAL(18,2))) AS q, count(1) AS n0
        |  FROM graft_li_gs GROUP BY l_returnflag, l_linestatus)
        |SELECT CAST(grouping_id() AS INT) AS gid, l_returnflag, l_linestatus,
        |  CAST(sum(q) AS DOUBLE) AS sum_qty,
        |  sum(n0) AS n
        |FROM fine
        |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())""".stripMargin)
      .orderBy(col("gid"),
        col("l_returnflag").asc_nulls_first,
        col("l_linestatus").asc_nulls_first)
  }

  /** Morton (Z-order) clustering keys over (user bucket, hour bucket) —
    * the layout key [[graft.operators.ZOrder.cluster]] sorts by so parquet
    * row-group stats prune BOTH dimensions (spec measures the tiles). */
  private def zorderKey(spark: SparkSession, dir: String): DataFrame = {
    val (ev0, tsIsLong) = eventsWithTs(spark, dir)
    val base = ev0
      .select(col("event_id"), (col("user_id") % 1024).as("x"),
        tsUs(tsIsLong)("ts").as("ts_us"))
      .select(col("event_id"), col("x"), expr("ts_us div 3600000000 % 1024").as("y"))
    base.select(col("event_id"), col("x"), col("y"),
      graft.operators.ZOrder.zvalue(col("x"), col("y"), 16).as("z"))
      .orderBy("event_id")
  }

  private def eventsAsOf(spark: SparkSession, dir: String): DataFrame = {
    val (ev, tsIsLong) = eventsWithTs(spark, dir)
    val toUs = tsUs(tsIsLong) _
    val purchases = ev.filter(col("event_type") === "purchase")
      .select("event_id", "user_id", "ts", "value")
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts"),
        col("event_id").as("c_eid"), col("value").as("c_value"))
    graft.operators.AsOfJoin
      .backward(purchases, clicks, Seq("user_id"), "ts", "ts",
        rightPayload = Map("ts" -> "click_ts", "c_value" -> "click_value"),
        rightTieBreak = Seq("c_eid"))
      .select(
        col("event_id"), col("user_id"),
        toUs("ts").as("ts_us"),
        col("value").as("purchase_value"),
        toUs("click_ts").as("click_ts_us"),
        col("click_value"))
      .withColumn("lag_us", col("ts_us") - col("click_ts_us"))
      .orderBy("event_id")
  }

  /**
   * Band join: clicks within ±5 minutes of each error event by the same
   * user ([[graft.operators.RangeJoin]] — binned equi-join, shuffle volume
   * 3|errors| + |clicks| instead of a per-user nested loop). Errors with
   * no nearby click survive with zero counts via the join-back.
   */
  private def eventsRangeJoin(spark: SparkSession, dir: String): DataFrame = {
    val (ev, tsIsLong) = eventsWithTs(spark, dir)
    val base = ev.withColumn("ts_us", tsUs(tsIsLong)("ts"))
    val errors = base.filter(col("event_type") === "error")
      .select("event_id", "user_id", "ts_us")
    val clicks = base.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts_us"), col("value").as("c_value"))
    val pairs = graft.operators.RangeJoin.band(
      errors, clicks, Seq("user_id"), "ts_us", "ts_us",
      radius = 5L * 60 * 1000000,
      rightPayload = Map("c_value" -> "click_value"))
    val agg = pairs.groupBy("event_id").agg(
      count(lit(1)).as("n_nearby"),
      sum(floor(col("click_value") * 100)).cast("long").as("click_cents"))
    errors.join(agg, Seq("event_id"), "left")
      .select(col("event_id"), col("user_id"),
        coalesce(col("n_nearby"), lit(0L)).as("n_nearby"),
        coalesce(col("click_cents"), lit(0L)).as("click_cents"))
      .orderBy("event_id")
  }

  /**
   * Time-series gap fill: the full (event_type × hour) grid between the
   * corpus bounds, hours with no events kept at zero — the densification
   * step every downstream rate/anomaly computation needs. The grid is
   * generated (types × sequence of hours, both driver-free: bounds ride a
   * 1-row broadcast), so no window scans the fact table twice.
   */
  private def eventsGapFill(spark: SparkSession, dir: String): DataFrame = {
    val (ev, tsIsLong) = eventsWithTs(spark, dir)
    val hourTs = hourBucket(tsIsLong)
    val hourly = ev.select(col("event_type"), hourTs.as("hr"))
      .groupBy("event_type", "hr").agg(count(lit(1)).as("n"))
    val bounds = ev.agg(min(hourTs).as("h0"), max(hourTs).as("h1"))
    val grid = ev.select("event_type").distinct()
      .crossJoin(broadcast(bounds))
      .select(col("event_type"),
        explode(sequence(col("h0"), col("h1"), expr("interval 1 hour")))
          .as("hour_ts"))
    grid.join(hourly,
        grid("event_type") === hourly("event_type") &&
          col("hour_ts") === col("hr"), "left")
      .select(grid("event_type"),
        date_format(col("hour_ts"), "yyyy-MM-dd HH:mm:ss").as("hour"),
        coalesce(col("n"), lit(0L)).as("n_events"))
      .orderBy("event_type", "hour")
  }

  /** Semi-structured extraction: parse the JSON props payload and roll the
    * extracted integer up per event type — all exact-integer outputs. */
  private def eventsJson(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "events")
      .select(col("event_type"),
        get_json_object(col("props"), "$.k").cast("long").as("k"))
      .groupBy("event_type")
      .agg(
        count(lit(1)).as("n_events"),
        sum(col("k")).as("sum_k"),
        min(col("k")).as("min_k"),
        max(col("k")).as("max_k"),
        countDistinct(col("k")).as("n_distinct_k"))
      .orderBy("event_type")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "events_asof" -> (eventsAsOf _),
    "events_pivot" -> (eventsPivot _),
    "events_unpivot" -> (eventsUnpivot _),
    "q_range_window" -> (qRangeWindow _),
    "events_funnel" -> (eventsFunnel _),
    "events_retention" -> (eventsRetention _),
    "zorder_key" -> (zorderKey _),
    "q_stats" -> (qStats _),
    "q_grouping_sets" -> (qGroupingSets _),
    "events_json" -> (eventsJson _),
    "events_range_join" -> (eventsRangeJoin _),
    "q_cube" -> (qCube _),
    "q_setops" -> (qSetOps _),
    "q_approx_distinct" -> (qApproxDistinct _),
    "events_gap_fill" -> (eventsGapFill _),
    "q_percentiles" -> (qPercentiles _),
    "q_distinct" -> (qDistinct _),
    "q1_agg" -> (q1Agg _),
    "q3_join" -> (q3Join _),
    "bloom_join" -> (qBloomJoin _),
    "top_orders_window" -> (topOrders _),
    "q_rank_family" -> (qRankFamily _),
    "events_hourly" -> (eventsHourly _),
    "events_sliding" -> (eventsSliding _),
    "q_semi_anti" -> (qSemiAnti _),
    "q_full_outer" -> (qFullOuter _),
    "q_above_avg" -> (qAboveAvg _),
    "q_rollup" -> (qRollup _),
    "q_sessions" -> (qSessions _),
  )

  val oracleSql: Map[String, String] = Map(
    "zorder_key" ->
      """WITH b AS (SELECT event_id, user_id % 1024 AS x,
        |             epoch_us(ts) // 3600000000 % 1024 AS y FROM events)
        |SELECT event_id, x, y,
        |  CAST(list_sum(list_transform(range(0, 16), bb ->
        |    (((x >> bb) & 1) << (2*bb)) + (((y >> bb) & 1) << (2*bb + 1))))
        |    AS BIGINT) AS z
        |FROM b ORDER BY event_id""".stripMargin,
    "events_funnel" ->
      """WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS ts_us FROM events),
        |v AS (SELECT user_id, min(ts_us) AS t_view FROM e
        |      WHERE event_type = 'view' GROUP BY 1),
        |c AS (SELECT user_id, min(ts_us) AS t_click FROM e JOIN v USING (user_id)
        |      WHERE event_type = 'click' AND ts_us > t_view GROUP BY 1),
        |p AS (SELECT user_id, min(ts_us) AS t_purchase FROM e JOIN c USING (user_id)
        |      WHERE event_type = 'purchase' AND ts_us > t_click GROUP BY 1)
        |SELECT user_id, t_view, t_click, t_purchase,
        |       t_purchase IS NOT NULL AS converted
        |FROM v LEFT JOIN c USING (user_id) LEFT JOIN p USING (user_id)
        |ORDER BY user_id""".stripMargin,
    "events_retention" ->
      """WITH a AS (SELECT DISTINCT user_id,
        |             epoch_us(ts) // 3600000000 AS hour FROM events),
        |f AS (SELECT user_id, min(hour) AS cohort_hour FROM a GROUP BY 1)
        |SELECT cohort_hour, hour - cohort_hour AS offset_hours,
        |       count(DISTINCT user_id) AS n_users
        |FROM a JOIN f USING (user_id)
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q_stats" ->
      """WITH b AS (SELECT l_returnflag,
        |    CAST(CAST(l_quantity AS DECIMAL(18,2)) * 100 AS BIGINT) AS q,
        |    CAST(CAST(l_discount AS DECIMAL(18,2)) * 1000 AS BIGINT) AS d
        |  FROM lineitem),
        |m AS (SELECT l_returnflag, count(*) AS n,
        |        CAST(sum(q) AS BIGINT) AS sum_q, CAST(sum(d) AS BIGINT) AS sum_d,
        |        CAST(sum(q*q) AS BIGINT) AS sum_q2, CAST(sum(d*d) AS BIGINT) AS sum_d2,
        |        CAST(sum(q*d) AS BIGINT) AS sum_qd
        |      FROM b GROUP BY 1)
        |SELECT l_returnflag, n, sum_q, sum_d,
        |  CAST(sum_q AS DOUBLE) / n AS mean_q_cents,
        |  CAST(n*sum_q2 - sum_q*sum_q AS DOUBLE) / CAST(n*n AS DOUBLE) AS var_q,
        |  CAST(n*sum_qd - sum_q*sum_d AS DOUBLE) /
        |    (sqrt(CAST(n*sum_q2 - sum_q*sum_q AS DOUBLE)) *
        |     sqrt(CAST(n*sum_d2 - sum_d*sum_d AS DOUBLE))) AS corr_qd
        |FROM m ORDER BY l_returnflag""".stripMargin,
    "q_grouping_sets" ->
      """SELECT CAST(GROUPING(l_returnflag)*2 + GROUPING(l_linestatus) AS INT) AS gid,
        |  l_returnflag, l_linestatus,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  count(1) AS n
        |FROM lineitem
        |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        |ORDER BY gid, l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin,
    "events_unpivot" ->
      """SELECT user_id, event_type,
        |  CAST(sum(CAST(floor(value * 100) AS BIGINT)) AS BIGINT) AS cents
        |FROM events GROUP BY user_id, event_type
        |ORDER BY user_id, event_type""".stripMargin,
    "events_pivot" ->
      """SELECT user_id,
        |  CAST(sum(CASE WHEN event_type='click' THEN CAST(floor(value*100) AS BIGINT) END) AS BIGINT) AS click,
        |  CAST(sum(CASE WHEN event_type='error' THEN CAST(floor(value*100) AS BIGINT) END) AS BIGINT) AS error,
        |  CAST(sum(CASE WHEN event_type='purchase' THEN CAST(floor(value*100) AS BIGINT) END) AS BIGINT) AS purchase,
        |  CAST(sum(CASE WHEN event_type='signup' THEN CAST(floor(value*100) AS BIGINT) END) AS BIGINT) AS signup,
        |  CAST(sum(CASE WHEN event_type='view' THEN CAST(floor(value*100) AS BIGINT) END) AS BIGINT) AS view
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin,
    "q_range_window" ->
      """WITH o AS (SELECT o_orderkey, o_custkey, epoch_us(o_orderdate) AS ts_us,
        |             CAST(o_totalprice AS DECIMAL(18,2)) AS p FROM orders)
        |SELECT o_orderkey, o_custkey, ts_us,
        |  CAST(sum(p) OVER w AS DOUBLE) AS spend_30d,
        |  count(*) OVER w AS n_30d
        |FROM o
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY ts_us
        |             RANGE BETWEEN 2592000000000 PRECEDING AND CURRENT ROW)
        |ORDER BY o_orderkey""".stripMargin,
    "events_asof" ->
      """WITH p AS (SELECT event_id, user_id, ts, value FROM events
        |           WHERE event_type = 'purchase'),
        |c AS (SELECT user_id, ts, value FROM events WHERE event_type = 'click')
        |SELECT p.event_id, p.user_id, epoch_us(p.ts) AS ts_us,
        |  p.value AS purchase_value, epoch_us(c.ts) AS click_ts_us,
        |  c.value AS click_value, epoch_us(p.ts) - epoch_us(c.ts) AS lag_us
        |FROM p ASOF LEFT JOIN c ON p.user_id = c.user_id AND p.ts >= c.ts
        |ORDER BY p.event_id""".stripMargin,
    "events_range_join" ->
      """WITH e AS (SELECT event_id, user_id, ts FROM events
        |           WHERE event_type = 'error'),
        |c AS (SELECT user_id, ts, value FROM events WHERE event_type = 'click')
        |SELECT e.event_id, e.user_id, count(c.ts) AS n_nearby,
        |  coalesce(CAST(sum(floor(c.value * 100)) AS BIGINT), 0) AS click_cents
        |FROM e LEFT JOIN c ON e.user_id = c.user_id
        |  AND abs(epoch_us(e.ts) - epoch_us(c.ts)) <= 300000000
        |GROUP BY e.event_id, e.user_id ORDER BY e.event_id""".stripMargin,
    "events_gap_fill" ->
      """WITH h AS (SELECT event_type AS et, date_trunc('hour', ts) AS hr,
        |             count(*) AS n
        |           FROM events GROUP BY 1, 2),
        |b AS (SELECT min(date_trunc('hour', ts)) AS h0,
        |             max(date_trunc('hour', ts)) AS h1 FROM events),
        |grid AS (SELECT t.event_type, gs.g AS hour
        |         FROM (SELECT DISTINCT event_type FROM events) t,
        |              (SELECT unnest(generate_series(h0, h1, INTERVAL 1 HOUR))
        |                 AS g FROM b) gs)
        |SELECT grid.event_type,
        |  strftime(grid.hour, '%Y-%m-%d %H:%M:%S') AS hour,
        |  coalesce(h.n, 0) AS n_events
        |FROM grid LEFT JOIN h ON grid.event_type = h.et AND grid.hour = h.hr
        |ORDER BY grid.event_type, hour""".stripMargin,
    "events_json" ->
      """SELECT event_type, count(*) AS n_events,
        |  CAST(sum(CAST(props->>'$.k' AS BIGINT)) AS BIGINT) AS sum_k,
        |  min(CAST(props->>'$.k' AS BIGINT)) AS min_k,
        |  max(CAST(props->>'$.k' AS BIGINT)) AS max_k,
        |  count(DISTINCT CAST(props->>'$.k' AS BIGINT)) AS n_distinct_k
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q_percentiles" ->
      """SELECT event_type,
        |  quantile_cont(value, 0.5) AS p50,
        |  quantile_cont(value, 0.95) AS p95,
        |  count(DISTINCT date_trunc('hour', ts)) AS n_hours,
        |  count(*) AS n
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q_distinct" ->
      """SELECT l_returnflag,
        |  count(DISTINCT l_partkey) AS n_parts,
        |  count(DISTINCT l_suppkey) AS n_supps,
        |  count(*) AS n_rows
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    // the oracle recomputes the exact counts and asserts the tolerance
    // predicates as literal TRUE — the hash gate passes iff Spark's HLL++
    // estimate lands within 5% of exact (see qApproxDistinct scaladoc)
    "q_approx_distinct" ->
      """SELECT l_returnflag,
        |  count(DISTINCT l_partkey) AS n_parts_exact,
        |  count(DISTINCT l_suppkey) AS n_supps_exact,
        |  TRUE AS parts_within_5pct,
        |  TRUE AS supps_within_5pct
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q1_agg" ->
      s"""SELECT l_returnflag, l_linestatus,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
        |  CAST(sum($sqlDiscPrice) AS DOUBLE) AS sum_disc_price,
        |  count(*) AS count_order
        |FROM lineitem GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "bloom_join" ->
      s"""SELECT o_orderpriority,
        |  CAST(sum($sqlDiscPrice) AS DOUBLE) AS revenue,
        |  count(*) AS n_items
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE o_totalprice > 400000
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "q3_join" ->
      s"""SELECT n_name,
        |  CAST(sum($sqlDiscPrice) AS DOUBLE) AS revenue,
        |  count(*) AS n_items
        |FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation ON s_nationkey = n_nationkey
        |GROUP BY n_name ORDER BY n_name""".stripMargin,
    "top_orders_window" ->
      """WITH r AS (SELECT o_orderpriority, o_orderkey, o_totalprice,
        |  CAST(row_number() OVER (PARTITION BY o_orderpriority
        |       ORDER BY o_totalprice DESC, o_orderkey ASC) AS INT) AS rank_in_priority
        |  FROM orders)
        |SELECT o_orderpriority, o_orderkey, o_totalprice, rank_in_priority
        |FROM r WHERE rank_in_priority <= 3
        |ORDER BY o_orderpriority, rank_in_priority""".stripMargin,
    "q_rank_family" ->
      """WITH b AS (SELECT o_orderpriority, o_orderkey, o_totalprice,
        |    CAST(floor(o_totalprice / 10000) AS BIGINT) AS price_bucket FROM orders)
        |SELECT o_orderpriority, o_orderkey, price_bucket,
        |  CAST(dense_rank() OVER wb AS INT) AS drk,
        |  percent_rank() OVER wb AS prk,
        |  cume_dist() OVER wb AS cd,
        |  CAST(ntile(4) OVER wt AS INT) AS quartile
        |FROM b
        |WINDOW wb AS (PARTITION BY o_orderpriority ORDER BY price_bucket DESC),
        |       wt AS (PARTITION BY o_orderpriority
        |              ORDER BY o_totalprice DESC, o_orderkey ASC)
        |ORDER BY o_orderpriority, o_orderkey""".stripMargin,
    "events_hourly" ->
      """SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour,
        |  event_type,
        |  count(*) AS n_events,
        |  CAST(sum(CAST(floor(value * 100) AS BIGINT)) AS BIGINT) AS sum_value_cents
        |FROM events GROUP BY 1, 2 ORDER BY hour, event_type""".stripMargin,
    "q_semi_anti" ->
      """SELECT c_custkey, 'has_orders' AS status FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |UNION ALL
        |SELECT c_custkey, 'no_orders' AS status FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |ORDER BY c_custkey""".stripMargin,
    "q_cube" ->
      """SELECT CAST(GROUPING(l_returnflag) * 2 + GROUPING(l_linestatus) AS INT) AS gid,
        |  l_returnflag, l_linestatus,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  count(*) AS n
        |FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
        |ORDER BY gid, l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin,
    "q_setops" ->
      """WITH wo AS (SELECT DISTINCT c.c_custkey FROM customer c
        |            JOIN orders o ON c.c_custkey = o.o_custkey),
        |ln AS (SELECT c_custkey FROM customer WHERE c_nationkey < 10)
        |SELECT c_custkey, 'both' AS tag FROM (
        |  SELECT c_custkey FROM wo INTERSECT SELECT c_custkey FROM ln)
        |UNION ALL
        |SELECT c_custkey, 'orders_only' AS tag FROM (
        |  SELECT c_custkey FROM wo EXCEPT SELECT c_custkey FROM ln)
        |ORDER BY c_custkey, tag""".stripMargin,
    "q_above_avg" ->
      """SELECT o_orderkey, o_custkey, o_totalprice
        |FROM orders o
        |WHERE CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) *
        |    (SELECT count(*) FROM orders i WHERE i.o_custkey = o.o_custkey)
        |  > (SELECT CAST(sum(CAST(i.o_totalprice AS DECIMAL(18,2)) * 100) AS BIGINT)
        |     FROM orders i WHERE i.o_custkey = o.o_custkey)
        |ORDER BY o_orderkey""".stripMargin,
    "q_full_outer" ->
      """WITH c AS (SELECT c_nationkey, count(*) AS n_cust FROM customer GROUP BY 1),
        |s AS (SELECT s_nationkey, count(*) AS n_supp FROM supplier
        |      WHERE s_acctbal > 9000 GROUP BY 1)
        |SELECT coalesce(c_nationkey, s_nationkey) AS nationkey, n_cust, n_supp
        |FROM c FULL OUTER JOIN s ON c_nationkey = s_nationkey
        |ORDER BY nationkey""".stripMargin,
    "q_rollup" ->
      """SELECT CAST(GROUPING(l_returnflag) * 2 + GROUPING(l_linestatus) AS INT) AS gid,
        |  l_returnflag, l_linestatus,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  count(*) AS n
        |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
        |ORDER BY gid, l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin,
    "events_sliding" ->
      """WITH w AS (SELECT event_type, value,
        |    date_trunc('hour', ts)
        |      + CASE WHEN minute(ts) >= 30 THEN INTERVAL 30 MINUTE
        |             ELSE INTERVAL 0 MINUTE END
        |      - to_minutes(30 * k) AS win_ts
        |  FROM events, (SELECT unnest([0, 1]) AS k))
        |SELECT strftime(win_ts, '%Y-%m-%d %H:%M:%S') AS win_start, event_type,
        |  count(*) AS n_events,
        |  CAST(sum(CAST(floor(value * 100) AS BIGINT)) AS BIGINT) AS sum_value_cents
        |FROM w GROUP BY 1, 2 ORDER BY win_start, event_type""".stripMargin,
    "q_sessions" ->
      """WITH g AS (SELECT user_id, ts, event_id,
        |    lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
        |  FROM events)
        |SELECT user_id,
        |  CAST(sum(CASE WHEN prev_ts IS NULL
        |                 OR ts - prev_ts > INTERVAL 30 MINUTE THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_sessions,
        |  count(*) AS n_events
        |FROM g GROUP BY user_id ORDER BY user_id""".stripMargin,
  )
}
