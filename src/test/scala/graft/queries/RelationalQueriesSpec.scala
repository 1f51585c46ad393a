package graft.queries

import java.time.format.DateTimeFormatter
import java.time.{Instant, ZoneOffset}

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType}

import graft.SparkSpec

/**
 * Pins the events.ts read contract against the REAL driver testdata.
 *
 * Round 8 post-mortem: events.parquet's timestamp column resolves
 * differently across Spark versions (3.x: nanosecond LONG behind
 * spark.sql.legacy.parquet.nanosAsLong; 4.1+: TIMESTAMP_NTZ, conf inert),
 * and `sbt test` stayed green while the driver gate failed because no
 * suite exercised the ts-arithmetic path on the real file. These tests
 * make an image-side Spark bump fail the build instead of the gate.
 *
 * The expected values are recomputed here in plain Scala (epoch-micros
 * arithmetic on the collected rows) — an oracle independent of the Spark
 * SQL plan under test.
 */
class RelationalQueriesSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"
  private def haveData = new java.io.File(s"$dir/events.parquet").exists

  /** (user_id, event_id, epoch-micros) for every event, via a plain read. */
  private def rawEvents(): Array[(Long, Long, Long)] = {
    val ev = spark.read.parquet(s"$dir/events.parquet")
    val withUs = ev.schema("ts").dataType match {
      case LongType => ev.withColumn("us", col("ts") / 1000L cast "long")
      case _        => ev.withColumn("us", unix_micros(col("ts").cast("timestamp")))
    }
    withUs.select("user_id", "event_id", "us").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
  }

  test("running against the documented Spark line (IMPLEMENTATION.md environment pin)") {
    assert(spark.version.startsWith("4."),
      s"Spark ${spark.version} is outside the supported 4.x line — " +
        "re-validate the events.ts read contract and update IMPLEMENTATION.md")
  }

  test("events.ts reads as a supported dtype (TIMESTAMP_NTZ or legacy LONG)") {
    assume(haveData)
    val dt = spark.read.parquet(s"$dir/events.parquet").schema("ts").dataType
    assert(dt == TimestampNTZType || dt == LongType,
      s"events.ts resolved as $dt — neither TIMESTAMP_NTZ (Spark 4.1+) nor " +
        "LONG nanos (3.x legacy conf); the RelationalQueries ts branch needs updating")
  }

  test("events_hourly runs on the real events.parquet and matches a scala-side rollup") {
    assume(haveData)
    val fmt = DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm:ss").withZone(ZoneOffset.UTC)
    val ev = spark.read.parquet(s"$dir/events.parquet")
    val expectedTotal = ev.count()

    val got = RelationalQueries.queries("events_hourly")(spark, dir).collect()
    assert(got.nonEmpty)
    assert(got.map(_.getAs[Long]("n_events")).sum == expectedTotal)

    // independent per-hour counts from epoch micros (floor to the hour)
    val expectedByHour = rawEvents()
      .groupBy { case (_, _, us) =>
        fmt.format(Instant.ofEpochSecond(Math.floorDiv(us, 3600000000L) * 3600L))
      }.map { case (h, rows) => h -> rows.length.toLong }
    val gotByHour = got.groupBy(_.getAs[String]("hour"))
      .map { case (h, rows) => h -> rows.map(_.getAs[Long]("n_events")).sum }
    assert(gotByHour == expectedByHour)
  }

  test("q_sessions runs on the real events.parquet and matches a scala-side sessionizer") {
    assume(haveData)
    val gapUs = 30L * 60 * 1000000L
    val expected = rawEvents()
      .groupBy(_._1)
      .map { case (uid, rows) =>
        val ts = rows.sortBy { case (_, eid, us) => (us, eid) }.map(_._3)
        val breaks = ts.sliding(2).count { case Array(a, b) => b - a > gapUs; case _ => false }
        uid -> ((1L + breaks).toLong, ts.length.toLong)
      }

    val got = RelationalQueries.queries("q_sessions")(spark, dir).collect()
      .map(r => r.getAs[Long]("user_id") ->
        (r.getAs[Long]("n_sessions"), r.getAs[Long]("n_events"))).toMap
    assert(got == expected)
  }

  test("events_gap_fill densifies the full type x hour grid on the real file") {
    assume(haveData)
    val rows = RelationalQueries.queries("events_gap_fill")(spark, dir).collect()
    val types = rows.map(_.getString(0)).distinct.sorted
    val hours = rows.map(_.getString(1)).distinct
    // exact grid: every type has every hour exactly once
    assert(rows.length === types.length * hours.length)
    // zero rows exist (that's the point of gap filling) and counts add up
    assert(rows.exists(_.getLong(2) == 0L))
    assert(rows.map(_.getLong(2)).sum === rawEvents().length)
  }

  test("q_approx_distinct stays within 2% of the exact distinct counts") {
    assume(new java.io.File(s"$dir/lineitem.parquet").exists)
    // the driver entry emits tolerance booleans (its oracle asserts TRUE);
    // here we additionally pin the tighter 2% envelope on the raw HLL++
    // estimates at the same rsd the entry uses
    val gate = RelationalQueries.queries("q_approx_distinct")(spark, dir).collect()
    gate.foreach { r =>
      assert(r.getAs[Boolean]("parts_within_5pct"), s"${r.getString(0)} parts out of band")
      assert(r.getAs[Boolean]("supps_within_5pct"), s"${r.getString(0)} supps out of band")
    }
    val approx = spark.read.parquet(s"$dir/lineitem.parquet")
      .groupBy("l_returnflag")
      .agg(
        org.apache.spark.sql.functions
          .approx_count_distinct(org.apache.spark.sql.functions.col("l_partkey"), rsd = 0.02)
          .as("apx_parts"),
        org.apache.spark.sql.functions
          .approx_count_distinct(org.apache.spark.sql.functions.col("l_suppkey"), rsd = 0.02)
          .as("apx_supps"))
      .collect().map(r => r.getString(0) ->
        (r.getAs[Long]("apx_parts"), r.getAs[Long]("apx_supps"))).toMap
    val exact = RelationalQueries.queries("q_distinct")(spark, dir)
      .collect().map(r => r.getString(0) ->
        (r.getAs[Long]("n_parts"), r.getAs[Long]("n_supps"))).toMap
    assert(approx.keySet === exact.keySet)
    exact.foreach { case (flag, (p, s)) =>
      val (ap, as) = approx(flag)
      assert(math.abs(ap - p) <= math.max(2, 0.02 * p),
        s"$flag parts: approx $ap vs exact $p")
      assert(math.abs(as - s) <= math.max(2, 0.02 * s),
        s"$flag supps: approx $as vs exact $s")
    }
  }

  test("events_sliding: every event lands in exactly two 30-min-aligned windows") {
    assume(new java.io.File(s"$dir/events.parquet").exists)
    val total = spark.read.parquet(s"$dir/events.parquet").count()
    val rows = RelationalQueries.queries("events_sliding")(spark, dir).collect()
    assert(rows.map(_.getLong(2)).sum === 2 * total)
    rows.foreach { r =>
      val mins = r.getString(0).substring(14, 16).toInt
      assert(mins == 0 || mins == 30, s"unaligned window start ${r.getString(0)}")
    }
  }

  test("q_rank_family: rank invariants hold per partition on the real orders") {
    assume(new java.io.File(s"$dir/orders.parquet").exists)
    val rows = RelationalQueries.queries("q_rank_family")(spark, dir)
      .collect()
      .map(r => (r.getString(0), r.getLong(2), r.getInt(3), r.getDouble(4),
        r.getDouble(5), r.getInt(6)))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (prio, g) =>
      val n = g.length
      // cume_dist spans (0, 1] and is monotone in the bucket ordering
      assert(g.map(_._5).max === 1.0, prio)
      assert(g.map(_._5).min > 0.0)
      // percent_rank of the top bucket is 0
      assert(g.filter(_._3 == 1).forall(_._4 === 0.0), prio)
      // equal buckets share drk/prk/cd (peer semantics)
      g.groupBy(_._2).foreach { case (_, peers) =>
        assert(peers.map(t => (t._3, t._4, t._5)).distinct.size === 1, prio)
      }
      // quartiles partition the rows with sizes within 1 of each other
      val sizes = g.groupBy(_._6).values.map(_.size)
      assert(sizes.sum === n)
      assert(sizes.max - sizes.min <= 1, s"$prio quartile sizes $sizes")
    }
  }
}
