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

  // --- r21 rewrite parity: the closed-form / fine-aggregate rewrites must
  // be BIT-identical to the direct window / rollup formulations they
  // replaced (the driver's DuckDB oracle re-gates this too; these tests
  // keep the equivalence local and debuggable).

  test("q_rank_family closed-form rewrite is bit-identical to the direct double-window plan") {
    assume(new java.io.File(s"$dir/orders.parquet").exists)
    import org.apache.spark.sql.expressions.Window
    val o = spark.read.parquet(s"$dir/orders.parquet")
      .withColumn("price_bucket", floor(col("o_totalprice") / 10000).cast("long"))
    val wb = Window.partitionBy("o_orderpriority").orderBy(col("price_bucket").desc)
    val wt = Window.partitionBy("o_orderpriority")
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
    val direct = o.select(col("o_orderpriority"), col("o_orderkey"), col("price_bucket"),
        dense_rank().over(wb).as("drk"),
        percent_rank().over(wb).as("prk"),
        cume_dist().over(wb).as("cd"),
        ntile(4).over(wt).as("quartile"))
      .orderBy("o_orderpriority", "o_orderkey").collect()
    val got = RelationalQueries.queries("q_rank_family")(spark, dir).collect()
    assert(got.length === direct.length)
    got.zip(direct).zipWithIndex.foreach { case ((g, d), i) =>
      assert(g === d, s"row $i")
    }
  }

  test("q_rank_family rewrite handles tiny partitions (ntile n<4) and a null price") {
    import org.apache.spark.sql.expressions.Window
    val s = spark
    import s.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft_rankfam_edge").toString
    // priorities of size 1, 2, 3 and 5; one NULL o_totalprice (null bucket)
    val rows = Seq(
      (1L, "a", Some(5000.0)),
      (2L, "b", Some(15000.0)), (3L, "b", Some(15000.0)),
      (4L, "c", Some(25000.0)), (5L, "c", Some(5.0)), (6L, "c", None),
      (7L, "d", Some(100.0)), (8L, "d", Some(20000.0)), (9L, "d", Some(20000.0)),
      (10L, "d", Some(30000.0)), (11L, "d", Some(100.0)))
      .toDF("o_orderkey", "o_orderpriority", "o_totalprice")
    rows.write.mode("overwrite").parquet(s"$tmp/orders.parquet")
    val o = spark.read.parquet(s"$tmp/orders.parquet")
      .withColumn("price_bucket", floor(col("o_totalprice") / 10000).cast("long"))
    val wb = Window.partitionBy("o_orderpriority").orderBy(col("price_bucket").desc)
    val wt = Window.partitionBy("o_orderpriority")
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
    val direct = o.select(col("o_orderpriority"), col("o_orderkey"), col("price_bucket"),
        dense_rank().over(wb).as("drk"),
        percent_rank().over(wb).as("prk"),
        cume_dist().over(wb).as("cd"),
        ntile(4).over(wt).as("quartile"))
      .orderBy("o_orderpriority", "o_orderkey").collect()
    val got = RelationalQueries.queries("q_rank_family")(spark, tmp).collect()
    graft.storage.EpochManager.deleteRecursively(tmp)
    assert(got.length === direct.length)
    got.zip(direct).zipWithIndex.foreach { case ((g, d), i) =>
      assert(g === d, s"row $i")
    }
  }

  test("rollup/cube/grouping-sets fine-aggregate rewrites match the direct formulations") {
    assume(new java.io.File(s"$dir/lineitem.parquet").exists)
    import org.apache.spark.sql.types.DecimalType
    val li = spark.read.parquet(s"$dir/lineitem.parquet")
    val d = col("l_quantity").cast(DecimalType(18, 2))
    def directOf(grouped: org.apache.spark.sql.RelationalGroupedDataset) =
      grouped.agg(
        grouping_id().cast("int").as("gid"),
        sum(d).cast("double").as("sum_qty"),
        count(lit(1)).as("n"))
        .orderBy(col("gid"),
          col("l_returnflag").asc_nulls_first,
          col("l_linestatus").asc_nulls_first)
        .select("gid", "l_returnflag", "l_linestatus", "sum_qty", "n")
        .collect().toSeq
    assert(RelationalQueries.queries("q_rollup")(spark, dir).collect().toSeq ===
      directOf(li.rollup("l_returnflag", "l_linestatus")))
    assert(RelationalQueries.queries("q_cube")(spark, dir).collect().toSeq ===
      directOf(li.cube("l_returnflag", "l_linestatus")))
    li.createOrReplaceTempView("graft_li_gs_direct")
    val directGs = spark.sql(
      """SELECT CAST(grouping_id() AS INT) AS gid, l_returnflag, l_linestatus,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  count(1) AS n
        |FROM graft_li_gs_direct
        |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())""".stripMargin)
      .orderBy(col("gid"),
        col("l_returnflag").asc_nulls_first,
        col("l_linestatus").asc_nulls_first)
      .collect().toSeq
    assert(RelationalQueries.queries("q_grouping_sets")(spark, dir).collect().toSeq
      === directGs)
  }
}
