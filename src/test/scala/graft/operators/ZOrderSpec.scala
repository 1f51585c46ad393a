package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class ZOrderSpec extends SparkSpec {

  test("interleave matches a bit-by-bit reference and de-interleaves") {
    val rnd = new scala.util.Random(9)
    for (_ <- 1 to 200) {
      val x = rnd.nextInt(1 << 16).toLong
      val y = rnd.nextInt(1 << 16).toLong
      val z = ZOrderKernels.interleave(x, y, 16)
      var rx = 0L; var ry = 0L
      for (b <- 0 until 16) {
        rx |= ((z >>> (2 * b)) & 1L) << b
        ry |= ((z >>> (2 * b + 1)) & 1L) << b
      }
      assert((rx, ry) == ((x, y)), s"round-trip failed for ($x, $y)")
    }
    assert(ZOrderKernels.interleave(0b1010L, 0b0101L, 4) == 0b01100110L)
  }

  test("z-clustered layout prunes the non-leading dimension; a 1-D sort cannot") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(4)
    val rows = Seq.fill(20000)((rnd.nextInt(1024).toLong, rnd.nextInt(1024).toLong))
      .toDF("x", "y")
    val parts = 16

    // partitions whose (min/max x, min/max y) bounding box — what a
    // parquet row group's column stats expose — intersects the query
    // rectangle; everything else is pruned without being read
    def partitionsHit(df: org.apache.spark.sql.DataFrame,
        xr: (Long, Long), yr: (Long, Long)): Int =
      df.withColumn("pid", spark_partition_id())
        .groupBy("pid")
        .agg(min("x").as("x0"), max("x").as("x1"), min("y").as("y0"), max("y").as("y1"))
        .filter(col("x1") >= xr._1 && col("x0") <= xr._2 &&
          col("y1") >= yr._1 && col("y0") <= yr._2)
        .count().toInt

    val byX = rows.repartitionByRange(parts, col("x")).sortWithinPartitions("x")
    val byZ = ZOrder.cluster(rows, col("x"), col("y"), parts, bits = 10)

    // a y-narrow query: the x-sorted stripes ALL cover the full y extent,
    // so none prune; z tiles are square-ish, so only the low-y band reads
    val yNarrowX = partitionsHit(byX, (0L, 1023L), (0L, 63L))
    val yNarrowZ = partitionsHit(byZ, (0L, 1023L), (0L, 63L))
    assert(yNarrowX == parts, s"stripe layout unexpectedly pruned: $yNarrowX")
    assert(yNarrowZ * 2 <= parts, s"z layout pruned nothing: $yNarrowZ of $parts")

    // and a small 2-D box touches only a few z tiles
    val boxZ = partitionsHit(byZ, (0L, 127L), (0L, 127L))
    assert(boxZ <= parts / 4, s"2-D box hit $boxZ of $parts z tiles")
  }

  test("wide-domain values (ms epochs, snowflake ids) still cluster: min/max normalization") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(6)
    // x spans ~1.7e12 (ms epochs), y is snowflake-ish — the raw low 10
    // bits of either are noise, so unnormalized interleaving would give
    // every partition a full-domain bounding box (no pruning at all)
    val base = 1700000000000L
    val rows = Seq.fill(20000)(
      (base + rnd.nextInt(1 << 20).toLong * 1000L,
        (rnd.nextInt(1 << 20).toLong << 22) | 42L))
      .toDF("x", "y")
    val parts = 16
    val byZ = ZOrder.cluster(rows, col("x"), col("y"), parts, bits = 10)
    def hit(xr: (Long, Long), yr: (Long, Long)): Int =
      byZ.withColumn("pid", spark_partition_id())
        .groupBy("pid")
        .agg(min("x").as("x0"), max("x").as("x1"), min("y").as("y0"), max("y").as("y1"))
        .filter(col("x1") >= xr._1 && col("x0") <= xr._2 &&
          col("y1") >= yr._1 && col("y0") <= yr._2)
        .count().toInt
    // a quarter-domain 2-D box must prune most tiles
    val xQ = (base, base + (1L << 18) * 1000L)
    val yQ = (0L, (1L << 18) << 22)
    val boxZ = hit(xQ, yQ)
    assert(boxZ <= parts / 2, s"wide-domain clustering pruned nothing: $boxZ of $parts")
  }

  test("empty input and null coordinates survive cluster()") {
    val s = spark
    import s.implicits._
    // empty: the bounds row is all null — must return the frame, not NPE
    val empty = Seq.empty[(Long, Long)].toDF("x", "y")
    assert(ZOrder.cluster(empty, col("x"), col("y"), 4).count() === 0)
    // null coords: least() skips null operands, so without the guard such
    // rows land in the hottest max-corner tile; they must keep a null _z
    // (ranged together) and above all SURVIVE with exact multiplicity
    val rows = Seq((1L, 1L), (100L, 100L)).toDF("x", "y")
      .unionByName(Seq((Option.empty[Long], Option(5L)),
        (Option(5L), Option.empty[Long])).toDF("x", "y"))
    val out = ZOrder.cluster(rows, col("x"), col("y"), 2)
    assert(out.count() === 4)
    assert(out.filter(col("x").isNull || col("y").isNull).count() === 2)
  }

  test("caller-supplied bounds skip the bounds scan and still cluster") {
    val s = spark
    import s.implicits._
    val rows = (0L until 1000L).map(i => (i, (i * 37) % 1000)).toDF("x", "y")
    val withBounds = ZOrder.cluster(rows, col("x"), col("y"), 4,
      bits = 10, bounds = Some((0L, 999L, 0L, 999L)))
    val scanned = ZOrder.cluster(rows, col("x"), col("y"), 4, bits = 10)
    def keyOrder(df: org.apache.spark.sql.DataFrame) =
      df.withColumn("pid", spark_partition_id())
        .groupBy("pid").count().orderBy("pid").collect().map(_.getLong(1)).toSeq
    assert(withBounds.count() === 1000)
    // identical bounds -> identical partition layout
    assert(keyOrder(withBounds) === keyOrder(scanned))
  }

  test("stale caller bounds: below-lo values clamp to bucket 0, not the max-corner tile") {
    val s = spark
    import s.implicits._
    // bounds say [0, 1000] but a few rows sit below: an un-clamped
    // negative bucket sign-extends into the max Morton tile and inflates
    // its bounding box; the clamp sends them to the LOW corner instead
    val rows = ((0L until 1000L).map(i => (i, i)) ++ Seq((-5L, 1L), (-9L, 2L)))
      .toDF("x", "y")
    val out = ZOrder.cluster(rows, col("x"), col("y"), 8,
      bits = 10, bounds = Some((0L, 999L, 0L, 999L)))
    assert(out.count() === 1002)
    // the below-lo rows must share a partition with the SMALLEST x values
    val pidOf = out.withColumn("pid", spark_partition_id())
    val negPids = pidOf.filter(col("x") < 0).select("pid").distinct()
      .collect().map(_.getInt(0)).toSet
    val minPid = pidOf.filter(col("x") === 0).select("pid").head().getInt(0)
    val maxPid = pidOf.filter(col("x") === 999).select("pid").head().getInt(0)
    assert(negPids.forall(_ == minPid),
      s"below-lo rows landed in partitions $negPids, not the low tile $minPid")
    assert(!negPids.contains(maxPid) || minPid == maxPid)
  }

  test("reversed caller bounds are rejected, not silently collapsed to one tile") {
    val s = spark
    import s.implicits._
    val rows = Seq((1L, 1L)).toDF("x", "y")
    intercept[IllegalArgumentException] {
      ZOrder.cluster(rows, col("x"), col("y"), 2,
        bounds = Some((999L, 0L, 0L, 999L)))
    }
  }

  test("a domain spanning more than Long.MaxValue still buckets sanely (no long wrap)") {
    val s = spark
    import s.implicits._
    // Long.MinValue sentinel + large positive ids: hi - lo wraps in long
    // arithmetic; the decimal span must keep buckets within [0, top]
    val rows = Seq((Long.MinValue, 0L), (0L, 0L), (Long.MaxValue, 0L))
      .toDF("x", "y")
    val out = ZOrder.cluster(rows, col("x"), col("y"), 2, bits = 8)
    assert(out.count() === 3) // no crash, nothing dropped
  }
}
