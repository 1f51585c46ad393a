package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class RangeJoinSpec extends SparkSpec {

  private lazy val left = {
    val s = spark
    import s.implicits._
    Seq(
      ("u1", 0L, "l0"),    // band [-10, 10]
      ("u1", 100L, "l1"),  // band [90, 110]
      ("u1", -25L, "l2"),  // negative values: floor-div bins must not skew
      ("u2", 50L, "l3"))   // no right partner at all
      .toDF("k", "v", "lid")
  }

  private lazy val right = {
    val s = spark
    import s.implicits._
    Seq(
      ("u1", 10L, 1L),   // exactly on l0's upper edge (inclusive)
      ("u1", -10L, 2L),  // exactly on l0's lower edge (inclusive)
      ("u1", 11L, 3L),   // one past the edge: excluded
      ("u1", 95L, 4L),   // inside l1's band
      ("u1", 110L, 5L),  // l1 upper edge
      ("u1", -30L, 6L),  // inside l2's band (both negative)
      ("u3", 0L, 7L))    // wrong key
      .toDF("k", "v", "rid")
  }

  private def pairs() = RangeJoin
    .band(left, right, Seq("k"), "v", "v", radius = 10L,
      rightPayload = Map("rid" -> "rid"))
    .select("lid", "rid")
    .collect().map(r => (r.getString(0), r.getLong(1))).toSet

  test("payload outputs colliding with rightVal or keys are rejected, not dropped") {
    // rename the right value so the collision is with rightVal ONLY (a
    // left-column collision would trip the older require instead)
    val r2 = right.withColumnRenamed("v", "rv")
    intercept[IllegalArgumentException] {
      RangeJoin.band(left, r2, Seq("k"), "v", "rv", radius = 10L,
        rightPayload = Map("rid" -> "rv")) // collides with rightVal
    }
    intercept[IllegalArgumentException] {
      RangeJoin.band(left, right, Seq("k"), "v", "v", radius = 10L,
        rightPayload = Map("rid" -> "k")) // collides with a key
    }
  }

  test("band membership is inclusive at both edges, per key, sign-correct") {
    assert(pairs() === Set(
      ("l0", 1L), ("l0", 2L),   // both edges of l0
      ("l1", 4L), ("l1", 5L),   // inside + upper edge
      ("l2", 6L)))              // negative band
  }

  test("no candidate pair is emitted twice by the 3-bin explode") {
    val all = RangeJoin
      .band(left, right, Seq("k"), "v", "v", radius = 10L,
        rightPayload = Map("rid" -> "rid"))
      .select("lid", "rid").collect().map(r => (r.getString(0), r.getLong(1)))
    assert(all.length === all.distinct.length, s"duplicates in ${all.toSeq}")
  }

  test("matches a brute-force theta join on a random shape") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(42)
    val lhs = (0 until 200).map(i =>
      ("k" + rnd.nextInt(5), rnd.nextLong() % 1000, i.toLong))
      .toDF("k", "v", "lid")
    val rhs = (0 until 200).map(i =>
      ("k" + rnd.nextInt(5), rnd.nextLong() % 1000, i.toLong))
      .toDF("k", "v", "rid")
    val got = RangeJoin.band(lhs, rhs, Seq("k"), "v", "v", radius = 37L,
      rightPayload = Map("rid" -> "rid"))
      .select("lid", "rid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val want = lhs.as("a").join(rhs.as("b"),
      col("a.k") === col("b.k") &&
        abs(col("a.v") - col("b.v")) <= 37L)
      .select(col("a.lid"), col("b.rid"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === want)
  }

  test("domain extremes never wrap into false matches (decimal band check)") {
    val s = spark
    import s.implicits._
    val l = Seq(("k", Long.MaxValue, "hi"), ("k", Long.MinValue + 1, "lo"))
      .toDF("k", "v", "lid")
    val r = Seq(("k", Long.MinValue, 1L), ("k", Long.MaxValue - 1, 2L))
      .toDF("k", "v", "rid")
    val out = RangeJoin.band(l, r, Seq("k"), "v", "v", radius = 2L,
      rightPayload = Map("rid" -> "m_rid"))
      .collect().map(x => (x.getAs[String]("lid"), x.getAs[Long]("m_rid"))).toSet
    // MaxValue pairs only with MaxValue-1; MinValue+1 only with MinValue —
    // the 2^64-apart cross pairs must NOT appear (long subtraction wraps)
    assert(out === Set(("hi", 2L), ("lo", 1L)), s"got $out")
  }

  test("reserved working column names are rejected, not silently destroyed") {
    val s = spark
    import s.implicits._
    val bad = Seq(("k", 1L, "x")).toDF("k", "v", "_range_rv")
    intercept[IllegalArgumentException](RangeJoin.band(
      bad, right, Seq("k"), "v", "v", 10L, Map("rid" -> "m_rid")))
  }

  test("payload output named like a reserved working column is rejected") {
    val s = spark
    import s.implicits._
    val l = Seq(("en", 1L, 10L)).toDF("lang", "a_id", "a_len")
    val r = Seq(("en", 2L, 11L, 1.0)).toDF("lang", "b_id", "b_len", "v")
    // '_range_bin'/'_range_rv' outputs would be overwritten by the
    // binning withColumn and then dropped — payload silently missing
    intercept[IllegalArgumentException] {
      RangeJoin.band(l, r, Seq("lang"), "a_len", "b_len", radius = 2,
        rightPayload = Map("v" -> "_range_bin"))
    }
    intercept[IllegalArgumentException] {
      RangeJoin.band(l, r, Seq("lang"), "a_len", "b_len", radius = 2,
        rightPayload = Map("v" -> "_range_rv"))
    }
  }

  test("plan is an equi-join, not a nested-loop theta join") {
    val plan = RangeJoin.band(left, right, Seq("k"), "v", "v", radius = 10L,
      rightPayload = Map("rid" -> "rid")).queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"),
      s"range join degenerated to a nested loop:\n$plan")
  }
}
