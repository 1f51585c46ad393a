package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class AsOfJoinSpec extends SparkSpec {

  // left: (key, ts, tag)   right: (key, ts, payload value, tiebreak id)
  private lazy val left = {
    val s = spark
    import s.implicits._
    Seq(
      ("u1", 100L, "p1"), // after r@50 and r@100 (tie, inclusive)
      ("u1", 60L, "p2"),  // after r@50 only
      ("u1", 10L, "p3"),  // before every right row -> null
      ("u2", 500L, "p4"), // u2 has no right rows at all -> null
      ("u3", 80L, "p5"))  // right value is null at the matched row
      .toDF("k", "ts", "tag")
  }

  private lazy val right = {
    val s = spark
    import s.implicits._
    Seq(
      ("u1", 50L, Some(1.5), 1L),
      ("u1", 100L, Some(2.5), 2L),  // equal-ts twin of id 3
      ("u1", 100L, Some(3.5), 3L),  // max tie-break wins
      ("u1", 200L, Some(9.9), 4L),  // in the future of every left row
      ("u3", 70L, None: Option[Double], 5L),
      ("u3", 40L, Some(7.0), 6L))
      .toDF("k", "ts", "v", "rid")
  }

  private def run() = AsOfJoin
    .backward(left, right, Seq("k"), "ts", "ts",
      rightPayload = Map("ts" -> "m_ts", "v" -> "m_v", "rid" -> "m_rid"),
      rightTieBreak = Seq("rid"))
    .orderBy("k", "ts")

  test("backward picks the greatest right ts <= left ts, inclusive, per key") {
    val rows = run().collect().map(r =>
      (r.getString(0), r.getLong(1),
        Option(r.getAs[Any]("m_ts")).map(_.asInstanceOf[Long]),
        Option(r.getAs[Any]("m_rid")).map(_.asInstanceOf[Long])))
    assert(rows === Array(
      ("u1", 10L, None, None),
      ("u1", 60L, Some(50L), Some(1L)),
      ("u1", 100L, Some(100L), Some(3L)), // tie inclusive; max rid of twins
      ("u2", 500L, None, None),
      ("u3", 80L, Some(70L), Some(5L))))
  }

  test("payload fields never tear: a null payload value stays with its row") {
    // u3@80 matches r@70 whose v is null; per-column last(ignoreNulls)
    // would reach back to r@40's 7.0 — the struct carrier must not
    val u3 = run().filter(col("k") === "u3").collect().head
    assert(u3.getAs[Any]("m_rid") === 5L)
    assert(u3.isNullAt(u3.fieldIndex("m_v")),
      s"expected null m_v from the matched row, got ${u3.getAs[Any]("m_v")}")
  }

  test("left columns and row count are preserved exactly") {
    val out = run()
    assert(out.count() === left.count())
    assert(out.columns.toSeq === Seq("k", "ts", "tag", "m_rid", "m_ts", "m_v"))
    val tags = out.select("tag").collect().map(_.getString(0)).sorted
    assert(tags === Array("p1", "p2", "p3", "p4", "p5"))
  }

  test("plan shape: exactly one exchange, partitioned on the keys") {
    val plan = run().queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(exchanges === 1, s"expected one shuffle, plan:\n$plan")
  }

  test("a null right ts never matches (nulls-first sort must not fabricate a predecessor)") {
    val s = spark
    import s.implicits._
    val l = Seq(("u1", 5L, "early")).toDF("k", "ts", "tag")
    val r = Seq(("u1", Option.empty[Long], 42L)).toDF("k", "ts", "rid")
    val out = AsOfJoin.backward(l, r, Seq("k"), "ts", "ts",
      rightPayload = Map("rid" -> "m_rid")).head()
    assert(out.isNullAt(out.fieldIndex("m_rid")),
      "null-ts right row became a spurious as-of match")
  }

  test("null equi-keys never match each other (equi-join / DuckDB ASOF semantics)") {
    val s = spark
    import s.implicits._
    val l = Seq((None: Option[String], 10L, "lx"), (Some("u1"), 10L, "ly"))
      .toDF("k", "ts", "tag")
    val r = Seq((None: Option[String], 5L, 1.0), (Some("u1"), 5L, 2.0))
      .toDF("k", "ts", "v")
    val out = AsOfJoin.backward(l, r, Seq("k"), "ts", "ts",
      rightPayload = Map("v" -> "m_v"))
      .collect().map(x => (Option(x.getAs[String]("k")), Option(x.getAs[Any]("m_v")))).toMap
    assert(out(Some("u1")) === Some(2.0)) // real key matches
    assert(out(None) === None, "null keys must not enrich each other")
  }

  test("a null tie-break loses to any real tie-break at equal ts") {
    val s = spark
    import s.implicits._
    val l = Seq(("u1", 100L, "x")).toDF("k", "ts", "tag")
    val r = Seq(
      ("u1", 100L, Option.empty[Long], 1.0),
      ("u1", 100L, Some(5L), 2.0))
      .toDF("k", "ts", "rid", "v")
    val out = AsOfJoin.backward(l, r, Seq("k"), "ts", "ts",
      rightPayload = Map("v" -> "m_v"), rightTieBreak = Seq("rid")).head()
    assert(out.getDouble(out.fieldIndex("m_v")) === 2.0,
      "null-tie-break row beat the documented max-tie-break winner")
  }

  test("empty key list = global as-of join over one timeline") {
    // Window.partitionBy() with no columns is the global window; the
    // null-key right filter must fold over lit(true), not reduce (which
    // throws on Nil)
    val s = spark
    import s.implicits._
    val l = Seq((10L, "a"), (20L, "b")).toDF("ts", "tag")
    val r = Seq((5L, 1.0), (15L, 2.0)).toDF("ts", "v")
    val out = AsOfJoin.backward(l, r, Seq.empty, "ts", "ts",
      rightPayload = Map("v" -> "m_v"))
      .collect().map(x => (x.getAs[Long]("ts"), x.getAs[Double]("m_v"))).toMap
    assert(out(10L) === 1.0)
    assert(out(20L) === 2.0)
  }
}
