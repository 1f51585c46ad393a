package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class BloomJoinSpec extends SparkSpec {

  private lazy val fact = {
    val s = spark
    import s.implicits._
    (0L until 10000L).map(i => (i, i % 1000, s"p$i")).toDF("row_id", "fk", "payload")
  }

  // 50 of the 1000 fk values match
  private lazy val dim = {
    val s = spark
    import s.implicits._
    (0L until 1000L by 20L).map(k => (k, s"d$k")).toDF("pk", "dim_payload")
  }

  test("non-integral key columns are rejected, not silently filtered to nothing") {
    val s = spark
    import s.implicits._
    val strDim = Seq(("a", 1), ("b", 2)).toDF("sku", "x")
    val e = intercept[IllegalArgumentException](BloomJoin.keyFilter(strDim, "sku"))
    assert(e.getMessage.contains("integral"))
    intercept[IllegalArgumentException](
      BloomJoin.innerJoin(fact, "payload", strDim, "sku"))
  }

  test("prefilter has no false negatives: every truly-matching row survives") {
    val bf = BloomJoin.keyFilter(dim, "pk")
    val kept = BloomJoin.prefilter(fact, col("fk"), bf)
      .select("row_id").collect().map(_.getLong(0)).toSet
    val trueMatches = fact.join(dim, col("fk") === col("pk"), "left_semi")
      .select("row_id").collect().map(_.getLong(0)).toSet
    assert(trueMatches.subsetOf(kept),
      s"bloom dropped ${(trueMatches -- kept).size} matching rows")
  }

  test("prefilter prunes: surviving fraction tracks selectivity + fpp") {
    val bf = BloomJoin.keyFilter(dim, "pk", fpp = 0.01)
    val kept = BloomJoin.prefilter(fact, col("fk"), bf).count()
    // true selectivity 5% of rows; allow generous fpp slack
    assert(kept >= 500, s"false negatives? kept=$kept")
    assert(kept <= 1500, s"bloom barely pruned: kept=$kept of 10000")
  }

  test("innerJoin is bit-identical to the plain exact join") {
    val viaBloom = BloomJoin.innerJoin(fact, "fk", dim, "pk")
      .select("row_id", "pk", "dim_payload")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    val plain = fact.join(dim, col("fk") === col("pk"))
      .select("row_id", "pk", "dim_payload")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    assert(viaBloom === plain)
  }

  test("the probe sits in the plan as a filter above the fact scan") {
    // a parquet-backed fact side: ConvertToLocalRelation folds the probe
    // away on driver-local Seqs, which is fine but not what this pins
    val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    val bf = BloomJoin.keyFilter(dim, "pk")
    val plan = BloomJoin.prefilter(li, col("l_orderkey"), bf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("bloom_might_contain"), plan)
  }

  test("bloom_join driver-gate query runs green on the sf0.001 tables") {
    val df = graft.queries.RelationalQueries
      .queries("bloom_join")(spark, "/root/testdata/sf0.001")
    val rows = df.collect()
    assert(rows.length === 5) // one row per order priority
    assert(rows.map(_.getLong(2)).sum > 0) // n_items
  }
}
