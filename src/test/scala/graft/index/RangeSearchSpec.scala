package graft.index

import org.apache.spark.sql.functions._

import graft.{Metric, SparkSpec}
import graft.functions.VectorKernels

class RangeSearchSpec extends SparkSpec {

  private val dim = 16
  private lazy val corpus = randomVectors(300, dim, seed = 5)
  private lazy val queries = randomVectors(4, dim, seed = 9)

  private def brute(radius: Double, metric: Metric.Value) =
    (for {
      (qid, qv) <- queries
      (id, v) <- corpus
      d = VectorKernels.distance(qv, v, metric.id)
      if d <= radius
    } yield ((qid, id), d)).toMap

  test("range search returns exactly the pairs within the radius, all metrics") {
    for (m <- Seq(Metric.L2, Metric.InnerProduct, Metric.Cosine)) {
      // per-metric radius near each distribution's low tail
      val allD = for { (_, qv) <- queries; (_, v) <- corpus }
        yield VectorKernels.distance(qv, v, m.id)
      val radius = allD.sorted.apply(allD.size / 20) // ~5% selectivity
      val got = Knn.range(queriesDF(queries), vectorsDF(corpus), radius, m)
        .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
      assert(got === brute(radius, m), s"metric $m radius $radius")
    }
  }

  test("null query vectors and null stored vectors yield no rows") {
    val s = spark
    import s.implicits._
    val qs = Seq((0L, queries.head._2), (1L, null: Array[Float])).toDF("qid", "qvec")
    val vs = Seq((0L, corpus.head._2), (1L, null: Array[Float])).toDF("id", "vec")
    val got = Knn.range(qs, vs, Double.MaxValue).collect()
    assert(got.length === 1) // only the (0, 0) live pair
    assert(got.head.getLong(0) === 0L && got.head.getLong(1) === 0L)
  }

  test("the distance kernel appears once in the join condition (no conjunct substitution)") {
    val plan = Knn.range(queriesDF(queries), vectorsDF(corpus), 1.0)
      .queryExecution.executedPlan.toString
    val joinLine = plan.linesIterator.find(_.contains("NestedLoopJoin")).getOrElse("")
    val kernelCount = "l2_distance".r.findAllIn(joinLine).size
    assert(kernelCount === 1, s"distance evaluated $kernelCount times per pair:\n$plan")
  }

  test("range_search driver-gate query is non-empty and radius-bounded on sf0.001") {
    val df = graft.queries.VectorQueries
      .queries("range_search")(spark, "/root/testdata/sf0.001")
    val rows = df.collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getDouble(2) <= 1.35))
  }
}
