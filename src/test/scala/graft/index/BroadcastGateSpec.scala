package graft.index

import org.apache.spark.sql.DataFrame

import graft.{SearchParams, SparkSpec}

/**
 * The broadcast size-gate contract for BOTH distributed flood paths
 * (flat [[IvfFlatIndex.searchJoinPruned]] and PQ [[IvfPqIndex.searchJoin]]):
 * below the gate the probed side ships through the lazy broadcast
 * exchange into [[BroadcastProbeTopK]] (the corpus scan stays
 * unshuffled); above it NOTHING is broadcast — the flood co-partitions
 * through [[CoGroupTopK]] instead of forcing an unbounded query set
 * through a driver-side broadcast. The PQ ADC stage always co-partitions
 * (the shuffled codes are m+8 B/row); its gate governs only the rerank
 * candidate join-back. Results are identical either way (plan-string
 * assert + hash equality).
 */
class BroadcastGateSpec extends SparkSpec {

  private val dim = 16
  private val nOver = IvfFlatIndex.MaxStaticBatch + 76 // a genuine flood batch
  private lazy val corpus = randomVectors(400, dim)
  private lazy val floodQueries = randomVectors(nOver, dim, seed = 777)
  private lazy val flat = IvfFlatIndex.build(spark, vectorsDF(corpus), nlist = 8)
  private lazy val pqIndex =
    IvfPqIndex.build(spark, vectorsDF(corpus), nlist = 8, m = 4, nbits = 6)

  private val GateKey = IvfFlatIndex.BroadcastGateKey
  private val AutoKey = "spark.sql.autoBroadcastJoinThreshold"

  /** Run `body` with the gate and Spark's auto-broadcast threshold set,
    * restoring both afterwards (suites share one session). */
  private def withConf(gate: String, auto: String)(body: => Unit): Unit = {
    val conf = spark.conf
    val oldGate = conf.getOption(GateKey)
    val oldAuto = conf.getOption(AutoKey)
    try {
      conf.set(GateKey, gate)
      conf.set(AutoKey, auto)
      body
    } finally {
      oldGate.fold(conf.unset(GateKey))(conf.set(GateKey, _))
      oldAuto.fold(conf.unset(AutoKey))(conf.set(AutoKey, _))
    }
  }

  /** The initial (pre-AQE) physical plan — where an explicit hint always
    * surfaces as a BroadcastHashJoin and, with autoBroadcastJoinThreshold
    * disabled, its absence proves no hint was planted (AQE may still
    * re-promote at runtime with validation, which is the designed escape). */
  private def initialPlan(df: DataFrame): String = df.queryExecution.sparkPlan.toString

  private def key(r: org.apache.spark.sql.Row) =
    (r.getLong(0), r.getInt(3), r.getLong(1), r.getDouble(2))
  private def sortedKeys(df: DataFrame) = df.collect().map(key).sortBy(x => (x._1, x._2))

  test("flat flood co-partitions above the gate, broadcast-probes below it") {
    val qdf = queriesDF(floodQueries)
    val params = SearchParams(k = 5, nprobe = 4)
    withConf(gate = "1", auto = "-1") {
      val plan = initialPlan(flat.search(qdf, params)) // nOver > MaxStaticBatch -> flood path
      assert(!plan.contains("BroadcastProbeTopK") && !plan.contains("BroadcastExchange"),
        s"above-gate flood must not broadcast the probed side:\n$plan")
      assert(plan.contains("CoGroup"),
        s"above-gate flood should co-partition queries and corpus:\n$plan")
    }
    withConf(gate = (1L << 40).toString, auto = "-1") {
      val plan = initialPlan(flat.search(qdf, params))
      assert(plan.contains("BroadcastProbeTopK"),
        s"below-gate flood should take the broadcast-probe operator:\n$plan")
      assert(!plan.contains("CoGroup"),
        s"below-gate flood must not shuffle the corpus:\n$plan")
    }
  }

  test("flat flood results are identical above and below the gate, and match static") {
    val qdf = queriesDF(floodQueries)
    val params = SearchParams(k = 5, nprobe = 8) // nprobe = nlist -> exact, fully determined
    val static = sortedKeys(flat.searchBatch(floodQueries.toArray, params))
    withConf(gate = "1", auto = "-1") {
      assert(sortedKeys(flat.search(qdf, params)) === static)
    }
    withConf(gate = (1L << 40).toString, auto = "-1") {
      assert(sortedKeys(flat.search(qdf, params)) === static)
    }
  }

  test("pq flood: ADC always co-partitions; rerank join-back hints only below the gate") {
    val qdf = queriesDF(floodQueries)
    val params = SearchParams(k = 5, nprobe = 4)
    withConf(gate = "1", auto = "-1") {
      for (rerank <- Seq(0, 20)) {
        val plan = initialPlan(pqIndex.search(qdf, params, rerank))
        assert(!plan.contains("BroadcastHashJoin") && !plan.contains("BroadcastExchange"),
          s"above-gate PQ flood (rerankK=$rerank) must not broadcast:\n$plan")
        assert(plan.contains("CoGroup"),
          s"PQ flood (rerankK=$rerank) should co-partition the codes scan:\n$plan")
      }
    }
    withConf(gate = (1L << 40).toString, auto = "-1") {
      // ADC-only: co-partitioned end to end, nothing to broadcast at all
      val adcPlan = initialPlan(pqIndex.search(qdf, params, 0))
      assert(adcPlan.contains("CoGroup") && !adcPlan.contains("BroadcastHashJoin"),
        s"below-gate ADC-only PQ flood should stay join-free:\n$adcPlan")
      // rerank: the id-only ADC winners broadcast into the raw-payload
      // join-back so the (100 TB) raw scan stays unshuffled
      val rrPlan = initialPlan(pqIndex.search(qdf, params, 20))
      assert(rrPlan.contains("BroadcastHashJoin"),
        s"below-gate PQ rerank should hint the candidate join-back:\n$rrPlan")
    }
  }

  test("pq flood results are bit-identical above/below the gate and vs static") {
    val qdf = queriesDF(floodQueries)
    for {
      rerank <- Seq(0, 20)
      metric <- Seq(None, Some(graft.Metric.InnerProduct), Some(graft.Metric.Cosine))
    } {
      val params = SearchParams(k = 5, nprobe = 4, metric = metric)
      val static = sortedKeys(pqIndex.searchBatch(floodQueries.toArray, params, rerank))
      withConf(gate = "1", auto = "-1") {
        assert(sortedKeys(pqIndex.search(qdf, params, rerank)) === static,
          s"above-gate diverges at rerankK=$rerank metric=$metric")
      }
      withConf(gate = (1L << 40).toString, auto = "-1") {
        assert(sortedKeys(pqIndex.search(qdf, params, rerank)) === static,
          s"below-gate diverges at rerankK=$rerank metric=$metric")
      }
    }
  }

  test("gate decision pins to the plan-stats estimate boundary") {
    val qdf = queriesDF(floodQueries.take(64))
    val nprobe = 4
    val est = qdf.queryExecution.optimizedPlan.stats.sizeInBytes * nprobe
    assert(est > 0)
    withConf(gate = est.toString, auto = "-1") {
      assert(IvfFlatIndex.fitsBroadcastGate(qdf, nprobe), "estimate == gate must fit")
    }
    withConf(gate = (est - 1).toString, auto = "-1") {
      assert(!IvfFlatIndex.fitsBroadcastGate(qdf, nprobe), "estimate > gate must not fit")
    }
  }

  test("streaming ADC scorer is bit-identical across orderings and the table cutover") {
    val books = IvfPqIndex.trainCodebooks(corpus.map(_._2).toArray, m = 4, nbits = 6)
    val qs = floodQueries.take(4).toArray
    val codeRows = corpus.take(200).map { case (_, v) =>
      new org.apache.spark.sql.catalyst.util.GenericArrayData(
        graft.functions.PqKernels.encode(v, books))
    }
    def arr(v: Array[Float]) = new org.apache.spark.sql.catalyst.util.GenericArrayData(v)
    for (metricId <- Seq(graft.functions.VectorKernels.METRIC_L2,
        graft.functions.VectorKernels.METRIC_IP,
        graft.functions.VectorKernels.METRIC_COSINE)) {
      // ground truth: the static path's full-table lookup-sum
      val expected = for ((qid, qv) <- qs; c <- codeRows) yield
        graft.functions.PqKernels.adcDistance(
          graft.functions.PqKernels.adcTable(qv, books, metricId), c)
      // clustered order (runs cross the buildAfter=32 cutover at 200 rows)
      val clustered = new graft.functions.AdcStreamScorer(books, metricId)
      val got = for ((qid, qv) <- qs; c <- codeRows) yield
        clustered.score(qid, arr(qv), c)
      assert(got.toSeq === expected.toSeq, s"clustered order diverged, metric=$metricId")
      // adversarial order: qid alternates every row -> scorer must stay in
      // direct mode and STILL produce identical bits
      val alternating = new graft.functions.AdcStreamScorer(books, metricId)
      val altExpected = for (c <- codeRows; (qid, qv) <- qs) yield
        graft.functions.PqKernels.adcDistance(
          graft.functions.PqKernels.adcTable(qv, books, metricId), c)
      val altGot = for (c <- codeRows; (qid, qv) <- qs) yield
        alternating.score(qid, arr(qv), c)
      assert(altGot.toSeq === altExpected.toSeq, s"alternating order diverged, metric=$metricId")
    }
  }
}
