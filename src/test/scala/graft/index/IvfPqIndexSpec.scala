package graft.index

import graft.{SearchParams, SparkSpec}
import graft.functions.PqKernels
import graft.kmeans.Lloyd

class IvfPqIndexSpec extends SparkSpec {

  private lazy val data = randomVectors(1000, 16)
  private lazy val queries = randomVectors(8, 16, seed = 12345)
  private lazy val index = IvfPqIndex.build(spark, vectorsDF(data), nlist = 8, m = 4, nbits = 6)

  test("codebooks have shape m x ks x dsub and training is deterministic") {
    val sample = data.map(_._2).toArray
    val b1 = IvfPqIndex.trainCodebooks(sample, m = 4, nbits = 6)
    val b2 = IvfPqIndex.trainCodebooks(sample, m = 4, nbits = 6)
    assert(b1.length === 4)
    assert(b1.forall(_.length === 64))
    assert(b1.forall(_.forall(_.length === 4)))
    assert(b1.map(_.map(_.toSeq).toSeq).toSeq === b2.map(_.map(_.toSeq).toSeq).toSeq)
  }

  test("encode/decode quantization error is bounded and ADC equals decoded distance") {
    val sample = data.map(_._2).toArray
    val books = IvfPqIndex.trainCodebooks(sample, m = 4, nbits = 6)
    val v = sample(17)
    val code = PqKernels.encode(v, books)
    val dec = PqKernels.decode(code, books)
    val qerr = graft.functions.VectorKernels.l2(v, dec)
    assert(qerr < 4.0, s"quantization error too large: $qerr")
    // ADC distance of query q to code(v) == exact L2(q, decode(v))
    val q = queries.head._2
    val table = PqKernels.adcTableRaw(q, books, graft.functions.VectorKernels.METRIC_L2)
    val adc = PqKernels.adcDistanceBytes(table, code)
    val viaDecode = graft.functions.VectorKernels.l2(q, dec)
    assert(math.abs(adc - viaDecode) < 1e-9)
  }

  test("ADC-only search recall@10 vs exact is reasonable") {
    val q = queriesDF(queries)
    val adc = index.search(q, SearchParams(k = 10, nprobe = 8)).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val flat = IvfFlatIndex.build(spark, vectorsDF(data), nlist = 8)
    val exact = flat.searchExact(q, 10).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (adc & exact).size.toDouble / exact.size
    assert(recall >= 0.5, s"ADC recall@10 was $recall")
  }

  test("full rerank over all candidates makes IVF-PQ exact (the S13 differential)") {
    val q = queriesDF(queries)
    val reranked = index.search(
      q, SearchParams(k = 10, nprobe = 8), rerankK = data.size).collect()
    val flat = IvfFlatIndex.build(spark, vectorsDF(data), nlist = 8)
    val exact = flat.searchExact(q, 10).collect()
    val key = (r: org.apache.spark.sql.Row) =>
      (r.getLong(0), r.getInt(3), r.getLong(1), r.getDouble(2))
    assert(reranked.map(key).sortBy(x => (x._1, x._2)) ===
      exact.map(key).sortBy(x => (x._1, x._2)))
  }

  test("moderate rerank beats ADC-only recall") {
    val q = queriesDF(queries)
    val flat = IvfFlatIndex.build(spark, vectorsDF(data), nlist = 8)
    val exact = flat.searchExact(q, 10).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    def recallOf(df: org.apache.spark.sql.DataFrame) = {
      val s = df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      (s & exact).size.toDouble / exact.size
    }
    val adcOnly = recallOf(index.search(q, SearchParams(k = 10, nprobe = 8)))
    val rr = recallOf(index.search(q, SearchParams(k = 10, nprobe = 8), rerankK = 50))
    assert(rr >= adcOnly, s"rerank recall $rr < adc-only $adcOnly")
  }

  test("per-metric ADC tables: IP/Cosine recall without rerank inflation") {
    import graft.Metric
    val q = queriesDF(queries)
    val vectors = vectorsDF(data)
    def recallOf(res: org.apache.spark.sql.DataFrame, metric: Metric.Value) = {
      val exact = Knn.exact(q, vectors, 10, metric).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val got = res.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      (got & exact).size.toDouble / exact.size
    }
    // IP tables on the L2-built (raw-space) index: decode approximates the
    // raw vector, so -dot lookup-sums track the true IP order
    val ip = recallOf(
      index.search(q, SearchParams(k = 10, nprobe = 8, metric = Some(Metric.InnerProduct))),
      Metric.InnerProduct)
    // the round-3 caveat shape: L2-ordered ADC pool measured against the
    // IP ground truth — per-metric tables must do strictly better
    val ipViaL2 = recallOf(
      index.search(q, SearchParams(k = 10, nprobe = 8)), Metric.InnerProduct)
    assert(ip >= 0.6, s"IP ADC recall@10 was $ip")
    assert(ip >= ipViaL2, s"IP tables ($ip) lost to L2-shaped pool ($ipViaL2)")
    // Cosine requires the normalized-space build
    val cosIndex = IvfPqIndex.build(spark, vectors, nlist = 8, m = 4, nbits = 6,
      metric = Metric.Cosine)
    val cos = recallOf(
      cosIndex.search(q, SearchParams(k = 10, nprobe = 8, metric = Some(Metric.Cosine))),
      Metric.Cosine)
    val cosViaL2 = recallOf(
      index.search(q, SearchParams(k = 10, nprobe = 8)), Metric.Cosine)
    // same absolute bar as the L2 ADC-only test: random gaussians at dim 16
    // concentrate cosine distances, so quantization noise caps recall
    assert(cos >= 0.5, s"Cosine ADC recall@10 was $cos")
    assert(cos >= cosViaL2, s"cosine tables ($cos) lost to L2-shaped pool ($cosViaL2)")
  }

  test("static (batch) and distributed (join) PQ paths are bit-identical") {
    val qdf = queriesDF(queries)
    val params = SearchParams(k = 5, nprobe = 4)
    val key = (r: org.apache.spark.sql.Row) =>
      (r.getLong(0), r.getInt(3), r.getLong(1), r.getDouble(2))
    for {
      rerank <- Seq(0, 50)
      metric <- Seq(None, Some(graft.Metric.InnerProduct), Some(graft.Metric.Cosine))
    } {
      val p = params.copy(metric = metric)
      val static = index.searchBatch(
        queries.map { case (i, v) => (i, v) }.toArray, p, rerank)
        .collect().map(key).sortBy(x => (x._1, x._2))
      val join = index.searchJoin(qdf, p, rerank)
        .collect().map(key).sortBy(x => (x._1, x._2))
      assert(static === join, s"paths diverge at rerankK=$rerank metric=$metric")
    }
  }

  test("PQ epoch roundtrip: disk-backed search matches in-memory; rerank scan prunes") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-pq-epoch").toString
    IvfPqIndex.writeEpoch(index, tmp)
    val back = IvfPqIndex.readEpoch(spark, tmp)
    val params = SearchParams(k = 5, nprobe = 4)
    val batch = queries.map { case (i, v) => (i, v) }.toArray
    val key = (r: org.apache.spark.sql.Row) =>
      (r.getLong(0), r.getInt(3), r.getLong(1), r.getDouble(2))
    val mem = index.searchBatch(batch, params, rerankK = 20)
      .collect().map(key).sortBy(x => (x._1, x._2))
    val disk = back.searchBatch(batch, params, rerankK = 20)
      .collect().map(key).sortBy(x => (x._1, x._2))
    assert(mem === disk)
    val plan = back.searchBatch(batch, params, rerankK = 20)
      .queryExecution.executedPlan.toString
    // both the codes scan and the rerank's raw scan prune to probed lists
    assert(plan.linesIterator.count(_.contains("PartitionFilters: [list_id")) >= 2,
      s"expected pruned codes+raw scans in:\n$plan")
  }

  test("epoch metric is written atomically and corrupt values refuse to load") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-pq-metric").toString
    IvfPqIndex.writeEpoch(index, tmp)
    val metricPath = java.nio.file.Paths.get(s"$tmp/metric.txt")
    // no .tmp residue from the atomic write, and the content parses strict
    assert(!java.nio.file.Files.exists(
      metricPath.resolveSibling("metric.txt.tmp")))
    assert(graft.Metric.parseStrict(
      java.nio.file.Files.readString(metricPath).trim) === index.metric)
    // a truncated/garbage metric must fail loudly, never default to L2 —
    // a Cosine-built epoch silently served as L2 is the failure this guards
    java.nio.file.Files.writeString(metricPath, "Cos")
    val e = intercept[IllegalArgumentException](IvfPqIndex.readEpoch(spark, tmp))
    assert(e.getMessage.contains("corrupt persisted metric"))
    // the user-request parser keeps the reference's L2 fallback untouched
    assert(graft.Metric.parse("Cos") === graft.Metric.L2)
  }

  test("null query vectors are dropped, counted, and logged — not silent") {
    val before = IvfFlatIndex.droppedNullQueries.get()
    val batch = Array((0L, queries.head._2), (1L, null: Array[Float]))
    val rows = index.searchBatch(batch, SearchParams(k = 3, nprobe = 8)).collect()
    assert(rows.map(_.getLong(0)).distinct === Array(0L)) // qid 1 has no rows
    assert(IvfFlatIndex.droppedNullQueries.get() === before + 1)
  }

  test("codebook parquet roundtrip preserves the (sub << 16) | centroid packing") {
    val sample = data.take(200).map(_._2).toArray
    val books = IvfPqIndex.trainCodebooks(sample, m = 2, nbits = 4)
    val tmp = java.nio.file.Files.createTempDirectory("graft-pq").toString
    IvfPqIndex.writeCodebooks(spark, books, s"$tmp/codebooks")
    val back = IvfPqIndex.readCodebooks(spark, s"$tmp/codebooks")
    assert(back.map(_.map(_.toSeq).toSeq).toSeq === books.map(_.map(_.toSeq).toSeq).toSeq)
  }

  test("trainSample caps rows by the driver byte budget, keeping the id-prefix") {
    val v = vectorsDF(data) // dim 16 -> 64 B float payload per row
    val capped = Lloyd.trainSample(v, maxTrain = 1000, maxBytes = 640) // 10 rows
    assert(capped.length === 10)
    val full = Lloyd.trainSample(v, maxTrain = 1000)
    assert(full.length === 1000) // default 256 MB budget never binds here
    // the cap keeps the deterministic lowest-id prefix, so training stays
    // reproducible — just on fewer rows
    assert(capped.map(_.toSeq).toSeq === full.take(10).map(_.toSeq).toSeq)
  }

  test("trainSample tolerates NULL ids: nulls sort first into the prefix, all-null still trains") {
    // round 19 (own review): the two-phase cutoff's max() IGNORES nulls,
    // so an all-null-id prefix used to read as "no sample" and fail a
    // build the single-phase plan trained fine on
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(StructField("id", LongType),
      StructField("vec", ArrayType(FloatType))))
    def df(rows: Seq[(java.lang.Long, Array[Float])]) = {
      val list = new java.util.ArrayList[Row]()
      rows.foreach { case (i, v) => list.add(Row(i, v.toSeq)) }
      spark.createDataFrame(list, schema)
    }
    val rnd = new scala.util.Random(3)
    def vec() = Array.fill(4)(rnd.nextFloat())
    // all-null ids: the sample is the rows themselves, never empty
    val allNull = df((0 until 30).map(_ => (null: java.lang.Long, vec())))
    assert(Lloyd.trainSample(allNull, maxTrain = 20).length === 20)
    assert(Lloyd.trainSample(allNull, maxTrain = 50).length === 30)
    // mixed: nulls sort FIRST under the ascending id prefix, so a cap
    // smaller than the null count + low ids must still fill completely
    val mixed = df(
      (0 until 5).map(_ => (null: java.lang.Long, vec())) ++
        (0L until 20L).map(i => (java.lang.Long.valueOf(i), vec())))
    assert(Lloyd.trainSample(mixed, maxTrain = 10).length === 10)
    assert(Lloyd.trainSample(mixed, maxTrain = 100).length === 25)
  }

  test("trainSample stays bounded and full under heavily duplicated ids") {
    // ADVICE r19: the `id <= cutoff` prefix holds EVERY tie at the
    // cutoff, so the old orderBy+limit over it could re-create the
    // partitions x capped TakeOrdered partial blowup. The strict/ties
    // split keeps the TakeOrdered input under `capped` rows by
    // construction; this pins the observable half — the sample still
    // fills to the cap, honors the id-prefix (every selected id <=
    // cutoff), and unique-id sampling stays bit-identical.
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    def vec(tag: Float) = Array.fill(4)(rnd.nextFloat()) :+ tag
    // 3 distinct ids x 200 rows each: any cap between 201 and 400 puts
    // the cutoff ON a 200-row tie group
    val dup = (0 until 600).map(i => ((i % 3).toLong, vec(i % 3).toSeq))
      .toDF("id", "vec")
    val sample = Lloyd.trainSample(dup, maxTrain = 250)
    assert(sample.length === 250)
    // id-prefix semantics: the tag column encodes the id — cutoff is 1,
    // so id=2 rows (tag 2f) must never be selected and all 200 id=0
    // rows must be (they sort strictly before the cutoff)
    assert(sample.forall(_.last <= 1f + 1e-6f))
    assert(sample.count(_.last < 0.5f) === 200)
    // unique ids: bit-identical to the ascending id prefix
    val uniq = (0L until 50L).map(i => (i, vec(i.toFloat).toSeq)).toDF("id", "vec")
    val s2 = Lloyd.trainSample(uniq, maxTrain = 20)
    val expect = uniq.orderBy("id").limit(20).collect()
      .map(_.getSeq[Float](1).toArray)
    assert(s2.map(_.toSeq).toSeq === expect.map(_.toSeq).toSeq)
  }

  test("nbits bounds are enforced") {
    val sample = data.take(100).map(_._2).toArray
    intercept[IllegalArgumentException](IvfPqIndex.trainCodebooks(sample, m = 4, nbits = 9))
    intercept[IllegalArgumentException](IvfPqIndex.trainCodebooks(sample, m = 5, nbits = 4))
  }
}
