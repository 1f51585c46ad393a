package graft.functions

import org.apache.spark.sql.functions._

import graft.{Metric, SparkSpec}
import graft.index.Knn

/**
 * Every custom expression ships both an interpreted `eval` and generated
 * code; this suite pins them to each other by running the same plans with
 * whole-stage codegen on (default) and off.
 */
class CodegenParitySpec extends SparkSpec {

  private def withCodegenOff[T](f: => T): T = {
    val key = "spark.sql.codegen.wholeStage"
    val old = spark.conf.get(key, "true")
    spark.conf.set(key, "false")
    try f finally spark.conf.set(key, old)
  }

  test("distance/normalize expressions: codegen == interpreted") {
    val vecs = vectorsDF(randomVectors(200, 12))
    val qs = queriesDF(randomVectors(5, 12, seed = 3))
    def run() = Knn.exact(qs, vecs, 7, Metric.Cosine)
      .collect().map(r => (r.getLong(0), r.getInt(3), r.getLong(1), r.getDouble(2)))
      .sortBy(x => (x._1, x._2)).toSeq
    val on = run()
    val off = withCodegenOff(run())
    assert(on === off)
  }

  test("text expressions (minhash/simhash/fingerprint): codegen == interpreted") {
    val s = spark
    import s.implicits._
    val docs = Seq((1L, "the quick brown fox"), (2L, "jumps over the lazy dog"), (3L, ""))
      .toDF("id", "t")
    def run() = docs.select(
      col("id"),
      text.minhash_signature(text.tokenize(col("t")), 16),
      text.simhash64(text.tokenize(col("t"))),
      text.fingerprint(col("t")))
      .collect().map(r => (r.getLong(0), r.getSeq[Long](1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1).toSeq
    val on = run()
    val off = withCodegenOff(run())
    assert(on === off)
  }

  test("poly_fingerprint kernel == the split/ascii/aggregate HOF fold it replaced (r20)") {
    val s = spark
    import s.implicits._
    // ASCII, unicode (2/3/4-byte code points incl. a surrogate pair),
    // empty, single-char, long, and null — the kernel must reproduce the
    // composed-builtin fold bit-for-bit on every one
    val docs = Seq(
      (1L, "the quick brown fox 123"),
      (2L, "héllo w世rld"),
      (3L, "emoji 😀 pair"),
      (4L, ""),
      (5L, "x"),
      (6L, ("abc" * 500) + "ü"),
      (7L, null.asInstanceOf[String]))
      .toDF("id", "t")
    def vals(c: org.apache.spark.sql.Column) = docs.select(col("id"), c)
      .collect().map(r => (r.getLong(0), if (r.isNullAt(1)) None else Some(r.getLong(1))))
      .sortBy(_._1).toSeq
    val kernel = vals(text.fingerprint(col("t")))
    val hofs = vals(text.fingerprintViaHofs(col("t")))
    assert(kernel === hofs)
    val off = withCodegenOff(vals(text.fingerprint(col("t"))))
    assert(kernel === off)
  }

  test("broadcast_set_overlap: codegen == interpreted, null semantics match arrays_overlap's coalesced form") {
    val s = spark
    import s.implicits._
    import org.apache.spark.unsafe.types.UTF8String
    val set = new java.util.HashSet[UTF8String]()
    Seq("quick brown", "lazy dog").foreach(x => set.add(UTF8String.fromString(x)))
    val bc = spark.sparkContext.broadcast(set)
    val docs = Seq(
      (1L, "the quick brown fox"), // bigram hit
      (2L, "nothing shared here at all"), // miss
      (3L, ""), // empty token array -> empty ngram array -> false
      (4L, null.asInstanceOf[String])) // null text -> null (callers coalesce)
      .toDF("id", "t")
    def run() = docs.select(col("id"),
      text.broadcast_set_overlap(
        array_distinct(text.word_ngrams(text.tokenize(col("t")), 2)), bc))
      .collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) None else Some(r.getBoolean(1))))
      .sortBy(_._1).toSeq
    val on = run()
    val off = withCodegenOff(run())
    assert(on === off)
    assert(on === Seq(1L -> Some(true), 2L -> Some(false),
      3L -> Some(false), 4L -> None))
  }

  test("PQ encode: codegen == interpreted") {
    val s = spark
    import s.implicits._
    val sample = randomVectors(200, 8).map(_._2).toArray
    val books = graft.index.IvfPqIndex.trainCodebooks(sample, m = 2, nbits = 4)
    val bc = spark.sparkContext.broadcast(books)
    val df = vectorsDF(randomVectors(50, 8, seed = 4))
    def run() = df.select(
      col("id"),
      pq.pq_encode(col("vec"), bc).as("c"))
      .collect().map(r => (r.getLong(0), r.getSeq[Byte](1)))
      .sortBy(_._1).toSeq
    val on = run()
    val off = withCodegenOff(run())
    assert(on === off)
  }

  test("PQ ADC distance (SQL-path expression): codegen == interpreted, all three metrics, null codes null") {
    import org.apache.spark.sql.graftshims
    val sample = randomVectors(200, 8).map(_._2).toArray
    val books = graft.index.IvfPqIndex.trainCodebooks(sample, m = 2, nbits = 4)
    val bc = spark.sparkContext.broadcast(books)
    val q = randomVectors(1, 8, seed = 9).head._2
    val df = vectorsDF(randomVectors(60, 8, seed = 5))
      .select(col("id"), graftshims.column(
        PqEncode(graftshims.expression(col("vec")), bc)).as("codes"))
      // one NULL codes row (nullIntolerant must propagate, not crash) and
      // one WRONG-LENGTH row (malformed codes rank last via MaxValue)
      .union(spark.range(1).select(lit(999L).as("id"),
        lit(null).cast("array<tinyint>").as("codes")))
      .union(spark.range(1).select(lit(998L).as("id"),
        array(lit(1.toByte)).as("codes")))
    def run(metricId: Int) = df.select(
      col("id"),
      graftshims.column(PqAdcDistance(
        graftshims.expression(col("codes")), q.toIndexedSeq, bc, metricId)).as("d"))
      .collect().map(r => (r.getLong(0),
        if (r.isNullAt(1)) None else Some(r.getDouble(1))))
      .sortBy(_._1).toSeq
    Seq(VectorKernels.METRIC_L2, VectorKernels.METRIC_IP,
      VectorKernels.METRIC_COSINE).foreach { m =>
      val on = run(m)
      val off = withCodegenOff(run(m))
      assert(on === off, s"metric $m: codegen != interpreted")
      assert(on.find(_._1 == 999L).exists(_._2.isEmpty),
        s"metric $m: NULL codes must yield NULL distance")
      assert(on.find(_._1 == 998L).exists(_._2.contains(Double.MaxValue)),
        s"metric $m: wrong-length codes must rank last (MaxValue), not crash")
      // the lookup-sum must equal the table-free direct accumulation the
      // facade paths use (adcDistanceDirectBytes) — one shared semantics
      val direct = vectorsDF(randomVectors(60, 8, seed = 5)).collect().map { r =>
        val v = r.getSeq[Float](1).toArray
        val codes = PqKernels.encode(v, books)
        (r.getLong(0), Some(PqKernels.adcDistanceDirectBytes(
          PqKernels.prepQuery(q, m), books, m, codes)))
      }.sortBy(_._1).toSeq
      assert(on.filter(_._1 < 900L) === direct,
        s"metric $m: expression != direct kernel accumulation")
    }
  }

  test("PQ range keep (never-dismiss bound): codegen == interpreted across the malformed matrix") {
    import org.apache.spark.sql.graftshims
    val sample = randomVectors(200, 8).map(_._2).toArray
    val books = graft.index.IvfPqIndex.trainCodebooks(sample, m = 2, nbits = 4)
    val bc = spark.sparkContext.broadcast(books)
    val q = randomVectors(1, 8, seed = 9).head._2
    // errs: list 0 tight, list 1 loose, list 2 NaN (poisoned), list 3 inf
    val errs = spark.sparkContext.broadcast(
      Array(0.1, 100.0, Double.NaN, Double.PositiveInfinity))
    val base = vectorsDF(randomVectors(40, 8, seed = 5))
      .select(col("id"), graftshims.column(
        PqEncode(graftshims.expression(col("vec")), bc)).as("codes"),
        (col("id") % 4).cast("int").as("list_id"))
      // NULL codes, wrong-length codes, NULL list, out-of-range list —
      // every unscorable flavor must KEEP (true), never null/false-crash
      .union(spark.range(1).select(lit(999L).as("id"),
        lit(null).cast("array<tinyint>").as("codes"), lit(0).as("list_id")))
      .union(spark.range(1).select(lit(998L).as("id"),
        array(lit(1.toByte)).as("codes"), lit(0).as("list_id")))
      .union(spark.range(1).select(lit(997L).as("id"),
        array(lit(0.toByte), lit(0.toByte)).as("codes"),
        lit(null).cast("int").as("list_id")))
      .union(spark.range(1).select(lit(996L).as("id"),
        array(lit(0.toByte), lit(0.toByte)).as("codes"), lit(77).as("list_id")))
    def run(radius: Double) = base.select(
      col("id"),
      graftshims.column(PqRangeKeep(
        graftshims.expression(col("codes")),
        graftshims.expression(col("list_id")),
        q.toIndexedSeq, radius, bc, errs)).as("keep"))
      .collect().map(r => (r.getLong(0), r.getBoolean(1))).sortBy(_._1).toSeq
    Seq(0.5, 4.0, 50.0).foreach { r =>
      val on = run(r)
      val off = withCodegenOff(run(r))
      assert(on === off, s"radius $r: codegen != interpreted")
      Seq(999L, 998L, 997L, 996L).foreach { id =>
        assert(on.find(_._1 == id).exists(_._2),
          s"radius $r: unscorable row $id must be KEPT (never dismissed)")
      }
      // NaN / inf err lists always keep
      assert(on.filter(t => t._1 < 900L && (t._1 % 4 == 2 || t._1 % 4 == 3))
        .forall(_._2), s"radius $r: non-finite err lists must keep")
      // loose-err list keeps everything at any radius (bound >= 100^2)
      assert(on.filter(t => t._1 < 900L && t._1 % 4 == 1).forall(_._2))
    }
    // semantics vs the direct kernel on the tight-err list: keep iff
    // adc <= (sqrt(r)+0.1)^2
    val r = 4.0
    val on = run(r)
    vectorsDF(randomVectors(40, 8, seed = 5)).collect()
      .filter(_.getLong(0) % 4 == 0).foreach { row =>
        val codes = PqKernels.encode(row.getSeq[Float](1).toArray, books)
        val adc = PqKernels.adcDistanceDirectBytes(
          PqKernels.prepQuery(q, VectorKernels.METRIC_L2), books,
          VectorKernels.METRIC_L2, codes)
        val b = math.sqrt(r) + 0.1
        assert(on.find(_._1 == row.getLong(0)).exists(_._2 == (adc <= b * b)),
          s"row ${row.getLong(0)}: keep must equal the kernel bound")
      }
    // the IP twin (Cauchy–Schwarz bound): codegen == interpreted, keeps
    // all unscorable flavors, and agrees with the kernel bound
    // adc <= r + ||q||*e on the tight-err list
    def runIp(radius: Double) = base.select(
      col("id"),
      graftshims.column(PqRangeKeep(
        graftshims.expression(col("codes")),
        graftshims.expression(col("list_id")),
        q.toIndexedSeq, radius, bc, errs,
        VectorKernels.METRIC_IP)).as("keep"))
      .collect().map(r => (r.getLong(0), r.getBoolean(1))).sortBy(_._1).toSeq
    val qNorm = math.sqrt(q.map(x => x.toDouble * x.toDouble).sum)
    Seq(-2.0, 0.0, 2.0).foreach { rr =>
      val onIp = runIp(rr)
      val offIp = withCodegenOff(runIp(rr))
      assert(onIp === offIp, s"IP radius $rr: codegen != interpreted")
      Seq(999L, 998L, 997L, 996L).foreach { id =>
        assert(onIp.find(_._1 == id).exists(_._2),
          s"IP radius $rr: unscorable row $id must be KEPT")
      }
      vectorsDF(randomVectors(40, 8, seed = 5)).collect()
        .filter(_.getLong(0) % 4 == 0).foreach { row =>
          val codes = PqKernels.encode(row.getSeq[Float](1).toArray, books)
          val adc = PqKernels.adcDistanceDirectBytes(
            PqKernels.prepQuery(q, VectorKernels.METRIC_IP), books,
            VectorKernels.METRIC_IP, codes)
          assert(onIp.find(_._1 == row.getLong(0))
            .exists(_._2 == (adc <= rr + qNorm * 0.1)),
            s"IP row ${row.getLong(0)}: keep must equal the kernel bound")
        }
    }
  }

  test("PQ ADC distance (runtime-query column): codegen == interpreted, agrees with the literal twin") {
    import org.apache.spark.sql.graftshims
    val sample = randomVectors(200, 8).map(_._2).toArray
    val books = graft.index.IvfPqIndex.trainCodebooks(sample, m = 2, nbits = 4)
    val bc = spark.sparkContext.broadcast(books)
    val q = randomVectors(1, 8, seed = 9).head._2
    val qLit = array(q.map(x => lit(x)).toIndexedSeq: _*).cast("array<float>")
    val base = vectorsDF(randomVectors(60, 8, seed = 5))
      .select(col("id"), graftshims.column(
        PqEncode(graftshims.expression(col("vec")), bc)).as("codes"),
        qLit.as("qv"))
      // malformed rows on EITHER side: NULL codes (null propagates),
      // wrong-length codes (MaxValue), NULL query (null propagates),
      // wrong-DIM query (MaxValue)
      .union(spark.range(1).select(lit(999L).as("id"),
        lit(null).cast("array<tinyint>").as("codes"), qLit.as("qv")))
      .union(spark.range(1).select(lit(998L).as("id"),
        array(lit(1.toByte)).as("codes"), qLit.as("qv")))
      .union(spark.range(1).select(lit(997L).as("id"),
        array(lit(0.toByte), lit(0.toByte)).as("codes"),
        lit(null).cast("array<float>").as("qv")))
      .union(spark.range(1).select(lit(996L).as("id"),
        array(lit(0.toByte), lit(0.toByte)).as("codes"),
        array(lit(1.0f)).cast("array<float>").as("qv")))
      // a NULL ELEMENT inside the query array (r17 advice: toFloatArray
      // silently zero-fills it — the expression must rank the pair last,
      // not score a vector the caller never wrote)
      .union(spark.range(1).select(lit(995L).as("id"),
        array(lit(0.toByte), lit(0.toByte)).as("codes"),
        array((lit(0.5f) +: lit(null).cast("float") +:
          Seq.fill(6)(lit(0.5f))): _*).cast("array<float>").as("qv")))
      // a TOO-LONG query (r17 advice: used to silently score a prefix —
      // and for cosine, normalize over the full length while doing so)
      .union(spark.range(1).select(lit(994L).as("id"),
        array(lit(0.toByte), lit(0.toByte)).as("codes"),
        array(Seq.fill(9)(lit(1.0f)): _*).cast("array<float>").as("qv")))
    def run(metricId: Int) = base.select(
      col("id"),
      graftshims.column(PqAdcDistanceCol(
        graftshims.expression(col("codes")),
        graftshims.expression(col("qv")), bc, metricId)).as("d"))
      .collect().map(r => (r.getLong(0),
        if (r.isNullAt(1)) None else Some(r.getDouble(1))))
      .sortBy(_._1).toSeq
    Seq(VectorKernels.METRIC_L2, VectorKernels.METRIC_IP,
      VectorKernels.METRIC_COSINE).foreach { m =>
      val on = run(m)
      val off = withCodegenOff(run(m))
      assert(on === off, s"metric $m: codegen != interpreted")
      assert(on.find(_._1 == 999L).exists(_._2.isEmpty),
        s"metric $m: NULL codes must yield NULL")
      assert(on.find(_._1 == 998L).exists(_._2.contains(Double.MaxValue)),
        s"metric $m: wrong-length codes must rank last")
      assert(on.find(_._1 == 997L).exists(_._2.isEmpty),
        s"metric $m: NULL query must yield NULL")
      assert(on.find(_._1 == 996L).exists(_._2.contains(Double.MaxValue)),
        s"metric $m: wrong-dim query must rank last, not crash")
      assert(on.find(_._1 == 995L).exists(_._2.contains(Double.MaxValue)),
        s"metric $m: a null-ELEMENT query must rank last, not score zero-filled")
      assert(on.find(_._1 == 994L).exists(_._2.contains(Double.MaxValue)),
        s"metric $m: a too-LONG query must rank last, not score a prefix")
      // the runtime-query expression must agree with the literal-query
      // twin (PqAdcDistance's table path) on every well-formed row —
      // one ADC semantics regardless of how the query arrives
      val lit_ = base.filter(col("id") < 900L).select(
        col("id"),
        graftshims.column(PqAdcDistance(
          graftshims.expression(col("codes")), q.toIndexedSeq, bc, m)).as("d"))
        .collect().map(r => (r.getLong(0), Some(r.getDouble(1)))).sortBy(_._1).toSeq
      assert(on.filter(_._1 < 900L) === lit_,
        s"metric $m: runtime-query ADC != literal-query ADC")
    }
  }

  test("PQ range keep (per-row query column): codegen == interpreted, kernel-bound agreement, keep-on-unscorable") {
    import org.apache.spark.sql.graftshims
    val sample = randomVectors(200, 8).map(_._2).toArray
    val books = graft.index.IvfPqIndex.trainCodebooks(sample, m = 2, nbits = 4)
    val bc = spark.sparkContext.broadcast(books)
    // errs: list 0 tight, list 1 loose, list 2 NaN, list 3 inf — the
    // same four-flavor layout as the literal twin's test
    val errs = spark.sparkContext.broadcast(
      Array(0.1, 100.0, Double.NaN, Double.PositiveInfinity))
    val q1 = randomVectors(1, 8, seed = 9).head._2
    val q2 = randomVectors(1, 8, seed = 10).head._2
    def qLit(q: Array[Float]) =
      array(q.map(x => lit(x)).toIndexedSeq: _*).cast("array<float>")
    // per-row queries ALTERNATE (the interleaved-stream memo pattern)
    val base = vectorsDF(randomVectors(40, 8, seed = 5))
      .select(col("id"), graftshims.column(
        PqEncode(graftshims.expression(col("vec")), bc)).as("codes"),
        (col("id") % 4).cast("int").as("list_id"),
        when(col("id") % 2 === 0, qLit(q1)).otherwise(qLit(q2)).as("qv"))
      // unscorable flavors: NULL codes, wrong-length codes, NULL list,
      // out-of-range list, NULL query, null-ELEMENT query — ALL keep
      .union(spark.range(1).select(lit(999L).as("id"),
        lit(null).cast("array<tinyint>").as("codes"), lit(0).as("list_id"),
        qLit(q1).as("qv")))
      .union(spark.range(1).select(lit(998L).as("id"),
        array(lit(1.toByte)).as("codes"), lit(0).as("list_id"),
        qLit(q1).as("qv")))
      .union(spark.range(1).select(lit(997L).as("id"),
        array(lit(0.toByte), lit(0.toByte)).as("codes"),
        lit(null).cast("int").as("list_id"), qLit(q1).as("qv")))
      .union(spark.range(1).select(lit(996L).as("id"),
        array(lit(0.toByte), lit(0.toByte)).as("codes"), lit(77).as("list_id"),
        qLit(q1).as("qv")))
      .union(spark.range(1).select(lit(995L).as("id"),
        array(lit(0.toByte), lit(0.toByte)).as("codes"), lit(0).as("list_id"),
        lit(null).cast("array<float>").as("qv")))
      .union(spark.range(1).select(lit(994L).as("id"),
        array(lit(0.toByte), lit(0.toByte)).as("codes"), lit(0).as("list_id"),
        array((lit(0.5f) +: lit(null).cast("float") +:
          Seq.fill(6)(lit(0.5f))): _*).cast("array<float>").as("qv")))
    def run(radius: Double, metricId: Int, tol: Double = 0.0) = base.select(
      col("id"),
      graftshims.column(PqRangeKeepCol(
        graftshims.expression(col("codes")),
        graftshims.expression(col("list_id")),
        graftshims.expression(col("qv")),
        radius, bc, errs, metricId, tol)).as("keep"))
      .collect().map(r => (r.getLong(0), r.getBoolean(1))).sortBy(_._1).toSeq
    def qOf(id: Long): Array[Float] = if (id % 2 == 0) q1 else q2
    // L2 arm
    Seq(0.5, 4.0, 50.0).foreach { r =>
      val on = run(r, VectorKernels.METRIC_L2)
      assert(on === withCodegenOff(run(r, VectorKernels.METRIC_L2)),
        s"L2 radius $r: codegen != interpreted")
      Seq(999L, 998L, 997L, 996L, 995L, 994L).foreach { id =>
        assert(on.find(_._1 == id).exists(_._2),
          s"L2 radius $r: unscorable row $id must be KEPT")
      }
      assert(on.filter(t => t._1 < 900L && (t._1 % 4 == 2 || t._1 % 4 == 3))
        .forall(_._2), s"L2 radius $r: non-finite err lists must keep")
      // tight-err list: keep iff the kernel bound, per THAT ROW's query
      vectorsDF(randomVectors(40, 8, seed = 5)).collect()
        .filter(_.getLong(0) % 4 == 0).foreach { row =>
          val id = row.getLong(0)
          val codes = PqKernels.encode(row.getSeq[Float](1).toArray, books)
          val adc = PqKernels.adcDistanceDirectBytes(
            PqKernels.prepQuery(qOf(id), VectorKernels.METRIC_L2), books,
            VectorKernels.METRIC_L2, codes)
          val b = math.sqrt(r) + 0.1
          assert(on.find(_._1 == id).exists(_._2 == (adc <= b * b)),
            s"L2 row $id: keep must equal the kernel bound for ITS query")
        }
    }
    // IP arm (per-row ||q||)
    Seq(-2.0, 0.0, 2.0).foreach { r =>
      val on = run(r, VectorKernels.METRIC_IP)
      assert(on === withCodegenOff(run(r, VectorKernels.METRIC_IP)),
        s"IP radius $r: codegen != interpreted")
      vectorsDF(randomVectors(40, 8, seed = 5)).collect()
        .filter(_.getLong(0) % 4 == 0).foreach { row =>
          val id = row.getLong(0)
          val q = qOf(id)
          val codes = PqKernels.encode(row.getSeq[Float](1).toArray, books)
          val adc = PqKernels.adcDistanceDirectBytes(
            PqKernels.prepQuery(q, VectorKernels.METRIC_IP), books,
            VectorKernels.METRIC_IP, codes)
          val qn = math.sqrt(q.map(x => x.toDouble * x.toDouble).sum)
          assert(on.find(_._1 == id).exists(_._2 == (adc <= r + qn * 0.1)),
            s"IP row $id: keep must equal the per-row Cauchy–Schwarz bound")
        }
    }
    // cosine arm: near-unit queries score; a degenerate query ROW keeps
    val n1 = VectorKernels.normalize(q1)
    val n2 = VectorKernels.normalize(q2)
    val cosBase = vectorsDF(randomVectors(40, 8, seed = 5))
      .select(col("id"), graftshims.column(
        PqEncode(graftshims.expression(col("vec")), bc)).as("codes"),
        (col("id") % 4).cast("int").as("list_id"),
        when(col("id") % 2 === 0, qLit(n1)).otherwise(qLit(n2)).as("qv"))
      .union(spark.range(1).select(lit(993L).as("id"),
        array(lit(0.toByte), lit(0.toByte)).as("codes"), lit(0).as("list_id"),
        qLit(q1.map(x => x * 1e-5f)).as("qv")))
    def runCos(radius: Double) = cosBase.select(
      col("id"),
      graftshims.column(PqRangeKeepCol(
        graftshims.expression(col("codes")),
        graftshims.expression(col("list_id")),
        graftshims.expression(col("qv")),
        radius, bc, errs, VectorKernels.METRIC_COSINE, 1e-3)).as("keep"))
      .collect().map(r => (r.getLong(0), r.getBoolean(1))).sortBy(_._1).toSeq
    Seq(0.2, 0.8).foreach { r =>
      val on = runCos(r)
      assert(on === withCodegenOff(runCos(r)),
        s"cosine radius $r: codegen != interpreted")
      assert(on.find(_._1 == 993L).exists(_._2),
        s"cosine radius $r: a degenerate (tiny-norm) query ROW must keep")
      vectorsDF(randomVectors(40, 8, seed = 5)).collect()
        .filter(_.getLong(0) % 4 == 0).foreach { row =>
          val id = row.getLong(0)
          val q = if (id % 2 == 0) n1 else n2
          val codes = PqKernels.encode(row.getSeq[Float](1).toArray, books)
          val adc = PqKernels.adcDistanceDirectBytes(
            PqKernels.prepQuery(q, VectorKernels.METRIC_COSINE), books,
            VectorKernels.METRIC_COSINE, codes)
          assert(on.find(_._1 == id).exists(_._2 == (adc <= r + 0.1)),
            s"cosine row $id: keep must equal adc <= r + err on the tight list")
        }
    }
  }
}
