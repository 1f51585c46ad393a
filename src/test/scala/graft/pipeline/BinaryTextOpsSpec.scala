package graft.pipeline

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Round-9 operator wave: binary (sign-bit) Hamming ANN, exact token-span
  * dedup, and the PII scrubber. Each test pins the operator against an
  * independent in-JVM reference computation, not against itself. */
class BinaryTextOpsSpec extends SparkSpec {

  private def signPackRef(v: Array[Float], word: Int): Long = {
    var acc = 0L
    var b = 0
    while (b < 32) {
      if (v(word * 32 + b) > 0f) acc |= (1L << b)
      b += 1
    }
    acc
  }

  test("signPackWord matches the bit-twiddling reference on both words") {
    val rows = randomVectors(50, 64, seed = 7)
    val df = vectorsDF(rows)
      .select(col("id"),
        EmbeddingOps.signPackWord(col("vec"), 0).as("w0"),
        EmbeddingOps.signPackWord(col("vec"), 1).as("w1"))
    val got = df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    val want = rows.map { case (id, v) => (id, signPackRef(v, 0), signPackRef(v, 1)) }
    assert(got.toSeq == want)
  }

  test("hammingSearch equals the brute-force Hamming reference incl. ties") {
    val corpus = randomVectors(300, 64, seed = 11)
    val queries = corpus.take(8).map { case (id, v) => (id + 1000, v.map(x => -x)) }
    val got = Similarity
      .hammingSearch(queriesDF(queries.toIndexedSeq), vectorsDF(corpus), dim = 64, k = 5)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3)))
      .sortBy(t => (t._1, t._4))
    val packed = corpus.map { case (id, v) => (id, signPackRef(v, 0), signPackRef(v, 1)) }
    val want = queries.flatMap { case (qid, qv) =>
      val q0 = signPackRef(qv, 0); val q1 = signPackRef(qv, 1)
      packed
        .map { case (id, w0, w1) =>
          (id, (java.lang.Long.bitCount(w0 ^ q0) + java.lang.Long.bitCount(w1 ^ q1)).toLong)
        }
        .sortBy { case (id, d) => (d, id) }
        .take(5)
        .zipWithIndex
        .map { case ((id, d), i) => (qid, id, d, i + 1) }
    }.sortBy(t => (t._1, t._4))
    assert(got.toSeq == want.toSeq)
  }

  test("rerank entry points reject candK < k (a swapped pair silently shrinks results)") {
    val corpus = randomVectors(20, 16, seed = 3)
    val queries = corpus.take(2).map { case (id, v) => (id + 500, v) }
    intercept[IllegalArgumentException] {
      Similarity.hammingSearchRerank(queriesDF(queries.toIndexedSeq),
        vectorsDF(corpus), dim = 16, candK = 4, k = 10)
    }
    intercept[IllegalArgumentException] {
      Similarity.sq8SearchRerank(queriesDF(queries.toIndexedSeq),
        vectorsDF(corpus), candK = 4, k = 10)
    }
  }

  test("hammingSearchRerank with candK = |corpus| equals exact L2 knn") {
    val corpus = randomVectors(200, 64, seed = 13)
    val queries = corpus.take(5).map { case (id, v) => (id + 500, v) }
    val viaHamming = Similarity
      .hammingSearchRerank(queriesDF(queries.toIndexedSeq), vectorsDF(corpus),
        dim = 64, candK = 200, k = 4)
      .select("qid", "id", "rank")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).sortBy(t => (t._1, t._3))
    val exact = graft.index.Knn
      .exact(queriesDF(queries.toIndexedSeq), vectorsDF(corpus), k = 4)
      .select("qid", "id", "rank")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).sortBy(t => (t._1, t._3))
    assert(viaHamming.toSeq == exact.toSeq)
  }

  test("sq8SearchRerank with candK = |corpus| equals exact L2 knn") {
    val corpus = randomVectors(150, 64, seed = 17)
    val queries = corpus.take(5).map { case (id, v) => (id + 500, v) }
    val viaSq8 = Similarity
      .sq8SearchRerank(queriesDF(queries.toIndexedSeq), vectorsDF(corpus), candK = 150, k = 4)
      .select("qid", "id", "rank")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).sortBy(t => (t._1, t._3))
    val exact = graft.index.Knn
      .exact(queriesDF(queries.toIndexedSeq), vectorsDF(corpus), k = 4)
      .select("qid", "id", "rank")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).sortBy(t => (t._1, t._3))
    assert(viaSq8.toSeq == exact.toSeq)
  }

  test("labelCentroids computes exact fixed-point sums and derived means") {
    val s = spark
    import s.implicits._
    val df = Seq(
      (0L, Array(1.5f, -0.25f), 1),
      (1L, Array(2.5f, 0.75f), 1),
      (2L, Array(-1.0f, 4.0f), 2)
    ).toDF("vec_id", "embedding", "label")
    val got = EmbeddingOps.labelCentroids(df)
      .select("label", "pos", "n", "sum_micros", "mean_component")
      .collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
      .sortBy(t => (t._1, t._2))
    assert(got.toSeq == Seq(
      (1, 0, 2L, 4000000L, 2.0),
      (1, 1, 2L, 500000L, 0.25),
      (2, 0, 1L, -1000000L, -1.0),
      (2, 1, 1L, 4000000L, 4.0)))
  }

  test("spanPairs finds exactly the documents sharing a full token span") {
    val s = spark
    import s.implicits._
    val base = (1 to 20).map(i => s"tok$i").mkString(" ")
    val docs = Seq(
      (0L, base + " tail zero"), // shares the 20-token prefix with doc 1
      (1L, base + " tail one"),
      (2L, "a completely different short document body here"),
      (3L, (30 to 60).map(i => s"tok$i").mkString(" "))
    ).toDF("doc_id", "text")
    val got = Dedup.spanPairs(docs, spanLen = 15)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(t => (t._1, t._2))
    // docs 0 and 1 share the 21-token prefix "tok1..tok20 tail" and ONLY
    // that: 22 tokens each, windows at offsets 0..7, of which offsets 0..6
    // lie fully inside the shared prefix => 7 shared spans
    assert(got.toSeq == Seq((0L, 1L, 7L)))
  }

  test("heavyHitters is exact, partitioning-invariant, and MG keeps the guarantee") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(5)
    // Zipf-ish corpus: token i appears ~ 2000/i times, shuffled into docs
    val stream = (1 to 60).flatMap(i => Seq.fill(2000 / i)(s"w$i"))
    val docs = rnd.shuffle(stream).grouped(40).zipWithIndex
      .map { case (g, i) => (i.toLong, g.mkString(" ")) }.toSeq
      .toDF("doc_id", "text")
    val naive = stream.groupBy(identity).view.mapValues(_.size).toSeq
      .sortBy { case (t, c) => (-c, t) }.take(10)
      .zipWithIndex.map { case ((t, c), i) => (t, c.toLong, i + 1) }
    def run(df: org.apache.spark.sql.DataFrame, cap: Int) =
      TextAnalysis.heavyHitters(df, k = 10, capacity = cap)
        .collect().map(r => (r.getString(0), r.getLong(1), r.getInt(2))).toSeq
    assert(run(docs, 256) == naive)
    assert(run(docs.repartition(7), 256) == naive) // partitioning-invariant
    // tiny capacity still exact while the k-th count > N/capacity
    val n = stream.size
    assert(naive.last._2 > n / 64)
    assert(run(docs.repartition(3), 64) == naive)
  }

  test("misraGries keeps every token above the n/capacity threshold") {
    val tokens = Seq.fill(900)("hot") ++ (1 to 2100).map(i => s"cold$i")
    val kept = TextAnalysis.misraGries(
      new scala.util.Random(3).shuffle(tokens).iterator, capacity = 8)
    assert(kept.contains("hot")) // 900 > 3000/8 = 375
    assert(kept.size <= 8)
  }

  test("piiScrub counts and redacts emails, phones, and IPv4s") {
    val s = spark
    import s.implicits._
    val docs = Seq(
      (0L, "mail a.b-c_d@ex-ample.org and x@y.io phone +1-555-0199 ip 10.2.3.4 done"),
      (1L, "no pii at all in this row"),
      (2L, "edge 999.1.1.1 still matches the ip pattern; 1.2.3 does not")
    ).toDF("doc_id", "text")
    val got = TextAnalysis.piiScrub(docs)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4)))
      .sortBy(_._1)
    assert(got(0) == ((0L, 2L, 1L, 1L,
      "mail <EMAIL> and <EMAIL> phone <PHONE> ip <IP> done")))
    assert(got(1) == ((1L, 0L, 0L, 0L, "no pii at all in this row")))
    assert(got(2)._4 == 1L)
    assert(got(2)._5.contains("edge <IP> still"))
    assert(got(2)._5.contains("1.2.3 does not"))
  }
}
