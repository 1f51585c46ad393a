package graft.pipeline

import org.apache.spark.sql.functions._

import graft.SparkSpec

class TrainingPrepSpec extends SparkSpec {

  private lazy val docs = {
    val s = spark
    import s.implicits._
    // (doc_id, text, lang, source): token counts 4 / 3 / 2 / 5 / 3 / 1
    Seq(
      (0L, "alpha beta gamma delta", "en", "srcA"),
      (1L, "epsilon zeta eta", "en", "srcA"),
      (2L, "theta iota", "de", "srcA"),
      (3L, "kappa lambda mu nu xi", "de", "srcB"),
      (4L, "omicron pi rho", "en", "srcB"),
      (5L, "sigma", "zh", "srcB"))
      .toDF("doc_id", "text", "lang", "source")
  }

  test("packSequences chops the per-shard stream at exact token offsets") {
    // shards=1 so each source is one stream; budget 5 forces mid-stream cuts
    val out = TrainingPrep.packSequences(docs, budget = 5, shards = 1)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(3), r.getLong(4), r.getLong(5)))
    // srcA stream: doc0 tokens 4 (start 0), doc1 tokens 3 (start 4),
    //              doc2 tokens 2 (start 7)
    // srcB stream: doc3 tokens 5 (start 0), doc4 tokens 3 (start 5),
    //              doc5 tokens 1 (start 8)
    assert(out === Array(
      (0L, 4L, 0L, 0L), (1L, 3L, 0L, 4L), (2L, 2L, 1L, 2L),
      (3L, 5L, 0L, 0L), (4L, 3L, 1L, 0L), (5L, 1L, 1L, 3L)))
  }

  test("packSequences shard boundaries never mix documents across shards") {
    val out = TrainingPrep.packSequences(docs, budget = 5, shards = 2)
      .select("doc_id", "shard").collect()
      .map(r => (r.getLong(0), r.getInt(1))).toMap
    assert(out === Map(0L -> 0, 1L -> 1, 2L -> 0, 3L -> 1, 4L -> 0, 5L -> 1))
  }

  test("sampleStratified is a pure function of (id, stratum) with per-stratum rates") {
    def bucket(id: Long): Long = ((id * 48271L + 11L) % 2147483647L) % 1000L
    val kept = TrainingPrep.sampleStratified(
      docs, Map("en" -> 1000, "de" -> 0), defaultPermille = 500)
      .collect().map(_.getLong(0)).toSet
    val expected = docs.collect().flatMap { r =>
      val (id, lang) = (r.getLong(0), r.getString(2))
      val rate = lang match { case "en" => 1000L; case "de" => 0L; case _ => 500L }
      if (bucket(id) < rate) Some(id) else None
    }.toSet
    assert(kept === expected)
    assert(Set(0L, 1L, 4L).subsetOf(kept)) // rate 1000 keeps every en doc
    assert(!kept.contains(2L) && !kept.contains(3L)) // rate 0 drops every de doc
    // repartitioning must not change the sample (determinism contract)
    val kept2 = TrainingPrep.sampleStratified(
      docs.repartition(7), Map("en" -> 1000, "de" -> 0), defaultPermille = 500)
      .collect().map(_.getLong(0)).toSet
    assert(kept2 === kept)
  }

  test("contamination finds shared rare n-grams and caps boilerplate by df") {
    val s = spark
    import s.implicits._
    val corpus = Seq(
      (10L, "one two three four five"), // shares "two three four" with eval
      (11L, "alpha beta gamma delta"), // no overlap
      (12L, "two three four again here")) // also shares it
      .toDF("doc_id", "text").withColumn("lang", lit("en"))
    val eval = Seq((90L, "two three four and more"))
      .toDF("doc_id", "text").withColumn("lang", lit("en"))
    val hits = TrainingPrep.contamination(corpus, eval, n = 3, maxDf = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(hits === Set((10L, 1L, 1L), (12L, 1L, 1L)))
    // maxDf = 1: the shared shingle appears in 2 corpus docs -> dropped
    val capped = TrainingPrep.contamination(corpus, eval, n = 3, maxDf = 1).count()
    assert(capped === 0L)
  }

  test("chunkDocuments covers every token with sliding ragged-tail windows") {
    val s = spark
    import s.implicits._
    // 10 tokens, window 4, stride 3 -> starts 0,3,6 (the start-6 window
    // reaches the last token, so no redundant trailing chunk)
    val d = Seq((1L, "t0 t1 t2 t3 t4 t5 t6 t7 t8 t9"), (2L, "a b"), (3L, ""))
      .toDF("doc_id", "text")
    val out = TrainingPrep.chunkDocuments(d, window = 4, stride = 3)
      .orderBy("doc_id", "chunk_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4)))
    assert(out === Array(
      (1L, 0L, 0L, 4L, "t0 t1 t2 t3"),
      (1L, 1L, 3L, 4L, "t3 t4 t5 t6"),
      (1L, 2L, 6L, 4L, "t6 t7 t8 t9"),
      (2L, 0L, 0L, 2L, "a b"), // short doc: one whole-doc chunk
      (3L, 0L, 0L, 0L, ""))) // empty doc: one empty chunk, never dropped
    // stride == window -> disjoint cover, token counts sum to doc length
    val cover = TrainingPrep.chunkDocuments(d, window = 4, stride = 4)
      .groupBy("doc_id").sum("n_tok").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(cover === Map(1L -> 10L, 2L -> 2L, 3L -> 0L))
    // null text must survive as one empty chunk — size(NULL) would
    // otherwise null-cascade into sequence() and explode() drops the doc
    val withNull = Seq((1L, "a b"), (2L, null: String)).toDF("doc_id", "text")
    val nullOut = TrainingPrep.chunkDocuments(withNull, window = 4, stride = 3)
      .orderBy("doc_id").collect()
    assert(nullOut.map(_.getLong(0)).toSeq === Seq(1L, 2L),
      "null-text doc silently disappeared")
    assert(nullOut(1).getLong(3) === 0L) // n_tok 0 for the null doc
  }

  test("shuffleCorpus is a reproducible total order independent of bucketing") {
    val s = spark
    import s.implicits._
    val d = (0L until 500L).map(i => (i, s"doc $i")).toDF("doc_id", "text")
    val pos = TrainingPrep.shuffleCorpus(d).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    // positions are exactly 1..N (offset arithmetic has no gaps/overlaps)
    assert(pos.values.toSeq.sorted === (1L to 500L))
    // bucketing is an implementation detail: any bucket count, same order
    val pos2 = TrainingPrep.shuffleCorpus(d, buckets = 7).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(pos2 === pos)
    // matches the definition: sort by (lehmer(id), id)
    val expected = (0L until 500L)
      .sortBy(i => ((i * 48271L + 11L) % 2147483647L, i))
      .zipWithIndex.map { case (id, p) => id -> (p + 1L) }.toMap
    assert(pos === expected)
  }

  test("negative doc ids hash into [0, 1000) like any other (pmod keys)") {
    val s = spark
    import s.implicits._
    val d = Seq((-5L, "neg id doc", "en", "srcA"), (7L, "pos id doc", "en", "srcA"))
      .toDF("doc_id", "text", "lang", "source")
    // rate 0: NOTHING may survive — a signed % would keep the negative id
    // (its negative bucket compares below any rate)
    val kept = TrainingPrep.sampleStratified(d, Map("en" -> 0), defaultPermille = 0)
      .collect()
    assert(kept.isEmpty, s"rate-0 stratum leaked: ${kept.toSeq}")
    // and shuffle positions stay a dense positive 1..n
    val pos = TrainingPrep.shuffleCorpus(d).collect().map(_.getLong(2)).sorted
    assert(pos.toSeq === Seq(1L, 2L))
  }

  test("writeShards: balanced deterministic shards with a faithful manifest") {
    val s = spark
    import s.implicits._
    val corpus = (0L until 97L).map(i => (i, s"doc $i body", "en", "srcA"))
      .toDF("doc_id", "text", "lang", "source")
    val dir = java.nio.file.Files.createTempDirectory("graft-shards").toString + "/out"
    TrainingPrep.writeShards(corpus, dir, numShards = 4)
    val back = spark.read.parquet(dir)
    assert(back.count() === 97)
    val sizes = back.groupBy("shard").count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(sizes.keySet === Set(0, 1, 2, 3))
    assert(sizes.values.max - sizes.values.min <= 25) // ceil(97/4)=25 cap
    // every doc lands in exactly one shard
    assert(back.select("doc_id").distinct().count() === 97)
    // manifest totals match the data
    val manifest = java.nio.file.Files.readString(
      java.nio.file.Paths.get(s"$dir/_shards.json"))
    assert(manifest.contains("\"total_rows\":97"))
    assert(manifest.contains("\"num_shards\":4"))
    // re-export reproduces identical shard membership (pure function of ids)
    val dir2 = java.nio.file.Files.createTempDirectory("graft-shards2").toString + "/out"
    TrainingPrep.writeShards(corpus, dir2, numShards = 4)
    val m1 = back.select("doc_id", "shard").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val m2 = spark.read.parquet(dir2).select("doc_id", "shard").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(m1 === m2)
  }

  test("corpusStats token shares sum to 1 and mix_weight flattens strata") {
    val rows = TrainingPrep.corpusStats(docs).orderBy("lang").collect()
    // en: docs 0,1,4 = 4+3+3 = 10 tokens; de: 2+5 = 7; zh: 1. total 18
    val byLang = rows.map(r => r.getString(0) ->
      (r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4))).toMap
    assert(byLang("en")._1 === 3L && byLang("en")._2 === 10L)
    assert(byLang("de")._2 === 7L && byLang("zh")._2 === 1L)
    assert(math.abs(rows.map(_.getDouble(3)).sum - 1.0) < 1e-12)
    assert(byLang("en")._3 === 10.0 / 18.0)
    // uniform target: weight = total / (n_strata * n_tokens)
    assert(byLang("zh")._4 === 18.0 / (3.0 * 1.0))
    // weighted shares are uniform: share * weight = 1 / n_strata
    rows.foreach { r =>
      assert(math.abs(r.getDouble(3) * r.getDouble(4) - 1.0 / 3.0) < 1e-12)
    }
  }

  test("corpusStats: a zero-token stratum yields weight 0, never Infinity") {
    val s = spark
    import s.implicits._
    // a CJK stratum tokenizes to zero tokens under [a-z0-9]+ — its
    // mix_weight must be 0 (weight-nothing), not the Infinity that would
    // poison every downstream sampling probability
    val d = Seq(
      (0L, "plain english words here", "en"),
      (1L, "中文文档", "zh"))
      .toDF("doc_id", "text", "lang")
    val rows = TrainingPrep.corpusStats(d).collect()
      .map(r => r.getString(0) -> (r.getDouble(3), r.getDouble(4))).toMap
    assert(rows("zh")._1 === 0.0)
    assert(rows("zh")._2 === 0.0, s"zero-token stratum weight: ${rows("zh")._2}")
    assert(!rows.values.exists(v => v._1.isNaN || v._1.isInfinite ||
      v._2.isNaN || v._2.isInfinite))
  }

  test("writeShards on an empty corpus writes an empty manifest instead of crashing") {
    val s = spark
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_empty_shards").toString
    // FIRST a real export, then an empty re-export at the same path: the
    // empty manifest must not sit next to the previous run's stale shard
    // parquet (a reader would silently train on the old rows)
    val real = Seq((1L, "alpha"), (2L, "beta")).toDF("doc_id", "text")
      .withColumn("source", lit("web"))
    TrainingPrep.writeShards(real, s"$dir/out", numShards = 2)
    assert(spark.read.parquet(s"$dir/out").count() === 2)
    val empty = real.filter(col("doc_id") < 0)
    TrainingPrep.writeShards(empty, s"$dir/out", numShards = 4)
    val manifest = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(s"$dir/out/_shards.json")),
      java.nio.charset.StandardCharsets.UTF_8)
    assert(manifest === """{"num_shards":0,"total_rows":0,"shards":[]}""")
    val stale = new java.io.File(s"$dir/out").listFiles()
      .filter(_.getName.startsWith("shard="))
    assert(stale.isEmpty, s"stale shards survived the empty export: ${stale.toSeq}")
  }
}
