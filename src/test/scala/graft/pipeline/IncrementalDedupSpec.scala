package graft.pipeline

import org.apache.spark.sql.functions._

import graft.SparkSpec

class IncrementalDedupSpec extends SparkSpec {

  private val longA = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
  private val longB = "one two three four five six seven eight nine ten"

  private lazy val corpus = {
    val s = spark
    import s.implicits._
    Seq(
      (100L, longA),
      (101L, longA), // second copy: min corpus id must win as dup_of
      (102L, longB),
      (103L, "totally different words entirely unrelated content here"))
      .toDF("doc_id", "text")
  }

  private lazy val batch = {
    val s = spark
    import s.implicits._
    Seq(
      (0L, longA),                                   // exact dup of 100/101
      // near dup of 102: 9 of 10 tokens shared -> high shingle jaccard
      (1L, "one two three four five six seven eight nine eleven"),
      (2L, "completely novel text with no partner anywhere at all"),
      (3L, "tiny"))                                  // too short to shingle
      .toDF("doc_id", "text")
  }

  test("incremental labels exact, near and novel batch docs") {
    val out = Dedup.incremental(batch, corpus, threshold = 0.5)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0),
        Option(r.getAs[Any]("dup_of")).map(_.asInstanceOf[Long]),
        Option(r.getAs[Any]("match_kind")).map(_.asInstanceOf[String])))
    assert(out(0) === ((0L, Some(100L), Some("exact")))) // min corpus id
    assert(out(1) === ((1L, Some(102L), Some("near"))))
    assert(out(2) === ((2L, None, None)))
    assert(out(3) === ((3L, None, None))) // unshingleable -> novel
  }

  test("incrementalManaged releases this call's batch-side caches and matches incremental") {
    val index = Dedup.buildCorpusIndex(corpus)
    val before = spark.sparkContext.getPersistentRDDs.keySet
    val (out, release) = Dedup.incrementalManaged(batch, index, "doc_id", "text", 0.5)
    val rows = out.orderBy("doc_id").collect()
      .map(r => (r.getLong(0), Option(r.getAs[Any]("dup_of"))))
    assert(rows.length === 4)
    assert(rows(0) === ((0L, Some(100L))))
    release()
    // the two batch-side caches (shingle + band projections) are gone;
    // a continuous ingest loop must not grow the registry per batch
    val after = spark.sparkContext.getPersistentRDDs.keySet
    assert((after -- before).isEmpty,
      s"batch-side caches survived release(): ${after -- before}")
  }

  test("identical-text pairs always survive LSH banding (jaccard = 1)") {
    // identical shingle sets give identical signatures, so every band
    // matches — the exact twin can never be missed by the near path either
    val near = Dedup.incremental(
      batch.filter(col("doc_id") === 0), corpus, threshold = 0.99)
      .collect().head
    assert(near.getAs[String]("match_kind") === "exact")
    assert(near.getAs[Long]("dup_of") === 100L)
  }

  test("dupClusters closes transitive chains the one-pass approximation can't") {
    val s = spark
    import s.implicits._
    // chain 0-1, 1-2, 2-3 plus isolated 4 and a separate pair 5-6
    val d = (0L to 6L).map(i => (i, s"doc $i")).toDF("doc_id", "text")
    val pairs = Seq((0L, 1L), (1L, 2L), (2L, 3L), (5L, 6L))
      .toDF("a_id", "b_id")
    val out = Dedup.dupClusters(d, pairs).orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out === Array(
      (0L, 0L, 4L), (1L, 0L, 4L), (2L, 0L, 4L), (3L, 0L, 4L),
      (4L, 4L, 1L),
      (5L, 5L, 2L), (6L, 5L, 2L)))
  }

  test("dupClusters is direction-agnostic in the pair list") {
    val s = spark
    import s.implicits._
    val d = (0L to 2L).map(i => (i, s"doc $i")).toDF("doc_id", "text")
    // deliberately reversed: higher id first
    val pairs = Seq((2L, 0L), (1L, 2L)).toDF("a_id", "b_id")
    val out = Dedup.dupClusters(d, pairs).orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(out === Array((0L, 0L), (1L, 0L), (2L, 0L)))
  }

  test("prebuilt CorpusIndex from parquet: same labels, no corpus text scan in the batch plan") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-corpus-index").toString
    // curation time: corpus lands as parquet, index tables derived ONCE
    corpus.write.mode("overwrite").parquet(s"$tmp/corpus")
    val corpusPq = spark.read.parquet(s"$tmp/corpus")
    Dedup.writeCorpusIndex(Dedup.buildCorpusIndex(corpusPq), s"$tmp/idx")
    // ingest time: ONLY the index tables are read back
    val index = Dedup.readCorpusIndex(spark, s"$tmp/idx")
    // the read-back index carries its build params (params.json) — the
    // batch side derives them instead of accepting free ones that drift
    assert(index.numHashes === 64 && index.bandCount === 16 &&
      index.ngram === 3 && index.family === graft.functions.HashFamily.Xxh64)
    val out = Dedup.incremental(batch, index,
      idCol = "doc_id", textCol = "text", threshold = 0.5)
    // the batch plan must not touch the corpus parquet at all — every
    // corpus-side input comes from the index tables
    val scannedPaths = out.queryExecution.executedPlan.collectLeaves()
      .map(_.toString).mkString("\n")
    assert(!scannedPaths.contains(s"$tmp/corpus"),
      s"batch plan scans the corpus table:\n$scannedPaths")
    assert(scannedPaths.contains("idx/bands"), "index tables absent from plan")
    // and the labels match the inline-derivation overload exactly
    val viaIndex = out.orderBy("doc_id").collect()
      .map(r => (r.getLong(0),
        Option(r.getAs[Any]("dup_of")).map(_.asInstanceOf[Long]),
        Option(r.getAs[Any]("match_kind")).map(_.asInstanceOf[String])))
    val inline = Dedup.incremental(batch, corpusPq, threshold = 0.5)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0),
        Option(r.getAs[Any]("dup_of")).map(_.asInstanceOf[Long]),
        Option(r.getAs[Any]("match_kind")).map(_.asInstanceOf[String])))
    assert(viaIndex === inline)
    assert(viaIndex(0) === ((0L, Some(100L), Some("exact"))))
  }

  test("batch docs never match other batch docs, corpus never self-joins") {
    val s = spark
    import s.implicits._
    // two identical docs in the SAME batch, corpus unrelated: both novel
    val b2 = Seq((0L, longA), (1L, longA)).toDF("doc_id", "text")
    val c2 = Seq((100L, longB)).toDF("doc_id", "text")
    val out = Dedup.incremental(b2, c2, threshold = 0.5)
      .collect().map(r => Option(r.getAs[Any]("dup_of")))
    assert(out.forall(_.isEmpty))
  }
}
