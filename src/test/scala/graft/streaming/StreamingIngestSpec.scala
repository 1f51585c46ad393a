package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkSpec
import graft.streaming.StreamingIngest.{Event, Session}

class StreamingIngestSpec extends SparkSpec {

  private def ts(minute: Int) = new Timestamp(3600L * 1000 * 24 + minute * 60000L)

  test("windowed counts aggregate a streaming source incrementally") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Event]
    val q = StreamingIngest
      .windowedCounts(mem.toDF(), windowLength = "10 minutes", watermarkDelay = "5 minutes")
      .writeStream.format("memory").queryName("win_counts")
      .outputMode(OutputMode.Update()).start()
    try {
      mem.addData(
        Event(1, ts(0), 1, "click", 1.0),
        Event(2, ts(1), 2, "click", 2.0),
        Event(3, ts(11), 1, "view", 5.0))
      q.processAllAvailable()
      val rows = spark.table("win_counts").collect()
      val click = rows.find(_.getString(1) == "click").get
      assert(click.getLong(2) === 2L)
      assert(click.getDouble(3) === 3.0)
      val view = rows.find(_.getString(1) == "view").get
      assert(view.getLong(2) === 1L)
      // two distinct 10-minute windows
      assert(rows.map(_.get(0)).distinct.length === 2)
    } finally q.stop()
  }

  test("sliding counts place each event in length/slide concurrent windows") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Event]
    val q = StreamingIngest
      .slidingCounts(mem.toDF(), windowLength = "10 minutes",
        slide = "5 minutes", watermarkDelay = "5 minutes")
      .writeStream.format("memory").queryName("slide_counts")
      .outputMode(OutputMode.Update()).start()
    try {
      mem.addData(
        Event(1, ts(7), 1, "click", 1.0), // windows starting at 0 and 5
        Event(2, ts(8), 2, "click", 2.0)) // same two windows
      q.processAllAvailable()
      val rows = spark.table("slide_counts").collect()
      // both events in both overlapping windows
      assert(rows.length === 2)
      assert(rows.forall(_.getLong(2) === 2L))
      assert(rows.forall(_.getDouble(3) === 3.0))
      val starts = rows.map(_.getTimestamp(0).getTime).sorted
      assert(starts(1) - starts(0) === 5 * 60 * 1000L) // one slide apart
    } finally q.stop()
  }

  test("stream-static enrichment broadcasts the dim and drops deny-listed users") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dim = Seq((1L, "gold"), (2L, "free")).toDF("user_id", "tier")
    val mem = MemoryStream[Event]
    val q = StreamingIngest
      .enrichWithStatic(mem.toDF(), dim, Seq("user_id"))
      .writeStream.format("memory").queryName("enriched")
      .outputMode(OutputMode.Append()).start()
    try {
      mem.addData(
        Event(1, ts(0), 1, "click", 1.0),
        Event(2, ts(1), 2, "view", 2.0),
        Event(3, ts(2), 99, "click", 3.0)) // not in the dim: dropped by inner
      q.processAllAvailable()
      val rows = spark.table("enriched")
        .select("event_id", "tier").collect()
        .map(r => (r.getLong(0), r.getString(1))).toSet
      assert(rows === Set((1L, "gold"), (2L, "free")))
    } finally q.stop()
  }

  test("streaming near-dup screen flags corpus matches, passes novel docs") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = spark.sqlContext
    val corpus = Seq(
      (100L, "the quick brown fox jumps over the lazy dog near the river bank"),
      (101L, "a completely unrelated corpus document about columnar execution"),
      (102L, "der schnelle braune fuchs springt und der hund ist mit anderen"))
      .toDF("doc_id", "text")
    // through the CorpusIndex overload (the writeCorpusIndex/read shape)
    val index = graft.pipeline.Dedup.buildCorpusIndex(corpus)
    val mem = MemoryStream[(Long, Timestamp, String)]
    val q = StreamingIngest
      .nearDupScreen(mem.toDF().toDF("doc_id", "ts", "text"), index,
        threshold = 0.5, watermarkDelay = "10 minutes")
      .writeStream.format("memory").queryName("neardup_screen")
      .outputMode(OutputMode.Append()).start()
    try {
      mem.addData(
        (1L, ts(0), "the quick brown fox jumps over the lazy dog near the river bank"), // exact
        (2L, ts(1), "the quick brown fox jumps over the lazy dog near the river bend"), // near
        (3L, ts(2), "totally novel text that matches nothing in the corpus at all ok"))
      q.processAllAvailable()
      val rows = spark.table("neardup_screen")
        .select("doc_id", "corpus_id", "jaccard").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      val byDoc = rows.groupBy(_._1)
      assert(byDoc(1L).exists(t => t._2 == 100L && t._3 == 1.0)) // exact: jaccard 1
      assert(byDoc(2L).exists(t => t._2 == 100L && t._3 >= 0.5)) // near-dup
      assert(!byDoc.contains(3L), s"novel doc flagged: $rows")
      // multi-band candidate hits collapsed to one row per (doc, corpus)
      assert(rows.length === rows.distinct.length)
      assert(byDoc(1L).count(_._2 == 100L) === 1)
    } finally q.stop()
  }

  test("near-dup screen: an edited re-crawl of the same doc_id is re-verified, not suppressed") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = spark.sqlContext
    val corpus = Seq(
      (100L, "the quick brown fox jumps over the lazy dog near the river bank"))
      .toDF("doc_id", "text")
    val index = graft.pipeline.Dedup.buildCorpusIndex(corpus)
    val mem = MemoryStream[(Long, Timestamp, String)]
    val q = StreamingIngest
      .nearDupScreen(mem.toDF().toDF("doc_id", "ts", "text"), index,
        threshold = 0.95, watermarkDelay = "10 minutes")
      .writeStream.format("memory").queryName("neardup_recrawl")
      .outputMode(OutputMode.Append()).start()
    try {
      // v1: a superset of the corpus text — band-collides (all corpus
      // shingles present, so with the fixed seed several bands agree)
      // but jaccard ~0.65 fails the 0.95 threshold, recording the
      // (doc, corpus) candidate in the dedup state
      mem.addData((1L, ts(0),
        "the quick brown fox jumps over the lazy dog near the river bank " +
          "and then some extra trailing words appended here"))
      q.processAllAvailable()
      assert(spark.table("neardup_recrawl").count() === 0,
        "v1 must fail verification for this test to mean anything")
      // v2, same doc_id INSIDE the watermark: the edited text is now an
      // exact corpus match — the (doc, corpus) dedup must not have
      // poisoned it (content_key distinguishes the arrivals)
      mem.addData((1L, ts(1),
        "the quick brown fox jumps over the lazy dog near the river bank"))
      q.processAllAvailable()
      val rows = spark.table("neardup_recrawl")
        .select("doc_id", "corpus_id", "jaccard").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      assert(rows.exists(t => t._1 == 1L && t._2 == 100L && t._3 === 1.0),
        s"edited re-crawl was suppressed by the candidate dedup: ${rows.toSeq}")
    } finally q.stop()
  }

  test("stream-stream attribution join pairs purchases with lookback clicks only") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = spark.sqlContext
    val purchases = MemoryStream[Event]
    val clicks = MemoryStream[Event]
    val q = StreamingIngest
      .attributionJoin(purchases.toDF(), clicks.toDF(), lookback = "15 minutes")
      .writeStream.format("memory").queryName("attr_join")
      .outputMode(OutputMode.Append()).start()
    try {
      clicks.addData(
        Event(1, ts(0), 7, "click", 1.0), // inside the 15-min lookback
        Event(2, ts(9), 7, "click", 2.0), // inside
        Event(3, ts(30), 7, "click", 3.0), // AFTER the purchase — excluded
        Event(4, ts(9), 8, "click", 4.0)) // other user — excluded
      purchases.addData(Event(10, ts(10), 7, "purchase", 99.0))
      q.processAllAvailable()
      val rows = spark.table("attr_join")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getTimestamp(4), r.getDouble(5)))
        .sortBy(_._3.getTime)
      assert(rows.toSeq == Seq(
        (10L, 7L, ts(0), 1.0),
        (10L, 7L, ts(9), 2.0)))
    } finally q.stop()
  }

  test("native session_window merges gap windows and closes them at the watermark") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Event]
    val q = StreamingIngest
      .sessionWindows(mem.toDF(), gap = "10 minutes", watermarkDelay = "5 minutes")
      .writeStream.format("memory").queryName("session_wins")
      .outputMode(OutputMode.Append()).start()
    try {
      // two events 5 min apart merge into one session; a third 60 min in
      // starts a second session
      mem.addData(
        Event(1, ts(0), 7, "click", 1.0),
        Event(2, ts(5), 7, "view", 2.0),
        Event(3, ts(60), 7, "click", 4.0))
      q.processAllAvailable()
      // append mode: nothing final until the watermark passes session end
      mem.addData(Event(4, ts(200), 9, "click", 8.0))
      q.processAllAvailable()
      val rows = spark.table("session_wins")
        .collect().map(r => (r.getLong(0), r.getTimestamp(1), r.getTimestamp(2),
          r.getLong(3), r.getDouble(4))).sortBy(_._2.getTime)
      assert(rows.length === 2) // user 9's session is still open
      assert(rows(0) === ((7L, ts(0), ts(15), 2L, 3.0))) // merged, end = last+gap
      assert(rows(1) === ((7L, ts(60), ts(70), 1L, 4.0)))
    } finally q.stop()
  }

  test("sessionize merges per-user state across micro-batches") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Event]
    val q = StreamingIngest.sessionize(mem.toDS(), timeoutMs = 0).toDF()
      .writeStream.format("memory").queryName("sessions")
      .outputMode(OutputMode.Update()).start()
    try {
      mem.addData(Event(1, ts(0), 7, "click", 1.0), Event(2, ts(1), 7, "view", 2.0))
      q.processAllAvailable()
      mem.addData(Event(3, ts(2), 7, "click", 4.0), Event(4, ts(0), 8, "view", 9.0))
      q.processAllAvailable()
      // a LATE event must not move the session end backwards
      mem.addData(Event(5, ts(1), 7, "late", 0.5))
      q.processAllAvailable()
      // a late event EARLIER than the recorded start must pull it back —
      // symmetric with the end never regressing
      mem.addData(Event(6, ts(-3), 7, "later-still-earlier", 0.0))
      q.processAllAvailable()
      val byUser = spark.table("sessions").as[Session].collect()
        .groupBy(_.user_id).map { case (u, ss) => u -> ss.maxBy(_.n_events) }
      assert(byUser(7L).n_events === 5)
      assert(byUser(7L).total_value === 7.5)
      assert(byUser(7L).started === ts(-3)) // pulled back by the late event
      assert(byUser(7L).ended === ts(2)) // not regressed to ts(1)
      assert(byUser(8L).n_events === 1)
    } finally q.stop()
  }

  test("E2E: streamed vectors reach serving through the epoch lifecycle (round 7)") {
    // the full SURVEY §7.5 streaming-ingest story, mirroring the
    // reference's BuildEpoch/ActivateEpoch loop (query_service.cpp:472-519):
    // stream NEW vectors into staging -> batch re-cluster staging + the
    // serving corpus into a fresh epoch -> atomic swap -> the ingested
    // vectors surface in search results -> the superseded epoch cleans up
    val s = spark
    import s.implicits._
    implicit val sqlCtx = spark.sqlContext
    val db = new graft.api.VectorDB(spark,
      java.nio.file.Files.createTempDirectory("graft-e2e-db").toString)
    val dim = 8
    db.createIndex(graft.IndexConfig("stream_idx", dimension = dim, nlist = 2))
    // epoch 1: a batch corpus clustered away from the soon-to-stream point
    val base = randomVectors(100, dim)
    val e1 = db.buildEpoch("stream_idx", vectorsDF(base))
    db.activateEpoch("stream_idx", e1)
    // stream novel vectors (ids 9000+) clustered at a distinctive corner
    val tmp = java.nio.file.Files.createTempDirectory("graft-e2e-staging").toString
    val mem = MemoryStream[(Long, Seq[Float])]
    val ingest = StreamingIngest.ingestToStaging(
      mem.toDF().toDF("id", "vec"), s"$tmp/staging", s"$tmp/ckpt")
    val novel = (0 until 10).map(i =>
      (9000L + i, Seq.fill(dim)(50.0f + i * 0.01f)))
    try {
      mem.addData(novel.take(6): _*)
      ingest.processAllAvailable()
      mem.addData(novel.drop(6): _*) // second micro-batch appends
      ingest.processAllAvailable()
    } finally ingest.stop()
    val probe = queriesDF(Seq((0L, Array.fill(dim)(50.0f))))
    // BEFORE the swap the serving epoch knows nothing of the stream
    val before = db.search("stream_idx", probe, topk = 3).collect()
    assert(before.forall(_.getLong(1) < 9000L), "unswapped epoch leaked staged ids")
    // rebuild from serving corpus + staging, swap, search again
    val staged = spark.read.parquet(s"$tmp/staging")
      .select(org.apache.spark.sql.functions.col("id"),
        org.apache.spark.sql.functions.col("vec").cast("array<float>").as("vec"))
    assert(staged.count() === 10)
    val merged = vectorsDF(base).unionByName(staged)
    val e2 = db.buildEpoch("stream_idx", merged)
    db.activateEpoch("stream_idx", e2)
    val after = db.search("stream_idx", probe, topk = 3).collect()
    assert(after.nonEmpty && after.forall(_.getLong(1) >= 9000L),
      s"ingested vectors absent after swap: ${after.map(_.getLong(1)).toSeq}")
    assert(db.stats("stream_idx")("num_vectors") === 110L)
    // superseded epoch cleans up; the serving epoch survives
    val removed = db.cleanupOldEpochs("stream_idx", keepN = 1)
    assert(removed.nonEmpty, "old epoch should have been removed")
    assert(db.search("stream_idx", probe, topk = 3).count() === 3,
      "serving epoch must survive cleanup")
  }

  test("streaming ingest appends to an epoch staging dir readable by batch") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = spark.sqlContext
    val tmp = java.nio.file.Files.createTempDirectory("graft-staging").toString
    val mem = MemoryStream[Event]
    val q = StreamingIngest.ingestToStaging(
      mem.toDF(), s"$tmp/staging", s"$tmp/ckpt")
    try {
      mem.addData(Event(1, ts(0), 1, "click", 1.0), Event(2, ts(1), 2, "view", 2.0))
      q.processAllAvailable()
      mem.addData(Event(3, ts(2), 3, "click", 3.0))
      q.processAllAvailable()
      val staged = spark.read.parquet(s"$tmp/staging")
      assert(staged.count() === 3)
      assert(staged.columns.toSet ===
        Set("event_id", "ts", "user_id", "event_type", "value"))
    } finally q.stop()
  }

  test("dedupStream drops re-arrivals of the same content within the watermark") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Timestamp, String)]
    val q = StreamingIngest
      .dedupStream(mem.toDF().toDF("doc_id", "ts", "text"),
        watermarkDelay = "10 minutes")
      .writeStream.format("memory").queryName("dedup_stream")
      .outputMode(OutputMode.Append()).start()
    try {
      mem.addData(
        (1L, ts(0), "the quick brown fox"),
        (2L, ts(1), "a different document"))
      q.processAllAvailable()
      // batch 2: one replay (same text, later ts) + one novel doc
      mem.addData(
        (3L, ts(2), "the quick brown fox"),
        (4L, ts(3), "genuinely new content"))
      q.processAllAvailable()
      val ids = spark.table("dedup_stream").collect()
        .map(_.getAs[Long]("doc_id")).sorted
      assert(ids === Array(1L, 2L, 4L), "replayed doc 3 must be dropped")
    } finally q.stop()
  }

  // texts mirror CurationSpec's batch fixture so the streaming screen's
  // verdicts are comparable stage for stage
  private val goodA =
    "the quick brown fox jumps over a lazy dog while twenty other animals " +
      "watch from the tall green hill near town"
  private val goodB =
    "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu " +
      "nu xi omicron pi rho sigma tau upsilon"
  private val nearBase =
    "one two three four five six seven eight nine ten eleven twelve " +
      "thirteen fourteen fifteen sixteen seventeen eighteen nineteen " +
      "twenty twentyone twentytwo twentythree "
  private val contaminatedText =
    "researchers found the zebra quokka axolotl sequence appearing in " +
      "several benchmark answer keys during the annual evaluation of " +
      "language systems last winter"
  private val evalText =
    "the eval set contains zebra quokka axolotl patterns hidden within " +
      "questions that models must answer without prior exposure to " +
      "benchmark data collections online"

  test("streaming curation screen: every stateless stage fires with its reason") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = spark.sqlContext
    val corpus = Seq(200L -> goodB, 201L -> (nearBase + "alphaend"))
      .toDF("doc_id", "text")
    val eval = Seq(100L -> evalText).toDF("doc_id", "text")
    val index = graft.pipeline.Dedup.buildCorpusIndex(corpus)
    val screen = graft.pipeline.Curation.evalScreenShingles(corpus, eval)
    val mem = MemoryStream[(Long, Timestamp, String)]
    val q = StreamingIngest
      .curationScreen(mem.toDF().toDF("doc_id", "ts", "text"), index, screen)
      .writeStream.format("memory").queryName("curation_screen")
      .outputMode(OutputMode.Append()).start()
    try {
      mem.addData(
        (1L, ts(0), goodA), // novel, clean -> keep
        (2L, ts(1), "!!! ??? ---"), // quality
        (3L, ts(2), Seq.fill(25)("spam").mkString(" ")), // repetition
        (4L, ts(3), goodB), // exact twin of corpus 200
        (5L, ts(4), contaminatedText)) // shares the eval trigram
      q.processAllAvailable()
      val byId = spark.table("curation_screen").collect()
        .map(r => r.getAs[Long]("doc_id") -> r).toMap
      assert(byId.keySet === Set(1L, 2L, 3L, 4L, 5L),
        "one audit row per incoming doc")
      def reason(id: Long) = Option(byId(id).getAs[String]("drop_reason")).orNull
      assert(byId(1L).getAs[Boolean]("stateless_keep") && reason(1L) == null)
      assert(reason(2L) === "quality")
      assert(reason(3L) === "repetition")
      assert(reason(4L) === "exact_dup")
      assert(byId(4L).getAs[Long]("exact_dup_of") === 200L)
      assert(reason(5L) === "contaminated")
    } finally q.stop()
  }

  test("contamination set-probe form is verdict-identical to the broadcast-array form") {
    // the ContamSetProbeThreshold gate swaps the PLAN (arrays_overlap
    // over one broadcast row vs a per-row broadcast-set probe) — never
    // the verdicts; force each side of the gate over the same stream
    val s = spark
    import s.implicits._
    implicit val sqlCtx = spark.sqlContext
    val corpus = Seq(200L -> goodB, 201L -> (nearBase + "alphaend"))
      .toDF("doc_id", "text")
    val eval = Seq(100L -> evalText).toDF("doc_id", "text")
    val index = graft.pipeline.Dedup.buildCorpusIndex(corpus)
    val screen = graft.pipeline.Curation.evalScreenShingles(corpus, eval)
    val batches = Seq(
      (1L, ts(0), goodA), // clean
      (2L, ts(1), contaminatedText), // eval hit -> contaminated both sides
      (3L, ts(2), "!!! ??? ---"), // quality (null shingles path)
      (4L, ts(3), goodB)) // exact dup
    def run(name: String, threshold: Long): Map[Long, (Boolean, String)] = {
      val mem = MemoryStream[(Long, Timestamp, String)]
      val q = StreamingIngest
        .curationScreen(mem.toDF().toDF("doc_id", "ts", "text"), index, screen,
          setProbeThreshold = threshold)
        .writeStream.format("memory").queryName(name)
        .outputMode(OutputMode.Append()).start()
      try {
        mem.addData(batches: _*)
        q.processAllAvailable()
        spark.table(name).collect().map(r => r.getAs[Long]("doc_id") ->
          ((r.getAs[Boolean]("contaminated"),
            Option(r.getAs[String]("drop_reason")).orNull))).toMap
      } finally q.stop()
    }
    val arrayForm = run("contam_gate_array", Long.MaxValue) // always arrays_overlap
    val setForm = run("contam_gate_set", 0L) // always the broadcast-set probe
    assert(arrayForm === setForm, "both gate sides must agree on every verdict")
    assert(arrayForm(2L)._1 && arrayForm(2L)._2 === "contaminated")
    assert(!arrayForm(1L)._1 && arrayForm(1L)._2 == null)
    assert(!arrayForm(3L)._1, "null-shingle docs must coalesce to false on both sides")
  }

  test("E2E ingest shape: persisted corpus index from parquet drives both screens") {
    // the 100 TB deployment: index tables written ONCE at curation time,
    // read back from parquet by the ingest driver — the stream never
    // touches corpus text, only the index projections
    val s = spark
    import s.implicits._
    implicit val sqlCtx = spark.sqlContext
    val corpus = Seq(200L -> goodB, 201L -> (nearBase + "alphaend"))
      .toDF("doc_id", "text")
    val eval = Seq(100L -> evalText).toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("graft-ci").toString
    graft.pipeline.Dedup.writeCorpusIndex(
      graft.pipeline.Dedup.buildCorpusIndex(corpus), dir)
    val index = graft.pipeline.Dedup.readCorpusIndex(spark, dir)
    val screen = graft.pipeline.Curation.evalScreenShingles(corpus, eval)
    val mem = MemoryStream[(Long, Timestamp, String)]
    val audited = StreamingIngest
      .curationScreen(mem.toDF().toDF("doc_id", "ts", "text"), index, screen)
    val q1 = audited.writeStream.format("memory").queryName("e2e_audit")
      .outputMode(OutputMode.Append()).start()
    val q2 = StreamingIngest
      .nearDupScreen(audited
        .filter(org.apache.spark.sql.functions.col("stateless_keep"))
        .select("doc_id", "ts", "text"),
        index, threshold = 0.5, watermarkDelay = "10 minutes")
      .writeStream.format("memory").queryName("e2e_neardup")
      .outputMode(OutputMode.Append()).start()
    try {
      mem.addData(
        (1L, ts(0), goodB), // exact twin of persisted corpus 200
        (2L, ts(1), nearBase + "gammaend"), // near twin of persisted 201
        (3L, ts(2), contaminatedText), // eval-screen hit
        (4L, ts(3), goodA)) // clean
      q1.processAllAvailable(); q2.processAllAvailable()
      val audit = spark.table("e2e_audit").collect()
        .map(r => r.getAs[Long]("doc_id") ->
          Option(r.getAs[String]("drop_reason")).orNull).toMap
      assert(audit === Map(1L -> "exact_dup", 2L -> null,
        3L -> "contaminated", 4L -> null))
      val near = spark.table("e2e_neardup").collect()
        .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("corpus_id"))).toSet
      assert(near === Set(2L -> 201L),
        "the near twin must match against the parquet-loaded band index")
    } finally { q1.stop(); q2.stop() }
  }

  test("curation screen chains into the near-dup screen over its survivors") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = spark.sqlContext
    val corpus = Seq(201L -> (nearBase + "alphaend")).toDF("doc_id", "text")
    val eval = Seq(100L -> evalText).toDF("doc_id", "text")
    val index = graft.pipeline.Dedup.buildCorpusIndex(corpus)
    val screen = graft.pipeline.Curation.evalScreenShingles(corpus, eval)
    val mem = MemoryStream[(Long, Timestamp, String)]
    // production chain: stateless screen -> survivors -> band screen
    val survivors = StreamingIngest
      .curationScreen(mem.toDF().toDF("doc_id", "ts", "text"), index, screen)
      .filter(org.apache.spark.sql.functions.col("stateless_keep"))
      .select("doc_id", "ts", "text")
    val q = StreamingIngest
      .nearDupScreen(survivors, index, threshold = 0.5,
        watermarkDelay = "10 minutes")
      .writeStream.format("memory").queryName("curation_neardup")
      .outputMode(OutputMode.Append()).start()
    try {
      mem.addData(
        (6L, ts(0), nearBase + "betaend"), // near twin of corpus 201
        (7L, ts(1), "!!! ???"), // dropped by the stateless screen first
        (8L, ts(2), goodA)) // clean and novel
      q.processAllAvailable()
      val rows = spark.table("curation_neardup").collect()
        .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("corpus_id")))
      assert(rows.toSet === Set(6L -> 201L),
        s"only the near twin may reach a verified match: ${rows.toSeq}")
    } finally q.stop()
  }

  test("curationAudit: one watermark-closed row per doc, every stage verdict included") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = spark.sqlContext
    // disjoint ingest shape: corpus ids (all < stream ids) already curated
    val corpus = Seq(200L -> goodB, 201L -> (nearBase + "alphaend"))
      .toDF("doc_id", "text")
    val eval = Seq(100L -> evalText).toDF("doc_id", "text")
    val index = graft.pipeline.Dedup.buildCorpusIndex(corpus)
    val screen = graft.pipeline.Curation.evalScreenShingles(corpus, eval)
    val mem = MemoryStream[(Long, Timestamp, String)]
    val q = StreamingIngest
      .curationAudit(mem.toDF().toDF("doc_id", "ts", "text"), index, screen,
        watermarkDelay = "10 minutes")
      .writeStream.format("memory").queryName("curation_audit")
      .outputMode(OutputMode.Append()).start()
    try {
      mem.addData(
        (301L, ts(0), goodA), // novel, clean -> keep + shard
        (302L, ts(1), "!!! ??? ---"), // quality
        (303L, ts(2), Seq.fill(25)("spam").mkString(" ")), // repetition
        (304L, ts(3), goodB), // exact twin of corpus 200
        (305L, ts(4), nearBase + "gammaend"), // near twin of corpus 201
        (306L, ts(5), contaminatedText)) // shares the eval trigram
      q.processAllAvailable()
      // the audit row closes at watermark expiry — advance it past the
      // docs above with a sentinel arrival (itself still pending)
      mem.addData((999L, ts(60), goodA))
      q.processAllAvailable()
      val byId = spark.table("curation_audit").collect()
        .map(r => r.getAs[Long]("doc_id") -> r).toMap
      assert(byId.keySet === Set(301L, 302L, 303L, 304L, 305L, 306L),
        "one closed audit row per in-horizon doc (the sentinel stays pending)")
      def reason(id: Long) = Option(byId(id).getAs[String]("drop_reason")).orNull
      assert(reason(301L) == null && byId(301L).getAs[Boolean]("keep"))
      assert(!byId(301L).isNullAt(byId(301L).fieldIndex("shard")),
        "a kept doc must carry its shard")
      assert(reason(302L) === "quality" && byId(302L).isNullAt(
        byId(302L).fieldIndex("shard")))
      assert(reason(303L) === "repetition")
      assert(reason(304L) === "exact_dup")
      assert(byId(304L).getAs[Long]("exact_dup_of") === 200L)
      assert(reason(305L) === "near_dup")
      assert(byId(305L).getAs[Long]("near_dup_of") === 201L)
      assert(reason(306L) === "contaminated")
      assert(byId(306L).getAs[Boolean]("contaminated"))
    } finally q.stop()
  }

  test("curationAudit replay of a batch is byte-identical to Curation.curate") {
    // THE unification contract: index the batch's post-exact survivors,
    // eval-screen its post-near survivors, replay the whole batch through
    // the streaming audit -> every row (all verdict cells, keep,
    // drop_reason, shard) matches the batch pipeline column for column
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.functions.col
    implicit val sqlCtx = spark.sqlContext
    val docs = Seq(
      1L -> goodA, // clean keep
      2L -> "!!! ??? ---", // quality
      3L -> Seq.fill(25)("spam").mkString(" "), // repetition
      12L -> goodB, 13L -> goodB, // exact pair: 13 -> 12
      21L -> (nearBase + "alphaend"), // near pair keeper
      22L -> (nearBase + "betaend"), // near pair: 22 -> 21
      31L -> contaminatedText // contaminated
    ).toDF("doc_id", "text")
    val eval = Seq(100L -> evalText).toDF("doc_id", "text")
    val nearThreshold = 0.5
    val batch = graft.pipeline.Curation
      .curate(docs, eval, nearThreshold = nearThreshold)
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap

    // the projections the streaming driver would persist at curation time
    val s2 = docs.join(
      graft.pipeline.Curation.curate(docs, eval, nearThreshold = nearThreshold)
        .filter(col("quality_ok") && col("rep_ok") &&
          col("exact_dup_of").isNull)
        .select("doc_id"),
      Seq("doc_id"), "left_semi")
    val s3 = docs.join(
      graft.pipeline.Curation.curate(docs, eval, nearThreshold = nearThreshold)
        .filter(col("quality_ok") && col("rep_ok") &&
          col("exact_dup_of").isNull && col("near_dup_of").isNull)
        .select("doc_id"),
      Seq("doc_id"), "left_semi")
    val index = graft.pipeline.Dedup.buildCorpusIndex(s2)
    val screen = graft.pipeline.Curation.evalScreenShingles(s3, eval)

    val mem = MemoryStream[(Long, Timestamp, String)]
    val q = StreamingIngest
      .curationAudit(mem.toDF().toDF("doc_id", "ts", "text"), index, screen,
        nearThreshold = nearThreshold)
      .writeStream.format("memory").queryName("curation_audit_replay")
      .outputMode(OutputMode.Append()).start()
    try {
      mem.addData(docs.collect().map(r =>
        (r.getLong(0), ts(r.getLong(0).toInt), r.getString(1))).toSeq: _*)
      q.processAllAvailable()
      mem.addData((999L, ts(600), goodA)) // watermark advancer, stays pending
      q.processAllAvailable()
      val streamed = spark.table("curation_audit_replay").collect()
        .map(r => r.getAs[Long]("doc_id") -> r).toMap
      assert(streamed.keySet === batch.keySet)
      val cols = Seq("quality_ok", "rep_ok", "exact_dup_of", "near_dup_of",
        "contaminated", "keep", "drop_reason", "shard")
      for (id <- batch.keySet; c <- cols) {
        val b = batch(id).getAs[Any](c)
        val st = streamed(id).getAs[Any](c)
        assert(b === st, s"doc $id column $c: batch=$b stream=$st")
      }
    } finally q.stop()
  }

  test("replayConfs derives shuffle partitions and the codegen cutover from batch volume") {
    val cap = spark.sessionState.conf.numShufflePartitions
    // bench-sized replay (hundreds of KB): one partition, interpreted
    assert(StreamingIngest.replayConfs(spark, 300L << 10) === ((1, true)))
    // partitions scale with the batch and clamp at the session cap
    val (midParts, midInterp) =
      StreamingIngest.replayConfs(spark, 3 * StreamingIngest.ReplayBytesPerPartition)
    assert(midParts === math.min(cap, 3) && midInterp)
    val (bigParts, bigInterp) =
      StreamingIngest.replayConfs(spark, 4L * StreamingIngest.ReplayCodegenBytes)
    assert(bigParts === cap)
    // a production-sized batch keeps codegen on
    assert(!bigInterp)
    // boundary: exactly the cutover compiles (strictly-below interprets)
    assert(!StreamingIngest.replayConfs(spark, StreamingIngest.ReplayCodegenBytes)._2)
    assert(StreamingIngest.replayConfs(spark, StreamingIngest.ReplayCodegenBytes - 1)._2)
  }
}
