package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._

import graft.{Metric, SearchParams, SparkSpec}
import graft.index.IvfFlatIndex

/**
 * Pins the SQL ANN rewrite (SURVEY §4, custom component 3): the canonical
 * `ORDER BY l2_distance(vec, lit) LIMIT k` SQL over a registered
 * Hive-partitioned IVF table must plan as a PARTITION-PRUNED scan whose
 * results equal the programmatic facade at the same nprobe, be exact at
 * nprobe = nlist, and leave every non-matching shape untouched.
 */
class SqlAnnSpec extends SparkSpec {

  private val Dim = 8
  private val NList = 8
  private val K = 5

  private lazy val dir = java.nio.file.Files
    .createTempDirectory("graft-sqlann").toFile.getAbsolutePath

  // one shared fixture: 200 seeded vectors, IVF-assigned, written as the
  // Hive-partitioned layout an epoch uses
  private lazy val index: IvfFlatIndex = {
    val idx = IvfFlatIndex.build(spark, vectorsDF(randomVectors(200, Dim)), NList)
    idx.vectors.write.partitionBy("list_id").mode("overwrite").parquet(dir)
    idx
  }

  private def qvecSql: String = {
    // exactly-representable fractions: no float-parse divergence anywhere
    val vals = (0 until Dim).map(i => ((i * 7) % 33 - 16) / 16.0)
    s"CAST(array(${vals.mkString(", ")}) AS ARRAY<FLOAT>)"
  }

  private def qvec: Array[Float] =
    (0 until Dim).map(i => (((i * 7) % 33 - 16) / 16.0).toFloat).toArray

  private def annSql(view: String): String =
    s"""SELECT id, l2_distance(vec, $qvecSql) AS dist
       |FROM $view ORDER BY dist, id LIMIT $K""".stripMargin

  // the shared AQE-aware scan finder — same probe the driver entries use
  private def scanOf(df: DataFrame): FileSourceScanExec =
    SqlAnn.fileSourceScan(df).get

  private def partitionFilterText(df: DataFrame): String =
    scanOf(df).metadata.getOrElse("PartitionFilters", "")

  test("registered table at nprobe < nlist: pruned scan, facade-identical results") {
    index // force fixture
    spark.read.parquet(dir).createOrReplaceTempView("sqlann_v")
    SqlAnn.registerIndex(spark, dir, index.centroids.value, nprobe = 2)
    try {
      val df = spark.sql(annSql("sqlann_v"))
      val pf = partitionFilterText(df)
      assert(pf.contains("list_id"), s"expected a list_id partition filter, got: $pf")
      // the scan must actually read FEWER partitions than the table has
      val read = scanOf(df).relation.location.listFiles(
        scanOf(df).partitionFilters, Nil).size
      assert(read > 0 && read <= 2,
        s"nprobe=2 must prune to at most 2 of $NList partitions, read $read")
      // results == the facade's search at the same nprobe (same probe
      // selection kernel, same (dist, id) order)
      val sql = df.collect().map(r => (r.getLong(0), r.getDouble(1)))
      val facade = index.search(
        queriesDF(Seq(0L -> qvec)), SearchParams(k = K, nprobe = 2))
        .orderBy("rank").collect().map(r => (r.getLong(1), r.getDouble(2)))
      assert(sql.toSeq === facade.toSeq)
    } finally SqlAnn.unregisterIndex(spark, dir)
  }

  test("nprobe = nlist: rewrite fires and is exact vs brute force") {
    index
    spark.read.parquet(dir).createOrReplaceTempView("sqlann_v")
    SqlAnn.registerIndex(spark, dir, index.centroids.value, nprobe = NList)
    try {
      val df = spark.sql(annSql("sqlann_v"))
      assert(partitionFilterText(df).contains("list_id"))
      val sql = df.collect().map(r => (r.getLong(0), r.getDouble(1)))
      val exact = graft.index.Knn.exact(
        queriesDF(Seq(0L -> qvec)),
        index.vectors.select(col("id"), col("vec")), K, Metric.L2)
        .orderBy("rank").collect().map(r => (r.getLong(1), r.getDouble(2)))
      assert(sql.toSeq === exact.toSeq)
    } finally SqlAnn.unregisterIndex(spark, dir)
  }

  test("idempotent under the fixed-point batch: exactly one probe filter") {
    index
    spark.read.parquet(dir).createOrReplaceTempView("sqlann_v")
    SqlAnn.registerIndex(spark, dir, index.centroids.value, nprobe = 2)
    try {
      val df = spark.sql(annSql("sqlann_v"))
      val ins = df.queryExecution.optimizedPlan.collect {
        case f: org.apache.spark.sql.catalyst.plans.logical.Filter =>
          f.condition.collect {
            case i: org.apache.spark.sql.catalyst.expressions.In => i
          }.size
      }.sum
      assert(ins === 1, s"the fixed-point batch must inject the In exactly once, got $ins")
    } finally SqlAnn.unregisterIndex(spark, dir)
  }

  test("unregistered table, DESC sort, and non-vector sorts are left untouched") {
    index
    spark.read.parquet(dir).createOrReplaceTempView("sqlann_v")
    // (a) unregistered: no partition filter
    assert(!partitionFilterText(spark.sql(annSql("sqlann_v"))).contains("list_id"))
    SqlAnn.registerIndex(spark, dir, index.centroids.value, nprobe = 2)
    try {
      // (b) descending sort is not a nearest-neighbor query
      val desc = spark.sql(
        s"""SELECT id, l2_distance(vec, $qvecSql) AS dist
           |FROM sqlann_v ORDER BY dist DESC LIMIT $K""".stripMargin)
      assert(!partitionFilterText(desc).contains("list_id"))
      // (c) sorting by something else entirely
      val plain = spark.sql(s"SELECT id FROM sqlann_v ORDER BY id LIMIT $K")
      assert(!partitionFilterText(plain).contains("list_id"))
      // (d) non-literal query vector (vec against itself) cannot be probed
      val nonLit = spark.sql(
        s"SELECT id, l2_distance(vec, vec) AS dist FROM sqlann_v ORDER BY dist LIMIT $K")
      assert(!partitionFilterText(nonLit).contains("list_id"))
    } finally SqlAnn.unregisterIndex(spark, dir)
  }

  // clustered fixture for the RANGE rewrite: 8 tight clusters at scaled
  // hypercube corners — covering radii stay small and far apart, so a
  // small query ball provably intersects FEWER than nlist lists (the
  // uniform fixture's covering balls all overlap and nothing would prune)
  private def corner(k: Int): Array[Float] =
    (0 until Dim).map(d => if (((k >> (d % 3)) & 1) == 1) 4.0f else -4.0f).toArray
  private lazy val rangeDir = java.nio.file.Files
    .createTempDirectory("graft-sqlann-range").toFile.getAbsolutePath
  private lazy val rangeIndex: IvfFlatIndex = {
    val rnd = new scala.util.Random(7)
    val rows = (0L until 200L).map { i =>
      val c = corner((i % 8).toInt)
      (i, c.map(x => x + rnd.nextFloat() * 0.2f - 0.1f))
    }
    val idx = IvfFlatIndex.build(spark, vectorsDF(rows), NList)
    idx.vectors.write.partitionBy("list_id").mode("overwrite").parquet(rangeDir)
    idx
  }

  private def rangeSql(view: String, radius: String, qv: String = ""): String = {
    val q = if (qv.nonEmpty) qv else
      s"CAST(array(${corner(0).map(_.toDouble).mkString(", ")}) AS ARRAY<FLOAT>)"
    s"""SELECT id, l2_distance(vec, $q) AS dist
       |FROM $view WHERE l2_distance(vec, $q) <= $radius ORDER BY id""".stripMargin
  }

  test("range predicate: covering-ball prune fires, stays EXACT, and reads fewer partitions") {
    rangeIndex
    spark.read.parquet(rangeDir).createOrReplaceTempView("sqlann_range")
    SqlAnn.registerIndex(spark, rangeDir, rangeIndex.centroids.value,
      nprobe = 2, radii = Some(rangeIndex.listRadii))
    try {
      val df = spark.sql(rangeSql("sqlann_range", "2.0"))
      assert(partitionFilterText(df).contains("list_id"),
        "the range rewrite must inject a list_id partition filter")
      val inSizes = scanOf(df).partitionFilters.flatMap(_.collect {
        case i: org.apache.spark.sql.catalyst.expressions.In => i.list.size
      })
      assert(inSizes.nonEmpty && inSizes.head < NList,
        s"a tight query ball over clustered lists must prune (< $NList), got $inSizes")
      // EXACT despite the prune — identical to the brute-force range scan
      val got = df.collect().map(r => (r.getLong(0), r.getDouble(1)))
      val exact = graft.index.Knn.range(
        queriesDF(Seq(0L -> corner(0))),
        rangeIndex.vectors.select(col("id"), col("vec")), 2.0)
        .orderBy("id").collect().map(r => (r.getLong(1), r.getDouble(2)))
      assert(got.nonEmpty && got.toSeq === exact.toSeq)
    } finally SqlAnn.unregisterIndex(spark, rangeDir)
  }

  test("range predicate: no radii registered -> untouched; negative radius -> zero rows; cosine -> untouched") {
    rangeIndex
    spark.read.parquet(rangeDir).createOrReplaceTempView("sqlann_range")
    // (a) registered WITHOUT radii: the range shape must not rewrite
    SqlAnn.registerIndex(spark, rangeDir, rangeIndex.centroids.value, nprobe = 2)
    try {
      assert(!partitionFilterText(spark.sql(rangeSql("sqlann_range", "2.0")))
        .contains("list_id"), "no radii -> no range rewrite")
    } finally SqlAnn.unregisterIndex(spark, rangeDir)
    SqlAnn.registerIndex(spark, rangeDir, rangeIndex.centroids.value,
      nprobe = 2, radii = Some(rangeIndex.listRadii))
    try {
      // (b) negative radius: squared distance is never negative — the
      // intersection is empty and the rewrite must inject a CONSTANT
      // FALSE conjunct (zero rows would also fall out of the raw
      // predicate, so pin the PLAN, not just the row count)
      val none = spark.sql(rangeSql("sqlann_range", "-1.0"))
      val falseInjected = none.queryExecution.optimizedPlan.exists {
        case f: org.apache.spark.sql.catalyst.plans.logical.Filter =>
          f.condition.exists {
            case org.apache.spark.sql.catalyst.expressions.Literal(false, _) => true
            case _ => false
          }
        case _ => false
      }
      assert(falseInjected,
        "an empty covering-ball intersection must plan a constant-false conjunct")
      assert(none.collect().isEmpty)
      // (c) the bound needs a true metric: cosine range is left untouched
      val qv = s"CAST(array(${corner(0).map(_.toDouble).mkString(", ")}) AS ARRAY<FLOAT>)"
      val cos = spark.sql(
        s"""SELECT id FROM sqlann_range
           |WHERE cosine_distance(vec, $qv) <= 0.2 ORDER BY id""".stripMargin)
      assert(!partitionFilterText(cos).contains("list_id"),
        "cosine range must not use the L2 covering-ball bound")
    } finally SqlAnn.unregisterIndex(spark, rangeDir)
  }

  test("addVectors merges fresh bounds into the SQL registration in place (round 19: maintained, not stripped)") {
    import graft.IndexConfig
    val db = new graft.api.VectorDB(spark,
      java.nio.file.Files.createTempDirectory("graft-sqlann-grow").toString)
    db.createIndex(IndexConfig("rgidx", Dim, nlist = 4))
    val ep = db.buildEpoch("rgidx", vectorsDF(randomVectors(120, Dim)))
    db.activateEpoch("rgidx", ep)
    db.loadIndex("rgidx")
    db.registerSql("rgidx", nprobe = 4, computeRangeRadii = true)
    val q = s"CAST(array(${qvec.map(_.toDouble).mkString(", ")}) AS ARRAY<FLOAT>)"
    try {
      // radii attached: the range rewrite fires
      assert(partitionFilterText(spark.sql(rangeSql("rgidx", "2.0", q)))
        .contains("list_id"))
      // appended rows can grow lists past the registered covering radii.
      // The append merges max(old, batchMax) into the registration IN
      // PLACE (token identity preserved: close() below still releases
      // with its original handle) — the range rewrite KEEPS firing and
      // finds the appended row, which sits at distance 0 of the query
      db.addVectors("rgidx", vectorsDF(Seq(9999L -> qvec)))
      val post = spark.sql(rangeSql("rgidx", "2.0", q))
      assert(partitionFilterText(post).contains("list_id"),
        "post-append range SQL must STAY pruned (bounds maintained)")
      assert(post.collect().map(_.getLong(0)).contains(9999L),
        "the appended in-radius row must be found through the merged bounds")
      // the TOP-K rewrite keeps working — its contract never needed radii
      assert(partitionFilterText(spark.sql(annSql("rgidx"))).contains("list_id"))
      // the blunt external-writer path still exists: explicit
      // invalidation falls back to the full scan
      val em = new graft.storage.EpochManager(s"${db.dataPath}/rgidx/epochs")
      SqlAnn.invalidateRadii(spark, s"${em.epochPath(ep)}/vectors")
      assert(!partitionFilterText(spark.sql(rangeSql("rgidx", "2.0", q)))
        .contains("list_id"),
        "explicit invalidation must fall back to the full scan")
    } finally db.close()
  }

  test("round 20: out-of-band growth auto-degrades the prune via the freshness signature — exact without invalidateRadii") {
    // a writer the registration never hears about (a raw parquet append —
    // the foreign-PROCESS analog) grows the listing past the bounds
    // signature: any FRESH scan must plan UNPRUNED (and stay exact on
    // the new row), while a pre-growth snapshot — whose rows the bounds
    // DO cover — keeps the prune. Pre-r20 the fresh scan kept the stale
    // prune and falsely dismissed the new row until invalidateRadii.
    val oobDir = java.nio.file.Files
      .createTempDirectory("graft-sqlann-oob").toString + "/vectors"
    val oobIdx = IvfFlatIndex.build(
      spark, vectorsDF(randomVectors(120, Dim, seed = 5)), 4)
    oobIdx.vectors.write.partitionBy("list_id").mode("overwrite").parquet(oobDir)
    SqlAnn.registerIndex(spark, oobDir, oobIdx.centroids.value,
      nprobe = 2, radii = Some(oobIdx.listRadii))
    try {
      spark.read.parquet(oobDir).createOrReplaceTempView("sqlann_oob_pre")
      val vNew = Array.fill(Dim)(100f) // far outside every covering ball
      val q = litOf(vNew)
      // for this far query the prune's strongest form fires: an EMPTY
      // covering-ball intersection plans a constant-false conjunct —
      // exactly the shape that would falsely dismiss the row about to be
      // appended, were the bounds trusted past their signature
      def constFalse(df: DataFrame): Boolean =
        df.queryExecution.optimizedPlan.exists {
          case f: org.apache.spark.sql.catalyst.plans.logical.Filter =>
            f.condition.exists {
              case org.apache.spark.sql.catalyst.expressions
                  .Literal(false, _) => true
              case _ => false
            }
          case _ => false
        }
      assert(constFalse(spark.sql(rangeSql("sqlann_oob_pre", "1.0", q))),
        "sanity: the registered prune fires pre-growth (empty intersection)")
      // the foreign append: a far-out row raw-written into list 0's
      // partition dir, bypassing addVectors and every bounds delta
      val s = spark
      import s.implicits._
      Seq((7777L, vNew.toSeq)).toDF("id", "vec")
        .withColumn("list_id", org.apache.spark.sql.functions.lit(0))
        .write.mode("append").partitionBy("list_id").parquet(oobDir)
      // a FRESH scan lists the grown dir: prune suppressed, result exact
      spark.read.parquet(oobDir).createOrReplaceTempView("sqlann_oob_post")
      val post = spark.sql(rangeSql("sqlann_oob_post", "1.0", q))
      assert(!partitionFilterText(post).contains("list_id") && !constFalse(post),
        "a listing grown past the bounds signature must suppress the prune")
      assert(post.collect().map(_.getLong(0)).contains(7777L),
        "the out-of-band row must be found — exact, just unpruned")
      // the PRE-growth snapshot's listing is still covered: prune intact
      assert(constFalse(spark.sql(rangeSql("sqlann_oob_pre", "1.0", q))),
        "a snapshot the bounds cover must keep pruning")
    } finally SqlAnn.unregisterIndex(spark, oobDir)
  }

  test("metric plumbing: cosine_distance probes under cosine and is exact at nprobe = nlist") {
    index
    spark.read.parquet(dir).createOrReplaceTempView("sqlann_v")
    SqlAnn.registerIndex(spark, dir, index.centroids.value, nprobe = NList)
    try {
      val df = spark.sql(
        s"""SELECT id, cosine_distance(vec, $qvecSql) AS dist
           |FROM sqlann_v ORDER BY dist, id LIMIT $K""".stripMargin)
      assert(partitionFilterText(df).contains("list_id"),
        "the rewrite must fire for cosine_distance too")
      val sql = df.collect().map(r => (r.getLong(0), r.getDouble(1)))
      val exact = graft.index.Knn.exact(
        queriesDF(Seq(0L -> qvec)),
        index.vectors.select(col("id"), col("vec")), K, Metric.Cosine)
        .orderBy("rank").collect().map(r => (r.getLong(1), r.getDouble(2)))
      assert(sql.toSeq === exact.toSeq)
    } finally SqlAnn.unregisterIndex(spark, dir)
  }

  test("VectorDB.registerSql exposes the served epoch; swap re-registers; close releases") {
    import graft.IndexConfig
    val db = new graft.api.VectorDB(spark,
      java.nio.file.Files.createTempDirectory("graft-sqlann-db").toString)
    db.createIndex(IndexConfig("sqlidx", Dim, nlist = 4))
    val ep1 = db.buildEpoch("sqlidx", vectorsDF(randomVectors(150, Dim)))
    db.activateEpoch("sqlidx", ep1)
    db.loadIndex("sqlidx")
    // nprobe = nlist -> the SQL surface is exact vs the facade's exact path
    val view = db.registerSql("sqlidx", nprobe = 4)
    assert(view === "sqlidx")
    val df = spark.sql(annSql(view))
    assert(partitionFilterText(df).contains("list_id"), "rewrite must fire on the served view")
    val viaSql = df.collect().map(r => (r.getLong(0), r.getDouble(1)))
    val viaFacade = db.searchExact("sqlidx", queriesDF(Seq(0L -> qvec)), K)
      .orderBy("rank").collect().map(r => (r.getLong(1), r.getDouble(2)))
    assert(viaSql.toSeq === viaFacade.toSeq)
    // epoch swap: re-register follows the new epoch and RELEASES the old
    // path's registration
    val em = new graft.storage.EpochManager(s"${db.dataPath}/sqlidx/epochs")
    val oldPath = s"${em.epochPath(ep1)}/vectors"
    val ep2 = db.buildEpoch("sqlidx", vectorsDF(randomVectors(150, Dim, seed = 7)))
    db.activateEpoch("sqlidx", ep2)
    db.loadIndex("sqlidx")
    db.registerSql("sqlidx", nprobe = 2)
    spark.read.parquet(oldPath).createOrReplaceTempView("sqlann_old_epoch")
    assert(!partitionFilterText(spark.sql(annSql("sqlann_old_epoch"))).contains("list_id"),
      "the superseded epoch's registration must be released")
    assert(partitionFilterText(spark.sql(annSql(view))).contains("list_id"),
      "the new epoch must be registered")
    // close releases the surviving registration AND drops the view (a
    // lingering view would serve the unpinned epoch until cleanup deletes
    // the directory, then crash every query)
    val ep2Path = s"${em.epochPath(ep2)}/vectors"
    db.close()
    intercept[org.apache.spark.sql.AnalysisException](spark.sql(annSql(view)))
    spark.read.parquet(ep2Path).createOrReplaceTempView("sqlann_after_close")
    assert(!partitionFilterText(spark.sql(annSql("sqlann_after_close"))).contains("list_id"),
      "close() must release the SQL registration")
  }

  test("registerSql close() releases only its OWN registration (two facades, one path)") {
    import graft.IndexConfig
    val base = java.nio.file.Files.createTempDirectory("graft-sqlann-2f").toString
    val a = new graft.api.VectorDB(spark, base)
    a.createIndex(IndexConfig("shidx", Dim, nlist = 4))
    val ep = a.buildEpoch("shidx", vectorsDF(randomVectors(120, Dim)))
    a.activateEpoch("shidx", ep)
    a.loadIndex("shidx")
    a.registerSql("shidx", nprobe = 4, viewName = "sh_a")
    // facade B over the SAME dataPath/index/epoch registers the same path
    val b = new graft.api.VectorDB(spark, base)
    b.loadIndex("shidx")
    b.registerSql("shidx", nprobe = 4, viewName = "sh_b")
    // A closes: its token was superseded by B's, so B's registration (and
    // the JVM-global registry slot) must survive
    a.close()
    assert(partitionFilterText(spark.sql(annSql("sh_b"))).contains("list_id"),
      "the surviving facade's SQL registration must not be torn down by the peer's close")
    b.close()
  }

  test("close() with the DEFAULT view name: a superseded facade leaves the winner's view alone") {
    import graft.IndexConfig
    val base = java.nio.file.Files.createTempDirectory("graft-sqlann-2fv").toString
    val a = new graft.api.VectorDB(spark, base)
    a.createIndex(IndexConfig("shvidx", Dim, nlist = 4))
    val ep = a.buildEpoch("shvidx", vectorsDF(randomVectors(120, Dim)))
    a.activateEpoch("shvidx", ep)
    a.loadIndex("shvidx")
    // BOTH facades use the default viewName (the index name): they share
    // the registry slot AND the temp view — the exact collision shape the
    // token guard exists for
    a.registerSql("shvidx", nprobe = 4)
    val b = new graft.api.VectorDB(spark, base)
    b.loadIndex("shvidx")
    b.registerSql("shvidx", nprobe = 4)
    // A closes: its registration was superseded, so it must tear down
    // NEITHER the registry slot NOR the shared view
    a.close()
    val df = spark.sql(annSql("shvidx"))
    assert(partitionFilterText(df).contains("list_id"),
      "the surviving facade's view must still exist and rewrite")
    assert(df.collect().length === K)
    // B's close (the owner) does drop the view
    b.close()
    intercept[org.apache.spark.sql.AnalysisException](spark.sql(annSql("shvidx")))
  }

  test("close() leaves a view a peer re-bound to a DIFFERENT epoch alone") {
    import graft.IndexConfig
    val base = java.nio.file.Files.createTempDirectory("graft-sqlann-xe").toString
    val a = new graft.api.VectorDB(spark, base)
    a.createIndex(IndexConfig("xeidx", Dim, nlist = 4))
    val ep1 = a.buildEpoch("xeidx", vectorsDF(randomVectors(120, Dim)))
    a.activateEpoch("xeidx", ep1)
    a.loadIndex("xeidx")
    a.registerSql("xeidx", nprobe = 4)
    // peer facade builds and serves a NEW epoch, re-binding the shared
    // default view name to a DIFFERENT path — A's token still owns ITS
    // path's registry slot, so the token guard ALONE would let A's close
    // tear down B's view; the view-resolution guard must stop it
    val b = new graft.api.VectorDB(spark, base)
    val ep2 = b.buildEpoch("xeidx", vectorsDF(randomVectors(130, Dim, seed = 5)))
    b.activateEpoch("xeidx", ep2)
    b.loadIndex("xeidx")
    b.registerSql("xeidx", nprobe = 4)
    a.close()
    val df = spark.sql(annSql("xeidx"))
    assert(partitionFilterText(df).contains("list_id"),
      "the peer's re-bound view must survive A's close and still rewrite")
    assert(spark.sql("SELECT count(*) FROM xeidx").collect().head.getLong(0) === 130L,
      "the view must still serve the peer's epoch")
    b.close()
    intercept[org.apache.spark.sql.AnalysisException](spark.sql(annSql("xeidx")))
  }

  test("addVectors refreshes the registered view: SQL sees appended rows") {
    import graft.IndexConfig
    val db = new graft.api.VectorDB(spark,
      java.nio.file.Files.createTempDirectory("graft-sqlann-app").toString)
    db.createIndex(IndexConfig("appidx", Dim, nlist = 4))
    val ep = db.buildEpoch("appidx", vectorsDF(randomVectors(120, Dim)))
    db.activateEpoch("appidx", ep)
    db.loadIndex("appidx")
    db.registerSql("appidx", nprobe = 4)
    try {
      val before = spark.sql("SELECT count(*) FROM appidx").collect().head.getLong(0)
      assert(before === 120L)
      // the temp view holds an eagerly-listed InMemoryFileIndex: without
      // the in-append re-read, the appended files would stay INVISIBLE to
      // the SQL surface while the facade serves them — the silent
      // pre-append-snapshot shape
      db.addVectors("appidx", vectorsDF(Seq(9001L -> qvec, 9002L -> qvec)))
      val after = spark.sql("SELECT count(*) FROM appidx").collect().head.getLong(0)
      assert(after === 122L,
        s"SQL view must see appended rows (got $after, want 122)")
      // and the appended row is reachable through the rewritten top-k
      // (nprobe = nlist: exact, and 9001/9002 sit AT the query point)
      val top = spark.sql(annSql("appidx")).collect().map(_.getLong(0))
      assert(top.contains(9001L) && top.contains(9002L),
        s"appended ids must surface in SQL top-k, got ${top.mkString(",")}")
    } finally db.close()
  }

  test("facade range search never falsely dismisses a list whose covering radius is NaN") {
    // one poisoned vector (NaN component) in list L makes the max()-built
    // covering radius NaN; IEEE comparisons are all false, so an unguarded
    // rangeProbe would prune L and falsely dismiss its HEALTHY members —
    // the SQL rewrite already guards this (SqlAnn.intersecting), the
    // facade path must match
    val rnd = new scala.util.Random(11)
    val rows = (0L until 160L).map { i =>
      val c = corner((i % 8).toInt)
      (i, c.map(x => x + rnd.nextFloat() * 0.2f - 0.1f))
    } :+ (999L, {
      val v = corner(0); v(0) = Float.NaN; v
    })
    val idx = IvfFlatIndex.build(spark, vectorsDF(rows), NList)
    val poisonedList = idx.listRadii.indexWhere(_.isNaN)
    assert(poisonedList >= 0, "fixture must poison exactly one list's radius")
    // healthy members near corner(0) share the poisoned vector's list
    // (it sits at corner(0) too); a radius-2 ball around corner(0) must
    // return them regardless of the NaN radius
    val got = idx.rangeSearch(queriesDF(Seq(0L -> corner(0))), 2.0)
      .collect().map(_.getLong(1)).toSet
    val exact = graft.index.Knn.range(
      queriesDF(Seq(0L -> corner(0))),
      idx.vectors.select(col("id"), col("vec")), 2.0)
      .collect().map(_.getLong(1)).toSet
    assert(got === exact, "NaN covering radius must mean 'never prune', not 'always prune'")
    assert(got.nonEmpty, "the fixture must actually have matches near corner(0)")
  }

  test("a user WHERE clause composes with the injected probe filter") {
    index
    spark.read.parquet(dir).createOrReplaceTempView("sqlann_v")
    SqlAnn.registerIndex(spark, dir, index.centroids.value, nprobe = NList)
    try {
      val df = spark.sql(
        s"""SELECT id, l2_distance(vec, $qvecSql) AS dist
           |FROM sqlann_v WHERE id % 2 = 0 ORDER BY dist, id LIMIT $K""".stripMargin)
      assert(partitionFilterText(df).contains("list_id"))
      val got = df.collect().map(_.getLong(0))
      assert(got.nonEmpty && got.forall(_ % 2 == 0))
      // exact (nprobe = nlist): equals brute force over the filtered corpus
      val exact = graft.index.Knn.exact(
        queriesDF(Seq(0L -> qvec)),
        index.vectors.filter(col("id") % 2 === 0).select(col("id"), col("vec")),
        K, Metric.L2).orderBy("rank").collect().map(_.getLong(1))
      assert(got.toSeq === exact.toSeq)
    } finally SqlAnn.unregisterIndex(spark, dir)
  }

  test("ANN SQL races epoch build/activate/cleanup churn without failed queries") {
    import graft.IndexConfig
    val db = new graft.api.VectorDB(spark,
      java.nio.file.Files.createTempDirectory("graft-sqlann-churn").toString)
    db.createIndex(IndexConfig("churnidx", Dim, nlist = 4))
    val ep0 = db.buildEpoch("churnidx", vectorsDF(randomVectors(100, Dim)))
    db.activateEpoch("churnidx", ep0)
    db.loadIndex("churnidx")
    db.registerSql("churnidx", nprobe = 4)
    val errs = new java.util.concurrent.CopyOnWriteArrayList[Throwable]()
    val stop = new java.util.concurrent.atomic.AtomicBoolean(false)
    val queriesRun = new java.util.concurrent.atomic.AtomicLong()
    // reader: ALL THREE ANN SQL shapes in a tight loop — every query
    // must return its full result, never a FileNotFound from a reaped
    // epoch dir, never an unresolved view. Between a swap and the
    // re-register a query may serve the PREVIOUS epoch (the documented
    // staleness window) or lose the rewrite for a moment (registration
    // released first — the unrewritten plan is the correct exact
    // fallback, never an error); keepN = 2 keeps that epoch on disk
    // until the view is two swaps past it.
    localQView("churn_bq", Seq(500L -> qvec, 501L -> qvec.map(-_)))
    val batchChurnSql =
      s"""SELECT qid, id, dist, rank FROM (
         |  SELECT q.qid, t.id, l2_distance(t.vec, q.qvec) AS dist,
         |    CAST(row_number() OVER (PARTITION BY q.qid
         |      ORDER BY l2_distance(t.vec, q.qvec), t.id) AS INT) AS rank
         |  FROM churn_bq q, churnidx t)
         |WHERE rank <= $K ORDER BY qid, rank""".stripMargin
    val rangeChurnSql =
      s"""SELECT q.qid, t.id FROM churn_bq q, churnidx t
         |WHERE l2_distance(t.vec, q.qvec) <= 0.5""".stripMargin
    val reader = new Thread(() => {
      try {
        while (!stop.get()) {
          val rows = spark.sql(annSql("churnidx")).collect()
          if (rows.length != K)
            throw new AssertionError(s"expected $K rows, got ${rows.length}")
          val brows = spark.sql(batchChurnSql).collect()
          if (brows.length != 2 * K)
            throw new AssertionError(s"expected ${2 * K} batch rows, got ${brows.length}")
          spark.sql(rangeChurnSql).collect() // count is epoch-dependent; must not throw
          queriesRun.incrementAndGet()
          ()
        }
      } catch { case e: Throwable => errs.add(e); () }
    }, "sqlann-churn-reader")
    reader.start()
    try {
      (1 to 4).foreach { i =>
        val ep = db.buildEpoch("churnidx",
          vectorsDF(randomVectors(100, Dim, seed = 42 + i)))
        db.activateEpoch("churnidx", ep)
        db.loadIndex("churnidx")
        db.registerSql("churnidx", nprobe = 4)
        db.cleanupOldEpochs("churnidx", keepN = 2)
        ()
      }
    } finally {
      stop.set(true)
      reader.join(120000)
    }
    assert(!reader.isAlive, "reader thread hung")
    assert(errs.isEmpty, s"ANN SQL failed during epoch churn: $errs")
    assert(queriesRun.get() > 0, "the reader must have actually run queries")
    // after the churn settles, SQL serves the FINAL epoch exactly
    val viaSql = spark.sql(annSql("churnidx")).collect()
      .map(r => (r.getLong(0), r.getDouble(1)))
    val viaFacade = db.search("churnidx", queriesDF(Seq(0L -> qvec)),
      topk = K, nprobe = 4).orderBy("rank").collect()
      .map(r => (r.getLong(1), r.getDouble(2)))
    assert(viaSql.toSeq === viaFacade.toSeq)
    db.close()
  }

  // ---- the BATCH shape (round 14): window-rank over a join ---------------

  /** Canonical batch-scoring SQL: per-query top-k via row_number over the
    * (queries x corpus) join — the SQL twin of searchBatch. */
  private def batchSql(qView: String, tView: String, k: Int = K): String =
    s"""SELECT qid, id, dist, rank FROM (
       |  SELECT q.qid, t.id, l2_distance(t.vec, q.qvec) AS dist,
       |    CAST(row_number() OVER (PARTITION BY q.qid
       |      ORDER BY l2_distance(t.vec, q.qvec), t.id) AS INT) AS rank
       |  FROM $qView q, $tView t)
       |WHERE rank <= $k ORDER BY qid, rank""".stripMargin

  /** A LITERAL query batch (LocalRelation) — the shape that unlocks the
    * static union partition filter. */
  private def localQView(name: String, rows: Seq[(Long, Array[Float])]): Unit = {
    val list = new java.util.ArrayList[org.apache.spark.sql.Row]()
    rows.foreach { case (i, v) =>
      list.add(org.apache.spark.sql.Row(i, if (v == null) null else v.toSeq))
    }
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(StructField("qid", LongType),
      StructField("qvec", ArrayType(FloatType))))
    spark.createDataFrame(list, schema).createOrReplaceTempView(name)
  }

  /** The CORPUS scan of a batch-shape plan (the one with the list_id
    * partition column) — the generic first-scan finder would hit the
    * QUERIES table's scan when the batch is parquet-backed. Unwraps AQE
    * plan wrappers AND (post-execution) materialized query stages. */
  private def corpusScan(df: DataFrame): FileSourceScanExec =
    SqlAnn.fileSourceScans(df)
      .find(_.output.exists(_.name == "list_id"))
      .getOrElse(fail("no corpus scan (list_id) in the executed plan"))

  /** Did the batch rewrite fire? (the probe explode on the queries side) */
  private def hasProbeGenerate(df: DataFrame): Boolean =
    df.queryExecution.optimizedPlan.exists {
      case g: org.apache.spark.sql.catalyst.plans.logical.Generate =>
        g.generator match {
          case e: org.apache.spark.sql.catalyst.expressions.Explode =>
            e.child.isInstanceOf[graft.functions.ProbeLists]
          case _ => false
        }
      case _ => false
    }

  private def rows4(df: DataFrame): Seq[(Long, Long, Double, Int)] =
    df.collect().toSeq.map(r =>
      (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))

  test("batch shape: probe equi-join + static partition filter, exact at nprobe = nlist, both FROM orders") {
    index
    spark.read.parquet(dir).createOrReplaceTempView("sqlann_v")
    SqlAnn.registerIndex(spark, dir, index.centroids.value, nprobe = NList)
    val qs = randomVectors(3, Dim, seed = 9)
    localQView("sqlann_bq", qs)
    try {
      val df = spark.sql(batchSql("sqlann_bq", "sqlann_v"))
      assert(hasProbeGenerate(df), "the probe explode must be injected")
      assert(partitionFilterText(df).contains("list_id"),
        "a literal batch must yield the static union partition filter")
      // the cartesian is GONE: an equi-join (broadcast-hash here) replaced it
      val phys = df.queryExecution.executedPlan.toString
      assert(!phys.contains("CartesianProduct") && !phys.contains("NestedLoop"),
        s"the rewrite must plan an equi-join, got:\n$phys")
      // exact at nprobe = nlist, per query
      val exact = graft.index.Knn.exact(queriesDF(qs),
        index.vectors.select(col("id"), col("vec")), K, Metric.L2)
        .orderBy("qid", "rank")
      assert(rows4(df) === rows4(exact.select(
        col("qid"), col("id"), col("dist"), col("rank"))))
      // reversed FROM order (registered table on the LEFT) rewrites too
      val rev = spark.sql(
        s"""SELECT qid, id, dist, rank FROM (
           |  SELECT q.qid, t.id, l2_distance(t.vec, q.qvec) AS dist,
           |    CAST(row_number() OVER (PARTITION BY q.qid
           |      ORDER BY l2_distance(t.vec, q.qvec), t.id) AS INT) AS rank
           |  FROM sqlann_v t, sqlann_bq q)
           |WHERE rank <= $K ORDER BY qid, rank""".stripMargin)
      assert(hasProbeGenerate(rev) && partitionFilterText(rev).contains("list_id"))
      assert(rows4(rev) === rows4(df))
    } finally SqlAnn.unregisterIndex(spark, dir)
  }

  test("batch shape at nprobe < nlist: facade-identical results, scan reads fewer partitions") {
    rangeIndex
    spark.read.parquet(rangeDir).createOrReplaceTempView("sqlann_brange")
    SqlAnn.registerIndex(spark, rangeDir, rangeIndex.centroids.value, nprobe = 2)
    // queries at two cluster corners: their probe unions cover FEWER than
    // nlist lists, so the static filter actually prunes the scan
    val qs = Seq(100L -> corner(0), 101L -> corner(3))
    localQView("sqlann_bq2", qs)
    try {
      val df = spark.sql(batchSql("sqlann_bq2", "sqlann_brange"))
      assert(hasProbeGenerate(df) && partitionFilterText(df).contains("list_id"))
      val read = scanOf(df).relation.location.listFiles(
        scanOf(df).partitionFilters, Nil).size
      assert(read > 0 && read <= 4,
        s"2 queries x nprobe=2 must prune to at most 4 of $NList partitions, read $read")
      // per-query results == the facade at the SAME nprobe (same probe
      // kernel, same (dist, id) merge order)
      val facade = rangeIndex.search(queriesDF(qs),
        graft.SearchParams(k = K, nprobe = 2)).orderBy("qid", "rank")
      assert(rows4(df) === rows4(facade.select(
        col("qid"), col("id"), col("dist"), col("rank"))))
    } finally SqlAnn.unregisterIndex(spark, rangeDir)
  }

  test("batch shape: parquet-backed queries table gets DYNAMIC partition pruning") {
    index
    spark.read.parquet(dir).createOrReplaceTempView("sqlann_v")
    SqlAnn.registerIndex(spark, dir, index.centroids.value, nprobe = NList)
    val qDir = java.nio.file.Files
      .createTempDirectory("graft-sqlann-qp").toFile.getAbsolutePath
    val qs = randomVectors(3, Dim, seed = 9)
    queriesDF(qs).write.mode("overwrite").parquet(qDir)
    spark.read.parquet(qDir).createOrReplaceTempView("sqlann_bqp")
    try {
      val df = spark.sql(batchSql("sqlann_bqp", "sqlann_v"))
      assert(hasProbeGenerate(df),
        "a non-literal batch must still get the per-query join prune")
      // the probe union is runtime-only here: the CORPUS scan must carry
      // a DYNAMIC pruning filter on list_id instead of a static In
      val pf = corpusScan(df).metadata.getOrElse("PartitionFilters", "")
      assert(pf.contains("dynamicpruning"),
        s"a non-literal batch must inject dynamic partition pruning, got: $pf")
      // still exact at nprobe = nlist
      val exact = graft.index.Knn.exact(queriesDF(qs),
        index.vectors.select(col("id"), col("vec")), K, Metric.L2)
        .orderBy("qid", "rank")
      assert(rows4(df) === rows4(exact.select(
        col("qid"), col("id"), col("dist"), col("rank"))))
    } finally SqlAnn.unregisterIndex(spark, dir)
  }

  test("batch shape: dynamic pruning actually reads fewer partitions at nprobe < nlist") {
    rangeIndex
    spark.read.parquet(rangeDir).createOrReplaceTempView("sqlann_brange2")
    SqlAnn.registerIndex(spark, rangeDir, rangeIndex.centroids.value, nprobe = 2)
    val qDir = java.nio.file.Files
      .createTempDirectory("graft-sqlann-qp2").toFile.getAbsolutePath
    // two corner queries: probe union covers FEWER than nlist lists
    val qs = Seq(100L -> corner(0), 101L -> corner(3))
    queriesDF(qs).write.mode("overwrite").parquet(qDir)
    spark.read.parquet(qDir).createOrReplaceTempView("sqlann_bqp2")
    try {
      val df = spark.sql(batchSql("sqlann_bqp2", "sqlann_brange2"))
      assert(corpusScan(df).metadata.getOrElse("PartitionFilters", "")
        .contains("dynamicpruning"))
      // facade-identical at the same nprobe
      val facade = rangeIndex.search(queriesDF(qs),
        graft.SearchParams(k = K, nprobe = 2)).orderBy("qid", "rank")
      assert(rows4(df) === rows4(facade.select(
        col("qid"), col("id"), col("dist"), col("rank"))))
      // the runtime metric proves the prune: after execution the scan
      // read at most union(probes) of the table's partitions
      val partsRead = corpusScan(df)
        .metrics.get("numPartitions").map(_.value).getOrElse(-1L)
      assert(partsRead > 0 && partsRead <= 4,
        s"dynamic pruning must read <= 4 of $NList partitions, read $partsRead")
    } finally SqlAnn.unregisterIndex(spark, rangeDir)
  }

  test("batch shape: non-matching window shapes are left untouched") {
    index
    spark.read.parquet(dir).createOrReplaceTempView("sqlann_v")
    localQView("sqlann_bq3", randomVectors(2, Dim, seed = 9))
    // (a) unregistered table: nothing fires
    assert(!hasProbeGenerate(spark.sql(batchSql("sqlann_bq3", "sqlann_v"))))
    SqlAnn.registerIndex(spark, dir, index.centroids.value, nprobe = 2)
    try {
      // (b) DESC rank (farthest-first) is not a nearest-neighbor query
      val desc = spark.sql(
        s"""SELECT qid, id, rank FROM (
           |  SELECT q.qid, t.id,
           |    CAST(row_number() OVER (PARTITION BY q.qid
           |      ORDER BY l2_distance(t.vec, q.qvec) DESC) AS INT) AS rank
           |  FROM sqlann_bq3 q, sqlann_v t)
           |WHERE rank <= $K ORDER BY qid, rank""".stripMargin)
      assert(!hasProbeGenerate(desc))
      // (c) partitioning by a CORPUS column ranks per corpus row — not the
      // per-query ANN shape
      val byCorpus = spark.sql(
        s"""SELECT qid, id, rank FROM (
           |  SELECT q.qid, t.id,
           |    CAST(row_number() OVER (PARTITION BY t.list_id
           |      ORDER BY l2_distance(t.vec, q.qvec)) AS INT) AS rank
           |  FROM sqlann_bq3 q, sqlann_v t)
           |WHERE rank <= $K ORDER BY qid, id, rank""".stripMargin)
      assert(!hasProbeGenerate(byCorpus))
      // (d) ordering by something other than a distance
      val byId = spark.sql(
        s"""SELECT qid, id, rank FROM (
           |  SELECT q.qid, t.id,
           |    CAST(row_number() OVER (PARTITION BY q.qid ORDER BY t.id) AS INT) AS rank
           |  FROM sqlann_bq3 q, sqlann_v t)
           |WHERE rank <= $K ORDER BY qid, rank""".stripMargin)
      assert(!hasProbeGenerate(byId))
    } finally SqlAnn.unregisterIndex(spark, dir)
  }

  test("batch shape: idempotent under the fixed-point batch (one Generate, one In)") {
    index
    spark.read.parquet(dir).createOrReplaceTempView("sqlann_v")
    SqlAnn.registerIndex(spark, dir, index.centroids.value, nprobe = 2)
    localQView("sqlann_bq4", randomVectors(2, Dim, seed = 9))
    try {
      val df = spark.sql(batchSql("sqlann_bq4", "sqlann_v"))
      val gens = df.queryExecution.optimizedPlan.collect {
        case g: org.apache.spark.sql.catalyst.plans.logical.Generate => g
      }.size
      val ins = df.queryExecution.optimizedPlan.collect {
        case f: org.apache.spark.sql.catalyst.plans.logical.Filter =>
          f.condition.collect {
            case i: org.apache.spark.sql.catalyst.expressions.In => i
          }.size
      }.sum
      assert(gens === 1, s"exactly one probe explode, got $gens")
      assert(ins === 1, s"exactly one static In filter, got $ins")
    } finally SqlAnn.unregisterIndex(spark, dir)
  }

  test("batch shape: RANK() and cosine_distance plumb through (exact at nprobe = nlist)") {
    index
    spark.read.parquet(dir).createOrReplaceTempView("sqlann_v")
    SqlAnn.registerIndex(spark, dir, index.centroids.value, nprobe = NList)
    val qs = randomVectors(2, Dim, seed = 9)
    localQView("sqlann_bq7", qs)
    try {
      // RANK() produces the same WindowGroupLimit anchor as row_number()
      val ranked = spark.sql(
        s"""SELECT qid, id, dist FROM (
           |  SELECT q.qid, t.id, l2_distance(t.vec, q.qvec) AS dist,
           |    RANK() OVER (PARTITION BY q.qid
           |      ORDER BY l2_distance(t.vec, q.qvec), t.id) AS rnk
           |  FROM sqlann_bq7 q, sqlann_v t)
           |WHERE rnk <= $K ORDER BY qid, dist, id""".stripMargin)
      assert(hasProbeGenerate(ranked) && partitionFilterText(ranked).contains("list_id"))
      val exact = graft.index.Knn.exact(queriesDF(qs),
        index.vectors.select(col("id"), col("vec")), K, Metric.L2)
        .orderBy("qid", "rank").collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      assert(ranked.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
        === exact.toSeq)
      // cosine: the probe expression must inherit the metric
      val cos = spark.sql(
        s"""SELECT qid, id, dist, rank FROM (
           |  SELECT q.qid, t.id, cosine_distance(t.vec, q.qvec) AS dist,
           |    CAST(row_number() OVER (PARTITION BY q.qid
           |      ORDER BY cosine_distance(t.vec, q.qvec), t.id) AS INT) AS rank
           |  FROM sqlann_bq7 q, sqlann_v t)
           |WHERE rank <= $K ORDER BY qid, rank""".stripMargin)
      assert(hasProbeGenerate(cos) && partitionFilterText(cos).contains("list_id"))
      val exactCos = graft.index.Knn.exact(queriesDF(qs),
        index.vectors.select(col("id"), col("vec")), K, Metric.Cosine)
        .orderBy("qid", "rank")
      assert(rows4(cos) === rows4(exactCos.select(
        col("qid"), col("id"), col("dist"), col("rank"))))
    } finally SqlAnn.unregisterIndex(spark, dir)
  }

  // ---- the RANGE-JOIN shape (round 14): SQL similarity join --------------

  private def rangeJoinSql(qView: String, tView: String, radius: String): String =
    s"""SELECT q.qid, t.id, l2_distance(t.vec, q.qvec) AS dist
       |FROM $qView q, $tView t
       |WHERE l2_distance(t.vec, q.qvec) <= $radius ORDER BY qid, id""".stripMargin

  private def hasRangeGenerate(df: DataFrame): Boolean =
    df.queryExecution.optimizedPlan.exists {
      case g: org.apache.spark.sql.catalyst.plans.logical.Generate =>
        g.generator match {
          case e: org.apache.spark.sql.catalyst.expressions.Explode =>
            e.child.isInstanceOf[graft.functions.RangeProbeLists]
          case _ => false
        }
      case _ => false
    }

  private def rows3(df: DataFrame): Seq[(Long, Long, Double)] =
    df.collect().toSeq.map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))

  test("round 20: a NEW radius over the warmed range family compiles zero codegen classes") {
    // r19 verdict #4 / watch #1: the radius used to be the one
    // value-bearing token in the family's generated source (an inlined
    // `2.5D` in the filter stage; `${radius}D` in the probe explode), so
    // a serving workload with per-request radii compiled one class per
    // DISTINCT radius even after PlanWarmup. DoubleRef + the referenced
    // probe radius make the source radius-invariant: after ONE warming
    // radius, every later distinct radius must be codegen+0 — single
    // table AND join shapes.
    rangeIndex
    spark.read.parquet(rangeDir).createOrReplaceTempView("sqlann_radref")
    SqlAnn.registerIndex(spark, rangeDir, rangeIndex.centroids.value,
      nprobe = 2, radii = Some(rangeIndex.listRadii))
    localQView("sqlann_radrefq", Seq(100L -> corner(0), 101L -> corner(3)))
    def cg: Long = org.apache.spark.metrics.source.CodegenMetrics
      .METRIC_COMPILATION_TIME.getCount
    try {
      // warm each shape once (any radius)
      spark.sql(rangeSql("sqlann_radref", "2.0")).collect()
      spark.sql(rangeJoinSql("sqlann_radrefq", "sqlann_radref", "2.0")).collect()
      val c0 = cg
      val a = spark.sql(rangeSql("sqlann_radref", "2.5")).collect()
      val b = spark.sql(rangeJoinSql("sqlann_radrefq", "sqlann_radref", "1.7"))
        .collect()
      assert(cg - c0 === 0L,
        s"distinct radii over the warmed family must compile nothing, got +${cg - c0}")
      // and the substituted predicate still FILTERS correctly: results
      // match the unregistered brute force at the new radii
      SqlAnn.unregisterIndex(spark, rangeDir)
      val a2 = spark.sql(rangeSql("sqlann_radref", "2.5")).collect()
      val b2 = spark.sql(rangeJoinSql("sqlann_radrefq", "sqlann_radref", "1.7"))
        .collect()
      assert(a.map(_.toSeq).toSeq === a2.map(_.toSeq).toSeq)
      assert(b.map(_.toSeq).toSeq === b2.map(_.toSeq).toSeq)
    } finally SqlAnn.unregisterIndex(spark, rangeDir)
  }

  test("range join: the cartesian becomes an equi-join, EXACT, pruned scan (literal batch)") {
    rangeIndex
    spark.read.parquet(rangeDir).createOrReplaceTempView("sqlann_rj")
    SqlAnn.registerIndex(spark, rangeDir, rangeIndex.centroids.value,
      nprobe = 2, radii = Some(rangeIndex.listRadii))
    val qs = Seq(100L -> corner(0), 101L -> corner(3))
    localQView("sqlann_rjq", qs)
    try {
      val df = spark.sql(rangeJoinSql("sqlann_rjq", "sqlann_rj", "2.0"))
      assert(hasRangeGenerate(df), "the range-probe explode must be injected")
      val scan = corpusScan(df)
      assert(scan.metadata.getOrElse("PartitionFilters", "").contains("list_id"))
      val read = scan.relation.location.listFiles(scan.partitionFilters, Nil).size
      assert(read > 0 && read < NList,
        s"tight query balls over clustered lists must prune (< $NList), read $read")
      val phys = df.queryExecution.executedPlan.toString
      assert(!phys.contains("CartesianProduct") && !phys.contains("NestedLoop"),
        s"the rewrite must plan an equi-join, got:\n$phys")
      // EXACT — identical to the brute-force range scan over both queries
      val exact = graft.index.Knn.range(queriesDF(qs),
        rangeIndex.vectors.select(col("id"), col("vec")), 2.0).orderBy("qid", "id")
      val got = rows3(df)
      assert(got.nonEmpty && got === rows3(exact.select(
        col("qid"), col("id"), col("dist"))))
    } finally SqlAnn.unregisterIndex(spark, rangeDir)
  }

  test("range join: parquet queries side gets dynamic pruning; no radii / cosine untouched") {
    rangeIndex
    spark.read.parquet(rangeDir).createOrReplaceTempView("sqlann_rj2")
    val qDir = java.nio.file.Files
      .createTempDirectory("graft-sqlann-rjq").toFile.getAbsolutePath
    val qs = Seq(100L -> corner(0), 101L -> corner(3))
    queriesDF(qs).write.mode("overwrite").parquet(qDir)
    spark.read.parquet(qDir).createOrReplaceTempView("sqlann_rjqp")
    // (a) registered WITHOUT radii: the join shape must not rewrite
    SqlAnn.registerIndex(spark, rangeDir, rangeIndex.centroids.value, nprobe = 2)
    try {
      assert(!hasRangeGenerate(
        spark.sql(rangeJoinSql("sqlann_rjqp", "sqlann_rj2", "2.0"))))
    } finally SqlAnn.unregisterIndex(spark, rangeDir)
    SqlAnn.registerIndex(spark, rangeDir, rangeIndex.centroids.value,
      nprobe = 2, radii = Some(rangeIndex.listRadii))
    try {
      // (b) non-literal queries side: dynamic pruning at the corpus scan
      val df = spark.sql(rangeJoinSql("sqlann_rjqp", "sqlann_rj2", "2.0"))
      assert(hasRangeGenerate(df))
      assert(corpusScan(df).metadata.getOrElse("PartitionFilters", "")
        .contains("dynamicpruning"))
      val exact = graft.index.Knn.range(queriesDF(qs),
        rangeIndex.vectors.select(col("id"), col("vec")), 2.0).orderBy("qid", "id")
      assert(rows3(df) === rows3(exact.select(col("qid"), col("id"), col("dist"))))
      val partsRead = corpusScan(df)
        .metrics.get("numPartitions").map(_.value).getOrElse(-1L)
      assert(partsRead > 0 && partsRead < NList,
        s"dynamic range pruning must read < $NList partitions, read $partsRead")
      // (c) the bound needs a true metric: cosine join is left untouched
      val cos = spark.sql(
        s"""SELECT q.qid, t.id FROM sqlann_rjqp q, sqlann_rj2 t
           |WHERE cosine_distance(t.vec, q.qvec) <= 0.2""".stripMargin)
      assert(!hasRangeGenerate(cos))
      // (d) idempotence: one Generate, one In/dpp filter
      val gens = df.queryExecution.optimizedPlan.collect {
        case g: org.apache.spark.sql.catalyst.plans.logical.Generate => g
      }.size
      assert(gens === 1, s"exactly one range-probe explode, got $gens")
    } finally SqlAnn.unregisterIndex(spark, rangeDir)
  }

  test("batch shape: the shuffle-join regime (no broadcast) still prunes via the standalone subquery") {
    // the 100 TB flood shape: a queries side too big to broadcast makes
    // the equi-join shuffle — dynamic pruning must then fall back to the
    // standalone distinct-keys subquery (onlyInBroadcast = false for a
    // re-executable side) and STILL prune the corpus scan
    rangeIndex
    spark.read.parquet(rangeDir).createOrReplaceTempView("sqlann_smj")
    SqlAnn.registerIndex(spark, rangeDir, rangeIndex.centroids.value, nprobe = 2)
    val qDir = java.nio.file.Files
      .createTempDirectory("graft-sqlann-smj").toFile.getAbsolutePath
    val qs = Seq(100L -> corner(0), 101L -> corner(3))
    queriesDF(qs).write.mode("overwrite").parquet(qDir)
    spark.read.parquet(qDir).createOrReplaceTempView("sqlann_smjq")
    val conf = spark.conf
    val oldT = conf.get("spark.sql.autoBroadcastJoinThreshold")
    val oldA = conf.getOption("spark.sql.adaptive.autoBroadcastJoinThreshold")
    conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    try {
      val df = spark.sql(batchSql("sqlann_smjq", "sqlann_smj"))
      assert(hasProbeGenerate(df))
      assert(corpusScan(df).metadata.getOrElse("PartitionFilters", "")
        .contains("dynamicpruning"))
      val phys = df.queryExecution.executedPlan.toString
      assert(!phys.contains("BroadcastHashJoin"),
        s"the regime under test is the NON-broadcast join, got:\n$phys")
      // facade-identical at the same nprobe, through the shuffle join
      val facade = rangeIndex.search(queriesDF(qs),
        graft.SearchParams(k = K, nprobe = 2)).orderBy("qid", "rank")
      assert(rows4(df) === rows4(facade.select(
        col("qid"), col("id"), col("dist"), col("rank"))))
      // and the scan really read only the probed partitions
      val partsRead = corpusScan(df)
        .metrics.get("numPartitions").map(_.value).getOrElse(-1L)
      assert(partsRead > 0 && partsRead <= 4,
        s"standalone-subquery pruning must read <= 4 of $NList partitions, read $partsRead")
    } finally {
      conf.set("spark.sql.autoBroadcastJoinThreshold", oldT)
      oldA.fold(conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold"))(
        conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", _))
      SqlAnn.unregisterIndex(spark, rangeDir)
    }
  }

  test("dynamic pruning demands broadcast reuse for non-re-executable query sides") {
    // a queries side that may not re-execute to the same rows (sample,
    // rand(), unordered limit) must NOT feed a standalone pruning
    // subquery — a second execution could prune partitions the join's
    // actual rows need (false dismissal). The injected subquery's
    // onlyInBroadcast flag is the guard: reuse-or-drop.
    index
    spark.read.parquet(dir).createOrReplaceTempView("sqlann_det")
    SqlAnn.registerIndex(spark, dir, index.centroids.value, nprobe = NList)
    val qDir = java.nio.file.Files
      .createTempDirectory("graft-sqlann-det").toFile.getAbsolutePath
    queriesDF(randomVectors(6, Dim, seed = 9)).write.mode("overwrite").parquet(qDir)
    spark.read.parquet(qDir).createOrReplaceTempView("sqlann_detq")
    def onlyInBroadcastOf(df: DataFrame): Seq[Boolean] =
      df.queryExecution.optimizedPlan.collect {
        case f: org.apache.spark.sql.catalyst.plans.logical.Filter =>
          f.condition.collect {
            case d: org.apache.spark.sql.catalyst.expressions.DynamicPruningSubquery =>
              d.onlyInBroadcast
          }
      }.flatten
    try {
      // plain parquet side: re-executable, standalone subquery allowed
      val det = spark.sql(batchSql("sqlann_detq", "sqlann_det"))
      assert(onlyInBroadcastOf(det) === Seq(false))
      // unordered LIMIT: row selection is not stable across executions
      val lim = spark.sql(
        s"""SELECT qid, id, dist, rank FROM (
           |  SELECT q.qid, t.id, l2_distance(t.vec, q.qvec) AS dist,
           |    CAST(row_number() OVER (PARTITION BY q.qid
           |      ORDER BY l2_distance(t.vec, q.qvec), t.id) AS INT) AS rank
           |  FROM (SELECT * FROM sqlann_detq LIMIT 3) q, sqlann_det t)
           |WHERE rank <= $K ORDER BY qid, rank""".stripMargin)
      assert(hasProbeGenerate(lim), "the join prune itself still applies")
      assert(onlyInBroadcastOf(lim).forall(_ == true),
        "a limited queries side must demand broadcast reuse for pruning")
      // and the results stay correct either way (broadcast reuse serves
      // one consistent row set to both join and prune)
      val rows = rows4(lim)
      assert(rows.map(_._1).distinct.size === 3 && rows.size === 3 * K)
      // OFFSET selects by position like a limit: not stable across
      // executions over anything but a total order (r18 — the pre-r18
      // gate listed only Sample and the Limit nodes, so an OFFSET side
      // could feed a standalone DPP build and falsely dismiss)
      val off = spark.sql(
        s"""SELECT qid, id, dist, rank FROM (
           |  SELECT q.qid, t.id, l2_distance(t.vec, q.qvec) AS dist,
           |    CAST(row_number() OVER (PARTITION BY q.qid
           |      ORDER BY l2_distance(t.vec, q.qvec), t.id) AS INT) AS rank
           |  FROM (SELECT * FROM sqlann_detq OFFSET 2) q, sqlann_det t)
           |WHERE rank <= $K ORDER BY qid, rank""".stripMargin)
      assert(hasProbeGenerate(off), "the join prune itself still applies")
      assert(onlyInBroadcastOf(off).forall(_ == true),
        "an OFFSET queries side must demand broadcast reuse for pruning")
      // TABLESAMPLE: same guard
      val samp = spark.sql(
        s"""SELECT qid, id, dist, rank FROM (
           |  SELECT q.qid, t.id, l2_distance(t.vec, q.qvec) AS dist,
           |    CAST(row_number() OVER (PARTITION BY q.qid
           |      ORDER BY l2_distance(t.vec, q.qvec), t.id) AS INT) AS rank
           |  FROM (SELECT * FROM sqlann_detq TABLESAMPLE (50 PERCENT)) q, sqlann_det t)
           |WHERE rank <= $K ORDER BY qid, rank""".stripMargin)
      if (hasProbeGenerate(samp))
        assert(onlyInBroadcastOf(samp).forall(_ == true),
          "a sampled queries side must demand broadcast reuse for pruning")
    } finally SqlAnn.unregisterIndex(spark, dir)
  }

  test("range join: negative radius yields zero rows exactly") {
    rangeIndex
    spark.read.parquet(rangeDir).createOrReplaceTempView("sqlann_rj3")
    SqlAnn.registerIndex(spark, rangeDir, rangeIndex.centroids.value,
      nprobe = 2, radii = Some(rangeIndex.listRadii))
    localQView("sqlann_rjq3", Seq(100L -> corner(0)))
    try {
      val df = spark.sql(rangeJoinSql("sqlann_rjq3", "sqlann_rj3", "-1.0"))
      assert(df.collect().isEmpty,
        "sqrt(negative) = NaN keeps only NaN-radius lists; the retained " +
          "dist <= r predicate then drops every pair — exactly zero rows")
    } finally SqlAnn.unregisterIndex(spark, rangeDir)
  }

  // ---- the COSINE bridge (round 15): unit-norm attested tables -----------

  // normalized clustered fixture: the corner clusters projected onto the
  // unit sphere keep their separation (different corners' cosine distance
  // >= 0.5; within-cluster ~1e-3), so a 0.1 cosine ball provably prunes
  private lazy val cosDir = java.nio.file.Files
    .createTempDirectory("graft-sqlann-cosine").toFile.getAbsolutePath
  private lazy val cosIndex: IvfFlatIndex = {
    val rnd = new scala.util.Random(17)
    val rows = (0L until 200L).map { i =>
      val c = corner((i % 8).toInt)
      (i, graft.functions.VectorKernels.normalize(
        c.map(x => x + rnd.nextFloat() * 0.2f - 0.1f)))
    }
    val idx = IvfFlatIndex.build(spark, vectorsDF(rows), NList)
    idx.vectors.write.partitionBy("list_id").mode("overwrite").parquet(cosDir)
    idx
  }
  private def ncorner(k: Int): Array[Float] =
    graft.functions.VectorKernels.normalize(corner(k))
  private def litOf(v: Array[Float]): String =
    s"CAST(array(${v.map(_.toDouble).mkString(", ")}) AS ARRAY<FLOAT>)"

  private def cosineJoinSql(qView: String, tView: String, radius: String): String =
    s"""SELECT q.qid, t.id, cosine_distance(t.vec, q.qvec) AS dist
       |FROM $qView q, $tView t
       |WHERE cosine_distance(t.vec, q.qvec) <= $radius ORDER BY qid, id""".stripMargin

  private def hasCosineGenerate(df: DataFrame): Boolean =
    df.queryExecution.optimizedPlan.exists {
      case g: org.apache.spark.sql.catalyst.plans.logical.Generate =>
        g.generator match {
          case e: org.apache.spark.sql.catalyst.expressions.Explode =>
            e.child.isInstanceOf[graft.functions.CosineRangeProbeLists]
          case _ => false
        }
      case _ => false
    }

  test("cosine join over a unit-norm-attested table: bridge fires, EXACT, pruned scan") {
    cosIndex
    graft.GraftExtensions.register(spark) // cosine_distance for the brute run
    spark.read.parquet(cosDir).createOrReplaceTempView("sqlann_cj")
    val qs = Seq(100L -> ncorner(0), 101L -> ncorner(3))
    localQView("sqlann_cjq", qs)
    // brute force FIRST (nothing registered -> the cartesian plan)
    val brute = rows3(spark.sql(cosineJoinSql("sqlann_cjq", "sqlann_cj", "0.1")))
    SqlAnn.registerIndex(spark, cosDir, cosIndex.centroids.value,
      nprobe = 2, radii = Some(cosIndex.listRadii), unitNorm = true)
    try {
      val df = spark.sql(cosineJoinSql("sqlann_cjq", "sqlann_cj", "0.1"))
      assert(hasCosineGenerate(df), "the cosine range-probe explode must be injected")
      val scan = corpusScan(df)
      assert(scan.metadata.getOrElse("PartitionFilters", "").contains("list_id"))
      val read = scan.relation.location.listFiles(scan.partitionFilters, Nil).size
      assert(read > 0 && read < NList,
        s"tight cosine balls over clustered unit vectors must prune (< $NList), read $read")
      val phys = df.queryExecution.executedPlan.toString
      assert(!phys.contains("CartesianProduct") && !phys.contains("NestedLoop"),
        s"the rewrite must plan an equi-join, got:\n$phys")
      val got = rows3(df)
      assert(got.nonEmpty && got === brute,
        "the cosine bridge must be EXACT (conservative bound + kept predicate)")
    } finally SqlAnn.unregisterIndex(spark, cosDir)
  }

  test("cosine join: degenerate (zero) query rows fall back to all lists per row — still exact") {
    cosIndex
    graft.GraftExtensions.register(spark)
    spark.read.parquet(cosDir).createOrReplaceTempView("sqlann_cj2")
    // a zero vector's norm fails the unit check: the bridge bound doesn't
    // hold for it, so its probe emits EVERY list (no false dismissal) and
    // the kept cosine predicate does the filtering (dist = 1 for a zero
    // vector against anything — no matches at 0.1)
    val qs = Seq(100L -> ncorner(0), 102L -> Array.fill(Dim)(0f))
    localQView("sqlann_cjq2", qs)
    val brute = rows3(spark.sql(cosineJoinSql("sqlann_cjq2", "sqlann_cj2", "0.1")))
    SqlAnn.registerIndex(spark, cosDir, cosIndex.centroids.value,
      nprobe = 2, radii = Some(cosIndex.listRadii), unitNorm = true)
    try {
      val df = spark.sql(cosineJoinSql("sqlann_cjq2", "sqlann_cj2", "0.1"))
      assert(hasCosineGenerate(df))
      val got = rows3(df)
      assert(got === brute)
      assert(got.map(_._1).toSet === Set(100L), "the zero query matches nothing")
    } finally SqlAnn.unregisterIndex(spark, cosDir)
  }

  test("cosine join without the unitNorm attestation stays untouched (radii alone are not enough)") {
    cosIndex
    spark.read.parquet(cosDir).createOrReplaceTempView("sqlann_cj3")
    localQView("sqlann_cjq3", Seq(100L -> ncorner(0)))
    SqlAnn.registerIndex(spark, cosDir, cosIndex.centroids.value,
      nprobe = 2, radii = Some(cosIndex.listRadii))
    try {
      val df = spark.sql(cosineJoinSql("sqlann_cjq3", "sqlann_cj3", "0.1"))
      assert(!hasCosineGenerate(df),
        "no attestation -> the bridge bound is unsound -> no rewrite")
    } finally SqlAnn.unregisterIndex(spark, cosDir)
  }

  test("single-table cosine range: bridge prunes for a unit literal, ignores a non-unit literal") {
    cosIndex
    graft.GraftExtensions.register(spark)
    spark.read.parquet(cosDir).createOrReplaceTempView("sqlann_cr")
    def sql(lit: String) =
      s"""SELECT id, cosine_distance(vec, $lit) AS dist
         |FROM sqlann_cr WHERE cosine_distance(vec, $lit) <= 0.1 ORDER BY id""".stripMargin
    val brute = spark.sql(sql(litOf(ncorner(0)))).collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSeq
    SqlAnn.registerIndex(spark, cosDir, cosIndex.centroids.value,
      nprobe = 2, radii = Some(cosIndex.listRadii), unitNorm = true)
    try {
      val df = spark.sql(sql(litOf(ncorner(0))))
      assert(partitionFilterText(df).contains("list_id"),
        "the single-table cosine bridge must inject the list_id filter")
      val inSizes = scanOf(df).partitionFilters.flatMap(_.collect {
        case i: org.apache.spark.sql.catalyst.expressions.In => i.list.size
      })
      assert(inSizes.nonEmpty && inSizes.head < NList,
        s"a 0.1 cosine ball over clustered unit vectors must prune, got $inSizes")
      val got = df.collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      assert(got.nonEmpty && got === brute)
      // a NON-unit literal (norm ~11): the bridge bound doesn't hold for
      // it — the driver-side norm check must leave the query untouched
      assert(!partitionFilterText(spark.sql(sql(litOf(corner(0)))))
        .contains("list_id"),
        "a non-unit query literal must not prune through the bridge")
    } finally SqlAnn.unregisterIndex(spark, cosDir)
  }

  test("top-k with a metadata join: the registered side is pruned before the join") {
    index
    graft.GraftExtensions.register(spark)
    spark.read.parquet(dir).createOrReplaceTempView("sqlann_tkj")
    // a dims table: one metadata row per corpus id
    spark.range(200).select(col("id").as("mid"), (col("id") % 7).as("tag"))
      .createOrReplaceTempView("sqlann_dims")
    def sql =
      s"""SELECT t.id, d.tag, l2_distance(t.vec, $qvecSql) AS dist
         |FROM sqlann_tkj t JOIN sqlann_dims d ON t.id = d.mid
         |ORDER BY dist, t.id LIMIT $K""".stripMargin
    val brute = spark.sql(sql).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    SqlAnn.registerIndex(spark, dir, index.centroids.value, nprobe = NList)
    try {
      val df = spark.sql(sql)
      val pf = SqlAnn.fileSourceScans(df)
        .find(_.output.exists(_.name == "list_id"))
        .flatMap(_.metadata.get("PartitionFilters")).getOrElse("")
      assert(pf.contains("list_id"),
        s"the registered join side must carry the probe filter, got: $pf")
      val got = df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
      assert(got.nonEmpty && got === brute, "exact at nprobe = nlist through the join")
      // at nprobe < nlist: the scan really reads fewer partitions
      SqlAnn.unregisterIndex(spark, dir)
      SqlAnn.registerIndex(spark, dir, index.centroids.value, nprobe = 2)
      val ap = spark.sql(sql)
      val scan = SqlAnn.fileSourceScans(ap)
        .find(_.output.exists(_.name == "list_id")).get
      val read = scan.relation.location.listFiles(scan.partitionFilters, Nil).size
      assert(read > 0 && read <= 2,
        s"nprobe=2 must prune the joined scan to at most 2 of $NList partitions, read $read")
      // LEFT join with the registered table PRESERVED: fires too (round
      // 16) — the probe filter under t only drops candidate rows the
      // nprobe contract already allows; see the dedicated outer-join
      // matrix test for semantics
      val lj = spark.sql(
        s"""SELECT t.id, d.tag, l2_distance(t.vec, $qvecSql) AS dist
           |FROM sqlann_tkj t LEFT JOIN sqlann_dims d ON t.id = d.mid
           |ORDER BY dist, t.id LIMIT $K""".stripMargin)
      val ljPf = SqlAnn.fileSourceScans(lj)
        .find(_.output.exists(_.name == "list_id"))
        .flatMap(_.metadata.get("PartitionFilters")).getOrElse("")
      assert(ljPf.contains("list_id"),
        "a LEFT join with the registered side preserved must be pruned")
    } finally SqlAnn.unregisterIndex(spark, dir)
  }

  test("outer-join top-k matrix: preserved registered side pruned, null-producing side untouched") {
    index
    graft.GraftExtensions.register(spark)
    spark.read.parquet(dir).createOrReplaceTempView("sqlann_oj")
    // PARTIAL metadata (one row per third id): a LEFT join genuinely
    // null-extends some candidates, so exactness at nprobe = nlist pins
    // the null-extension semantics, not just the happy path
    spark.range(200).filter(col("id") % 3 === 0)
      .select(col("id").as("mid"), (col("id") % 7).as("tag"))
      .createOrReplaceTempView("sqlann_oj_dims")
    def corpusPf(df: DataFrame): String = SqlAnn.fileSourceScans(df)
      .find(_.output.exists(_.name == "list_id"))
      .flatMap(_.metadata.get("PartitionFilters")).getOrElse("")
    def rowsOf(df: DataFrame): Seq[(Long, Option[Long], Double)] =
      df.collect().map(r => (r.getLong(0),
        if (r.isNullAt(1)) None else Some(r.getLong(1)), r.getDouble(2))).toSeq
    val leftSql =
      s"""SELECT t.id, d.tag, l2_distance(t.vec, $qvecSql) AS dist
         |FROM sqlann_oj t LEFT JOIN sqlann_oj_dims d ON t.id = d.mid
         |ORDER BY dist, t.id LIMIT $K""".stripMargin
    val rightSql =
      s"""SELECT t.id, d.tag, l2_distance(t.vec, $qvecSql) AS dist
         |FROM sqlann_oj_dims d RIGHT JOIN sqlann_oj t ON t.id = d.mid
         |ORDER BY dist, t.id LIMIT $K""".stripMargin
    val semiSql =
      s"""SELECT t.id, CAST(NULL AS LONG) AS tag, l2_distance(t.vec, $qvecSql) AS dist
         |FROM sqlann_oj t
         |WHERE EXISTS (SELECT 1 FROM sqlann_oj_dims d WHERE d.mid = t.id)
         |ORDER BY dist, t.id LIMIT $K""".stripMargin
    val antiSql =
      s"""SELECT t.id, CAST(NULL AS LONG) AS tag, l2_distance(t.vec, $qvecSql) AS dist
         |FROM sqlann_oj t
         |WHERE NOT EXISTS (SELECT 1 FROM sqlann_oj_dims d WHERE d.mid = t.id)
         |ORDER BY dist, t.id LIMIT $K""".stripMargin
    // the registered table NULL-PRODUCING: its rows may be replaced by
    // null-extension, which the nprobe contract does not cover
    val nullProdSql =
      s"""SELECT d.mid, t.id, l2_distance(t.vec, $qvecSql) AS dist
         |FROM sqlann_oj_dims d LEFT JOIN sqlann_oj t ON t.id = d.mid
         |ORDER BY dist, d.mid LIMIT $K""".stripMargin
    val brutes = Seq(leftSql, rightSql, semiSql, antiSql).map(s => rowsOf(spark.sql(s)))
    SqlAnn.registerIndex(spark, dir, index.centroids.value, nprobe = NList)
    try {
      Seq(leftSql, rightSql, semiSql, antiSql).zip(brutes).zip(
        Seq("LeftOuter", "RightOuter", "LeftSemi", "LeftAnti")).foreach {
        case ((s, brute), name) =>
          val df = spark.sql(s)
          val pf = corpusPf(df)
          assert(pf.contains("list_id"),
            s"$name with the registered side preserved must prune, got: $pf")
          assert(rowsOf(df) === brute, s"$name must be exact at nprobe = nlist")
      }
      // nprobe < nlist: the preserved-side scan really reads fewer
      // partitions, and every surviving row comes from a probed list
      SqlAnn.unregisterIndex(spark, dir)
      SqlAnn.registerIndex(spark, dir, index.centroids.value, nprobe = 2)
      val lp = spark.sql(leftSql)
      val scan = SqlAnn.fileSourceScans(lp)
        .find(_.output.exists(_.name == "list_id")).get
      val read = scan.relation.location.listFiles(scan.partitionFilters, Nil).size
      assert(read > 0 && read <= 2,
        s"nprobe=2 must prune the preserved side to at most 2 of $NList partitions, read $read")
      assert(rowsOf(lp).size === K, "the pruned LEFT join still returns a full top-k")
      // null-producing registered side: untouched (a probe filter there
      // would flip matched rows to null-extended ones)
      assert(!corpusPf(spark.sql(nullProdSql)).contains("list_id"),
        "the null-producing side of an outer join must never be pruned")
    } finally SqlAnn.unregisterIndex(spark, dir)
  }

  test("cosine SELF-join dedup: bridge + self-join compose, EXACT") {
    // the LLM near-dup shape in its most common form: cosine distance,
    // one table, every near pair — both round-15 features composing
    cosIndex
    graft.GraftExtensions.register(spark)
    spark.read.parquet(cosDir).createOrReplaceTempView("sqlann_csj")
    def sql =
      s"""SELECT a.id AS a_id, b.id AS b_id, cosine_distance(b.vec, a.vec) AS dist
         |FROM sqlann_csj a, sqlann_csj b
         |WHERE cosine_distance(b.vec, a.vec) <= 0.1 AND a.id < b.id
         |ORDER BY a_id, b_id""".stripMargin
    val brute = rows3(spark.sql(sql))
    SqlAnn.registerIndex(spark, cosDir, cosIndex.centroids.value,
      nprobe = 2, radii = Some(cosIndex.listRadii), unitNorm = true)
    try {
      val df = spark.sql(sql)
      assert(hasCosineGenerate(df), "the cosine range-probe explode must be injected")
      val phys = df.queryExecution.executedPlan.toString
      assert(!phys.contains("CartesianProduct") && !phys.contains("NestedLoop"),
        s"the cosine self-join must plan as an equi-join, got:\n$phys")
      val got = rows3(df)
      assert(got.nonEmpty && got === brute,
        s"cosine self-join must be EXACT (${got.size} vs ${brute.size} rows)")
    } finally SqlAnn.unregisterIndex(spark, cosDir)
  }

  // ---- round 16: the PQ-accelerated SQL top-k -----------------------------

  private lazy val pqDir = java.nio.file.Files
    .createTempDirectory("graft-sqlann-pq").toFile.getAbsolutePath
  private lazy val pqIndex: graft.index.IvfPqIndex = {
    rangeIndex // share the clustered-corner corpus
    val idx = graft.index.IvfPqIndex.build(spark,
      rangeIndex.vectors.select(col("id"), col("vec")), NList, m = 4)
    idx.codes.join(idx.rawVectors, "id")
      .select(col("id"), col("vec"), col("codes"), col("list_id"))
      .write.partitionBy("list_id").mode("overwrite").parquet(pqDir)
    idx
  }

  private def registerPq(nprobe: Int, rerankK: Int): Unit = {
    SqlAnn.registerIndex(spark, pqDir, pqIndex.centroids.value, nprobe = nprobe,
      centroidsBc = Some(pqIndex.centroids),
      pq = Some(new SqlAnn.PqInfo(pqIndex.codebooks, rerankK = rerankK)))
    ()
  }

  private def pqScansOf(df: DataFrame) = {
    val scans = SqlAnn.fileSourceScans(df)
    def pfOf(s: org.apache.spark.sql.execution.FileSourceScanExec) =
      s.metadata.getOrElse("PartitionFilters", "")
    val adc = scans.find(s => s.output.exists(_.name == "codes") &&
      !s.output.exists(_.name == "vec"))
    val rerank = scans.find(s => s.output.exists(_.name == "vec") &&
      !s.output.exists(_.name == "codes"))
    (adc, rerank, adc.map(pfOf), rerank.map(pfOf))
  }

  test("PQ-registered table: two-scan ADC + exact rerank plan, exact at full coverage") {
    pqIndex
    graft.GraftExtensions.register(spark)
    spark.read.parquet(pqDir).createOrReplaceTempView("sqlann_pq")
    val sql = annSql("sqlann_pq")
    // joined twin: PQ under an INNER metadata join with PARTIAL metadata
    spark.range(200).filter(col("id") % 2 === 0).select(col("id").as("mid"))
      .createOrReplaceTempView("sqlann_pq_jdims")
    val joinSql =
      s"""SELECT t.id, d.mid, l2_distance(t.vec, $qvecSql) AS dist
         |FROM sqlann_pq t JOIN sqlann_pq_jdims d ON t.id = d.mid
         |ORDER BY dist, t.id LIMIT $K""".stripMargin
    val brute = spark.sql(sql).collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val bruteJoin = spark.sql(joinSql).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    registerPq(nprobe = NList, rerankK = 400) // >= corpus: rerank covers all
    try {
      val df = spark.sql(sql)
      val (adc, rerank, adcPf, rerankPf) = pqScansOf(df)
      assert(adc.isDefined && rerank.isDefined,
        s"expected an (id, codes) candidate scan AND an (id, vec) rerank scan; " +
          s"got schemas ${SqlAnn.fileSourceScans(df).map(_.output.map(_.name))}")
      assert(adcPf.exists(_.contains("list_id")) && rerankPf.exists(_.contains("list_id")),
        s"both scans must carry the probe partition filter ($adcPf / $rerankPf)")
      val got = df.collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      assert(got === brute,
        "nprobe = nlist with rerankK >= corpus must be EXACT vs brute force")
      // idempotence: run the same SQL again (fresh plan through the same
      // fixed-point batch) — still two scans, same rows
      val again = spark.sql(sql)
      assert(pqScansOf(again)._1.isDefined)
      assert(again.collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq === brute)
      // PQ composes under an INNER metadata join and stays exact at full
      // coverage (partial metadata: the join genuinely drops candidates)
      val jdf = spark.sql(joinSql)
      assert(pqScansOf(jdf)._1.isDefined,
        "the PQ pipeline must fire under the metadata join")
      assert(jdf.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
        === bruteJoin, "PQ-under-join must be exact at full coverage")
      // a deterministic WHERE composes exactly too (the replicated
      // candidate-side predicate keeps the pool a superset of the
      // filtered top-k at full coverage)
      val filtSql =
        s"""SELECT id, l2_distance(vec, $qvecSql) AS dist
           |FROM sqlann_pq WHERE id % 2 = 0 ORDER BY dist, id LIMIT $K""".stripMargin
      SqlAnn.unregisterIndex(spark, pqDir)
      val bruteFilt = spark.sql(filtSql).collect()
        .map(r => (r.getLong(0), r.getDouble(1))).toSeq
      registerPq(nprobe = NList, rerankK = 400)
      val fdf = spark.sql(filtSql)
      assert(pqScansOf(fdf)._1.isDefined, "filtered PQ must fire")
      assert(fdf.collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq === bruteFilt,
        "filtered PQ top-k must be exact at full coverage")
    } finally SqlAnn.unregisterIndex(spark, pqDir)
  }

  test("PQ top-k at nprobe < nlist prunes both scans; small rerankK still returns k rows") {
    pqIndex
    graft.GraftExtensions.register(spark)
    spark.read.parquet(pqDir).createOrReplaceTempView("sqlann_pq")
    val sql = annSql("sqlann_pq")
    registerPq(nprobe = 2, rerankK = 400)
    try {
      val df = spark.sql(sql)
      val (adc, rerank, _, _) = pqScansOf(df)
      assert(adc.isDefined && rerank.isDefined, "the PQ pipeline must fire")
      Seq(adc.get, rerank.get).foreach { s =>
        // static filters only: the rerank side also carries the dynamic
        // candidate-list prune, which listFiles cannot evaluate
        val static = s.partitionFilters.filter(_.find(
          _.isInstanceOf[org.apache.spark.sql.catalyst.expressions.DynamicPruning])
          .isEmpty)
        val read = s.relation.location.listFiles(static, Nil).size
        assert(read > 0 && read <= 2,
          s"nprobe=2 must prune to at most 2 of $NList partitions, read $read")
      }
      assert(df.collect().length === K)
      // candidate pool floor: candK = max(rerankK, k) — a rerankK below k
      // must not truncate the result
      SqlAnn.unregisterIndex(spark, pqDir)
      registerPq(nprobe = NList, rerankK = 1)
      val tiny = spark.sql(sql)
      assert(pqScansOf(tiny)._1.isDefined, "the PQ pipeline must fire at rerankK=1")
      assert(tiny.collect().length === K, s"rerankK=1 must still return $K rows")
    } finally SqlAnn.unregisterIndex(spark, pqDir)
  }

  test("PQ rerank scan is DYNAMICALLY pruned to the candidates' lists (reads fewer than nprobe)") {
    pqIndex
    graft.GraftExtensions.register(spark)
    spark.read.parquet(pqDir).createOrReplaceTempView("sqlann_pq")
    // full probe width but a SMALL candidate pool around one cluster
    // corner: the ADC top-candK concentrate in a couple of lists, so the
    // rerank scan must read fewer partitions than the 8 the static probe
    // filter admits — the bytes argument that makes the codes scan a net
    // win (without the DPP, rerank re-reads (id, vec) of EVERY probed
    // list and the pipeline saves nothing over the flat path)
    registerPq(nprobe = NList, rerankK = 10)
    try {
      val df = spark.sql(
        s"""SELECT id, l2_distance(vec, ${litOf(corner(0))}) AS dist
           |FROM sqlann_pq ORDER BY dist, id LIMIT $K""".stripMargin)
      assert(df.collect().length === K)
      val (adc, rerank, _, rerankPf) = pqScansOf(df)
      assert(adc.isDefined && rerank.isDefined, "the PQ pipeline must fire")
      assert(rerankPf.exists(_.contains("dynamicpruning")),
        s"the rerank scan must carry the candidate-list DPP, got: $rerankPf")
      val adcParts = adc.get.metrics.get("numPartitions").map(_.value).getOrElse(-1L)
      val rerankParts = rerank.get.metrics.get("numPartitions").map(_.value).getOrElse(-1L)
      assert(adcParts === NList.toLong,
        s"nprobe = nlist: the candidate scan reads all $NList lists, read $adcParts")
      assert(rerankParts > 0 && rerankParts < NList,
        s"the rerank scan must read only the candidates' lists (< $NList), read $rerankParts")
    } finally SqlAnn.unregisterIndex(spark, pqDir)
  }

  test("PQ top-k under IP, and under cosine with the cosineCodes attestation: exact at full coverage") {
    pqIndex
    graft.GraftExtensions.register(spark)
    spark.read.parquet(pqDir).createOrReplaceTempView("sqlann_pq")
    // IP over the raw-coded table (the metric-generic ADC tables; the
    // kept exact rerank makes full coverage exact regardless)
    val ipSql =
      s"""SELECT id, ip_distance(vec, $qvecSql) AS dist
         |FROM sqlann_pq ORDER BY dist, id LIMIT $K""".stripMargin
    val ipBrute = spark.sql(ipSql).collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    registerPq(nprobe = NList, rerankK = 400)
    try {
      val ip = spark.sql(ipSql)
      assert(pqScansOf(ip)._1.isDefined, "IP must take the ADC path")
      assert(ip.collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq === ipBrute,
        "IP PQ top-k must be exact at full coverage")
    } finally SqlAnn.unregisterIndex(spark, pqDir)
    // cosine needs the attestation that codes were encoded from
    // NORMALIZED vectors — IvfPqIndex.build(metric = Cosine)'s layout
    val rnd = new scala.util.Random(17)
    val rows = (0L until 200L).map { i =>
      val c = corner((i % 8).toInt)
      (i, graft.functions.VectorKernels.normalize(
        c.map(x => x + rnd.nextFloat() * 0.2f - 0.1f)))
    }
    val cosIdx = graft.index.IvfPqIndex.build(
      spark, vectorsDF(rows), NList, m = 4, metric = Metric.Cosine)
    val cosPqDir = java.nio.file.Files
      .createTempDirectory("graft-sqlann-pqcos").toFile.getAbsolutePath
    cosIdx.codes.join(cosIdx.rawVectors, "id")
      .select(col("id"), col("vec"), col("codes"), col("list_id"))
      .write.partitionBy("list_id").mode("overwrite").parquet(cosPqDir)
    spark.read.parquet(cosPqDir).createOrReplaceTempView("sqlann_pqcos")
    val cosSql =
      s"""SELECT id, cosine_distance(vec, ${litOf(ncorner(0))}) AS dist
         |FROM sqlann_pqcos ORDER BY dist, id LIMIT $K""".stripMargin
    val cosBrute = spark.sql(cosSql).collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    SqlAnn.registerIndex(spark, cosPqDir, cosIdx.centroids.value, nprobe = NList,
      centroidsBc = Some(cosIdx.centroids),
      pq = Some(new SqlAnn.PqInfo(cosIdx.codebooks, rerankK = 400, cosineCodes = true)))
    try {
      val cos = spark.sql(cosSql)
      assert(pqScansOf(cos)._1.isDefined,
        "attested-cosine must take the ADC path")
      assert(cos.collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq === cosBrute,
        "cosine PQ top-k must be exact at full coverage")
    } finally SqlAnn.unregisterIndex(spark, cosPqDir)
  }

  test("PQ join guard: a join keyed on a non-det view column blocks the PQ pipeline too") {
    pqIndex
    graft.GraftExtensions.register(spark)
    // the non-det guard sits in front of BOTH prune flavors in pruned()'s
    // join case — this pins the PQ branch specifically (the flat branch
    // has its own pin), so a refactor that reorders the orElse or moves
    // the guard into prunedParts alone cannot silently re-open it
    spark.read.parquet(pqDir)
      .withColumn("rid", monotonically_increasing_id())
      .createOrReplaceTempView("sqlann_pq_ndv")
    spark.range(200).select(col("id").as("mid"))
      .createOrReplaceTempView("sqlann_pq_ndd")
    registerPq(nprobe = NList, rerankK = 400)
    try {
      val guarded = spark.sql(
        s"""SELECT d.mid, l2_distance(t.vec, $qvecSql) AS dist
           |FROM sqlann_pq_ndv t JOIN sqlann_pq_ndd d ON t.rid = d.mid
           |ORDER BY dist, d.mid LIMIT $K""".stripMargin)
      assert(pqScansOf(guarded)._1.isEmpty &&
        !partitionFilterText(guarded).contains("list_id"),
        "PQ must not restructure a join keyed on the non-det view column")
      // control: the same view joined on the deterministic id takes the
      // PQ pipeline through the view
      val control = spark.sql(
        s"""SELECT d.mid, l2_distance(t.vec, $qvecSql) AS dist
           |FROM sqlann_pq_ndv t JOIN sqlann_pq_ndd d ON t.id = d.mid
           |ORDER BY dist, d.mid LIMIT $K""".stripMargin)
      assert(pqScansOf(control)._1.isDefined,
        "a deterministic join key must still allow the PQ pipeline through the view")
    } finally SqlAnn.unregisterIndex(spark, pqDir)
  }

  test("PQ robustness: NULL and malformed codes rank last (no flood, no crash), exact at full coverage") {
    pqIndex
    graft.GraftExtensions.register(spark)
    // rows 0-4: codes NULLed (appended-after-encoding shape); rows 5-9:
    // WRONG-LENGTH codes (foreign/corrupt). BOTH flavors of unscorable
    // codes get the same semantics: ranked after every scorable row
    // (NULLS LAST for null adc; MaxValue for malformed — never an
    // executor ArrayIndexOutOfBounds, never nulls-first flooding the
    // pool), and at full coverage the exact rerank scores them by TRUE
    // distance — the pipeline stays exact over ALL rows.
    val mixDir = java.nio.file.Files
      .createTempDirectory("graft-sqlann-pqmix").toFile.getAbsolutePath
    spark.read.parquet(pqDir)
      .withColumn("codes",
        when(col("id") < 5, lit(null).cast("array<tinyint>"))
          .when(col("id") < 10,
            array(lit(1.toByte))) // length 1 != m — malformed
          .otherwise(col("codes")))
      .write.partitionBy("list_id").mode("overwrite").parquet(mixDir)
    spark.read.parquet(mixDir).createOrReplaceTempView("sqlann_pqmix")
    // expected: brute top-k over ALL rows — unscorable codes only demote
    // candidate rank, and candK >= corpus reaches them all
    val brute = spark.sql(annSql("sqlann_pqmix"))
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    SqlAnn.registerIndex(spark, mixDir, pqIndex.centroids.value, nprobe = NList,
      centroidsBc = Some(pqIndex.centroids),
      pq = Some(new SqlAnn.PqInfo(pqIndex.codebooks, rerankK = 400)))
    try {
      val df = spark.sql(annSql("sqlann_pqmix"))
      assert(pqScansOf(df)._1.isDefined, "the PQ pipeline must fire")
      val got = df.collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      assert(got === brute,
        "unscorable-coded rows rank last but stay reachable — exact at full coverage")
      // and a SMALL pool demonstrates the demotion: with candK = k the
      // unscorable rows cannot displace scorable candidates
      SqlAnn.unregisterIndex(spark, mixDir)
      SqlAnn.registerIndex(spark, mixDir, pqIndex.centroids.value, nprobe = NList,
        centroidsBc = Some(pqIndex.centroids),
        pq = Some(new SqlAnn.PqInfo(pqIndex.codebooks, rerankK = 1)))
      val tiny = spark.sql(annSql("sqlann_pqmix")).collect()
      assert(tiny.length === K, "a tiny pool still returns k rows")
      assert(tiny.forall(_.getLong(0) >= 10L),
        "at candK = k the unscorable rows must not occupy the pool")
    } finally SqlAnn.unregisterIndex(spark, mixDir)
  }

  test("PQ composition: preserved outer-join side and computed-column views take the pipeline") {
    pqIndex
    graft.GraftExtensions.register(spark)
    spark.read.parquet(pqDir).createOrReplaceTempView("sqlann_pq")
    spark.range(200).filter(col("id") % 3 === 0).select(col("id").as("mid"))
      .createOrReplaceTempView("sqlann_pq_odims")
    val ojSql =
      s"""SELECT t.id, d.mid, l2_distance(t.vec, $qvecSql) AS dist
         |FROM sqlann_pq t LEFT JOIN sqlann_pq_odims d ON t.id = d.mid
         |ORDER BY dist, t.id LIMIT $K""".stripMargin
    val ojBrute = spark.sql(ojSql).collect().map(r => (r.getLong(0),
      if (r.isNullAt(1)) None else Some(r.getLong(1)), r.getDouble(2))).toSeq
    // computed-column view over the PQ table: the chain rebuild carries
    // the prune through; deterministic columns stay exact at full
    // coverage (the non-det rid has no cross-plan value contract)
    spark.read.parquet(pqDir).withColumn("rid", monotonically_increasing_id())
      .createOrReplaceTempView("sqlann_pq_view")
    val vSql =
      s"""SELECT id, l2_distance(vec, $qvecSql) AS dist, rid
         |FROM sqlann_pq_view ORDER BY dist, id LIMIT $K""".stripMargin
    val vBrute = spark.sql(vSql).collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    registerPq(nprobe = NList, rerankK = 400)
    try {
      val oj = spark.sql(ojSql)
      assert(pqScansOf(oj)._1.isDefined,
        "the PQ pipeline must fire on the preserved side of a LEFT join")
      assert(oj.collect().map(r => (r.getLong(0),
        if (r.isNullAt(1)) None else Some(r.getLong(1)), r.getDouble(2))).toSeq === ojBrute,
        "PQ under a LEFT join must be exact at full coverage")
      val v = spark.sql(vSql)
      assert(pqScansOf(v)._1.isDefined,
        "the PQ pipeline must fire through a computed-column view")
      assert(v.collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq === vBrute,
        "PQ through a view must be exact at full coverage (deterministic columns)")
    } finally SqlAnn.unregisterIndex(spark, pqDir)
  }

  test("PQ composition: filtered shapes ride the pipeline; non-det filters and unattested cosine fall back") {
    pqIndex
    graft.GraftExtensions.register(spark)
    spark.read.parquet(pqDir).createOrReplaceTempView("sqlann_pq")
    registerPq(nprobe = 2, rerankK = 400)
    try {
      // a DETERMINISTIC user WHERE rides the pipeline: the predicate is
      // replicated into the ADC candidate stage (candidates = top-candK
      // of the rows that qualify) and kept on the rerank side
      val filtered = spark.sql(
        s"""SELECT id, l2_distance(vec, $qvecSql) AS dist
           |FROM sqlann_pq WHERE id % 2 = 0 ORDER BY dist, id LIMIT $K""".stripMargin)
      val (fAdc, _, _, _) = pqScansOf(filtered)
      assert(fAdc.isDefined, "a deterministic filtered shape must take the ADC path")
      val fRows = filtered.collect()
      assert(fRows.nonEmpty && fRows.forall(_.getLong(0) % 2 == 0))
      // a NON-DETERMINISTIC filter falls back (a replicated re-draw
      // would make the candidate and rerank stages disagree); the flat
      // probe prune still fires
      val nondet = spark.sql(
        s"""SELECT id, l2_distance(vec, $qvecSql) AS dist
           |FROM sqlann_pq WHERE rand() < 0.999 ORDER BY dist, id LIMIT $K""".stripMargin)
      assert(pqScansOf(nondet)._1.isEmpty,
        "a non-deterministic filter must fall back to the flat prune")
      assert(partitionFilterText(nondet).contains("list_id"),
        "the flat probe prune must still fire under the non-det filter")
      // cosine sort over a PQ registration: codes lack the normalized-
      // vector attestation — flat prune only
      val cosine = spark.sql(
        s"""SELECT id, cosine_distance(vec, $qvecSql) AS dist
           |FROM sqlann_pq ORDER BY dist, id LIMIT $K""".stripMargin)
      assert(pqScansOf(cosine)._1.isEmpty, "cosine must not take the ADC path")
      assert(partitionFilterText(cosine).contains("list_id"))
      // metadata join above the PQ table: the two-scan pipeline COMPOSES
      // under the join (the registered side is replaced by ADC+rerank,
      // the decoration join rides on top) — exactness pinned in the
      // full-coverage test
      spark.range(200).select(col("id").as("mid"), (col("id") % 3).as("tag"))
        .createOrReplaceTempView("sqlann_pq_dims")
      val joined = spark.sql(
        s"""SELECT t.id, d.tag, l2_distance(t.vec, $qvecSql) AS dist
           |FROM sqlann_pq t JOIN sqlann_pq_dims d ON t.id = d.mid
           |ORDER BY dist, t.id LIMIT $K""".stripMargin)
      assert(pqScansOf(joined)._1.isDefined,
        "the PQ pipeline must compose under a metadata join")
      assert(joined.collect().nonEmpty)
    } finally SqlAnn.unregisterIndex(spark, pqDir)
  }

  test("inner-product range/join prune via the Cauchy-Schwarz ball bound; no radii -> untouched") {
    // IP is not a metric (no triangle inequality), so there is no
    // covering ball in IP "space" — but every list member lies in the L2
    // ball (c_l, R_l), and Cauchy-Schwarz bounds the dot over it:
    // a list can hold `v·q >= -r` only if `c_l·q + R_l·||q|| >= -r`.
    // EXACT (the bound is the true max over the ball), no attestation
    // needed — round 16, beyond anything the reference expresses.
    rangeIndex
    graft.GraftExtensions.register(spark)
    spark.read.parquet(rangeDir).createOrReplaceTempView("sqlann_ip")
    // one zero query row: dot == 0, bound keeps a list iff r >= 0 — with
    // r = -100 the row matches nothing and prunes everything, exactly
    localQView("sqlann_ip_q",
      Seq(900L -> corner(0), 901L -> corner(3), 902L -> Array.fill(Dim)(0f)))
    // ip_distance(v, corner(0)) ~ -128 within corner-0's family; -100
    // keeps only the high-dot families, so the bound genuinely prunes
    val rSql =
      s"""SELECT id, ip_distance(vec, ${litOf(corner(0))}) AS dist
         |FROM sqlann_ip
         |WHERE ip_distance(vec, ${litOf(corner(0))}) <= -100.0 ORDER BY id""".stripMargin
    val jSql =
      s"""SELECT q.qid, t.id, ip_distance(t.vec, q.qvec) AS dist
         |FROM sqlann_ip_q q, sqlann_ip t
         |WHERE ip_distance(t.vec, q.qvec) <= -100.0 ORDER BY qid, id""".stripMargin
    val bruteR = spark.sql(rSql).collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val bruteJ = rows3(spark.sql(jSql))
    def hasIpGenerate(df: DataFrame): Boolean =
      df.queryExecution.optimizedPlan.exists {
        case g: org.apache.spark.sql.catalyst.plans.logical.Generate =>
          g.generator.children.head.isInstanceOf[graft.functions.IpRangeProbeLists]
        case _ => false
      }
    // WITHOUT radii: both shapes stay untouched (the prune needs the
    // covering radii like every range rewrite)
    SqlAnn.registerIndex(spark, rangeDir, rangeIndex.centroids.value, nprobe = 2)
    assert(!partitionFilterText(spark.sql(rSql)).contains("list_id"),
      "no radii -> IP range untouched")
    assert(!hasIpGenerate(spark.sql(jSql)), "no radii -> IP join untouched")
    SqlAnn.unregisterIndex(spark, rangeDir)
    SqlAnn.registerIndex(spark, rangeDir, rangeIndex.centroids.value,
      nprobe = 2, radii = Some(rangeIndex.listRadii))
    try {
      // single-table: the driver-side ball bound prunes the scan, exact
      val r = spark.sql(rSql)
      val pf = partitionFilterText(r)
      assert(pf.contains("list_id") || pf.contains("false"),
        s"IP range must prune via the ball bound, got: $pf")
      val inSizes = scanOf(r).partitionFilters.flatMap(_.collect {
        case i: org.apache.spark.sql.catalyst.expressions.In => i.list.size
      })
      assert(inSizes.headOption.exists(_ < NList),
        s"the -100 bound must genuinely prune (< $NList lists), got $inSizes")
      assert(r.collect().map(x => (x.getLong(0), x.getDouble(1))).toSeq === bruteR,
        "IP range must stay EXACT under the prune")
      assert(bruteR.nonEmpty, "fixture sanity: the IP bound matches rows")
      // similarity join: per-row runtime bound, exact incl. the zero row
      val j = spark.sql(jSql)
      assert(hasIpGenerate(j), "the IP range-join probe explode must be injected")
      assert(rows3(j) === bruteJ, "IP similarity join must stay EXACT")
      // the TOP-K shape was always metric-agnostic: still fires and
      // equals the facade at the same nprobe
      val tk = spark.sql(
        s"""SELECT id, ip_distance(vec, ${litOf(corner(0))}) AS dist
           |FROM sqlann_ip ORDER BY dist, id LIMIT $K""".stripMargin)
      assert(partitionFilterText(tk).contains("list_id"),
        "IP top-k must probe-prune like the other metrics")
      val facade = rangeIndex.search(
        queriesDF(Seq(0L -> corner(0))),
        SearchParams(k = K, nprobe = 2, metric = Some(Metric.InnerProduct)))
        .orderBy("rank").collect().map(r => (r.getLong(1), r.getDouble(2)))
      val got = tk.collect().map(r => (r.getLong(0), r.getDouble(1)))
      assert(got.toSeq === facade.toSeq, "IP top-k == facade at the same nprobe")
    } finally SqlAnn.unregisterIndex(spark, rangeDir)
  }

  test("verifyUnitNorm: one-pass attestation check (unit table true, raw table false, NaN/null poison fails)") {
    cosIndex; rangeIndex
    assert(SqlAnn.verifyUnitNorm(spark, cosDir),
      "the normalized fixture must pass the attestation check")
    assert(!SqlAnn.verifyUnitNorm(spark, rangeDir),
      "the raw corner fixture (norms ~11) must fail")
    // a poisoned vector (NaN component) must FAIL, never evade: NaN
    // norms poison the bridge bound like they poison covering radii
    val poisonDir = java.nio.file.Files
      .createTempDirectory("graft-sqlann-poison").toFile.getAbsolutePath
    val rows = (0L until 20L).map(i =>
      (i, graft.functions.VectorKernels.normalize(corner((i % 8).toInt)))) :+
      (99L, { val v = ncorner(0); v(0) = Float.NaN; v })
    vectorsDF(rows).withColumn("list_id", lit(0))
      .write.partitionBy("list_id").mode("overwrite").parquet(poisonDir)
    assert(!SqlAnn.verifyUnitNorm(spark, poisonDir),
      "a NaN component must fail the attestation check")
  }

  test("facade end-to-end: registerSql(unitNorm = true) unlocks the cosine join on the served view") {
    import graft.IndexConfig
    val db = new graft.api.VectorDB(spark,
      java.nio.file.Files.createTempDirectory("graft-sqlann-cos-db").toString)
    db.createIndex(IndexConfig("cosidx", Dim, nlist = 4))
    // the facade stores what it is given: the caller normalizes upfront
    // (the attestation is the caller's statement about ITS OWN data)
    val rnd = new scala.util.Random(23)
    val rows = (0L until 160L).map { i =>
      val c = corner((i % 8).toInt)
      (i, graft.functions.VectorKernels.normalize(
        c.map(x => x + rnd.nextFloat() * 0.2f - 0.1f)))
    }
    val ep = db.buildEpoch("cosidx", vectorsDF(rows))
    db.activateEpoch("cosidx", ep)
    db.loadIndex("cosidx")
    db.registerSql("cosidx", nprobe = 4, computeRangeRadii = true, unitNorm = true)
    try {
      localQView("cosidx_q", Seq(500L -> ncorner(0), 501L -> ncorner(3)))
      val sql =
        s"""SELECT q.qid, t.id, cosine_distance(t.vec, q.qvec) AS dist
           |FROM cosidx_q q, cosidx t
           |WHERE cosine_distance(t.vec, q.qvec) <= 0.1 ORDER BY qid, id""".stripMargin
      val df = spark.sql(sql)
      assert(hasCosineGenerate(df),
        "registerSql's attestation must unlock the cosine bridge")
      // exact vs the facade's own exact cosine range twin: brute force
      // over the same served vectors
      val served = spark.table("cosidx")
      val brute = graft.index.Knn.range(
        queriesDF(Seq(500L -> ncorner(0), 501L -> ncorner(3))),
        served.select(col("id"), col("vec")), 0.1, graft.Metric.Cosine)
        .orderBy("qid", "id")
      assert(rows3(df) === rows3(brute.select(col("qid"), col("id"), col("dist"))))
      // the verified flavor passes on this genuinely-normalized epoch
      db.registerSql("cosidx", nprobe = 4, computeRangeRadii = true,
        unitNorm = true, verifyUnitNorm = true)
      assert(hasCosineGenerate(spark.sql(sql)))
    } finally db.close()
  }

  test("registerSql(verifyUnitNorm = true) rejects a false attestation on raw vectors") {
    import graft.IndexConfig
    val db = new graft.api.VectorDB(spark,
      java.nio.file.Files.createTempDirectory("graft-sqlann-badattest").toString)
    db.createIndex(IndexConfig("rawidx", Dim, nlist = 4))
    val ep = db.buildEpoch("rawidx", vectorsDF(randomVectors(80, Dim)))
    db.activateEpoch("rawidx", ep)
    db.loadIndex("rawidx")
    try {
      intercept[graft.InvalidArgumentException] {
        db.registerSql("rawidx", nprobe = 4, unitNorm = true, verifyUnitNorm = true)
      }
      // verifyUnitNorm WITHOUT unitNorm used to be a silent no-op (neither
      // check nor registration) — a caller asking only for verification
      // must get a loud error, not a belief their corpus was validated
      // (round 16, r15 verdict #1)
      intercept[graft.InvalidArgumentException] {
        db.registerSql("rawidx", nprobe = 4, verifyUnitNorm = true)
      }
      // the unverified attestation is the caller's own risk and still
      // registers (documented contract)
      db.registerSql("rawidx", nprobe = 4, unitNorm = true)
    } finally db.close()
  }

  // ---- round 15: range rewrite through a computed-column view ------------

  test("range rewrite fires through a view whose Project blocks predicate pushdown") {
    rangeIndex
    // monotonically_increasing_id is non-deterministic: the main optimizer
    // cannot push ANY predicate below this Project, so the distance bound
    // is stuck ABOVE it — the rewrite must reach through and inject the
    // list_id prune directly over the relation
    spark.read.parquet(rangeDir)
      .withColumn("rid", monotonically_increasing_id())
      .createOrReplaceTempView("sqlann_pview")
    SqlAnn.registerIndex(spark, rangeDir, rangeIndex.centroids.value,
      nprobe = 2, radii = Some(rangeIndex.listRadii))
    try {
      val df = spark.sql(
        s"""SELECT id, l2_distance(vec, ${litOf(corner(0))}) AS dist, rid
           |FROM sqlann_pview
           |WHERE l2_distance(vec, ${litOf(corner(0))}) <= 2.0 ORDER BY id""".stripMargin)
      // shape sanity: the filter really is stuck above the Project (no
      // pushdown happened) — otherwise this test pins nothing
      val stuck = df.queryExecution.optimizedPlan.exists {
        case org.apache.spark.sql.catalyst.plans.logical.Filter(_,
            _: org.apache.spark.sql.catalyst.plans.logical.Project) => true
        case _ => false
      }
      assert(stuck, "fixture must keep the user filter above the view's Project")
      assert(partitionFilterText(df).contains("list_id"),
        "the covering-ball prune must reach the scan through the Project")
      val inSizes = scanOf(df).partitionFilters.flatMap(_.collect {
        case i: org.apache.spark.sql.catalyst.expressions.In => i.list.size
      })
      assert(inSizes.nonEmpty && inSizes.head < NList,
        s"the tight ball must prune (< $NList), got $inSizes")
      // deterministic columns stay EXACT vs brute force
      val got = df.collect().map(r => (r.getLong(0), r.getDouble(1)))
      val exact = graft.index.Knn.range(
        queriesDF(Seq(0L -> corner(0))),
        rangeIndex.vectors.select(col("id"), col("vec")), 2.0)
        .orderBy("id").collect().map(r => (r.getLong(1), r.getDouble(2)))
      assert(got.nonEmpty && got.toSeq === exact.toSeq)
      // idempotence through the new shape: exactly one injected In
      val ins = df.queryExecution.optimizedPlan.collect {
        case f: org.apache.spark.sql.catalyst.plans.logical.Filter =>
          f.condition.collect {
            case i: org.apache.spark.sql.catalyst.expressions.In => i
          }.size
      }.sum
      assert(ins === 1, s"exactly one In through the fixed-point batch, got $ins")
    } finally SqlAnn.unregisterIndex(spark, rangeDir)
  }

  test("STACKED non-collapsible view Projects: range and top-k prunes reach through both levels") {
    rangeIndex
    graft.GraftExtensions.register(spark)
    // two view levels, each with a non-deterministic computed column; the
    // outer references the inner's rid1 TWICE so CollapseProject cannot
    // inline it — the shape round 15's one-level resolveThrough lost
    spark.read.parquet(rangeDir)
      .withColumn("rid1", monotonically_increasing_id())
      .createOrReplaceTempView("sqlann_stk1")
    spark.sql(
      """SELECT id, vec, list_id, rid1, rid1 % 8 AS bucket1,
        |  monotonically_increasing_id() AS rid2
        |FROM sqlann_stk1""".stripMargin).createOrReplaceTempView("sqlann_stk2")
    SqlAnn.registerIndex(spark, rangeDir, rangeIndex.centroids.value,
      nprobe = 2, radii = Some(rangeIndex.listRadii))
    try {
      val df = spark.sql(
        s"""SELECT id, l2_distance(vec, ${litOf(corner(0))}) AS dist, rid1, rid2
           |FROM sqlann_stk2
           |WHERE l2_distance(vec, ${litOf(corner(0))}) <= 2.0 ORDER BY id""".stripMargin)
      // shape sanity: the two Projects really are stacked (not collapsed)
      // with the user filter stuck above both — otherwise this pins nothing
      val stacked = df.queryExecution.optimizedPlan.exists {
        case org.apache.spark.sql.catalyst.plans.logical.Filter(_,
            org.apache.spark.sql.catalyst.plans.logical.Project(_,
              _: org.apache.spark.sql.catalyst.plans.logical.Project)) => true
        case _ => false
      }
      assert(stacked, "fixture must keep TWO stacked Projects under the filter")
      assert(partitionFilterText(df).contains("list_id"),
        "the covering-ball prune must reach the scan through BOTH Projects")
      val got = df.collect().map(r => (r.getLong(0), r.getDouble(1)))
      val exact = graft.index.Knn.range(
        queriesDF(Seq(0L -> corner(0))),
        rangeIndex.vectors.select(col("id"), col("vec")), 2.0)
        .orderBy("id").collect().map(r => (r.getLong(1), r.getDouble(2)))
      assert(got.nonEmpty && got.toSeq === exact.toSeq,
        "deterministic columns stay exact through the stacked prune")
      // the top-k twin through the same stacked view
      val tk = spark.sql(
        s"""SELECT id, l2_distance(vec, ${litOf(corner(0))}) AS dist, rid2
           |FROM sqlann_stk2 ORDER BY dist, id LIMIT $K""".stripMargin)
      assert(partitionFilterText(tk).contains("list_id"),
        "the top-k probe prune must also reach through both Projects")
      assert(tk.collect().length === K)
    } finally SqlAnn.unregisterIndex(spark, rangeDir)
  }

  test("range rewrite skips injection when another conjunct predicates on a non-deterministic view column") {
    rangeIndex
    graft.GraftExtensions.register(spark)
    spark.read.parquet(rangeDir)
      .withColumn("rid", monotonically_increasing_id())
      .createOrReplaceTempView("sqlann_ndguard")
    SqlAnn.registerIndex(spark, rangeDir, rangeIndex.centroids.value,
      nprobe = 2, radii = Some(rangeIndex.listRadii))
    try {
      // a conjunct over the non-deterministic rid: injecting the list
      // prune below the Project would shift surviving rows' rid values
      // and could change WHICH rows pass `rid % 2 = 0` — the rewrite must
      // stay out (r15 advice; Spark's own pushdown refuses this case)
      val guarded = spark.sql(
        s"""SELECT id, l2_distance(vec, ${litOf(corner(0))}) AS dist, rid
           |FROM sqlann_ndguard
           |WHERE l2_distance(vec, ${litOf(corner(0))}) <= 2.0 AND rid % 2 = 0
           |ORDER BY id""".stripMargin)
      assert(!partitionFilterText(guarded).contains("list_id"),
        "a filter predicating on the non-deterministic column must not be pruned")
      // control: a conjunct over a DETERMINISTIC relation column composes
      // fine — only non-deterministic references trigger the guard
      val control = spark.sql(
        s"""SELECT id, l2_distance(vec, ${litOf(corner(0))}) AS dist, rid
           |FROM sqlann_ndguard
           |WHERE l2_distance(vec, ${litOf(corner(0))}) <= 2.0 AND id % 2 = 0
           |ORDER BY id""".stripMargin)
      assert(partitionFilterText(control).contains("list_id"),
        "a deterministic extra conjunct must still allow the prune")
    } finally SqlAnn.unregisterIndex(spark, rangeDir)
  }

  test("range join skips injection when the join predicates on a non-deterministic view column") {
    rangeIndex
    graft.GraftExtensions.register(spark)
    spark.read.parquet(rangeDir)
      .withColumn("rid", monotonically_increasing_id())
      .createOrReplaceTempView("sqlann_ndj")
    localQView("sqlann_ndj_q", Seq(0L -> corner(0), 1L -> corner(3)))
    SqlAnn.registerIndex(spark, rangeDir, rangeIndex.centroids.value,
      nprobe = 2, radii = Some(rangeIndex.listRadii))
    def hasRangeGenerate(df: DataFrame): Boolean =
      df.queryExecution.optimizedPlan.exists {
        case g: org.apache.spark.sql.catalyst.plans.logical.Generate =>
          g.generator.children.head
            .isInstanceOf[graft.functions.RangeProbeLists]
        case _ => false
      }
    try {
      // a cross-relation join key over the non-det rid cannot be pushed
      // out of the condition — injecting the probe filter below the view
      // Project would shift rid values and change which rows match qid
      val guarded = spark.sql(
        s"""SELECT q.qid, t.id FROM sqlann_ndj_q q JOIN sqlann_ndj t
           |ON l2_distance(t.vec, q.qvec) <= 2.0 AND q.qid = t.rid
           |ORDER BY qid, id""".stripMargin)
      assert(!hasRangeGenerate(guarded),
        "a join keyed on the non-det view column must stay unrewritten")
      // control: the same shape keyed on the deterministic id fires
      // through the view
      val control = spark.sql(
        s"""SELECT q.qid, t.id FROM sqlann_ndj_q q JOIN sqlann_ndj t
           |ON l2_distance(t.vec, q.qvec) <= 2.0 AND q.qid = t.id
           |ORDER BY qid, id""".stripMargin)
      assert(hasRangeGenerate(control),
        "a deterministic join key must still allow the range-join rewrite")
      // the TOP-K join prune honors the same guard: removing rows below
      // the view would shift rid and match DIFFERENT metadata rows —
      // changed join VALUES, not just dropped candidates
      def corpusPf(df: DataFrame): String = SqlAnn.fileSourceScans(df)
        .find(_.output.exists(_.name == "list_id"))
        .flatMap(_.metadata.get("PartitionFilters")).getOrElse("")
      val guardedTk = spark.sql(
        s"""SELECT q.qid, t.id, l2_distance(t.vec, ${litOf(corner(0))}) AS dist
           |FROM sqlann_ndj_q q JOIN sqlann_ndj t ON q.qid = t.rid
           |ORDER BY dist, t.id LIMIT $K""".stripMargin)
      assert(!corpusPf(guardedTk).contains("list_id") &&
        !partitionFilterText(guardedTk).contains("list_id"),
        "top-k joined on the non-det view column must stay unpruned")
      val controlTk = spark.sql(
        s"""SELECT q.qid, t.id, l2_distance(t.vec, ${litOf(corner(0))}) AS dist
           |FROM sqlann_ndj_q q JOIN sqlann_ndj t ON q.qid = t.id
           |ORDER BY dist, t.id LIMIT $K""".stripMargin)
      assert(corpusPf(controlTk).contains("list_id"),
        "top-k joined on the deterministic id must still prune")
    } finally SqlAnn.unregisterIndex(spark, rangeDir)
  }

  test("top-k rewrite fires through the same computed-column view") {
    rangeIndex
    spark.read.parquet(rangeDir)
      .withColumn("rid", monotonically_increasing_id())
      .createOrReplaceTempView("sqlann_pview2")
    SqlAnn.registerIndex(spark, rangeDir, rangeIndex.centroids.value, nprobe = 2)
    try {
      val df = spark.sql(
        s"""SELECT id, l2_distance(vec, ${litOf(corner(0))}) AS dist, rid
           |FROM sqlann_pview2 ORDER BY dist, id LIMIT $K""".stripMargin)
      assert(partitionFilterText(df).contains("list_id"),
        "the top-k probe filter must reach the scan through the view")
      // deterministic columns equal the facade at the same nprobe
      val got = df.collect().map(r => (r.getLong(0), r.getDouble(1)))
      val facade = rangeIndex.search(
        queriesDF(Seq(0L -> corner(0))), graft.SearchParams(k = K, nprobe = 2))
        .orderBy("rank").collect().map(r => (r.getLong(1), r.getDouble(2)))
      assert(got.toSeq === facade.toSeq)
    } finally SqlAnn.unregisterIndex(spark, rangeDir)
  }

  // ---- round 15: catalog (metastore) tables -------------------------------

  test("catalog parquet table (USING parquet, recovered partitions): rewrites reach the scan") {
    rangeIndex
    spark.sql("DROP TABLE IF EXISTS sqlann_cat")
    spark.sql(
      s"""CREATE TABLE sqlann_cat (id BIGINT, vec ARRAY<FLOAT>, list_id INT)
         |USING parquet PARTITIONED BY (list_id) LOCATION '$rangeDir'""".stripMargin)
    spark.sql("MSCK REPAIR TABLE sqlann_cat")
    SqlAnn.registerIndex(spark, rangeDir, rangeIndex.centroids.value,
      nprobe = 2, radii = Some(rangeIndex.listRadii))
    try {
      // top-k through the metastore relation
      val tk = spark.sql(
        s"""SELECT id, l2_distance(vec, ${litOf(corner(0))}) AS dist
           |FROM sqlann_cat ORDER BY dist, id LIMIT $K""".stripMargin)
      assert(partitionFilterText(tk).contains("list_id"),
        "the top-k rewrite must fire through a catalog table")
      // range: fires AND stays exact (catalog partition pruning serves
      // the same files the path-based scan reads)
      val rg = spark.sql(
        s"""SELECT id, l2_distance(vec, ${litOf(corner(0))}) AS dist
           |FROM sqlann_cat
           |WHERE l2_distance(vec, ${litOf(corner(0))}) <= 2.0 ORDER BY id""".stripMargin)
      assert(partitionFilterText(rg).contains("list_id"))
      val read = scanOf(rg).relation.location.listFiles(
        scanOf(rg).partitionFilters, Nil).size
      assert(read > 0 && read < NList,
        s"catalog partition pruning must read fewer than $NList partitions, read $read")
      val got = rg.collect().map(r => (r.getLong(0), r.getDouble(1)))
      val exact = graft.index.Knn.range(
        queriesDF(Seq(0L -> corner(0))),
        rangeIndex.vectors.select(col("id"), col("vec")), 2.0)
        .orderBy("id").collect().map(r => (r.getLong(1), r.getDouble(2)))
      assert(got.nonEmpty && got.toSeq === exact.toSeq)
      // batch shape through the catalog table: literal batch -> static In
      localQView("sqlann_catq", Seq(100L -> corner(0), 101L -> corner(3)))
      val bt = spark.sql(batchSql("sqlann_catq", "sqlann_cat"))
      assert(hasProbeGenerate(bt) && partitionFilterText(bt).contains("list_id"),
        "the batch rewrite must fire through a catalog table")
    } finally {
      SqlAnn.unregisterIndex(spark, rangeDir)
      spark.sql("DROP TABLE IF EXISTS sqlann_cat")
      ()
    }
  }

  // ---- round 15: the SQL self-join dedup shape ----------------------------

  test("self-join dedup shape: t x t range join fires, prunes dynamically, EXACT") {
    // the ANN-dedup query an LLM pipeline runs as SQL: every near pair
    // within radius r over ONE table — the naive plan is the full
    // cartesian self-join; the rewrite must turn it into the
    // bucketed-by-intersecting-lists equi-join (the SQL twin of
    // Dedup.embeddingNearDup's blocking)
    rangeIndex
    graft.GraftExtensions.register(spark)
    spark.read.parquet(rangeDir).createOrReplaceTempView("sqlann_sj")
    def sql = // a.id < b.id: each unordered pair once, no self-pairs
      s"""SELECT a.id AS a_id, b.id AS b_id, l2_distance(b.vec, a.vec) AS dist
         |FROM sqlann_sj a, sqlann_sj b
         |WHERE l2_distance(b.vec, a.vec) <= 0.5 AND a.id < b.id
         |ORDER BY a_id, b_id""".stripMargin
    val brute = rows3(spark.sql(sql))
    SqlAnn.registerIndex(spark, rangeDir, rangeIndex.centroids.value,
      nprobe = 2, radii = Some(rangeIndex.listRadii))
    try {
      val df = spark.sql(sql)
      assert(hasRangeGenerate(df), "the range-probe explode must be injected")
      val phys = df.queryExecution.executedPlan.toString
      assert(!phys.contains("CartesianProduct") && !phys.contains("NestedLoop"),
        s"the self-join must plan as an equi-join, got:\n$phys")
      // one side keeps the full scan (it feeds the probes); the OTHER
      // side's scan must carry the dynamic prune on list_id
      val pfs = SqlAnn.fileSourceScans(df)
        .filter(_.output.exists(_.name == "list_id"))
        .map(_.metadata.getOrElse("PartitionFilters", ""))
      assert(pfs.exists(_.contains("dynamicpruning")),
        s"one self-join side must be dynamically pruned, got: $pfs")
      val got = rows3(df)
      assert(got.nonEmpty && got === brute,
        s"self-join dedup must be EXACT (${got.size} vs ${brute.size} rows)")
    } finally SqlAnn.unregisterIndex(spark, rangeDir)
  }

  test("range shapes: BETWEEN composes conjuncts (single-table and join)") {
    rangeIndex
    graft.GraftExtensions.register(spark)
    spark.read.parquet(rangeDir).createOrReplaceTempView("sqlann_btw")
    def sql =
      s"""SELECT id, l2_distance(vec, ${litOf(corner(0))}) AS dist
         |FROM sqlann_btw
         |WHERE l2_distance(vec, ${litOf(corner(0))}) BETWEEN 0.0 AND 2.0
         |ORDER BY id""".stripMargin
    val brute = spark.sql(sql).collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    SqlAnn.registerIndex(spark, rangeDir, rangeIndex.centroids.value,
      nprobe = 2, radii = Some(rangeIndex.listRadii))
    try {
      val df = spark.sql(sql)
      assert(partitionFilterText(df).contains("list_id"),
        "BETWEEN splits into conjuncts; the upper bound must prune")
      val got = df.collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      assert(got.nonEmpty && got === brute)
    } finally SqlAnn.unregisterIndex(spark, rangeDir)
  }

  // ---- round 15: registration-churn hygiene -------------------------------

  test("same-path re-registration evicts the superseded radii broadcast; invalidation clears the pair atomically") {
    rangeIndex
    spark.read.parquet(rangeDir).createOrReplaceTempView("sqlann_churn2")
    val t1 = SqlAnn.registerIndex(spark, rangeDir, rangeIndex.centroids.value,
      nprobe = 2, radii = Some(rangeIndex.listRadii))
    val bc1 = t1.radiiPair.get._2
    val t2 = SqlAnn.registerIndex(spark, rangeDir, rangeIndex.centroids.value,
      nprobe = 2, radii = Some(rangeIndex.listRadii))
    try {
      // the superseded broadcast was unpersist()ed, NOT destroyed: a
      // rewritten plan that still holds it can re-fetch and read it
      assert(bc1.value.length === NList,
        "unpersist must leave the superseded broadcast re-fetchable")
      // the winner still rewrites
      assert(partitionFilterText(spark.sql(rangeSql("sqlann_churn2", "2.0")))
        .contains("list_id"))
      // the single-pair setter: invalidation clears BOTH halves in one
      // volatile write — no fresh-array/stale-broadcast interleaving.
      // The outgoing broadcast is unpersist()ed AS PART of the swap
      // (round 16, r15 advice: updateRadii(None) used to drop the only
      // handle before any eviction could run) — unpersist, not destroy,
      // so it stays re-fetchable for plans that snapshotted it
      val bc2 = t2.radiiPair.get._2
      SqlAnn.invalidateRadii(spark, rangeDir)
      assert(t2.radii.isEmpty && t2.radiiBc.isEmpty && t2.radiiPair.isEmpty)
      assert(bc2.value.length === NList,
        "the invalidated broadcast must stay re-fetchable (unpersist, not destroy)")
      assert(!partitionFilterText(spark.sql(rangeSql("sqlann_churn2", "2.0")))
        .contains("list_id"))
    } finally SqlAnn.unregisterIndex(spark, rangeDir)
  }

  test("deep determinism: rand() nested below an aggregate on the queries side demands broadcast reuse") {
    index
    spark.read.parquet(dir).createOrReplaceTempView("sqlann_deep")
    SqlAnn.registerIndex(spark, dir, index.centroids.value, nprobe = NList)
    val qDir = java.nio.file.Files
      .createTempDirectory("graft-sqlann-deep").toFile.getAbsolutePath
    queriesDF(randomVectors(5, Dim, seed = 9)).write.mode("overwrite").parquet(qDir)
    spark.read.parquet(qDir).createOrReplaceTempView("sqlann_deepq")
    def onlyInBroadcastOf(df: DataFrame): Seq[Boolean] =
      df.queryExecution.optimizedPlan.collect {
        case f: org.apache.spark.sql.catalyst.plans.logical.Filter =>
          f.condition.collect {
            case d: org.apache.spark.sql.catalyst.expressions.DynamicPruningSubquery =>
              d.onlyInBroadcast
          }
      }.flatten
    try {
      // rand() sits under the Aggregate — a top-operator-only expression
      // scan sees only deterministic aggregate expressions and would let
      // the planner RE-EXECUTE this side as a standalone pruning subquery
      // (second rand() draw -> different rows -> partitions the join's
      // actual rows need could be pruned: a false dismissal). NOT an
      // always-true comparison: the optimizer ELIMINATES rand() < c for
      // c >= 1, and a plan with the filter gone really is re-executable.
      val df = spark.sql(
        s"""SELECT qid, id, dist, rank FROM (
           |  SELECT q.qid, t.id, l2_distance(t.vec, q.qvec) AS dist,
           |    CAST(row_number() OVER (PARTITION BY q.qid
           |      ORDER BY l2_distance(t.vec, q.qvec), t.id) AS INT) AS rank
           |  FROM (SELECT qid, first(qvec) AS qvec FROM sqlann_deepq
           |        WHERE rand() < 0.999 GROUP BY qid) q, sqlann_deep t)
           |WHERE rank <= $K ORDER BY qid, rank""".stripMargin)
      assert(hasProbeGenerate(df), "the join prune itself still applies")
      // the nested rand() must survive optimization, or this pins nothing
      assert(df.queryExecution.optimizedPlan.exists(p =>
        p.expressions.exists(!_.deterministic)),
        "fixture must keep a non-deterministic expression below the aggregate")
      val flags = onlyInBroadcastOf(df)
      assert(flags.nonEmpty && flags.forall(_ == true),
        s"nested non-determinism must demand broadcast reuse, got $flags")
      // results stay internally consistent (one snapshot feeds both join
      // and prune): every surviving qid gets its FULL top-k
      val rows = rows4(df)
      assert(rows.groupBy(_._1).values.forall(_.size == K),
        s"each surviving query must keep its full top-$K")
    } finally SqlAnn.unregisterIndex(spark, dir)
  }

  test("batch shape: a user WHERE on the corpus composes; NULL query vectors yield no rows") {
    index
    spark.read.parquet(dir).createOrReplaceTempView("sqlann_v")
    SqlAnn.registerIndex(spark, dir, index.centroids.value, nprobe = NList)
    val qs = randomVectors(2, Dim, seed = 9)
    try {
      localQView("sqlann_bq5", qs)
      val df = spark.sql(
        s"""SELECT qid, id, dist, rank FROM (
           |  SELECT q.qid, t.id, l2_distance(t.vec, q.qvec) AS dist,
           |    CAST(row_number() OVER (PARTITION BY q.qid
           |      ORDER BY l2_distance(t.vec, q.qvec), t.id) AS INT) AS rank
           |  FROM sqlann_bq5 q, sqlann_v t WHERE t.id % 2 = 0)
           |WHERE rank <= $K ORDER BY qid, rank""".stripMargin)
      assert(hasProbeGenerate(df) && partitionFilterText(df).contains("list_id"))
      val exact = graft.index.Knn.exact(queriesDF(qs),
        index.vectors.filter(col("id") % 2 === 0).select(col("id"), col("vec")),
        K, Metric.L2).orderBy("qid", "rank")
      assert(rows4(df) === rows4(exact.select(
        col("qid"), col("id"), col("dist"), col("rank"))))
      // a NULL qvec row produces NO result rows for that qid (facade
      // semantics: null queries yield no rows) — the live query still
      // gets its full top-k
      localQView("sqlann_bq6", Seq(qs.head, 77L -> null))
      val withNull = spark.sql(batchSql("sqlann_bq6", "sqlann_v"))
      assert(hasProbeGenerate(withNull))
      val got = rows4(withNull)
      assert(got.map(_._1).distinct === Seq(qs.head._1), "null-qvec qid must vanish")
      assert(got.size === K)
    } finally SqlAnn.unregisterIndex(spark, dir)
  }

  // ---- round 17: facade PQ registration + the checkable codes attestation

  test("facade PQ round-trip: IndexConfig(m) epoch serves the compressed two-scan SQL pipeline") {
    import graft.IndexConfig
    graft.GraftExtensions.register(spark)
    val db = new graft.api.VectorDB(spark,
      java.nio.file.Files.createTempDirectory("graft-sqlann-pqdb").toString)
    // m = 2 declares the PQ index at CreateIndex (the reference's own API
    // shape); buildEpoch then writes codes + codebooks with the epoch
    db.createIndex(IndexConfig("pqfidx", Dim, nlist = 4, m = 2))
    val ep = db.buildEpoch("pqfidx", vectorsDF(randomVectors(150, Dim)))
    db.activateEpoch("pqfidx", ep)
    db.loadIndex("pqfidx")
    try {
      // registration at full coverage, attestation CHECKED: the honest
      // build must pass its own verification
      val view = db.registerSql("pqfidx", nprobe = 4, pq = true,
        pqRerankK = 1000, verifyCodes = true)
      val df = spark.sql(annSql(view))
      val (adc, rerank, adcPf, rerankPf) = pqScansOf(df)
      assert(adc.isDefined && rerank.isDefined,
        s"the served view must plan the two-scan pipeline; got " +
          s"${SqlAnn.fileSourceScans(df).map(_.output.map(_.name))}")
      assert(adcPf.exists(_.contains("list_id")) && rerankPf.exists(_.contains("list_id")))
      val viaSql = df.collect().map(r => (r.getLong(0), r.getDouble(1)))
      val viaFacade = db.searchExact("pqfidx", queriesDF(Seq(0L -> qvec)), K)
        .orderBy("rank").collect().map(r => (r.getLong(1), r.getDouble(2)))
      assert(viaSql.toSeq === viaFacade.toSeq,
        "full-coverage PQ SQL must equal the facade's exact search")
      // appended rows carry codes encoded under the EPOCH's codebooks
      // (not the null-codes lane) and surface through the refreshed view
      db.addVectors("pqfidx", vectorsDF(Seq(9999L -> qvec)))
      val em = new graft.storage.EpochManager(s"${db.dataPath}/pqfidx/epochs")
      val appended = spark.read.parquet(s"${em.epochPath(ep)}/vectors")
        .filter(col("id") === 9999L).select("codes").collect()
      assert(appended.length == 1 && appended.head.get(0) != null,
        "addVectors to a PQ epoch must append WITH codes")
      val after = spark.sql(annSql(view))
      assert(pqScansOf(after)._1.isDefined)
      val top = after.collect().map(r => (r.getLong(0), r.getDouble(1)))
      assert(top.head === ((9999L, 0.0)),
        s"the appended exact-match row must rank first, got ${top.head}")
      // compaction carries the codebooks; re-registering the compacted
      // epoch keeps the compressed path (and verification still passes)
      db.compactEpoch("pqfidx")
      val view2 = db.registerSql("pqfidx", nprobe = 4, pq = true,
        pqRerankK = 1000, verifyCodes = true)
      assert(pqScansOf(spark.sql(annSql(view2)))._1.isDefined,
        "the compacted epoch must still serve the two-scan pipeline")
    } finally db.close()
  }

  test("registerSql PQ validation: flat epoch, lone verifyCodes, bad rerankK all rejected") {
    import graft.IndexConfig
    val db = new graft.api.VectorDB(spark,
      java.nio.file.Files.createTempDirectory("graft-sqlann-pqval").toString)
    db.createIndex(IndexConfig("flatidx", Dim, nlist = 4)) // m = 0: flat
    val ep = db.buildEpoch("flatidx", vectorsDF(randomVectors(80, Dim)))
    db.activateEpoch("flatidx", ep)
    db.loadIndex("flatidx")
    try {
      // a flat epoch has no codebooks: pq = true must fail loudly, not
      // silently register the uncompressed path as if it were compressed
      intercept[graft.InvalidArgumentException](
        db.registerSql("flatidx", pq = true))
      // the lone-flag rule (same as verifyUnitNorm): a verification with
      // nothing to verify reads as "validated" while nothing ran
      intercept[graft.InvalidArgumentException](
        db.registerSql("flatidx", verifyCodes = true))
      intercept[graft.InvalidArgumentException](
        db.registerSql("flatidx", pq = true, pqRerankK = 0))
      // and the SqlAnn-level twin of the lone-flag rule
      intercept[IllegalArgumentException](
        SqlAnn.registerIndex(spark, dir, index.centroids.value, nprobe = 2,
          verifyCodes = true))
    } finally db.close()
  }

  test("registerSql verification taxonomy: sampled verify passes/rejects, failures surface as InvalidArgumentException") {
    import graft.IndexConfig
    graft.GraftExtensions.register(spark)
    val db = new graft.api.VectorDB(spark,
      java.nio.file.Files.createTempDirectory("graft-sqlann-pqsf").toString)
    db.createIndex(IndexConfig("pqsf", Dim, nlist = 4, m = 2))
    val ep = db.buildEpoch("pqsf", vectorsDF(randomVectors(150, Dim, seed = 31)))
    db.activateEpoch("pqsf", ep)
    db.loadIndex("pqsf")
    // an epoch whose id contract is BROKEN (duplicate ids appended): the
    // facade's verified registration must reject it with the facade's
    // OWN error type — r17 advice: SqlAnn's IllegalArgumentException
    // used to escape through registerSql, breaking the documented
    // taxonomy every other validation on the surface follows
    db.createIndex(IndexConfig("pqsfdup", Dim, nlist = 4, m = 2))
    val dupRows = randomVectors(60, Dim, seed = 32)
    val epDup = db.buildEpoch("pqsfdup", vectorsDF(dupRows ++ dupRows.take(3)))
    db.activateEpoch("pqsfdup", epDup)
    db.loadIndex("pqsfdup")
    try {
      // the fraction knob's own validation (facade taxonomy)
      intercept[graft.InvalidArgumentException](
        db.registerSql("pqsf", pq = true, verifyCodes = true,
          verifySampleFraction = 0.0))
      intercept[graft.InvalidArgumentException](
        db.registerSql("pqsf", pq = true, verifyCodes = true,
          verifySampleFraction = 1.5))
      // lone fraction: nothing to sample must fail loudly
      intercept[graft.InvalidArgumentException](
        db.registerSql("pqsf", pq = true, verifySampleFraction = 0.5))
      // honest epoch: the SAMPLED verification registers fine (r17
      // verdict #2 — the 100 TB mode: no full-corpus decode job)
      val view = db.registerSql("pqsf", nprobe = 4, pq = true,
        pqRerankK = 1000, verifyCodes = true, verifySampleFraction = 0.25)
      assert(pqScansOf(spark.sql(annSql(view)))._1.isDefined,
        "a sampled-verified registration must serve the two-scan pipeline")
      // broken id contract: rejected AS InvalidArgumentException — the
      // exact class, not just some IllegalArgumentException
      val e = intercept[IllegalArgumentException](
        db.registerSql("pqsfdup", pq = true, verifyCodes = true))
      assert(e.isInstanceOf[graft.InvalidArgumentException],
        s"facade taxonomy: expected InvalidArgumentException, got ${e.getClass}")
      // ... and the unverified registration of the same epoch still works
      // (the id contract is the caller's to honor; verification is the
      // opt-in check) — proving the failure above was the verifier
      db.registerSql("pqsfdup", nprobe = 4, viewName = "pqsfdup_raw", pq = true)
    } finally db.close()
  }

  test("verifyPqCodes: argmin replay accepts honest codes, rejects foreign books/codes/ids") {
    pqIndex
    val books = pqIndex.codebooks.value
    // the honest table passes, fully and sampled; NULL codes pass too
    // (the documented un-coded-append case)
    assert(SqlAnn.verifyPqCodes(spark, pqDir, books))
    assert(SqlAnn.verifyPqCodes(spark, pqDir, books, sampleFraction = 0.5))
    val base = spark.read.parquet(pqDir)
    val nullDir = java.nio.file.Files
      .createTempDirectory("graft-pqverify-null").toFile.getAbsolutePath
    base.withColumn("codes",
      when(col("id") < 5, lit(null)).otherwise(col("codes")))
      .write.mode("overwrite").parquet(nullDir)
    assert(SqlAnn.verifyPqCodes(spark, nullDir, books),
      "NULL codes are the documented append case and must pass")
    // FOREIGN codebooks: reversing each subspace's codeword order breaks
    // every stored argmin (code c now points at codeword ks-1-c)
    assert(!SqlAnn.verifyPqCodes(spark, pqDir, books.map(_.reverse)),
      "foreign codebooks must fail the argmin replay")
    // wrong-length codes
    val shortDir = java.nio.file.Files
      .createTempDirectory("graft-pqverify-short").toFile.getAbsolutePath
    base.withColumn("codes", slice(col("codes"), 1, 1))
      .write.mode("overwrite").parquet(shortDir)
    assert(!SqlAnn.verifyPqCodes(spark, shortDir, books),
      "wrong-length codes must fail")
    // id contract: duplicates and nulls fail regardless of codes
    val dupDir = java.nio.file.Files
      .createTempDirectory("graft-pqverify-dup").toFile.getAbsolutePath
    base.union(base.limit(3)).write.mode("overwrite").parquet(dupDir)
    assert(!SqlAnn.verifyPqCodes(spark, dupDir, books), "duplicate ids must fail")
    val nullIdDir = java.nio.file.Files
      .createTempDirectory("graft-pqverify-nid").toFile.getAbsolutePath
    base.withColumn("id",
      when(col("id") === 7L, lit(null)).otherwise(col("id")))
      .write.mode("overwrite").parquet(nullIdDir)
    assert(!SqlAnn.verifyPqCodes(spark, nullIdDir, books), "null ids must fail")
    // registration with verifyCodes = true enforces all of it
    intercept[IllegalArgumentException](
      SqlAnn.registerIndex(spark, pqDir, pqIndex.centroids.value, nprobe = 2,
        centroidsBc = Some(pqIndex.centroids),
        pq = Some(new SqlAnn.PqInfo(
          spark.sparkContext.broadcast(books.map(_.reverse)))),
        verifyCodes = true))
    // ... and the honest registration passes through it
    SqlAnn.registerIndex(spark, pqDir, pqIndex.centroids.value, nprobe = 2,
      centroidsBc = Some(pqIndex.centroids),
      pq = Some(new SqlAnn.PqInfo(pqIndex.codebooks)),
      verifyCodes = true)
    SqlAnn.unregisterIndex(spark, pqDir)
    // the sample-fraction knob (round 18, r17 verdict #2: previously
    // hardwired to a full replay): a SAMPLED verification still rejects
    // a corrupted codes column — foreign codebooks fail almost every
    // row, so any non-trivial sample catches them — and still accepts
    // the honest one
    intercept[IllegalArgumentException](
      SqlAnn.registerIndex(spark, pqDir, pqIndex.centroids.value, nprobe = 2,
        centroidsBc = Some(pqIndex.centroids),
        pq = Some(new SqlAnn.PqInfo(
          spark.sparkContext.broadcast(books.map(_.reverse)))),
        verifyCodes = true, verifySampleFraction = 0.3))
    SqlAnn.registerIndex(spark, pqDir, pqIndex.centroids.value, nprobe = 2,
      centroidsBc = Some(pqIndex.centroids),
      pq = Some(new SqlAnn.PqInfo(pqIndex.codebooks)),
      verifyCodes = true, verifySampleFraction = 0.5)
    SqlAnn.unregisterIndex(spark, pqDir)
    // the lone-flag rule extends to the fraction: a sample size with no
    // verification to sample must fail loudly, not read as "sampled"
    intercept[IllegalArgumentException](
      SqlAnn.registerIndex(spark, pqDir, pqIndex.centroids.value, nprobe = 2,
        centroidsBc = Some(pqIndex.centroids),
        pq = Some(new SqlAnn.PqInfo(pqIndex.codebooks)),
        verifySampleFraction = 0.5))
  }

  test("facade PQ with cosine metric: normalized-code attestation verified and served") {
    import graft.IndexConfig
    graft.GraftExtensions.register(spark)
    val db = new graft.api.VectorDB(spark,
      java.nio.file.Files.createTempDirectory("graft-sqlann-cospq").toString)
    db.createIndex(IndexConfig("cospq", Dim,
      metric = graft.Metric.Cosine, nlist = 4, m = 2))
    val ep = db.buildEpoch("cospq", vectorsDF(randomVectors(120, Dim, seed = 5)))
    db.activateEpoch("cospq", ep)
    db.loadIndex("cospq")
    try {
      val em = new graft.storage.EpochManager(s"${db.dataPath}/cospq/epochs")
      val path = s"${em.epochPath(ep)}/vectors"
      val books = graft.index.IvfPqIndex.readCodebooks(
        spark, s"${em.epochPath(ep)}/codebooks")
      // cosine epochs encode NORMALIZE(vec) while storing raw flat
      // vectors: a raw-replay verification must REJECT the honest codes,
      // and the normalized replay must accept them — the normalized flag
      // exists exactly because of this layout
      assert(!SqlAnn.verifyPqCodes(spark, path, books),
        "raw replay over a cosine epoch must fail (codes are normalized-encoded)")
      assert(SqlAnn.verifyPqCodes(spark, path, books, normalized = true),
        "normalized replay must accept the honest cosine codes")
      // registerSql wires cosineCodes AND the normalized verification
      val view = db.registerSql("cospq", nprobe = 4, pq = true,
        pqRerankK = 1000, verifyCodes = true)
      val sql =
        s"""SELECT id, cosine_distance(vec, $qvecSql) AS dist
           |FROM $view ORDER BY dist, id LIMIT $K""".stripMargin
      val df = spark.sql(sql)
      assert(pqScansOf(df)._1.isDefined,
        "the cosineCodes attestation must unlock the ADC path for cosine top-k")
      val got = df.collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      // exact at full coverage: unregister and replay the same SQL as the
      // brute-force scan over the still-bound view
      SqlAnn.unregisterIndex(spark, path)
      val brute = spark.sql(sql).collect()
        .map(r => (r.getLong(0), r.getDouble(1))).toSeq
      assert(got === brute,
        "cosine facade PQ at full coverage must equal brute force")
    } finally db.close()
  }

  test("batch PQ: literal batch rides the two-scan candidate pipeline, exact at full coverage") {
    pqIndex
    graft.GraftExtensions.register(spark)
    spark.read.parquet(pqDir).createOrReplaceTempView("sqlann_pq")
    val qs = randomVectors(3, Dim, seed = 21).map { case (i, v) => (i + 500L, v) }
    localQView("sqlann_pqb_q", qs)
    val sql = batchSql("sqlann_pqb_q", "sqlann_pq")
    val brute = rows4(spark.sql(sql)) // unregistered brute force
    registerPq(nprobe = NList, rerankK = 400)
    try {
      val df = spark.sql(sql)
      val (adc, rerank, adcPf, rerankPf) = pqScansOf(df)
      assert(adc.isDefined && rerank.isDefined,
        s"batch PQ must plan a codes-only candidate scan AND a vec rerank scan; got " +
          s"${SqlAnn.fileSourceScans(df).map(_.output.map(_.name))}")
      assert(adcPf.exists(_.contains("list_id")) && rerankPf.exists(_.contains("list_id")),
        s"both scans must carry the static probe filter ($adcPf / $rerankPf)")
      assert(rows4(df) === brute,
        "batch PQ at nprobe = nlist with rerankK >= corpus must be EXACT")
      // a NULL qvec row vanishes (no probe rows, no candidates) — the
      // live query keeps its full top-k, same contract as the flat path
      localQView("sqlann_pqb_qn", Seq(qs.head, 77L -> null))
      val withNull = spark.sql(batchSql("sqlann_pqb_qn", "sqlann_pq"))
      assert(pqScansOf(withNull)._1.isDefined)
      val got = rows4(withNull)
      assert(got.map(_._1).distinct === Seq(qs.head._1) && got.size === K)
      // partial coverage: both scans pruned below full width, every query
      // still gets k contiguously-ranked rows from its candidate pool
      SqlAnn.unregisterIndex(spark, pqDir)
      registerPq(nprobe = 2, rerankK = 20)
      val part = spark.sql(sql)
      assert(pqScansOf(part)._1.isDefined, "partial-coverage batch PQ must fire")
      val rowsP = rows4(part)
      qs.foreach { case (qid, _) =>
        assert(rowsP.filter(_._1 == qid).map(_._4) === (1 to K),
          s"query $qid must keep k contiguous ranks at partial coverage")
      }
      // candidate concentration (the batch twin of the single-query DPP
      // pin): clustered queries pool their ADC candidates in few lists,
      // so the rerank scan must carry the candidate-list DPP and read
      // FEWER partitions than the probe union — without it the rerank
      // re-reads (id, vec) of every probed list and the codes scan saves
      // nothing net (SqlPqScale's batch measurement: 196/256 partitions,
      // flat-plus-overhead latency)
      SqlAnn.unregisterIndex(spark, pqDir)
      localQView("sqlann_pqb_c",
        Seq(900L -> corner(0), 901L -> corner(0).map(x => x + 0.05f)))
      registerPq(nprobe = NList, rerankK = 10)
      val conc = spark.sql(batchSql("sqlann_pqb_c", "sqlann_pq"))
      val (cAdc, cRerank, _, cRerankPf) = pqScansOf(conc)
      assert(conc.collect().nonEmpty)
      assert(cAdc.isDefined && cRerank.isDefined)
      assert(cRerankPf.exists(_.contains("dynamicpruning")),
        s"the batch rerank scan must carry the candidate-list DPP: $cRerankPf")
      // the DPP build reuses the candidate stage, so the executed plan
      // holds MORE THAN ONE codes scan instance — read the max metric
      // (the un-executed duplicate reports 0)
      def parts(s: org.apache.spark.sql.execution.FileSourceScanExec): Long =
        s.metrics.get("numPartitions").map(_.value).getOrElse(-1L)
      val scansAll = SqlAnn.fileSourceScans(conc)
      val adcParts = scansAll.filter(s => s.output.exists(_.name == "codes") &&
        !s.output.exists(_.name == "vec")).map(parts).max
      val rerankParts = scansAll.filter(s => s.output.exists(_.name == "vec") &&
        !s.output.exists(_.name == "codes")).map(parts).max
      assert(adcParts === NList.toLong,
        s"nprobe = nlist: the candidate scan reads all $NList lists, read $adcParts")
      assert(rerankParts > 0 && rerankParts < NList,
        s"the batch rerank must read only the candidates' lists (< $NList), read $rerankParts")
    } finally SqlAnn.unregisterIndex(spark, pqDir)
  }

  test("batch PQ gates: parquet batches, unattested cosine, and filtered shapes") {
    pqIndex
    graft.GraftExtensions.register(spark)
    spark.read.parquet(pqDir).createOrReplaceTempView("sqlann_pq")
    val qs = randomVectors(3, Dim, seed = 22).map { case (i, v) => (i + 600L, v) }
    // a deterministic corpus-side WHERE is replicated into the candidate
    // stage — exact at full coverage over the filtered rows
    val filtSql =
      s"""SELECT qid, id, dist, rank FROM (
         |  SELECT q.qid, t.id, l2_distance(t.vec, q.qvec) AS dist,
         |    CAST(row_number() OVER (PARTITION BY q.qid
         |      ORDER BY l2_distance(t.vec, q.qvec), t.id) AS INT) AS rank
         |  FROM sqlann_pqg_q q, sqlann_pq t WHERE t.id % 2 = 0)
         |WHERE rank <= $K ORDER BY qid, rank""".stripMargin
    localQView("sqlann_pqg_q", qs)
    val bruteFilt = rows4(spark.sql(filtSql))
    // parquet-backed batch (round 17): rides the pipeline too — the
    // codes scan deliberately UNPRUNED, the rerank candidate-list-DPP'd
    val qDir = java.nio.file.Files
      .createTempDirectory("graft-pqbatch-qp").toFile.getAbsolutePath
    val list = new java.util.ArrayList[org.apache.spark.sql.Row]()
    qs.foreach { case (i, v) => list.add(org.apache.spark.sql.Row(i, v.toSeq)) }
    spark.createDataFrame(list, org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("qid",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("qvec",
        org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.FloatType)))))
      .write.mode("overwrite").parquet(qDir)
    spark.read.parquet(qDir).createOrReplaceTempView("sqlann_pqg_qp")
    val bruteP = rows4(spark.sql(batchSql("sqlann_pqg_qp", "sqlann_pq")))
    registerPq(nprobe = NList, rerankK = 400)
    try {
      val filt = spark.sql(filtSql)
      assert(pqScansOf(filt)._1.isDefined, "filtered batch PQ must fire")
      assert(rows4(filt) === bruteFilt,
        "filtered batch PQ must be exact at full coverage")
      val pq = spark.sql(batchSql("sqlann_pqg_qp", "sqlann_pq"))
      val (pAdc, pRerank, pAdcPf, pRerankPf) = pqScansOf(pq)
      assert(pAdc.isDefined && pRerank.isDefined,
        "a re-executable parquet batch must ride the PQ pipeline")
      assert(pAdcPf.forall(!_.contains("list_id")),
        s"the parquet-batch codes scan is unpruned by design ($pAdcPf)")
      assert(pRerankPf.exists(_.contains("dynamicpruning")),
        s"the parquet-batch rerank must carry the candidate-list DPP ($pRerankPf)")
      assert(rows4(pq) === bruteP,
        "parquet-batch PQ must be exact at full coverage")
      // a NON-re-executable batch (limit without total order: a
      // standalone DPP build could pool different rows than the join
      // sees) must fall back to the flat path
      val lim = spark.sql(
        s"""SELECT qid, id, dist, rank FROM (
           |  SELECT q.qid, t.id, l2_distance(t.vec, q.qvec) AS dist,
           |    CAST(row_number() OVER (PARTITION BY q.qid
           |      ORDER BY l2_distance(t.vec, q.qvec), t.id) AS INT) AS rank
           |  FROM (SELECT * FROM sqlann_pqg_qp LIMIT 2) q, sqlann_pq t)
           |WHERE rank <= $K ORDER BY qid, rank""".stripMargin)
      assert(pqScansOf(lim)._1.isEmpty,
        "a non-re-executable batch must not take the PQ pipeline")
      assert(hasProbeGenerate(lim), "the flat batch rewrite must serve it")
      // cosine without the cosineCodes attestation: flat probe join only
      val cosSql =
        s"""SELECT qid, id, dist, rank FROM (
           |  SELECT q.qid, t.id, cosine_distance(t.vec, q.qvec) AS dist,
           |    CAST(row_number() OVER (PARTITION BY q.qid
           |      ORDER BY cosine_distance(t.vec, q.qvec), t.id) AS INT) AS rank
           |  FROM sqlann_pqg_q q, sqlann_pq t)
           |WHERE rank <= $K ORDER BY qid, rank""".stripMargin
      val cos = spark.sql(cosSql)
      assert(pqScansOf(cos)._1.isEmpty,
        "unattested cosine must not take the batch ADC path")
      assert(hasProbeGenerate(cos), "the flat batch rewrite must serve cosine")
    } finally SqlAnn.unregisterIndex(spark, pqDir)
  }

  test("limit over a TOTAL-order sort is re-executable: batch PQ rides it; partial-order sorts still fall back") {
    // r17 verdict #6: reExecutesToSameRows used to reject ALL limits —
    // but a limit directly over a global sort whose keys include EVERY
    // output column re-executes to the same multiset (ties can only
    // swap fully-identical rows), so it may feed a standalone DPP build
    pqIndex
    graft.GraftExtensions.register(spark)
    spark.read.parquet(pqDir).createOrReplaceTempView("sqlann_pq")
    val qs = randomVectors(4, Dim, seed = 23).map { case (i, v) => (i + 700L, v) }
    val qDir = java.nio.file.Files
      .createTempDirectory("graft-pqlimit-qp").toFile.getAbsolutePath
    val list = new java.util.ArrayList[org.apache.spark.sql.Row]()
    qs.foreach { case (i, v) => list.add(org.apache.spark.sql.Row(i, v.toSeq)) }
    spark.createDataFrame(list, org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("qid",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("qvec",
        org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.FloatType)))))
      .write.mode("overwrite").parquet(qDir)
    spark.read.parquet(qDir).createOrReplaceTempView("sqlann_lim_qp")
    def limSql(orderBy: String) =
      s"""SELECT qid, id, dist, rank FROM (
         |  SELECT q.qid, t.id, l2_distance(t.vec, q.qvec) AS dist,
         |    CAST(row_number() OVER (PARTITION BY q.qid
         |      ORDER BY l2_distance(t.vec, q.qvec), t.id) AS INT) AS rank
         |  FROM (SELECT * FROM sqlann_lim_qp ORDER BY $orderBy LIMIT 2) q,
         |       sqlann_pq t)
         |WHERE rank <= $K ORDER BY qid, rank""".stripMargin
    val brute = rows4(spark.sql(limSql("qid, qvec")))
    registerPq(nprobe = NList, rerankK = 400)
    try {
      // ORDER BY every output column + LIMIT: total order, re-executable
      // — the PQ pipeline fires with the candidate-list DPP
      val tot = spark.sql(limSql("qid, qvec"))
      val (adc, _, _, rerankPf) = pqScansOf(tot)
      assert(adc.isDefined,
        "a limit over a total-order sort must ride the PQ pipeline")
      assert(rerankPf.exists(_.contains("dynamicpruning")),
        s"the rerank must carry the candidate-list DPP ($rerankPf)")
      assert(rows4(tot) === brute,
        "total-sort-limited batch PQ must be exact at full coverage")
      // ORDER BY a key SUBSET (qid only — unique in the data, but not
      // provably so from the plan): conservative fallback to the flat
      // path, broadcast-reuse-only pruning
      val part = spark.sql(limSql("qid"))
      assert(pqScansOf(part)._1.isEmpty,
        "a subset-order limit must not take the PQ pipeline")
      assert(hasProbeGenerate(part), "the flat batch rewrite must serve it")
    } finally SqlAnn.unregisterIndex(spark, pqDir)
  }

  test("PQ range refinement: codes-scan DPP prunes candidate lists, EXACT, never dismisses unscorable rows") {
    pqIndex
    graft.GraftExtensions.register(spark)
    // doctor the coded table: two IN-RADIUS rows become unscorable —
    // NULL codes (the un-coded-append case) and wrong-length codes (a
    // corrupted row) — the refinement must return BOTH (never-dismiss)
    val refDir = java.nio.file.Files
      .createTempDirectory("graft-pqrange").toFile.getAbsolutePath
    spark.read.parquet(pqDir)
      .withColumn("codes",
        when(col("id") === 0L, lit(null))
          .when(col("id") === 8L, slice(col("codes"), 1, 1))
          .otherwise(col("codes")))
      .write.partitionBy("list_id").mode("overwrite").parquet(refDir)
    spark.read.parquet(refDir).createOrReplaceTempView("sqlann_pqr")
    val sql = rangeSql("sqlann_pqr", "2.0")
    val brute = spark.sql(sql).collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(brute.exists(_._1 == 0L) && brute.exists(_._1 == 8L),
      "fixture: the two unscorable rows must be true matches")
    val (radii, errs) = SqlAnn.computePqRangeMeta(
      spark, refDir, pqIndex.centroids.value, pqIndex.codebooks.value)
    val errList = spark.read.parquet(refDir).filter(col("id") === 8L)
      .select(col("list_id")).head().getInt(0)
    assert(errs(errList).isInfinite,
      "a malformed-code row must poison its list's err to +inf (never pruned)")
    SqlAnn.registerIndex(spark, refDir, pqIndex.centroids.value, nprobe = 2,
      radii = Some(radii), centroidsBc = Some(pqIndex.centroids),
      pq = Some(new SqlAnn.PqInfo(pqIndex.codebooks)),
      pqRangeErrs = Some(errs))
    try {
      val df = spark.sql(sql)
      val pf = partitionFilterText(df)
      assert(pf.contains("list_id") && pf.contains("dynamicpruning"),
        s"the refinement DPP must reach the vector scan ($pf)")
      val got = df.collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      assert(got === brute, "the refined range scan must stay EXACT — " +
        "including the NULL-codes and corrupted-codes matches")
      // the DPP build side is the m-byte codes scan, vector-free
      val scans = SqlAnn.fileSourceScans(df)
      assert(scans.exists(s => s.output.exists(_.name == "codes") &&
        !s.output.exists(_.name == "vec")),
        s"the refinement must build from a codes-only scan " +
          s"(${scans.map(_.output.map(_.name))})")
      // idempotent under the fixed point: exactly one DPP conjunct
      val dppCount = df.queryExecution.optimizedPlan.collect {
        case f: org.apache.spark.sql.catalyst.plans.logical.Filter =>
          f.condition.collect {
            case _: org.apache.spark.sql.catalyst.expressions.DynamicPruningSubquery => 1
          }.sum
      }.sum
      assert(dppCount <= 1, s"expected at most one refinement DPP, got $dppCount")
      SqlAnn.unregisterIndex(spark, refDir)
      // DEGRADED-radii regime — the refinement's reason to exist: with
      // inflated covering radii (the grown-table shape) the ball prune
      // keeps EVERY list, but the per-row ADC bound still rules out the
      // lists with no plausible candidate. The runtime metric proves it.
      SqlAnn.registerIndex(spark, refDir, pqIndex.centroids.value, nprobe = 2,
        radii = Some(Array.fill(NList)(30.0)),
        centroidsBc = Some(pqIndex.centroids),
        pq = Some(new SqlAnn.PqInfo(pqIndex.codebooks)),
        pqRangeErrs = Some(errs))
      val df2 = spark.sql(sql)
      val got2 = df2.collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      assert(got2 === brute, "refined + inflated radii must stay exact")
      val vecScan = SqlAnn.fileSourceScans(df2)
        .find(s => s.output.exists(_.name == "vec"))
        .getOrElse(fail("no vector scan"))
      val partsRead = vecScan.metrics.get("numPartitions")
        .map(_.value).getOrElse(-1L)
      assert(partsRead > 0 && partsRead < NList,
        s"the ADC refinement must prune below the (inflated) ball prune: " +
          s"read $partsRead of $NList")
      // the IP arm (Cauchy–Schwarz bound) rides the same registration:
      // `ip_distance(vec, lit) <= r` refines through the SAME errs and
      // stays exact — including the unscorable rows
      val c0 = s"CAST(array(${corner(0).map(_.toDouble).mkString(", ")}) AS ARRAY<FLOAT>)"
      val ipSql =
        s"""SELECT id, ip_distance(vec, $c0) AS dist
           |FROM sqlann_pqr
           |WHERE ip_distance(vec, $c0) <= -100.0
           |ORDER BY id""".stripMargin
      SqlAnn.unregisterIndex(spark, refDir)
      val ipBrute = spark.sql(ipSql).collect()
        .map(r => (r.getLong(0), r.getDouble(1))).toSeq
      assert(ipBrute.exists(_._1 == 0L) && ipBrute.exists(_._1 == 8L),
        "IP fixture: the unscorable rows must be true IP matches")
      SqlAnn.registerIndex(spark, refDir, pqIndex.centroids.value, nprobe = 2,
        radii = Some(radii), centroidsBc = Some(pqIndex.centroids),
        pq = Some(new SqlAnn.PqInfo(pqIndex.codebooks)),
        pqRangeErrs = Some(errs))
      val ipDf = spark.sql(ipSql)
      val ipPf = partitionFilterText(ipDf)
      assert(ipPf.contains("dynamicpruning"),
        s"the IP refinement DPP must reach the vector scan ($ipPf)")
      assert(ipDf.collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
        === ipBrute, "the IP-refined range scan must stay EXACT")
      // append invalidation: a grown table strips radii AND errs — the
      // range shape falls back to the plain scan (no stale dismissal)
      SqlAnn.invalidateRadii(spark, refDir)
      val df3 = spark.sql(sql)
      assert(!partitionFilterText(df3).contains("list_id"),
        "invalidation must disable both the ball prune and the refinement")
      assert(df3.collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq === brute)
    } finally SqlAnn.unregisterIndex(spark, refDir)
  }

  /** Refinement DPPs in the optimized plan: DynamicPruningSubquery
    * conjuncts whose BUILD contains the per-row keep filter — the probe
    * that distinguishes the round-19 codes screen from the ball DPP. */
  private def refineDppCount(df: DataFrame): Int =
    df.queryExecution.optimizedPlan.collect {
      case f: org.apache.spark.sql.catalyst.plans.logical.Filter =>
        f.condition.collect {
          case d: org.apache.spark.sql.catalyst.expressions.DynamicPruningSubquery
              if d.buildQuery.exists {
                case bf: org.apache.spark.sql.catalyst.plans.logical.Filter =>
                  bf.condition.exists(
                    _.isInstanceOf[graft.functions.PqRangeKeepCol])
                case _ => false
              } => 1
        }.sum
    }.sum

  test("PQ range-JOIN/semi refinement: per-row codes screen prunes below the ball, EXACT, anti excluded") {
    pqIndex
    graft.GraftExtensions.register(spark)
    // the same doctored-unscorable fixture as the single-table test: two
    // in-radius rows with NULL and truncated codes — the pairwise screen
    // must keep both
    val jDir = java.nio.file.Files
      .createTempDirectory("graft-pqrjoin").toFile.getAbsolutePath
    spark.read.parquet(pqDir)
      .withColumn("codes",
        when(col("id") === 0L, lit(null))
          .when(col("id") === 8L, slice(col("codes"), 1, 1))
          .otherwise(col("codes")))
      .write.partitionBy("list_id").mode("overwrite").parquet(jDir)
    spark.read.parquet(jDir).createOrReplaceTempView("sqlann_pqj")
    val (_, errs) = SqlAnn.computePqRangeMeta(
      spark, jDir, pqIndex.centroids.value, pqIndex.codebooks.value)
    val qs = Seq(100L -> corner(0), 101L -> corner(3))
    localQView("sqlann_pqj_q", qs)
    val qDir = java.nio.file.Files
      .createTempDirectory("graft-pqrjoin-q").toFile.getAbsolutePath
    queriesDF(qs).write.mode("overwrite").parquet(qDir)
    spark.read.parquet(qDir).createOrReplaceTempView("sqlann_pqj_qp")
    def joinSql(q: String) =
      s"""SELECT q.qid, t.id, l2_distance(t.vec, q.qvec) AS dist
         |FROM $q q, sqlann_pqj t
         |WHERE l2_distance(t.vec, q.qvec) <= 2.0
         |ORDER BY qid, id""".stripMargin
    def semiSql(q: String) =
      s"""SELECT t.id FROM sqlann_pqj t WHERE EXISTS (
         |  SELECT 1 FROM $q q
         |  WHERE l2_distance(t.vec, q.qvec) <= 2.0) ORDER BY t.id""".stripMargin
    def antiSql(q: String) =
      s"""SELECT t.id FROM sqlann_pqj t WHERE NOT EXISTS (
         |  SELECT 1 FROM $q q
         |  WHERE l2_distance(t.vec, q.qvec) <= 2.0) ORDER BY t.id""".stripMargin
    def pairs(df: DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val bruteJoin = pairs(spark.sql(joinSql("sqlann_pqj_qp")))
    assert(bruteJoin.exists(_._2 == 0L) && bruteJoin.exists(_._2 == 8L),
      "fixture: the unscorable rows must be true join matches")
    val bruteSemi = spark.sql(semiSql("sqlann_pqj_qp")).collect().map(_.getLong(0)).toSeq
    val bruteAnti = spark.sql(antiSql("sqlann_pqj_qp")).collect().map(_.getLong(0)).toSeq
    // DEGRADED radii (the grown-table regime): the ball keeps every list
    // for every query, so any partition skipped below NList is the
    // refinement's work alone
    SqlAnn.registerIndex(spark, jDir, pqIndex.centroids.value, nprobe = 2,
      radii = Some(Array.fill(NList)(30.0)),
      centroidsBc = Some(pqIndex.centroids),
      pq = Some(new SqlAnn.PqInfo(pqIndex.codebooks)),
      pqRangeErrs = Some(errs))
    try {
      // dynamic arm: parquet-backed queries (the eval-set shape)
      val dj = spark.sql(joinSql("sqlann_pqj_qp"))
      assert(refineDppCount(dj) === 1,
        "the parquet-queries range join must carry exactly one codes-screen DPP")
      assert(pairs(dj) === bruteJoin,
        "refined range join must stay EXACT incl. unscorable-codes rows")
      val vecScan = SqlAnn.fileSourceScans(dj)
        .find(s => s.output.exists(_.name == "vec") &&
          s.output.exists(_.name == "list_id"))
        .getOrElse(fail("no corpus vec scan"))
      val partsRead = vecScan.metrics.get("numPartitions")
        .map(_.value).getOrElse(-1L)
      assert(partsRead > 0 && partsRead < NList,
        s"the codes screen must prune below the (inflated) ball: read $partsRead of $NList")
      // the build side reads codes WITHOUT vectors — the bytes argument
      val buildScan = SqlAnn.fileSourceScans(dj)
        .find(s => s.output.exists(_.name == "codes"))
        .getOrElse(fail("no codes build scan"))
      assert(!buildScan.output.exists(_.name == "vec") &&
        !buildScan.output.exists(_.name == "id"),
        s"the refinement build must scan (codes, list_id) only, " +
          s"got ${buildScan.output.map(_.name)}")
      // static arm: driver-known queries compose the static ball In with
      // the screen DPP
      val sj = spark.sql(joinSql("sqlann_pqj_q"))
      assert(refineDppCount(sj) === 1,
        "the local-queries range join must carry the codes-screen DPP too")
      assert(pairs(sj) === bruteJoin, "static-arm refined join must stay exact")
      // semi screen: same refinement, match existence preserved
      val sm = spark.sql(semiSql("sqlann_pqj_qp"))
      assert(refineDppCount(sm) === 1,
        "the semi screen must carry the codes-screen DPP")
      assert(sm.collect().map(_.getLong(0)).toSeq === bruteSemi,
        "refined semi screen must stay exact")
      // anti: output IS the non-matching rows — the screen must NOT
      // attach (and the scan stays unpruned, pinned by the r17 test)
      val an = spark.sql(antiSql("sqlann_pqj_qp"))
      assert(refineDppCount(an) === 0,
        "anti screens must never carry the codes-screen DPP")
      assert(an.collect().map(_.getLong(0)).toSeq === bruteAnti)
      // non-re-executable queries side: the screen build runs STANDALONE,
      // so a side that could re-draw rows must not attach it
      val lim = spark.sql(joinSql(
        "(SELECT * FROM sqlann_pqj_qp LIMIT 1)"))
      assert(refineDppCount(lim) === 0,
        "a no-total-order LIMIT queries side must not attach the screen")
      // the IP arm rides the same registration: per-pair Cauchy–Schwarz
      // bound (adc <= r + ||q_row||*maxErr), exact incl. the unscorable
      // rows
      val ipJSql =
        s"""SELECT q.qid, t.id, ip_distance(t.vec, q.qvec) AS dist
           |FROM sqlann_pqj_qp q, sqlann_pqj t
           |WHERE ip_distance(t.vec, q.qvec) <= -100.0
           |ORDER BY qid, id""".stripMargin
      SqlAnn.unregisterIndex(spark, jDir)
      val bruteIpJ = pairs(spark.sql(ipJSql))
      assert(bruteIpJ.exists(_._2 == 0L) && bruteIpJ.exists(_._2 == 8L),
        "IP fixture: the unscorable rows must be true IP join matches")
      SqlAnn.registerIndex(spark, jDir, pqIndex.centroids.value, nprobe = 2,
        radii = Some(Array.fill(NList)(30.0)),
        centroidsBc = Some(pqIndex.centroids),
        pq = Some(new SqlAnn.PqInfo(pqIndex.codebooks)),
        pqRangeErrs = Some(errs))
      val ipJ = spark.sql(ipJSql)
      assert(refineDppCount(ipJ) === 1,
        "the IP range join must carry the codes-screen DPP")
      assert(pairs(ipJ) === bruteIpJ, "IP-refined range join must stay exact")
    } finally SqlAnn.unregisterIndex(spark, jDir)
  }

  test("cosine PQ range refinement: pre-slacked keep bound EXACT; degenerate stored norm poisons its list, never dismissed") {
    graft.GraftExtensions.register(spark)
    // a unit-norm cosine-PQ corpus: normalized clustered corners (the
    // cosine IVF-PQ build renormalizes, so the stored column is unit)
    val rnd = new scala.util.Random(11)
    val rows = (0L until 200L).map { i =>
      val c = corner((i % 8).toInt)
      (i, c.map(x => x + rnd.nextFloat() * 0.2f - 0.1f))
    }
    val idx = graft.index.IvfPqIndex.build(
      spark, vectorsDF(rows), NList, m = 4, metric = Metric.Cosine)
    val cDir = java.nio.file.Files
      .createTempDirectory("graft-pqcos").toFile.getAbsolutePath
    // doctor in a DEGENERATE stored row: norm 1e-4, ALIGNED with the
    // query direction — the kernel's cosine distance to it is ~1e-4
    // (the eps keeps it near zero), so it IS a true match at any sane
    // radius, while its eps-normalized form has norm ~0.7: the naive
    // keep bound would not cover it. The meta pass must poison its list.
    val qdir = ncorner(0)
    val degVec = qdir.map(x => x * 1e-4f)
    val degCodes = graft.functions.PqKernels.encode(
      graft.functions.VectorKernels.normalize(degVec), idx.codebooks.value)
    val degList = {
      // assign like the index would: nearest centroid of the normalized row
      val cents = idx.centroids.value
      val nv = graft.functions.VectorKernels.normalize(degVec)
      (0 until cents.length).minBy(l =>
        graft.functions.VectorKernels.l2(nv, cents(l)))
    }
    import spark.implicits._
    val base = idx.codes.join(idx.rawVectors, "id")
      .select(col("id"), col("vec"), col("codes"), col("list_id"))
    val extra = Seq((9000L, degVec.toSeq, degCodes.toSeq, degList))
      .toDF("id", "vec", "codes", "list_id")
    base.unionByName(extra)
      .write.partitionBy("list_id").mode("overwrite").parquet(cDir)
    spark.read.parquet(cDir).createOrReplaceTempView("sqlann_pqcos")
    val (radii, errs) = SqlAnn.computePqRangeMeta(
      spark, cDir, idx.centroids.value, idx.codebooks.value,
      cosineCodes = true)
    assert(errs(degList).isInfinite,
      "an out-of-tolerance stored norm must poison its list's err")
    assert(errs.count(_.isInfinite) === 1,
      "healthy unit-norm lists must keep finite errs")
    val sql =
      s"""SELECT id, cosine_distance(vec, ${litOf(qdir)}) AS dist
         |FROM sqlann_pqcos
         |WHERE cosine_distance(vec, ${litOf(qdir)}) <= 0.3
         |ORDER BY id""".stripMargin
    val brute = spark.sql(sql).collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(brute.exists(_._1 == 9000L),
      "fixture: the degenerate row must be a true cosine match")
    // degraded-radii registration: the ball keeps everything, so any
    // pruning below NList is the cosine keep bound's work
    SqlAnn.registerIndex(spark, cDir, idx.centroids.value, nprobe = 2,
      radii = Some(Array.fill(NList)(30.0)),
      centroidsBc = Some(idx.centroids), unitNorm = true,
      pq = Some(new SqlAnn.PqInfo(idx.codebooks, cosineCodes = true)),
      pqRangeErrs = Some(errs))
    try {
      val df = spark.sql(sql)
      val pf = partitionFilterText(df)
      assert(pf.contains("dynamicpruning"),
        s"the cosine refinement DPP must reach the vector scan ($pf)")
      assert(df.collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
        === brute,
        "cosine-refined range scan must stay EXACT — incl. the degenerate row")
      val vecScan = SqlAnn.fileSourceScans(df)
        .find(s => s.output.exists(_.name == "vec"))
        .getOrElse(fail("no vector scan"))
      val partsRead = vecScan.metrics.get("numPartitions")
        .map(_.value).getOrElse(-1L)
      assert(partsRead > 0 && partsRead < NList,
        s"the cosine keep bound must prune below the (inflated) ball: " +
          s"read $partsRead of $NList")
      // a NON-unit query literal must not refine (the slack assumes a
      // near-unit query): no DPP, still exact
      val badQ = qdir.map(_ * 3.0f)
      val sqlBad =
        s"""SELECT id FROM sqlann_pqcos
           |WHERE cosine_distance(vec, ${litOf(badQ)}) <= 0.3 ORDER BY id""".stripMargin
      SqlAnn.unregisterIndex(spark, cDir)
      val bruteBad = spark.sql(sqlBad).collect().map(_.getLong(0)).toSeq
      SqlAnn.registerIndex(spark, cDir, idx.centroids.value, nprobe = 2,
        radii = Some(Array.fill(NList)(30.0)),
        centroidsBc = Some(idx.centroids), unitNorm = true,
        pq = Some(new SqlAnn.PqInfo(idx.codebooks, cosineCodes = true)),
        pqRangeErrs = Some(errs))
      val dfBad = spark.sql(sqlBad)
      assert(!partitionFilterText(dfBad).contains("dynamicpruning"),
        "a non-unit query literal must not attach the cosine refinement")
      assert(dfBad.collect().map(_.getLong(0)).toSeq === bruteBad)
      // the cosine JOIN arm: per-row keep bound over unit-norm query
      // rows (attestation + cosineCodes gates), exact incl. the
      // degenerate stored row — whose poisoned list keeps it reachable
      localQView("sqlann_pqcos_q", Seq(100L -> ncorner(0), 101L -> ncorner(3)))
      val jSql = cosineJoinSql("sqlann_pqcos_q", "sqlann_pqcos", "0.3")
      SqlAnn.unregisterIndex(spark, cDir)
      val bruteJ = spark.sql(jSql).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSeq
      assert(bruteJ.exists(_._2 == 9000L),
        "cosine join fixture: the degenerate row must be a true match")
      SqlAnn.registerIndex(spark, cDir, idx.centroids.value, nprobe = 2,
        radii = Some(Array.fill(NList)(30.0)),
        centroidsBc = Some(idx.centroids), unitNorm = true,
        pq = Some(new SqlAnn.PqInfo(idx.codebooks, cosineCodes = true)),
        pqRangeErrs = Some(errs))
      val dj = spark.sql(jSql)
      assert(refineDppCount(dj) === 1,
        "the cosine range join must carry the codes-screen DPP")
      assert(dj.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
        === bruteJ, "cosine-refined range join must stay exact")
    } finally SqlAnn.unregisterIndex(spark, cDir)
  }

  test("registerSql(pqRangeAccel): one meta pass unlocks the refined range scan; gates pinned") {
    import graft.IndexConfig
    graft.GraftExtensions.register(spark)
    val db = new graft.api.VectorDB(spark,
      java.nio.file.Files.createTempDirectory("graft-sqlann-pqra").toString)
    db.createIndex(IndexConfig("pqra", Dim, nlist = 4, m = 2))
    val ep = db.buildEpoch("pqra", vectorsDF(randomVectors(150, Dim, seed = 41)))
    db.activateEpoch("pqra", ep)
    db.loadIndex("pqra")
    // a cosine PQ epoch for the metric gate
    db.createIndex(IndexConfig("pqracos", Dim,
      metric = graft.Metric.Cosine, nlist = 4, m = 2))
    val epc = db.buildEpoch("pqracos", vectorsDF(randomVectors(90, Dim, seed = 42)))
    db.activateEpoch("pqracos", epc)
    db.loadIndex("pqracos")
    try {
      // lone-flag and metric gates (facade taxonomy). Round 19: the
      // cosine arm is attestation-gated, not rejected — a cosine epoch
      // WITHOUT unitNorm still throws
      intercept[graft.InvalidArgumentException](
        db.registerSql("pqra", pqRangeAccel = true))
      intercept[graft.InvalidArgumentException](
        db.registerSql("pqracos", pq = true, pqRangeAccel = true))
      // a UNIT-NORM cosine epoch + the attestation unlocks the cosine
      // refinement, consuming the build-persisted meta (no corpus scan)
      db.createIndex(graft.IndexConfig("pqracosu", Dim,
        metric = graft.Metric.Cosine, nlist = 4, m = 2))
      val normRows = randomVectors(90, Dim, seed = 45).map { case (i, v) =>
        (i, graft.functions.VectorKernels.normalize(v)) }
      val epu = db.buildEpoch("pqracosu", vectorsDF(normRows))
      db.activateEpoch("pqracosu", epu)
      db.loadIndex("pqracosu")
      val emu = new graft.storage.EpochManager(s"${db.dataPath}/pqracosu/epochs")
      assert(new java.io.File(s"${emu.epochPath(epu)}/pqerrs").exists,
        "a cosine PQ buildEpoch must persist the (normalized-space) errs")
      val scansC = SqlAnn.pqRangeMetaScans.get
      val vu = db.registerSql("pqracosu", nprobe = 4, pq = true,
        pqRerankK = 1000, unitNorm = true, pqRangeAccel = true)
      assert(SqlAnn.pqRangeMetaScans.get === scansC,
        "cosine pqRangeAccel must consume the persisted meta")
      val cq = litOf(ncorner(0))
      val cSql =
        s"""SELECT id, cosine_distance(vec, $cq) AS dist FROM $vu
           |WHERE cosine_distance(vec, $cq) <= 0.5 ORDER BY id""".stripMargin
      val dfc = spark.sql(cSql)
      assert(partitionFilterText(dfc).contains("dynamicpruning"),
        s"the cosine refinement must plan (${partitionFilterText(dfc)})")
      val gotC = dfc.collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      SqlAnn.unregisterIndex(spark, s"${emu.epochPath(epu)}/vectors")
      assert(gotC === spark.sql(cSql).collect()
        .map(r => (r.getLong(0), r.getDouble(1))).toSeq,
        "the facade cosine-refined range scan must stay exact")
      val view = db.registerSql("pqra", nprobe = 4, pq = true,
        pqRerankK = 1000, pqRangeAccel = true)
      val sql = rangeSql(view, "2.0", qvecSql)
      val brute = {
        val em = new graft.storage.EpochManager(s"${db.dataPath}/pqra/epochs")
        SqlAnn.unregisterIndex(spark, s"${em.epochPath(ep)}/vectors")
        val b = spark.sql(sql).collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
        db.registerSql("pqra", nprobe = 4, pq = true,
          pqRerankK = 1000, pqRangeAccel = true)
        b
      }
      val df = spark.sql(sql)
      val pf = partitionFilterText(df)
      assert(pf.contains("list_id") && pf.contains("dynamicpruning"),
        s"pqRangeAccel must plan the refined range scan ($pf)")
      assert(df.collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq === brute,
        "the facade-refined range scan must stay exact")
    } finally db.close()
  }

  test("pqRangeAccel meta rides the epoch: registration is a metadata read; compaction re-emits; append merges in place") {
    import graft.IndexConfig
    graft.GraftExtensions.register(spark)
    val db = new graft.api.VectorDB(spark,
      java.nio.file.Files.createTempDirectory("graft-sqlann-pqmeta").toString)
    db.createIndex(IndexConfig("pqmeta", Dim, nlist = 4, m = 2))
    val ep = db.buildEpoch("pqmeta", vectorsDF(randomVectors(150, Dim, seed = 43)))
    db.activateEpoch("pqmeta", ep)
    db.loadIndex("pqmeta")
    val em = new graft.storage.EpochManager(s"${db.dataPath}/pqmeta/epochs")
    def rows(df: DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    try {
      val root = em.epochPath(ep)
      assert(new java.io.File(s"$root/pqerrs").exists,
        "buildEpoch over a PQ L2 epoch must persist the decode-error table")
      // the persisted pair must replay a fresh meta pass bit-for-bit —
      // a registration may mix persisted and recomputed sources
      val books = graft.index.IvfPqIndex.readCodebooks(spark, s"$root/codebooks")
      val cents = db.readCentroids(s"$root/centroids")
      val (radii, errs) = SqlAnn.computePqRangeMeta(
        spark, s"$root/vectors", cents, books)
      assert(IvfFlatIndex.readListRadiiTable(spark, s"$root/radii", 4).toSeq
        === radii.toSeq, "persisted radii must replay the meta pass")
      assert(IvfFlatIndex.readListErrsTable(spark, s"$root/pqerrs", 4).toSeq
        === errs.toSeq, "persisted errs must replay the meta pass")
      // THE r19 contract (r18 verdict #1): registration consumes the
      // persisted tables — zero corpus passes
      val scans0 = SqlAnn.pqRangeMetaScans.get
      val view = db.registerSql("pqmeta", nprobe = 4, pq = true,
        pqRerankK = 1000, pqRangeAccel = true)
      assert(SqlAnn.pqRangeMetaScans.get === scans0,
        "registerSql over a freshly built PQ epoch must NOT scan the corpus")
      val sql = rangeSql(view, "2.0", qvecSql)
      val df = spark.sql(sql)
      val pf = partitionFilterText(df)
      assert(pf.contains("list_id") && pf.contains("dynamicpruning"),
        s"persisted-meta registration must still plan the refined scan ($pf)")
      val got = rows(df)
      SqlAnn.unregisterIndex(spark, s"$root/vectors")
      assert(got === rows(spark.sql(sql)),
        "persisted-meta refined range scan must stay exact")
      // compaction preserves membership + codes, so it re-emits the pair:
      // the compacted epoch registers scan-free too
      val ep2 = db.compactEpoch("pqmeta")
      val root2 = em.epochPath(ep2)
      assert(new java.io.File(s"$root2/pqerrs").exists,
        "compaction must re-emit pqerrs beside the copied radii")
      val scans1 = SqlAnn.pqRangeMetaScans.get
      db.registerSql("pqmeta", nprobe = 4, pq = true,
        pqRerankK = 1000, pqRangeAccel = true)
      assert(SqlAnn.pqRangeMetaScans.get === scans1,
        "registration over a compacted epoch must stay a metadata read")
      val got2 = rows(spark.sql(sql))
      SqlAnn.unregisterIndex(spark, s"$root2/vectors")
      assert(got2 === rows(spark.sql(sql)),
        "compacted-epoch refined range scan must stay exact")
      // append (round 19): the bounds are MAINTAINED — max(old, batch)
      // is exact for the union — so the tables survive with merged
      // values, a LIVE registration is merged in place (same token) and
      // keeps refining, the NEXT registration is still a metadata read,
      // and the refined range scan stays exact over the grown table
      db.registerSql("pqmeta", nprobe = 4, pq = true,
        pqRerankK = 1000, pqRangeAccel = true)
      val preRadii2 = IvfFlatIndex.readListRadiiTable(spark, s"$root2/radii", 4)
      val preErrs2 = IvfFlatIndex.readListErrsTable(spark, s"$root2/pqerrs", 4)
      db.addVectors("pqmeta", vectorsDF(randomVectors(10, Dim, seed = 44)
        .map { case (i, v) => (1000L + i, v) }))
      val dfLive = spark.sql(sql)
      assert(partitionFilterText(dfLive).contains("dynamicpruning"),
        "the LIVE registration must keep refining after the in-place merge")
      val gotLive = rows(dfLive)
      SqlAnn.unregisterIndex(spark, s"$root2/vectors")
      assert(gotLive === rows(spark.sql(sql)),
        "the live merged registration must stay exact over the grown table")
      assert(new java.io.File(s"$root2/pqerrs").exists &&
        new java.io.File(s"$root2/radii").exists,
        "append must MAINTAIN radii AND pqerrs (merged maxes), not drop them")
      assert(IvfFlatIndex.readListRadiiTable(spark, s"$root2/radii", 4)
        .zip(preRadii2).forall { case (po, pr) => po >= pr },
        "merged radii can only grow")
      assert(IvfFlatIndex.readListErrsTable(spark, s"$root2/pqerrs", 4)
        .zip(preErrs2).forall { case (po, pr) => po >= pr },
        "merged errs can only grow")
      val scans2 = SqlAnn.pqRangeMetaScans.get
      db.registerSql("pqmeta", nprobe = 4, pq = true,
        pqRerankK = 1000, pqRangeAccel = true)
      assert(SqlAnn.pqRangeMetaScans.get === scans2,
        "post-append registration must STAY a metadata read (merged tables)")
      val df3 = spark.sql(sql)
      assert(partitionFilterText(df3).contains("dynamicpruning"),
        "the refined range plan must still fire over the grown table")
      val got3 = rows(df3)
      SqlAnn.unregisterIndex(spark, s"$root2/vectors")
      assert(got3 === rows(spark.sql(sql)),
        "post-append merged-bounds registration must stay exact")
    } finally db.close()
  }

  test("semi/anti range joins: EXISTS screens become equi joins, exact; outer and flipped shapes pinned") {
    rangeIndex
    graft.GraftExtensions.register(spark)
    spark.read.parquet(rangeDir).createOrReplaceTempView("sqlann_sar")
    val qs = Seq(100L -> corner(0), 101L -> corner(3))
    localQView("sqlann_sar_q", qs)
    // the contamination screen and its DEcontamination twin — Spark
    // plans these as LeftSemi/LeftAnti joins with the bound in the
    // condition before the user rule batch runs
    val semiSql =
      s"""SELECT t.id FROM sqlann_sar t WHERE EXISTS (
         |  SELECT 1 FROM sqlann_sar_q q
         |  WHERE l2_distance(t.vec, q.qvec) <= 2.0) ORDER BY t.id""".stripMargin
    val antiSql =
      s"""SELECT t.id FROM sqlann_sar t WHERE NOT EXISTS (
         |  SELECT 1 FROM sqlann_sar_q q
         |  WHERE l2_distance(t.vec, q.qvec) <= 2.0) ORDER BY t.id""".stripMargin
    val bruteSemi = spark.sql(semiSql).collect().map(_.getLong(0)).toSeq
    val bruteAnti = spark.sql(antiSql).collect().map(_.getLong(0)).toSeq
    assert(bruteSemi.nonEmpty && bruteAnti.nonEmpty &&
      bruteSemi.size + bruteAnti.size === 200,
      "fixture sanity: the screens must partition the corpus")
    SqlAnn.registerIndex(spark, rangeDir, rangeIndex.centroids.value,
      nprobe = 2, radii = Some(rangeIndex.listRadii))
    try {
      val semi = spark.sql(semiSql)
      assert(hasRangeGenerate(semi), "the semi screen must gain the probe explode")
      // semi may prune the registered scan: non-matching rows are dropped
      // by semi semantics anyway
      assert(corpusScan(semi).metadata.getOrElse("PartitionFilters", "")
        .contains("list_id"), "semi must statically prune the corpus scan")
      val semiPhys = semi.queryExecution.executedPlan.toString
      assert(!semiPhys.contains("CartesianProduct") && !semiPhys.contains("NestedLoop"),
        s"semi must plan an equi join, got:\n$semiPhys")
      assert(semi.collect().map(_.getLong(0)).toSeq === bruteSemi,
        "the semi screen is exact (match existence preserved both ways)")
      val anti = spark.sql(antiSql)
      assert(hasRangeGenerate(anti), "the anti screen must gain the probe explode")
      // anti must NOT prune the registered scan — its OUTPUT is the
      // non-matching rows
      assert(!corpusScan(anti).metadata.getOrElse("PartitionFilters", "")
        .contains("list_id"), "anti must leave the corpus scan unpruned")
      val antiPhys = anti.queryExecution.executedPlan.toString
      assert(!antiPhys.contains("CartesianProduct") && !antiPhys.contains("NestedLoop"),
        s"anti must plan an equi join, got:\n$antiPhys")
      assert(anti.collect().map(_.getLong(0)).toSeq === bruteAnti,
        "the anti screen is exact")
      // registration on the INNER (right) side of the EXISTS: the explode
      // would land on the preserved side and duplicate its rows — pinned
      // untouched
      val flipped = spark.sql(
        s"""SELECT q.qid FROM sqlann_sar_q q WHERE EXISTS (
           |  SELECT 1 FROM sqlann_sar t
           |  WHERE l2_distance(t.vec, q.qvec) <= 2.0)""".stripMargin)
      assert(!hasRangeGenerate(flipped),
        "registered-inner semi must stay untouched")
      // preserved-row OUTER range join: every rewrite of this family
      // modifies a preserved side (explode duplicates null-extension,
      // prune deletes rows the outer join must emit) — pinned untouched
      val outer = spark.sql(
        s"""SELECT q.qid, t.id FROM sqlann_sar_q q LEFT JOIN sqlann_sar t
           |ON l2_distance(t.vec, q.qvec) <= 2.0""".stripMargin)
      assert(!hasRangeGenerate(outer), "outer range joins must stay untouched")
      // PARQUET-backed query set (eval sets are tables in practice): the
      // semi flavor rides the dynamic-pruning path, the anti flavor gets
      // the equi-key with the scan full — both still exact
      val qDir = java.nio.file.Files
        .createTempDirectory("graft-sar-qp").toFile.getAbsolutePath
      queriesDF(qs).write.mode("overwrite").parquet(qDir)
      spark.read.parquet(qDir).createOrReplaceTempView("sqlann_sar_qp")
      val semiP = spark.sql(semiSql.replace("sqlann_sar_q ", "sqlann_sar_qp "))
      assert(hasRangeGenerate(semiP), "parquet semi screen must rewrite")
      assert(corpusScan(semiP).metadata.getOrElse("PartitionFilters", "")
        .contains("dynamicpruning"),
        "parquet semi must dynamically prune the corpus scan")
      assert(semiP.collect().map(_.getLong(0)).toSeq === bruteSemi)
      val antiP = spark.sql(antiSql.replace("sqlann_sar_q ", "sqlann_sar_qp "))
      assert(hasRangeGenerate(antiP), "parquet anti screen must rewrite")
      val antiPPhys = antiP.queryExecution.executedPlan.toString
      assert(!antiPPhys.contains("CartesianProduct") && !antiPPhys.contains("NestedLoop"))
      assert(antiP.collect().map(_.getLong(0)).toSeq === bruteAnti)
      // METRIC MATRIX: the metric arms compose with the semi/anti gate —
      // an IP anti screen rides the Cauchy–Schwarz ball bound (same
      // attemptRangeJoin, different probe expression)
      val ipAntiSql =
        s"""SELECT t.id FROM sqlann_sar t WHERE NOT EXISTS (
           |  SELECT 1 FROM sqlann_sar_q q
           |  WHERE ip_distance(t.vec, q.qvec) <= -100.0) ORDER BY t.id""".stripMargin
      SqlAnn.unregisterIndex(spark, rangeDir)
      val bruteIpAnti = spark.sql(ipAntiSql).collect().map(_.getLong(0)).toSeq
      SqlAnn.registerIndex(spark, rangeDir, rangeIndex.centroids.value,
        nprobe = 2, radii = Some(rangeIndex.listRadii))
      val ipAnti = spark.sql(ipAntiSql)
      val ipGen = ipAnti.queryExecution.optimizedPlan.exists {
        case g: org.apache.spark.sql.catalyst.plans.logical.Generate =>
          g.generator.children.head
            .isInstanceOf[graft.functions.IpRangeProbeLists]
        case _ => false
      }
      assert(ipGen, "the IP anti screen must ride the ball-bound probes")
      assert(ipAnti.collect().map(_.getLong(0)).toSeq === bruteIpAnti,
        "IP anti screen must be exact")
    } finally SqlAnn.unregisterIndex(spark, rangeDir)
  }

  test("cosine semi screen over a unit-norm-attested table rides the bridge") {
    cosIndex
    graft.GraftExtensions.register(spark)
    spark.read.parquet(cosDir).createOrReplaceTempView("sqlann_csem")
    localQView("sqlann_csem_q", Seq(100L -> ncorner(0), 101L -> ncorner(3)))
    val sql =
      s"""SELECT t.id FROM sqlann_csem t WHERE EXISTS (
         |  SELECT 1 FROM sqlann_csem_q q
         |  WHERE cosine_distance(t.vec, q.qvec) <= 0.1) ORDER BY t.id""".stripMargin
    val brute = spark.sql(sql).collect().map(_.getLong(0)).toSeq
    SqlAnn.registerIndex(spark, cosDir, cosIndex.centroids.value,
      nprobe = 2, radii = Some(cosIndex.listRadii), unitNorm = true)
    try {
      val df = spark.sql(sql)
      assert(hasCosineGenerate(df),
        "the cosine semi screen must ride the unit-norm bridge probes")
      assert(corpusScan(df).metadata.getOrElse("PartitionFilters", "")
        .contains("list_id"), "the semi flavor prunes the corpus scan")
      assert(df.collect().map(_.getLong(0)).toSeq === brute,
        "cosine semi screen must be exact (bridge bound + kept predicate)")
    } finally SqlAnn.unregisterIndex(spark, cosDir)
  }
}
