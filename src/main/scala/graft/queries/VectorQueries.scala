package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{Metric, Tables}
import graft.functions.vector
import graft.index.Knn

/**
 * Driver-contract query entries for the vector-search operators
 * (SURVEY §2: D1-D4, S1, S7) with DuckDB oracle SQL. All distances are
 * double, accumulated sequentially, so Spark and DuckDB agree bitwise.
 */
object VectorQueries {

  private val K = 10
  private val NQ = 10 // embeddings with vec_id < NQ are the query batch

  private def emb(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "embeddings")

  /** Index-build memo: an index is built ONCE per (dir, params) and the
    * query entries then measure search, not train — the serving shape
    * (deterministic seed-42 training makes the cache transparent). */
  private val indexCache =
    new java.util.concurrent.ConcurrentHashMap[String, AnyRef]()

  private def cached[T <: AnyRef](key: String)(build: => T): T =
    indexCache.computeIfAbsent(key, _ => build).asInstanceOf[T]

  private[queries] def ivfIndex(spark: SparkSession, dir: String, nlist: Int): graft.index.IvfFlatIndex =
    cached(s"ivf:$dir:$nlist") {
      val e = emb(spark, dir)
      graft.index.IvfFlatIndex.build(spark,
        e.select(col("vec_id").as("id"), col("embedding").as("vec")), nlist)
    }

  private def ivfpqIndex(spark: SparkSession, dir: String, nlist: Int, m: Int): graft.index.IvfPqIndex =
    cached(s"ivfpq:$dir:$nlist:$m") {
      val e = emb(spark, dir)
      graft.index.IvfPqIndex.build(spark,
        e.select(col("vec_id").as("id"), col("embedding").as("vec")), nlist, m)
    }

  private def knnExact(metric: Metric.Value)(spark: SparkSession, dir: String): DataFrame = {
    val e = emb(spark, dir)
    val queries = e.filter(col("vec_id") < NQ)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val vectors = e.select(col("vec_id").as("id"), col("embedding").as("vec"))
    Knn.exact(queries, vectors, K, metric).orderBy("qid", "rank")
  }

  /** D4 exploded to (vec_id, pos, component) rows — raw ARRAY outputs crash
    * the driver's pandas-based hash compare, and the exploded projection is
    * strictly stronger anyway (position-wise equality, not just set). */
  private def normalizeVectors(spark: SparkSession, dir: String): DataFrame =
    emb(spark, dir)
      .select(col("vec_id"),
        posexplode(vector.normalize_vector(col("embedding"))).as(Seq("pos", "component")))
      .orderBy("vec_id", "pos")

  /**
   * Argmin assignment (S7) against a deterministic centroid set: the 16
   * lowest-id embeddings double as "centroids" so the oracle can rebuild
   * them in SQL. Ties keep the lowest centroid id, like the reference's
   * strict `<` scan (kernels.cuh:338-347).
   */
  private def assignLists(spark: SparkSession, dir: String): DataFrame = {
    val e = emb(spark, dir)
    val cents = e.filter(col("vec_id") < 16)
      .orderBy("vec_id")
      .select(col("vec_id"), col("embedding"))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    val bc = spark.sparkContext.broadcast(cents.map(_._2))
    val cids = cents.map(_._1)
    val cidCol = element_at(
      array(cids.toIndexedSeq.map(lit): _*),
      vector.argmin_centroid(col("embedding"), bc) + 1)
    e.select(col("vec_id"), cidCol.as("list_id")).orderBy("vec_id")
  }

  /**
   * Full IVF pipeline (S2-S6 + S7/S8 train) end-to-end: build an index over
   * the embeddings and search with nprobe = nlist, which must equal exact
   * brute force (the §5.1 differential) — making the DuckDB exact-kNN SQL a
   * valid oracle for the entire train -> assign -> probe -> prune -> top-k
   * plan.
   */
  private def ivfSearchFull(spark: SparkSession, dir: String): DataFrame = {
    import graft.SearchParams
    val e = emb(spark, dir)
    val queries = e.filter(col("vec_id") < NQ)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    ivfIndex(spark, dir, 16)
      .search(queries, SearchParams(k = K, nprobe = 16)).orderBy("qid", "rank")
  }

  /**
   * Large-batch IVF search through the fully-distributed join-pruned path
   * (ForceJoin — no driver snapshot, the shape for unbounded query sets);
   * with nprobe = nlist it is exhaustive, so the exact-kNN SQL is its
   * oracle.
   */
  private def ivfSearchBatchAll(spark: SparkSession, dir: String): DataFrame = {
    import graft.SearchParams
    import graft.index.IvfFlatIndex
    val e = emb(spark, dir)
    val queries = e.filter(col("vec_id") < 300)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    ivfIndex(spark, dir, 16)
      .searchWhere(queries, SearchParams(k = 5, nprobe = 16), None, IvfFlatIndex.ForceJoin)
      .orderBy("qid", "rank")
  }

  /** Pruned IVF probe (nprobe < nlist) — approximate, so rows-only checked;
    * the recall floor vs exact is asserted in IvfFlatIndexSpec. */
  private def ivfSearchProbe(spark: SparkSession, dir: String): DataFrame = {
    import graft.SearchParams
    val e = emb(spark, dir)
    val queries = e.filter(col("vec_id") < NQ)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    ivfIndex(spark, dir, 16)
      .search(queries, SearchParams(k = K, nprobe = 4)).orderBy("qid", "rank")
  }

  /**
   * IVF-PQ with exhaustive probe + full exact rerank (S10-S13): ADC
   * prefilter then exact re-scoring over every candidate reduces to exact
   * kNN, so the same DuckDB oracle checks the whole PQ pipeline
   * (train codebooks -> encode -> ADC tables -> lookup-sum -> rerank).
   */
  private def ivfpqSearchRerank(spark: SparkSession, dir: String): DataFrame = {
    import graft.SearchParams
    val e = emb(spark, dir)
    val queries = e.filter(col("vec_id") < NQ)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    ivfpqIndex(spark, dir, 16, 8)
      .search(queries, SearchParams(k = K, nprobe = 16), rerankK = 100000)
      .orderBy("qid", "rank")
  }

  /** ADC-only IVF-PQ search — approximate, rows-only checked (recall floor
    * asserted in IvfPqIndexSpec). */
  private def ivfpqSearchAdc(spark: SparkSession, dir: String): DataFrame = {
    import graft.SearchParams
    val e = emb(spark, dir)
    val queries = e.filter(col("vec_id") < NQ)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    ivfpqIndex(spark, dir, 16, 8)
      .search(queries, SearchParams(k = K, nprobe = 4)).orderBy("qid", "rank")
  }

  /**
   * The reference's canonical bench shape (bench/benchmark.cpp:28-43:
   * 1M x 128D, nlist 1024, nprobe 10, k 10, 10k queries) scaled 1/5 to fit
   * the local bench budget: 200k x 128D, nlist 256, nprobe 10, k 10, 1k
   * queries. Vectors are generated deterministically from xxhash64 of the
   * row id — no files needed, same corpus every run. Rows-only (the IVF
   * machinery itself is oracle-checked by the sf entries).
   */
  private def vectorScaleBench(spark: SparkSession, dir: String): DataFrame = {
    import graft.SearchParams
    val dim = 128
    val n = 200000
    val vecExpr = transform(
      sequence(lit(0), lit(dim - 1)),
      d => (pmod(xxhash64(col("id") * dim + d), lit(2000)) / 1000.0 - 1.0).cast("float"))
    val index = cached(s"scale:$n:$dim") {
      val corpus = spark.range(n).select(col("id"), vecExpr.as("vec"))
      val idx = graft.index.IvfFlatIndex.build(spark, corpus, nlist = 256, maxTrain = 20000)
      // materialize the assigned corpus once — the in-memory stand-in for
      // an epoch on disk; otherwise every search regenerates 25.6M
      // xxhash components AND re-runs the 200k x 256-centroid argmin
      idx.vectors.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK).count()
      idx
    }
    // two-step select: vecExpr must hash the OFFSET id, or the "queries"
    // would be bit-identical copies of corpus vectors 0..999
    val queries = spark.range(1000)
      .select((col("id") + 5000000L).as("id"))
      .select(col("id").as("qid"), vecExpr.as("qvec"))
    index.search(queries, SearchParams(k = 10, nprobe = 10))
  }

  // --- DuckDB oracle fragments -------------------------------------------

  import OracleFragments.{sqlL2, sqlIp, sqlCosine}

  private def knnOracle(distExpr: String): String =
    s"""WITH q AS (SELECT vec_id AS qid, embedding AS qv FROM embeddings WHERE vec_id < $NQ),
       |d AS (SELECT q.qid, v.vec_id AS id, ${distExpr} AS dist FROM q, embeddings v),
       |r AS (SELECT qid, id, dist,
       |        CAST(row_number() OVER (PARTITION BY qid ORDER BY dist, id) AS INT) AS rank
       |      FROM d)
       |SELECT qid, id, dist, rank FROM r WHERE rank <= $K ORDER BY qid, rank""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "knn_exact_l2" -> knnExact(Metric.L2) _,
    "knn_exact_ip" -> knnExact(Metric.InnerProduct) _,
    "knn_exact_cosine" -> knnExact(Metric.Cosine) _,
    "normalize_vectors" -> (normalizeVectors _),
    "assign_lists" -> (assignLists _),
    "ivf_search_full" -> (ivfSearchFull _),
    "ivf_search_probe" -> (ivfSearchProbe _),
    "ivf_search_batch_all" -> (ivfSearchBatchAll _),
    "ivfpq_search_rerank" -> (ivfpqSearchRerank _),
    "ivfpq_search_adc" -> (ivfpqSearchAdc _),
    "vector_scale_bench" -> (vectorScaleBench _),
  )

  val oracleSql: Map[String, String] = Map(
    "knn_exact_l2" -> knnOracle(sqlL2("q.qv", "v.embedding")),
    "knn_exact_ip" -> knnOracle(sqlIp("q.qv", "v.embedding")),
    "knn_exact_cosine" -> knnOracle(sqlCosine("q.qv", "v.embedding")),
    // nprobe = nlist makes IVF exhaustive, so exact kNN is the oracle
    "ivf_search_full" -> knnOracle(sqlL2("q.qv", "v.embedding")),
    // exhaustive probe + full exact rerank makes IVF-PQ exact too
    "ivfpq_search_rerank" -> knnOracle(sqlL2("q.qv", "v.embedding")),
    // join-pruned large-batch path, exhaustive probe == exact for ALL rows
    "ivf_search_batch_all" ->
      s"""WITH d AS (SELECT q.vec_id AS qid, v.vec_id AS id,
         |        ${sqlL2("q.embedding", "v.embedding")} AS dist
         |      FROM embeddings q, embeddings v WHERE q.vec_id < 300),
         |r AS (SELECT qid, id, dist,
         |        CAST(row_number() OVER (PARTITION BY qid ORDER BY dist, id) AS INT) AS rank
         |      FROM d)
         |SELECT qid, id, dist, rank FROM r WHERE rank <= 5 ORDER BY qid, rank""".stripMargin,
    // aligned unnests zip positionally in DuckDB => (pos, component) rows
    "normalize_vectors" ->
      """WITH n AS (SELECT vec_id, embedding,
        |  1.0 / sqrt(list_sum(list_transform(embedding, y -> CAST(y AS DOUBLE) * CAST(y AS DOUBLE))) + 1e-8) AS inv
        |  FROM embeddings)
        |SELECT vec_id,
        |       CAST(unnest(range(0, len(embedding))) AS INT) AS pos,
        |       unnest(list_transform(embedding, x -> CAST(CAST(x AS DOUBLE) * inv AS FLOAT))) AS component
        |FROM n ORDER BY vec_id, pos""".stripMargin,
    "assign_lists" ->
      s"""WITH c AS (SELECT vec_id AS cid, embedding AS cv FROM embeddings WHERE vec_id < 16),
         |d AS (SELECT v.vec_id, c.cid, ${sqlL2("v.embedding", "c.cv")} AS dist
         |      FROM embeddings v, c),
         |r AS (SELECT vec_id, cid,
         |        row_number() OVER (PARTITION BY vec_id ORDER BY dist, cid) AS rn
         |      FROM d)
         |SELECT vec_id, cid AS list_id FROM r WHERE rn = 1 ORDER BY vec_id""".stripMargin,
  )
}
