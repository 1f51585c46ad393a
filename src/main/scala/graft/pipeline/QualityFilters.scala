package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.text

/**
 * Repetition-based quality filtering and keyword extraction — the
 * Gopher-rules family of cheap corpus filters (Rae et al. 2021, "Scaling
 * Language Models", table A1) re-expressed as Catalyst plans. The
 * reference engine has no text surface; these are pipeline-extension
 * operators over the `documents` table.
 *
 * Scale shape: every metric is either a per-row array expression (zero
 * shuffle) or an explode -> two-stage aggregation (partial map-side agg,
 * one shuffle on (doc_id, term), one on doc_id) — both the canonical
 * 100 TB-safe forms. Nothing collects to the driver; corpus-wide stats
 * (N, df) travel as 1-row / vocab-sized broadcast joins.
 */
object QualityFilters {

  /** Thresholds for the keep/drop verdict — the Gopher values adapted to
    * word-level metrics (no newlines in this corpus, so the line-based
    * rules degenerate and are omitted). */
  val MaxTopUnigramFrac = 0.10
  val MaxTopBigramFrac = 0.08
  val MinDistinctRatio = 0.40

  /** Multiplicity of the most frequent element of a string array, as a
    * pure per-row expression: sort, then the longest equal-adjacent run
    * IS the mode's count. `aggregate` carries (prev, run, best) through
    * one pass over the sorted array — no explode, no shuffle, which is
    * what lets [[repetitionOk]] run on an unbounded stream. Empty array
    * -> 0; null array -> null (same as the sort). */
  private def topElementCount(arr: Column): Column =
    aggregate(
      array_sort(arr),
      struct(lit("").as("prev"), lit(0L).as("run"), lit(0L).as("best")),
      (acc, x) => {
        val run = when(x === acc("prev"), acc("run") + 1L).otherwise(lit(1L))
        struct(x.as("prev"), run.as("run"),
          greatest(acc("best"), run).as("best"))
      },
      acc => acc("best"))

  /**
   * The [[repetitionMetrics]] `rep_ok` verdict as ONE per-row expression —
   * zero shuffle, zero state, so a streaming ingest screen can apply the
   * SAME Gopher gate the batch pipeline applies (the equality is pinned by
   * a differential spec). The batch form stays the right choice for batch
   * audits (its two-stage aggregation exposes the component metrics);
   * this form exists for row-at-a-time contexts.
   */
  def repetitionOk(textCol: Column): Column = {
    val toks = text.tokenize(textCol)
    val n = size(toks).cast("long")
    val nd = size(array_distinct(toks)).cast("long")
    val topU = topElementCount(toks)
    val topB = topElementCount(text.word_ngrams(toks, 2))
    def ratio(num: Column, denom: Column): Column =
      when(denom > 0, num.cast("double") / denom.cast("double")).otherwise(0.0)
    ratio(nd, n) >= MinDistinctRatio &&
      ratio(coalesce(topU, lit(0L)), n) <= MaxTopUnigramFrac &&
      ratio(coalesce(topB, lit(0L)), n - 1) <= MaxTopBigramFrac
  }

  /**
   * Per-document repetition metrics:
   *  - `distinct_ratio`  — type/token ratio, a per-row array expression;
   *  - `top_unigram_frac` — share of the most frequent token;
   *  - `top_bigram_frac`  — share of the most frequent word bigram;
   *  - `rep_ok`           — conjunction of the thresholds above.
   * Documents with fewer than 2 tokens get bigram frac 0 (no bigrams).
   */
  def repetitionMetrics(docs: DataFrame,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    // pin the tokenized projection: three consumers (unigram branch,
    // bigram branch, final join) and Spark has no cross-branch CSE — an
    // uncached base re-runs the hottest regex pass over the full corpus
    // text once per branch
    val base = Dedup.persistOnce(docs.select(
      col(idCol),
      text.tokenize(col(textCol)).as("toks"))
      .withColumn("n_tokens", size(col("toks")).cast("long"))
      .withColumn("n_distinct", size(array_distinct(col("toks"))).cast("long")))

    def topCount(grams: Column, out: String): DataFrame = base
      .select(col(idCol), explode(grams).as("g"))
      .groupBy(col(idCol), col("g")).agg(count(lit(1)).as("cnt"))
      .groupBy(col(idCol)).agg(max("cnt").as(out))
    val uni = topCount(base("toks"), "top_uni")
    val bi = topCount(text.word_ngrams(base("toks"), 2), "top_bi")

    def ratio(num: Column, denom: Column): Column =
      when(denom > 0, num.cast("double") / denom.cast("double")).otherwise(0.0)

    base
      .join(uni, Seq(idCol), "left")
      .join(bi, Seq(idCol), "left")
      .select(
        col(idCol),
        col("n_tokens"),
        col("n_distinct"),
        ratio(col("n_distinct"), col("n_tokens")).as("distinct_ratio"),
        ratio(coalesce(col("top_uni"), lit(0L)), col("n_tokens"))
          .as("top_unigram_frac"),
        ratio(coalesce(col("top_bi"), lit(0L)), col("n_tokens") - 1)
          .as("top_bigram_frac"))
      .withColumn("rep_ok",
        col("distinct_ratio") >= MinDistinctRatio &&
          col("top_unigram_frac") <= MaxTopUnigramFrac &&
          col("top_bigram_frac") <= MaxTopBigramFrac)
  }

  /**
   * Longest consecutive identical-token run per document — the
   * gaps-and-islands form: posexplode preserves positions, a `lag`
   * window marks run breaks, a running sum names each island, and two
   * partial-agg stages collapse islands to lengths and docs to the max.
   * Everything shuffles on doc_id only (token positions stay inside
   * their doc's partition), so the plan is a per-doc sort, not a global
   * one. Empty docs survive with max_run 0 via the join-back.
   */
  def maxTokenRun(docs: DataFrame,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val x = docs.select(col(idCol),
      posexplode(text.tokenize(col(textCol))).as(Seq("pos", "tok")))
    val wOrd = Window.partitionBy(idCol).orderBy("pos")
    val runs = x
      .withColumn("brk",
        when(lag(col("tok"), 1).over(wOrd) === col("tok"), 0).otherwise(1))
      .withColumn("grp", sum("brk").over(wOrd))
      .groupBy(col(idCol), col("grp")).agg(count(lit(1)).as("run_len"))
      .groupBy(idCol).agg(max("run_len").as("mr"))
    docs.select(col(idCol))
      .join(runs, Seq(idCol), "left")
      .select(col(idCol), coalesce(col("mr"), lit(0L)).as("max_run"))
  }

  /**
   * Composed curation verdict — the full cleaning pipeline in one plan:
   * exact-dedup survivor flag (min doc_id per text), repetition gate
   * ([[repetitionMetrics]]), and the [[TextAnalysis.qualityScore]]
   * threshold, AND-ed into a final `keep`. One row per input document so
   * rejected docs stay visible with their failure reasons — the audit
   * shape a curation run needs. Three doc_id equi-joins over the
   * aggregation outputs; nothing leaves the cluster.
   */
  def cleanVerdict(docs: DataFrame, minQuality: Double = 0.5): DataFrame = {
    val keep = Dedup.exact(docs)
      .select(col("keep_id").as("doc_id"), lit(true).as("dedup_keep"))
    val rep = repetitionMetrics(docs).select("doc_id", "rep_ok")
    val qual = docs.select(col("doc_id"),
      TextAnalysis.qualityScore(col("text")).as("quality"))
    docs.select("doc_id", "lang")
      .join(keep, Seq("doc_id"), "left")
      .join(rep, Seq("doc_id"))
      .join(qual, Seq("doc_id"))
      .select(col("doc_id"), col("lang"),
        coalesce(col("dedup_keep"), lit(false)).as("dedup_keep"),
        col("rep_ok"),
        // null text scores a NULL quality; the quality stage owns that
        // failure (verdict false, never a NULL audit cell) — the same
        // rule Curation.curate and the streaming screens apply
        coalesce(col("quality") >= minQuality, lit(false)).as("quality_ok"))
      .withColumn("keep",
        col("dedup_keep") && col("rep_ok") && col("quality_ok"))
  }

  /**
   * Top-k keywords per document by a tf-rarity score with EXACT integer
   * arithmetic: `score = cnt * (N - df)` where `cnt` is the in-doc term
   * count, `N` the corpus size and `df` the term's document frequency.
   * Rank-equivalent to tf-idf with the rational surrogate idf (N-df)/N
   * (both factors are monotone the same way), and — unlike ln(N/df) —
   * bit-reproducible across engines, so the oracle can replay it.
   *
   * Ties rank deterministically by term string ascending. `N` travels as
   * a 1-row cross join (broadcast by AQE), `df` as an equi-join on term —
   * vocab-sized, broadcast in practice.
   */
  def tfidfKeywords(docs: DataFrame, k: Int = 3,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val terms = docs
      .select(col(idCol), explode(text.tokenize(col(textCol))).as("term"))
      .groupBy(col(idCol), col("term")).agg(count(lit(1)).as("cnt"))

    val n = docs.agg(count(lit(1)).as("n_docs"))
    val df = terms.groupBy("term").agg(count(lit(1)).as("df"))

    val w = Window.partitionBy(idCol)
      .orderBy(col("score").desc, col("term").asc)
    terms
      .join(df, "term")
      .crossJoin(broadcast(n))
      .withColumn("score", col("cnt") * (col("n_docs") - col("df")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col(idCol), col("rank"), col("term"), col("cnt"), col("df"),
        col("score"))
  }
}
