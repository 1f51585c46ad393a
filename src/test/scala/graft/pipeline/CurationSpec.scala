package graft.pipeline

import org.apache.spark.sql.Row

import graft.SparkSpec

/** Pins [[Curation.curate]]'s staged semantics: every drop reason fires on
  * a crafted doc, precedence is first-failing-stage, survivors get the
  * shared Lehmer shard, and the verdict is invariant under input
  * partitioning. */
class CurationSpec extends SparkSpec {

  // one doc per stage outcome (tokenizer is [a-z0-9]+ lowercase):
  //  1 unique good text                          -> kept
  //  2 punctuation junk (0 tokens)               -> quality
  //  3 one word repeated 25x (passes quality)    -> repetition
  //  4 good text, twin of 5                      -> kept (exact keeper)
  //  5 identical to 4                            -> exact_dup of 4
  //  6 24-word text, near-twin of 7              -> kept (near keeper)
  //  7 differs from 6 in the last word only      -> near_dup of 6
  //  8 contains the eval set's rare trigram,
  //    twin of 9                                 -> contaminated (keeper
  //                                                 survives to stage 4)
  //  9 identical to 8                            -> exact_dup of 8 (stage
  //                                                 precedence: exact
  //                                                 beats contaminated)
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
  private val contaminated =
    "researchers found the zebra quokka axolotl sequence appearing in " +
      "several benchmark answer keys during the annual evaluation of " +
      "language systems last winter"
  private val evalText =
    "the eval set contains zebra quokka axolotl patterns hidden within " +
      "questions that models must answer without prior exposure to " +
      "benchmark data collections online"

  private def fixture = {
    val s = spark
    import s.implicits._
    val corpus = Seq(
      1L -> goodA,
      2L -> "!!! ??? ---",
      3L -> Seq.fill(25)("spam").mkString(" "),
      4L -> goodB,
      5L -> goodB,
      6L -> (nearBase + "alphaend"),
      7L -> (nearBase + "betaend"),
      8L -> contaminated,
      9L -> contaminated).toDF("doc_id", "text")
    val eval = Seq(100L -> evalText).toDF("doc_id", "text")
    (corpus, eval)
  }

  private def collect(df: org.apache.spark.sql.DataFrame): Seq[Row] =
    df.orderBy("doc_id").collect().toSeq

  test("every stage fires, with first-failing-stage precedence") {
    val (corpus, eval) = fixture
    val out = collect(Curation.curate(corpus, eval))
    assert(out.map(_.getLong(0)) === Seq(1L, 2L, 3L, 4L, 5L, 6L, 7L, 8L, 9L),
      "one audit row per input doc")
    val byId = out.map(r => r.getLong(0) -> r).toMap
    def reason(id: Long): String =
      Option(byId(id).getAs[String]("drop_reason")).orNull
    def keep(id: Long): Boolean = byId(id).getAs[Boolean]("keep")

    assert(keep(1L) && reason(1L) == null)
    assert(!keep(2L) && reason(2L) === "quality")
    assert(!keep(3L) && reason(3L) === "repetition")
    assert(keep(4L) && reason(4L) == null)
    assert(!keep(5L) && reason(5L) === "exact_dup")
    assert(byId(5L).getAs[Long]("exact_dup_of") === 4L)
    assert(keep(6L) && reason(6L) == null)
    assert(!keep(7L) && reason(7L) === "near_dup")
    assert(byId(7L).getAs[Long]("near_dup_of") === 6L)
    assert(!keep(8L) && reason(8L) === "contaminated")
    // precedence: 9 is BOTH an exact twin of 8 and textually contaminated;
    // the exact stage dropped it first, so contamination never saw it
    assert(!keep(9L) && reason(9L) === "exact_dup")
    assert(byId(9L).getAs[Long]("exact_dup_of") === 8L)

    // kept docs get the shared Lehmer shard; dropped docs get null
    out.foreach { r =>
      val id = r.getLong(0)
      if (r.getAs[Boolean]("keep"))
        assert(r.getAs[Int]("shard") === ((id * 48271L + 11L) % 2147483647L % 8L).toInt)
      else assert(r.isNullAt(r.fieldIndex("shard")))
    }
  }

  test("verdict is invariant under input partitioning") {
    val (corpus, eval) = fixture
    val a = collect(Curation.curate(corpus, eval))
    val b = collect(Curation.curate(corpus.repartition(7), eval.repartition(3)))
    assert(a === b)
  }

  test("non-default id/text column names work end to end") {
    // contamination's output id column is always "doc_id"; curate must
    // map it back to the caller's idCol (a regression here fails with
    // AnalysisException in the assembly, not a wrong value)
    val s = spark
    import s.implicits._
    val corpus = Seq(1L -> goodA, 2L -> contaminated, 3L -> contaminated)
      .toDF("id", "body")
    val eval = Seq(100L -> evalText).toDF("id", "body")
    val out = Curation.curate(corpus, eval, idCol = "id", textCol = "body")
      .orderBy("id").collect()
    assert(out.map(_.getLong(0)) === Seq(1L, 2L, 3L))
    val byId = out.map(r => r.getLong(0) -> r).toMap
    assert(byId(1L).getAs[Boolean]("keep"))
    assert(byId(2L).getAs[String]("drop_reason") === "contaminated")
    assert(byId(3L).getAs[String]("drop_reason") === "exact_dup")
  }

  test("a doc whose only exact twin failed quality is NOT a duplicate") {
    val s = spark
    import s.implicits._
    // 11 repeats 3's repetitive text: 3 fails repetition, so 11 is the
    // MIN SURVIVING id of that text group — but it fails repetition
    // itself. Whereas 12/13 share goodA with no earlier failing twin:
    // staging must keep 12 and drop 13, never resurrect against docs the
    // quality gate removed.
    val rep = Seq.fill(25)("spam").mkString(" ")
    val corpus = Seq(3L -> rep, 11L -> rep, 12L -> goodA, 13L -> goodA)
      .toDF("doc_id", "text")
    val eval = Seq(100L -> evalText).toDF("doc_id", "text")
    val byId = collect(Curation.curate(corpus, eval))
      .map(r => r.getLong(0) -> r).toMap
    assert(byId(11L).getAs[String]("drop_reason") === "repetition")
    assert(byId(12L).getAs[Boolean]("keep"))
    assert(byId(13L).getAs[String]("drop_reason") === "exact_dup")
    assert(byId(13L).getAs[Long]("exact_dup_of") === 12L)
  }
}
