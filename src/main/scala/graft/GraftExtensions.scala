package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal}

import graft.functions._

/**
 * SQL surface: registers the engine's scalar expressions as SQL functions
 * so `spark.sql("SELECT l2_distance(a, b) ...")` works alongside the
 * programmatic API. Usable either via `GraftExtensions.register(spark)`
 * or as a `spark.sql.extensions` class
 * (`SparkSessionExtensions` injection).
 */
class GraftExtensions extends (org.apache.spark.sql.SparkSessionExtensions => Unit) {
  override def apply(ext: org.apache.spark.sql.SparkSessionExtensions): Unit =
    GraftExtensions.injections.foreach { case (name, builder) =>
      ext.injectFunction(
        (org.apache.spark.sql.catalyst.FunctionIdentifier(name),
          new org.apache.spark.sql.catalyst.expressions.ExpressionInfo("graft", name),
          builder))
    }
}

object GraftExtensions {

  /** Expand a SQL template (a macro body with `__arg<i>` placeholders)
    * into a catalyst expression with the call's arguments spliced in.
    * Spark 4's Column API builds ColumnNode trees that do NOT round-trip
    * into an analyzing plan, so the text functions' SQL-function twins
    * parse the same composed-builtin bodies directly — the parser emits
    * resolvable `UnresolvedFunction`/lambda nodes the analyzer finishes. */
  private def sqlMacro(template: String)(args: Seq[Expression]): Expression =
    org.apache.spark.sql.catalyst.parser.CatalystSqlParser
      .parseExpression(template).transformUp {
        case org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute(Seq(n))
            if n.startsWith("__arg") => args(n.drop("__arg".length).toInt)
        // inside a lambda body the parser wraps EVERY identifier as a
        // prospective lambda variable — placeholders included
        case org.apache.spark.sql.catalyst.expressions.UnresolvedNamedLambdaVariable(Seq(n))
            if n.startsWith("__arg") => args(n.drop("__arg".length).toInt)
      }

  /** Arity gate for every injection: extra arguments were previously
    * IGNORED (a `minhash_signature(toks, 128, 7)` silently computed the
    * 64-hash seed-42 default — signatures that match nothing built with
    * the requested parameters) and missing ones crashed analysis with a
    * raw IndexOutOfBoundsException. `arities` lists the accepted counts. */
  private def checked(name: String, arities: Set[Int])(
      build: Seq[Expression] => Expression): Seq[Expression] => Expression =
    es => {
      if (!arities.contains(es.length))
        throw new InvalidArgumentException(
          s"$name expects ${arities.toSeq.sorted.mkString(" or ")} argument(s), got ${es.length}")
      build(es)
    }

  /** Extract a foldable integer argument (SQL literal) or fail loudly —
    * the expression-level twins take these as constructor Ints, so a
    * non-literal here cannot be honored and must not be silently
    * defaulted. */
  private def litInt(name: String, arg: String, e: Expression): Int = e match {
    case Literal(v: Int, _) => v
    case Literal(v: Long, _) => v.toInt
    case Literal(v: Short, _) => v.toInt
    case Literal(v: Byte, _) => v.toInt
    case _ => throw new InvalidArgumentException(
      s"$name: $arg must be an integer literal, got ${e.sql}")
  }
  private def litLong(name: String, arg: String, e: Expression): Long = e match {
    case Literal(v: Long, _) => v
    case Literal(v: Int, _) => v.toLong
    case _ => throw new InvalidArgumentException(
      s"$name: $arg must be an integer literal, got ${e.sql}")
  }

  /** [[graft.functions.text.BpePattern]] as a SQL string literal (its
    * quotes and regex backslashes escaped). */
  private def bpeSqlPattern: String =
    "'" + text.BpePattern.replace("\\", "\\\\").replace("'", "\\'") + "'"

  private val injections: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "l2_distance" -> checked("l2_distance", Set(2))(es =>
      VectorDistance(es(0), es(1), Metric.L2)),
    "ip_distance" -> checked("ip_distance", Set(2))(es =>
      VectorDistance(es(0), es(1), Metric.InnerProduct)),
    "cosine_distance" -> checked("cosine_distance", Set(2))(es =>
      VectorDistance(es(0), es(1), Metric.Cosine)),
    "normalize_vector" -> checked("normalize_vector", Set(1))(es =>
      NormalizeVector(es(0))),
    // optional numHashes/seed now honored — they were silently ignored
    "minhash_signature" -> checked("minhash_signature", Set(1, 2, 3))(es =>
      MinHashSignature(es(0),
        if (es.length > 1) litInt("minhash_signature", "numHashes", es(1)) else 64,
        if (es.length > 2) litLong("minhash_signature", "seed", es(2)) else 42L)),
    "simhash64" -> checked("simhash64", Set(1, 2))(es =>
      SimHash64(es(0),
        if (es.length > 1) litLong("simhash64", "seed", es(1)) else 42L)),
    "sq8_pack" -> checked("sq8_pack", Set(2))(es => Sq8Pack(es(0), es(1))),
    "sq8_distance" -> checked("sq8_distance", Set(3))(es =>
      Sq8Distance(es(0), es(1), es(2), Metric.L2)),
    "zvalue" -> checked("zvalue", Set(2, 3))(es =>
      graft.operators.ZValue(es(0), es(1),
        if (es.length > 2) litInt("zvalue", "bits", es(2)) else 16)),
    "char_hist" -> checked("char_hist", Set(1))(es => CharHist(es(0))),
    "hist_l1" -> checked("hist_l1", Set(2))(es => HistL1(es(0), es(1))),
    // text pipeline: same composed-builtin bodies as graft.functions.text
    "graft_tokenize" -> checked("graft_tokenize", Set(1))(sqlMacro(
      "regexp_extract_all(lower(__arg0), '[a-z0-9]+', 0)") _),
    // native kernel, not a macro: the macro body spliced __arg0 three
    // times (two size() calls + the slice inside the lambda), re-running
    // an expensive input (e.g. graft_tokenize's regex pass) per
    // reference; the expression evaluates its child once and validates n
    "word_ngrams" -> checked("word_ngrams", Set(2))(es =>
      WordNgrams(es(0), litInt("word_ngrams", "n", es(1)))),
    "lsh_bands" -> checked("lsh_bands", Set(3))(es => {
      val numHashes = litInt("lsh_bands", "numHashes", es(1))
      val bands = litInt("lsh_bands", "bands", es(2))
      // the Column twin's guard, or the SQL surface silently drops the
      // trailing numHashes % bands signature rows and shifts the
      // (1/b)^(1/r) candidate S-curve
      if (bands <= 0 || numHashes % bands != 0)
        throw new InvalidArgumentException(
          s"lsh_bands: bands ($bands) must divide numHashes ($numHashes)")
      val r = numHashes / bands
      sqlMacro(
        s"""transform(sequence(0, ${bands - 1}),
           |  b -> xxhash64(b, slice(__arg0, b * $r + 1, $r)))""".stripMargin)(es)
    }),
    "doc_fingerprint" -> checked("doc_fingerprint", Set(1))(sqlMacro(
      """aggregate(
        |  transform(filter(split(__arg0, ''), ch -> ch != ''),
        |            ch -> cast(ascii(ch) as bigint)),
        |  0L, (acc, x) -> (acc * 31 + x) % 1000000007)""".stripMargin) _),
    "token_count" -> checked("token_count", Set(1))(sqlMacro(
      "size(regexp_extract_all(lower(__arg0), '[a-z0-9]+', 0))") _),
    "token_count_bpe" -> checked("token_count_bpe", Set(1))(sqlMacro(
      s"size(regexp_extract_all(__arg0, $bpeSqlPattern, 0))") _))

  /** Register on an existing session (temp functions, same expressions). */
  def register(spark: SparkSession): Unit =
    injections.foreach { case (name, builder) =>
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        name, builder, "scala_udf")
    }
}
