package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.Expression

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

  /** [[graft.functions.text.BpePattern]] as a SQL string literal (its
    * quotes and regex backslashes escaped). */
  private def bpeSqlPattern: String =
    "'" + text.BpePattern.replace("\\", "\\\\").replace("'", "\\'") + "'"

  private val injections: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "l2_distance" -> (es => VectorDistance(es(0), es(1), Metric.L2)),
    "ip_distance" -> (es => VectorDistance(es(0), es(1), Metric.InnerProduct)),
    "cosine_distance" -> (es => VectorDistance(es(0), es(1), Metric.Cosine)),
    "normalize_vector" -> (es => NormalizeVector(es(0))),
    "minhash_signature" -> (es => MinHashSignature(es(0), 64, 42L)),
    "simhash64" -> (es => SimHash64(es(0), 42L)),
    "sq8_pack" -> (es => Sq8Pack(es(0), es(1))),
    "sq8_distance" -> (es => Sq8Distance(es(0), es(1), es(2), Metric.L2)),
    "zvalue" -> (es => graft.operators.ZValue(es(0), es(1), 16)),
    "char_hist" -> (es => CharHist(es(0))),
    "hist_l1" -> (es => HistL1(es(0), es(1))),
    // text pipeline: same composed-builtin bodies as graft.functions.text
    "graft_tokenize" -> sqlMacro(
      "regexp_extract_all(lower(__arg0), '[a-z0-9]+', 0)") _,
    "word_ngrams" -> sqlMacro(
      """CASE WHEN size(__arg0) < __arg1 THEN cast(array() as array<string>)
        |ELSE transform(sequence(0, size(__arg0) - __arg1),
        |               i -> concat_ws(' ', slice(__arg0, i + 1, __arg1))) END"""
        .stripMargin) _,
    "lsh_bands" -> sqlMacro(
      """transform(sequence(0, __arg2 - 1),
        |  b -> xxhash64(b, slice(__arg0, b * (__arg1 div __arg2) + 1,
        |                         __arg1 div __arg2)))""".stripMargin) _,
    "doc_fingerprint" -> sqlMacro(
      """aggregate(
        |  transform(filter(split(__arg0, ''), ch -> ch != ''),
        |            ch -> cast(ascii(ch) as bigint)),
        |  0L, (acc, x) -> (acc * 31 + x) % 1000000007)""".stripMargin) _,
    "token_count" -> sqlMacro(
      "size(regexp_extract_all(lower(__arg0), '[a-z0-9]+', 0))") _,
    "token_count_bpe" -> sqlMacro(
      s"size(regexp_extract_all(__arg0, $bpeSqlPattern, 0))") _)

  /** Register on an existing session (temp functions, same expressions). */
  def register(spark: SparkSession): Unit =
    injections.foreach { case (name, builder) =>
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        name, builder, "scala_udf")
    }
}
