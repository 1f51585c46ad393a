package graft

import org.apache.spark.sql.functions._

class GraftExtensionsSpec extends SparkSpec {

  test("SQL surface: distance and text functions callable from spark.sql") {
    GraftExtensions.register(spark)
    val row = spark.sql(
      """SELECT
        |  l2_distance(array(CAST(1 AS FLOAT), CAST(2 AS FLOAT)),
        |              array(CAST(4 AS FLOAT), CAST(6 AS FLOAT))) AS l2,
        |  ip_distance(array(CAST(1 AS FLOAT), CAST(2 AS FLOAT)),
        |              array(CAST(4 AS FLOAT), CAST(6 AS FLOAT))) AS ip,
        |  cosine_distance(array(CAST(1 AS FLOAT), CAST(0 AS FLOAT)),
        |                  array(CAST(1 AS FLOAT), CAST(0 AS FLOAT))) AS cos,
        |  simhash64(array('a', 'b')) AS sh
        |""".stripMargin).head()
    assert(row.getDouble(0) === 25.0)
    assert(row.getDouble(1) === -16.0)
    assert(math.abs(row.getDouble(2)) < 1e-7)
    assert(row.getLong(3) !== 0L)
  }

  test("SQL surface: quantization and layout kernels callable from spark.sql") {
    GraftExtensions.register(spark)
    val row = spark.sql(
      """SELECT
        |  sq8_distance(array(CAST(0.5 AS FLOAT), CAST(-0.25 AS FLOAT)),
        |    sq8_pack(array(CAST(0.5 AS FLOAT), CAST(-0.25 AS FLOAT)),
        |             CAST(254 AS DOUBLE)),
        |    CAST(254 AS DOUBLE)) AS self_dist,
        |  zvalue(CAST(10 AS BIGINT), CAST(5 AS BIGINT)) AS z
        |""".stripMargin).head()
    // codes 127 and -64 dequantize to 0.5 and ~-0.2519..., so the self
    // distance is the (tiny) quantization error, not zero
    assert(row.getDouble(0) >= 0.0 && row.getDouble(0) < 1e-4)
    assert(row.getLong(1) === graft.operators.ZOrderKernels.interleave(10L, 5L, 16))
  }

  test("SQL surface: edit-distance count-filter kernels callable from spark.sql") {
    GraftExtensions.register(spark)
    val row = spark.sql(
      """SELECT
        |  hist_l1(char_hist('abc'), char_hist('abd')) AS l1_one_sub,
        |  hist_l1(char_hist('abc'), char_hist('abc')) AS l1_same,
        |  length(char_hist('abc')) AS hist_len
        |""".stripMargin).head()
    assert(row.getInt(0) === 2) // one substitution moves two bins by one
    assert(row.getInt(1) === 0)
    assert(row.getInt(2) === 256)
  }

  test("SQL surface: text pipeline functions mirror their Column twins") {
    GraftExtensions.register(spark)
    val row = spark.sql(
      """SELECT
        |  graft_tokenize('Hello, World 42!') AS toks,
        |  word_ngrams(graft_tokenize('a b c d'), 2) AS grams,
        |  doc_fingerprint('abc') AS fp,
        |  token_count('Hello, World 42!') AS tc,
        |  token_count_bpe('Hello, World 42!') AS bpe,
        |  lsh_bands(minhash_signature(graft_tokenize('a b c')), 64, 16) AS bands
        |""".stripMargin).head()
    assert(row.getSeq[String](0) === Seq("hello", "world", "42"))
    assert(row.getSeq[String](1) === Seq("a b", "b c", "c d"))
    // rolling hash of "abc": ((97*31+98)*31+99) mod 1e9+7
    assert(row.getLong(2) === ((97L * 31 + 98) * 31 + 99) % 1000000007L)
    assert(row.getInt(3) === 3)
    assert(row.getInt(4) === 5) // Hello | , | (sp)World | (sp)42 | !
    assert(row.getSeq[Long](5).length === 16)
    // the SQL twins must agree with the Column API versions on real text
    import graft.functions.text
    val s = "The quick brown fox, 99 times! Déjà vu."
    val twins = spark.sql(
      s"""SELECT doc_fingerprint('$s') AS fp, token_count('$s') AS tc,
         |       token_count_bpe("$s") AS bpe""".stripMargin).head()
    val cols = vectorsDF(Seq((1L, Array(0f)))).select(
      text.fingerprint(lit(s)), text.token_count(lit(s)), text.token_count_bpe(lit(s)))
      .head()
    assert(twins.getLong(0) === cols.getLong(0))
    assert(twins.getInt(1) === cols.getInt(1))
    assert(twins.getInt(2) === cols.getInt(2))
  }

  test("SQL surface: ORDER BY distance LIMIT k runs the kNN shape in SQL") {
    GraftExtensions.register(spark)
    vectorsDF(randomVectors(100, 8)).createOrReplaceTempView("vecs")
    val res = spark.sql(
      """SELECT v.id, l2_distance(q.vec, v.vec) AS dist
        |FROM vecs v CROSS JOIN (SELECT vec FROM vecs WHERE id = 0) q
        |ORDER BY dist, id LIMIT 5""".stripMargin).collect()
    assert(res.length === 5)
    assert(res.head.getLong(0) === 0L) // self-match first
    assert(res.head.getDouble(1) === 0.0)
  }

  test("SQL surface: wrong arity fails loudly instead of ignoring or crashing raw") {
    GraftExtensions.register(spark)
    // extra args were silently IGNORED (seed/numHashes dropped); missing
    // ones crashed with a raw IndexOutOfBoundsException
    val extra = intercept[Exception](
      spark.sql("SELECT l2_distance(array(CAST(1 AS FLOAT)))").head())
    assert(extra.getMessage.contains("argument"), extra.getMessage)
    val tooMany = intercept[Exception](
      spark.sql("SELECT char_hist('a', 'b')").head())
    assert(tooMany.getMessage.contains("argument"), tooMany.getMessage)
  }

  test("SQL surface: minhash_signature honors numHashes and seed arguments") {
    GraftExtensions.register(spark)
    val row = spark.sql(
      """SELECT
        |  size(minhash_signature(array('a','b','c'))) AS n_default,
        |  size(minhash_signature(array('a','b','c'), 128)) AS n_128,
        |  minhash_signature(array('a','b','c'), 64, 42)[0] AS h_seed42,
        |  minhash_signature(array('a','b','c'), 64, 7)[0] AS h_seed7
        |""".stripMargin).head()
    assert(row.getInt(0) === 64)
    assert(row.getInt(1) === 128, "numHashes argument was silently ignored")
    assert(row.getLong(2) !== row.getLong(3), "seed argument was silently ignored")
  }

  test("SQL surface: lsh_bands enforces the divisibility guard like its Column twin") {
    GraftExtensions.register(spark)
    val e = intercept[Exception](
      spark.sql("SELECT lsh_bands(minhash_signature(array('a')), 64, 7)").head())
    assert(e.getMessage.contains("divide"), e.getMessage)
    // and the valid shape still bands
    val ok = spark.sql(
      "SELECT size(lsh_bands(minhash_signature(array('a','b')), 64, 16)) AS n").head()
    assert(ok.getInt(0) === 16)
  }

  test("SQL surface: word_ngrams runs the native kernel and validates n") {
    GraftExtensions.register(spark)
    val row = spark.sql(
      "SELECT word_ngrams(array('a','b','c'), 2) AS g").head()
    assert(row.getSeq[String](0) === Seq("a b", "b c"))
    val bad = intercept[Exception](
      spark.sql("SELECT word_ngrams(array('a'), 0)").head())
    assert(bad.getMessage.contains("positive"), bad.getMessage)
  }
}
