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
}
