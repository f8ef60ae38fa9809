package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

class ExtensionsSpec extends AnyFunSuite {
  lazy val spark: SparkSession = GraftSession.local(4, "graft-test")

  test("vector kernels are callable from SQL") {
    val r = spark.sql(
      """SELECT cosine_sim(array(1.0D, 0.0D), array(1.0D, 0.0D)) AS c,
        |       l2_dist(array(0.0D, 3.0D), array(4.0D, 0.0D)) AS d,
        |       dot_product(array(2.0D, 3.0D), array(4.0D, 5.0D)) AS p""".stripMargin)
      .head()
    assert(math.abs(r.getDouble(0) - 1.0) < 1e-12)
    assert(math.abs(r.getDouble(1) - 5.0) < 1e-12)
    assert(math.abs(r.getDouble(2) - 23.0) < 1e-12)
  }

  test("SQL kernels accept float arrays via implicit cast") {
    val r = spark.sql(
      """SELECT cosine_sim(CAST(array(1.0, 1.0) AS ARRAY<FLOAT>),
        |                  CAST(array(1.0, 0.0) AS ARRAY<FLOAT>)) AS c""".stripMargin).head()
    assert(math.abs(r.getDouble(0) - 1.0 / math.sqrt(2)) < 1e-12)
  }
}
