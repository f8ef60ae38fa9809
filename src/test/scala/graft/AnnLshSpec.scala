package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class AnnLshSpec extends AnyFunSuite {
  lazy val spark: SparkSession = GraftSession.local(4, "graft-test")
  val sf = "/root/testdata/sf0.001"

  test("LSH top-k achieves reasonable recall@5 against exact top-k") {
    val lsh = SparkEntry.queries("ann_lsh_topk")(spark, sf)
      .select("query_id", "vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = SparkEntry.queries("vdb_knn_batch")(spark, sf)
      .select("query_id", "vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (lsh intersect exact).size.toDouble / exact.size
    // random-hyperplane LSH on near-random unit vectors: recall well
    // above chance (5/499 ~ 1%) proves the bucketing works
    assert(recall > 0.15, s"recall@5 = $recall")
  }

  test("LSH candidates never include the query itself") {
    val df = SparkEntry.queries("ann_lsh_topk")(spark, sf)
    assert(df.filter(col("query_id") === col("vec_id")).count() === 0)
  }
}
