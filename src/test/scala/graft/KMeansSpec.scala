package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.expressions.VectorSumAgg
import graft.vector.Centroids

class KMeansSpec extends AnyFunSuite {
  lazy val spark: SparkSession = GraftSession.local(4, "graft-test")
  val sf = "/root/testdata/sf0.001"

  test("VectorSumAgg sums element-wise and partial-merges") {
    import spark.implicits._
    val df = Seq((1, Array(1.0, 2.0)), (1, Array(10.0, 20.0)), (2, Array(5.0, 5.0)))
      .toDF("k", "v").repartition(4)
    val got = df.groupBy("k").agg(VectorSumAgg.vectorSum(col("v")).as("s"))
      .collect().map(r => r.getInt(0) -> r.getSeq[Double](1)).toMap
    assert(got(1) === Seq(11.0, 22.0))
    assert(got(2) === Seq(5.0, 5.0))
  }

  test("deterministic lloyd decreases inertia and partitions all vectors") {
    val emb = Tables.embeddings(spark, sf)
    def inertia(iters: Int): Double = {
      val (cents, assigned) = Centroids.lloyd(emb, k = 4, iters = iters)
      assigned.select(sum(pow(Centroids.nearestDist(col("embedding"), cents), 2)))
        .head().getDouble(0)
    }
    val i1 = inertia(1)
    val i5 = inertia(5)
    assert(i5 <= i1 + 1e-9, s"inertia should not increase: $i1 -> $i5")
  }

  test("MLlib KMeans path assigns every vector to one of k clusters") {
    val emb = Tables.embeddings(spark, sf)
    val (cents, assigned) = Centroids.mllibKMeans(emb, k = 4, maxIter = 10)
    assert(cents.length === 4)
    assert(assigned.count() === emb.count())
    assert(assigned.select("shard").distinct().count() <= 4)
    // MLlib centroids give competitive inertia vs deterministic lloyd
    val mlInertia = assigned
      .select(sum(pow(Centroids.nearestDist(col("embedding"), cents), 2)))
      .head().getDouble(0)
    val (lc, la) = Centroids.lloyd(emb, k = 4, iters = 5)
    val lloydInertia = la
      .select(sum(pow(Centroids.nearestDist(col("embedding"), lc), 2)))
      .head().getDouble(0)
    assert(mlInertia <= lloydInertia * 1.1)
  }
}
