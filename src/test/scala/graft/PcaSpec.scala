package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.expressions.VectorExpressions._
import graft.vector.Pca

class PcaSpec extends AnyFunSuite {
  lazy val spark: SparkSession = GraftSession.local(4, "graft-test")
  val sf = "/root/testdata/sf0.001"

  /** 4 well-separated 64-d cluster centers + small noise: variance
    * concentrates in the 3-dim span of the centers, the regime PCA
    * exists for.
    */
  private def clustered = {
    val centers = Seq.tabulate(4)(c => Array.tabulate(64)(i =>
      if (i % 4 == c) 5.0 else 0.0))
    spark.range(0, 2000, 1, 8).select(col("id"),
      array((0 until 64).map { i =>
        val center = (0 until 4).map(c =>
          when(col("id") % 4 === c, lit(centers(c)(i))).otherwise(lit(0.0)))
          .reduce(_ + _)
        center + (rand(seed = 500 + i) - 0.5) * 0.2
      }: _*).as("embedding"))
  }

  test("axes are orthonormal with descending captured variance") {
    val df = clustered.cache()
    val m = Pca.fit(df, k = 8)
    // unit length + pairwise orthogonality
    for (a <- m.components.indices; b <- a until m.components.length) {
      val dot = m.components(a).zip(m.components(b)).map { case (x, y) => x * y }.sum
      val want = if (a == b) 1.0 else 0.0
      assert(math.abs(dot - want) < 1e-8, s"axes $a,$b dot $dot")
    }
    // variance captured per axis is non-increasing
    val proj = Pca.project(df, m).select(col("pca"))
    val vars = proj.select((0 until 8).map(j =>
      var_pop(element_at(col("pca"), j + 1)).as(s"v$j")): _*).head()
    val vs = (0 until 8).map(vars.getDouble)
    assert(vs.zip(vs.tail).forall { case (a, b) => a >= b - 1e-9 }, s"variances $vs")
    // the 3-dim center span dominates: first 3 axes carry most variance
    assert(vs.take(3).sum > vs.drop(3).sum * 5, s"variances $vs")
    df.unpersist()
  }

  test("reduced-space knn recovers full-dim neighbors on clustered data") {
    val df = clustered.cache()
    val m = Pca.fit(df, k = 8)
    val proj = Pca.project(df, m).cache()
    val q = df.filter(col("id") === 7).head().getSeq[Double](1).toArray
    val qp = proj.filter(col("id") === 7).select("pca").head().getSeq[Double](0).toArray
    def top(frame: org.apache.spark.sql.DataFrame, c: String, qv: Array[Double]) =
      frame.filter(col("id") =!= 7)
        .withColumn("s", cosineSim(col(c), typedlit(qv.toSeq)))
        .orderBy(desc("s"), col("id").asc).limit(10).collect().map(_.getLong(0)).toSet
    // within-cluster ordering is pure noise (the centers dominate), so
    // exact top-10 identity is not preserved — CLUSTER membership is
    // the structure PCA must keep: every reduced-space neighbor of a
    // cluster-3 query is itself cluster-3, exactly as in full dim
    val full = top(df, "embedding", q)
    val reduced = top(proj, "pca", qp)
    assert(full.forall(_ % 4 == 3), s"full-dim neighbors off-cluster: $full")
    assert(reduced.forall(_ % 4 == 3), s"reduced-space neighbors off-cluster: $reduced")
    // refit stability holds only where the spectrum separates: the
    // dominant (center-span) axes agree up to sign; the degenerate
    // noise axes may legitimately rotate between fits (near-equal
    // eigenvalues), so they are not asserted
    val m2 = Pca.fit(df, k = 8)
    (0 until 3).foreach { j =>
      val dot = m.components(j).zip(m2.components(j)).map { case (x, y) => x * y }.sum
      assert(math.abs(math.abs(dot) - 1.0) < 1e-6, s"dominant axis $j drifted: |dot|=$dot")
    }
    proj.unpersist(); df.unpersist()
  }

  test("driver query returns a full reduced-space top-10") {
    val rows = SparkEntry.queries("vdb_pca_knn")(spark, sf).collect()
    assert(rows.length === 10)
    val scores = rows.map(_.getDouble(1))
    assert(scores.toSeq == scores.toSeq.sortBy(x => -x))
  }
}
