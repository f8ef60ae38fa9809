package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.expressions.VectorExpressions._
import graft.vector.{Opq, ProductQuantizer}

class OpqSpec extends AnyFunSuite {
  lazy val spark: SparkSession = GraftSession.local(4, "graft-test")

  test("eigenvalue allocation balances variance products across subspaces") {
    val vars = Array(100.0, 50.0, 10.0, 8.0, 4.0, 2.0, 1.0, 1.0)
    val perm = Opq.allocate(vars, numSubspaces = 4)
    assert(perm.sorted.sameElements(0 until 8), "a permutation")
    def spread(groups: Seq[Seq[Int]]): Double = {
      val sums = groups.map(_.map(d => math.log(vars(d))).sum)
      sums.max - sums.min
    }
    val allocated = perm.grouped(2).map(_.toSeq).toSeq
    val contiguous = (0 until 8).grouped(2).map(_.toSeq).toSeq
    assert(spread(allocated) < spread(contiguous) / 2,
      s"allocation $allocated not better than contiguous")
  }

  /** Correlated low-rank data: 8 latent coords with decaying scales,
    * mixed into all 64 raw dims by a fixed dense Gaussian matrix +
    * tiny noise. Raw contiguous PQ subspaces each see an 8-dim
    * correlated blob; OPQ's rotation recovers the latent axes and the
    * allocation spreads them one-per-subspace — the regime the
    * parametric OPQ exists for.
    */
  private def correlated = {
    val rnd = new scala.util.Random(4242)
    val w = Array.fill(8, 64)(rnd.nextGaussian())
    val z = (0 until 8).map(j => (rand(seed = 900 + j) - 0.5) * (6.0 / (j + 1)))
    val x = (0 until 64).map { i =>
      z.zipWithIndex.map { case (zj, j) => zj * w(j)(i) }.reduce(_ + _) +
        (rand(seed = 2000 + i) - 0.5) * 0.05
    }
    spark.range(0, 3000, 1, 8)
      .select(col("id").as("vec_id"), array(x: _*).as("embedding"))
  }

  test("OPQ rotation lifts ADC-only recall over raw PQ on correlated data") {
    val df = correlated.cache()
    df.count()
    val q = df.filter(col("vec_id") === 17)
      .select(col("embedding")).head().getSeq[Double](0).toArray
    val exact = df.filter(col("vec_id") =!= 17)
      .withColumn("d", l2Dist(col("embedding"), typedlit(q.toSeq)))
      .orderBy(asc("d"), col("vec_id").asc).limit(10)
      .collect().map(_.getLong(0)).toSet

    def adcTop10(encoded: org.apache.spark.sql.DataFrame, dist: org.apache.spark.sql.Column) =
      encoded.filter(col("vec_id") =!= 17)
        .withColumn("adc", dist)
        .orderBy(asc("adc"), col("vec_id").asc).limit(10)
        .collect().map(_.getLong(0)).toSet

    val rawModel = ProductQuantizer.train(df)
    val rawEnc = ProductQuantizer.encode(df, rawModel).select("vec_id", "pq_codes")
    val rawRecall = (exact intersect
      adcTop10(rawEnc, ProductQuantizer.adcDistance(col("pq_codes"), q, rawModel))).size

    val opqModel = Opq.train(df)
    val opqEnc = Opq.encode(df, opqModel).select("vec_id", "pq_codes")
    val opqRecall = (exact intersect
      adcTop10(opqEnc, Opq.adcDistance(col("pq_codes"), q, opqModel))).size

    info(s"ADC-only recall@10: raw=$rawRecall opq=$opqRecall")
    assert(opqRecall >= rawRecall,
      s"rotation must not hurt: raw=$rawRecall opq=$opqRecall")
    assert(opqRecall >= 6, s"opq recall too low: $opqRecall/10")
    df.unpersist()
  }
}
