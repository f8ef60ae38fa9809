package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import graft.plans.ShardTopKJoin
import graft.vector.{Centroids, ProductQuantizer}

/** Dev-only A/B for the fused exec's compressed scoring (round-13
  * candidate 1): DotOverNorm over a per-row RECONSTRUCTION projection
  * (dim multiply-adds per candidate pair) vs the codes-native Adc mode
  * (per-probe lookup tables, M lookups per pair). Same corpus, same
  * probes, same shuffle shape — only the per-pair arithmetic differs.
  *
  * Usage: sbt "Test/runMain graft.DevAdcBench [nVectors] [nQueries]"
  */
object DevAdcBench {
  def main(args: Array[String]): Unit = {
    val nVec = args.headOption.map(_.toInt).getOrElse(1000000)
    val nQ = args.drop(1).headOption.map(_.toInt).getOrElse(5000)
    val dim = args.drop(2).headOption.map(_.toInt).getOrElse(64)
    val spark = GraftSession.local(32, "graft-adcbench")
    spark.sparkContext.setLogLevel("ERROR")

    def timed[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[adcbench] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    val vecs = spark.range(0, nVec, 1, 64)
      .select(col("id"), array((0 until dim).map(i => rand(seed = 1000 + i) - 0.5): _*)
        .as("vector").cast("array<double>"))
      .cache()
    vecs.count()
    val cents = Centroids.deterministicInit(
      vecs.select(col("id").as("vec_id"), col("vector").as("embedding")), k = 16)
    val model = ProductQuantizer.train(
      vecs.sample(0.02, seed = 7).select(col("id"), col("vector")),
      idCol = "id", vecCol = "vector", dim = dim, numSubspaces = 16, numCodes = 16)
    val coded = ProductQuantizer.encode(vecs, model, "vector")
      .withColumn("shard", Centroids.nearestShard(col("vector"), cents))
      .withColumn("vnorm", graft.expressions.VectorExpressions.vecNorm(col("vector")))
      .select(col("id").cast(LongType).as("id"), col("shard").cast(LongType).as("shard"),
        col("pq_codes").cast("array<int>").as("codes"),
        col("vnorm").cast("double").as("vnorm"))
      .localCheckpoint(true)
    val probes = vecs.filter(col("id") % (nVec / nQ) === 0)
      .select(col("id").as("query_id"),
        explode(Centroids.nearestShards(col("vector"), cents, nprobe = 2)).as("shard"),
        col("vector").as("qv"))
      .localCheckpoint(true)

    def force(df: DataFrame): Long =
      df.agg(coalesce(sum(col("id") + col("rank")), lit(0L)).cast(LongType))
        .head().getLong(0)

    // (a) recon + DotOverNorm: the round-12 shape
    val recon = ProductQuantizer.decodeCol(col("codes"), model)
    val corpusR = coded.select(col("id"), col("shard"),
      recon.as("__recon"), col("vnorm"))
    // (b) codes-native Adc
    val state = ShardTopKJoin.AdcState(books = Map(-1 -> model.centroids),
      rotation = None, residual = None)

    var a = 0L; var b = 0L
    (1 to 3).foreach { pass =>
      a = timed(s"pass $pass DotOverNorm over reconstruction ($nVec x $nQ)") {
        force(ShardTopKJoin.ranked(corpusR, probes, k = 100,
          excludeSelf = false, metric = ShardTopKJoin.Metric.DotOverNorm))
      }
      b = timed(s"pass $pass codes-native Adc LUT ($nVec x $nQ)") {
        force(ShardTopKJoin.ranked(coded, probes, k = 100,
          excludeSelf = false, metric = ShardTopKJoin.Metric.Adc,
          adc = Some(state)))
      }
    }
    // same candidates; scores may differ in the last ulp (grouping),
    // so compare the id@rank sums — ulp-level rank flips would show as
    // a tiny drift, report it rather than assert
    println(s"[adcbench] id+rank checksum: dotnorm=$a adc=$b " +
      s"(equal=${a == b}; ulp-level rank flips possible by design)")
    spark.stop()
  }
}
