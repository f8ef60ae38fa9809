package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import graft.expressions.VectorExpressions._

/** Dev-only measurement for round-13 candidate 2: would SemDeDup's
  * pair stage profit from a fused threshold-join exec the way the knn
  * JOIN did from ShardTopKJoinExec?
  *
  * Hypothesis to test FIRST (no custom exec needed if it holds): the
  * current plan is inner-join → cosine filter → DISTINCT(x.vec_id) —
  * it scores EVERY pair, materializes every match, and shuffles the
  * matches to dedup them. The same verdicts come from a LEFT SEMI join
  * with the cosine in the join condition: SortMergeJoin's semi mode
  * emits each x row on its FIRST qualifying match and skips the rest
  * of the buffered group — early exit the declarative inner join can't
  * express, no match materialization, no distinct. On dup-heavy
  * clusters (the planted-twin and hot-cluster ScaleSmoke legs) the
  * early exit also skips real cosine work.
  *
  * Usage: sbt "Test/runMain graft.DevSemiDedupBench [nBase]"
  */
object DevSemiDedupBench {
  def main(args: Array[String]): Unit = {
    val nBase = args.headOption.map(_.toInt).getOrElse(100000)
    val spark = GraftSession.local(32, "graft-semibench")
    spark.sparkContext.setLogLevel("ERROR")

    def timed[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[semibench] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    // ScaleSmoke's semdedup corpus: 100k uniform + 1k planted twins
    val vecs = spark.range(0, nBase, 1, 64)
      .select(col("id"), array((0 until 64).map(i => rand(seed = 1000 + i) - 0.5): _*).as("vector"))
      .cache()
    vecs.count()
    val twins = vecs.filter(col("id") % 100 === 0)
      .select((col("id") + 10000000L).as("id"),
        transform(col("vector"), x => x + lit(0.05)).as("vector"))
    val corpus = vecs.unionByName(twins)
      .select(col("id").as("vec_id"), col("vector").cast("array<double>").as("embedding"))
    val cents = graft.vector.Centroids.deterministicInit(corpus, k = 16)
    val a = corpus.withColumn("shard",
      graft.vector.Centroids.nearestShard(col("embedding"), cents))
      .localCheckpoint(true)

    val threshold = 0.75

    /** The CURRENT pair stage: inner join + filter + distinct. */
    def innerDistinct(xs: DataFrame, ys: DataFrame,
                      keys: org.apache.spark.sql.Column): DataFrame =
      xs.join(ys, keys && col("y.vec_id") < col("x.vec_id"))
        .filter(cosineSim(col("x.embedding"), col("y.embedding")) >= threshold)
        .select(col("x.vec_id")).distinct()

    /** The candidate: left-semi with the cosine IN the join condition. */
    def semi(xs: DataFrame, ys: DataFrame,
             keys: org.apache.spark.sql.Column): DataFrame =
      xs.join(ys, keys && col("y.vec_id") < col("x.vec_id")
          && cosineSim(col("x.embedding"), col("y.embedding")) >= lit(threshold),
          "left_semi")
        .select(col("x.vec_id"))

    def salted(salt: Int): (DataFrame, DataFrame, org.apache.spark.sql.Column) = (
      a.withColumn("__salt", pmod(col("vec_id"), lit(salt))).as("x"),
      a.withColumn("__salt",
        explode(array((0 until salt).map(s => lit(s.toLong)): _*))).as("y"),
      col("x.shard") === col("y.shard") && col("x.__salt") === col("y.__salt"))

    def force(df: DataFrame): Long =
      df.agg(coalesce(sum(col("vec_id")), lit(0L)).cast(LongType)).head().getLong(0)

    // warmup the JIT/codegen on a slice
    val (wx, wy, wk) = salted(2)
    force(innerDistinct(wx.limit(20000), wy.limit(20000), wk))
    force(semi(wx.limit(20000), wy.limit(20000), wk))

    Seq(1, 8).foreach { salt =>
      val (xs, ys, keys) = salted(salt)
      var sumA = 0L; var sumB = 0L
      (1 to 2).foreach { pass =>
        sumA = timed(s"pass $pass salt=$salt inner+filter+distinct (current)") {
          force(innerDistinct(xs, ys, keys)) }
        sumB = timed(s"pass $pass salt=$salt left-semi w/ cosine condition") {
          force(semi(xs, ys, keys)) }
      }
      println(s"[semibench] salt=$salt verdict parity: ${sumA == sumB}")
    }

    // hot-cluster leg: 50k + 8k near-copies of one vector
    val hcBase = vecs.filter(col("id") < 50000)
    val hcHot = vecs.filter(col("id") === 7)
      .crossJoin(spark.range(1, 8001).select(col("id").as("j")))
      .select((col("j") + 20000000L).as("id"),
        transform(col("vector"), x => x + (col("j") % 11) * lit(0.002)).as("vector"))
    val hcCorpus = hcBase.unionByName(hcHot)
      .select(col("id").as("vec_id"), col("vector").cast("array<double>").as("embedding"))
    val hcCents = graft.vector.Centroids.deterministicInit(hcCorpus, k = 16)
    val hc = hcCorpus.withColumn("shard",
      graft.vector.Centroids.nearestShard(col("embedding"), hcCents))
      .localCheckpoint(true)
    val hcSalts = graft.dedup.Dedup.adaptiveSalts(hc, 1000000L)
    def hcSides(): (DataFrame, DataFrame, org.apache.spark.sql.Column) = {
      val withSalt = hc.join(broadcast(hcSalts), "shard")
      (withSalt.withColumn("__salt", pmod(col("vec_id"), col("__saltc"))).as("x"),
        withSalt.withColumn("__salt",
          explode(sequence(lit(0L), col("__saltc") - 1))).as("y"),
        col("x.shard") === col("y.shard") && col("x.__salt") === col("y.__salt"))
    }
    val (hx, hy, hkeys) = hcSides()
    var hA = 0L; var hB = 0L
    (1 to 2).foreach { pass =>
      hA = timed(s"pass $pass HOT adaptive inner+filter+distinct (current)") {
        force(innerDistinct(hx, hy, hkeys)) }
      hB = timed(s"pass $pass HOT adaptive left-semi w/ cosine condition") {
        force(semi(hx, hy, hkeys)) }
    }
    println(s"[semibench] hot-cluster verdict parity: ${hA == hB}")
    spark.stop()
  }
}
