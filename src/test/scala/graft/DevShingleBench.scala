package graft

/** Dev-only: how much of the shingle-kernel queries' cost is the
  * explode itself (the part a shared served-shingle artifact could
  * amortize) vs the pair join + verify downstream.
  * Usage: sbt "Test/runMain graft.DevShingleBench /root/testdata/sf0.1"
  */
object DevShingleBench {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.local(32, "graft-shmeasure")
    spark.sparkContext.setLogLevel("WARN")
    val docs = Tables.documents(spark, sfDir)
    def timed[T](n: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[shingle] $n: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    // JIT warmup on the sibling smallest SF when present; skip
    // quietly elsewhere (pass 1 then pays JIT)
    val warm = new java.io.File(sfDir).toPath.resolveSibling("sf0.001").toString
    if (new java.io.File(warm).isDirectory)
      graft.dedup.Dedup.shinglesOf(Tables.documents(spark, warm)).count()
    (1 to 3).foreach { p =>
      timed(s"pass$p shinglesOf count (explode only)") {
        graft.dedup.Dedup.shinglesOf(docs).count()
      }
      timed(s"pass$p stamp scan (count + sum of 32-bit hash(text) as long)") {
        docs.selectExpr("count(*)", "sum(cast(hash(text) as bigint))").head()
      }
      timed(s"pass$p ngramJaccardPairs count (full kernel)") {
        graft.dedup.Dedup.ngramJaccardPairs(docs).count()
      }
    }
    spark.stop()
  }
}
