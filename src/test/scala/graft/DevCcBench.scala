package graft

import org.apache.spark.sql.functions._

/** Dev-only breakdown of the connected-components pipeline cost
  * (dedup_clusters / dedup_keep_best — the two heaviest bench
  * queries): how much is candidate-pair generation, how much is the
  * CC rounds, how many rounds run, and what each round's job count
  * costs locally. Usage:
  *   sbt "Test/runMain graft.DevCcBench /root/testdata/sf0.1"
  */
object DevCcBench {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.local(32, "graft-ccbench")
    spark.sparkContext.setLogLevel("WARN")

    def timed[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[ccbench] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    val docs = Tables.documents(spark, sfDir)
    // JIT warmup on the sibling smallest SF when present; skip
    // quietly elsewhere (measurement still valid, pass 1 pays JIT)
    val warm = new java.io.File(sfDir).toPath.resolveSibling("sf0.001").toString
    if (new java.io.File(warm).isDirectory)
      graft.dedup.Dedup.ngramJaccardPairs(Tables.documents(spark, warm)).count()

    (1 to 3).foreach { pass =>
      val pairs = timed(s"pass$pass ngramJaccardPairs (candidate generation)") {
        val p = graft.dedup.Dedup.ngramJaccardPairs(docs).localCheckpoint(true)
        p.count(); p
      }
      val (labels, rounds) = timed(s"pass$pass connectedComponents over checkpointed pairs") {
        graft.dedup.Dedup.connectedComponentsWithRounds(pairs)
      }
      val n = timed(s"pass$pass labels count") { labels.count() }
      println(s"[ccbench] pass$pass rounds=$rounds labels=$n")
      org.apache.spark.sql.graftshim.CheckpointInterop.unpersistCheckpoint(labels)
      org.apache.spark.sql.graftshim.CheckpointInterop.unpersistCheckpoint(pairs)
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
