package graft

/** Dev-only focused timing harness: time a named subset of
  * SparkEntry.queries at an SF dir without running the whole Bench.
  * Usage: sbt "Test/runMain graft.DevTimeQueries /root/testdata/sf0.1 q1 q2 ..."
  */
object DevTimeQueries {
  def main(args: Array[String]): Unit = {
    val sfDir = args.head
    val names = args.tail.toSeq
    val spark = GraftSession.local(32, "graft-devtime")
    spark.sparkContext.setLogLevel("WARN")
    // warmup pass at sf0.001 for JIT
    names.foreach { n =>
      try SparkEntry.queries(n)(spark, "/root/testdata/sf0.001").count()
      catch { case _: Throwable => () }
    }
    spark.catalog.clearCache()
    (1 to 3).foreach { p =>
      names.foreach { n =>
        val t0 = System.nanoTime()
        val c = SparkEntry.queries(n)(spark, sfDir).count()
        val t = (System.nanoTime() - t0) / 1e9
        spark.catalog.clearCache()
        println(f"[devtime] pass$p $n%-28s $t%7.2f s  rows=$c")
      }
    }
    spark.stop()
  }
}
