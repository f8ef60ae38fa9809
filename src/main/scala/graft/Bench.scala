package graft
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = GraftSession.builder("graft-bench")
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // untimed warmup at the smallest SF: JIT + codegen caches settle so
    // the timed passes measure steady-state throughput
    if (sys.env.getOrElse("SPARK_GRAFT_WARMUP", "1") == "1") {
      // two passes: C2 compilation of generated code settles on the
      // second invocation of each query's hot loops
      val warmDir = "/root/testdata/sf0.001"
      for (_ <- 1 to 2) {
        SparkEntry.queries.foreach { case (_, fn) =>
          try fn(spark, warmDir).count() catch { case _: Throwable => () }
        }
        spark.catalog.clearCache()
      }
    }
    // Three timed passes, each visiting the queries in a DIFFERENT
    // deterministically-shuffled order; per query the min of the three
    // is reported. Single-shot timings on shared hardware vary 2-5x,
    // and a contention burst is minutes long — randomized order means
    // it lands on different queries each pass (so the min recovers the
    // clean timing), and the emitted per-pass totals make a contended
    // run diagnosable from the artifact alone (one inflated pass total
    // + clean per-query mins = host contention, not a regression).
    val names = SparkEntry.queries.keys.toVector.sorted
    val nPasses = 3
    val timings = Array.fill(nPasses)(scala.collection.mutable.Map.empty[String, Double])
    val passTotals = (0 until nPasses).map { p =>
      val order = new scala.util.Random(1000 + p).shuffle(names)
      var tot = 0.0
      order.foreach { name =>
        val fn = SparkEntry.queries(name)
        val t0 = System.nanoTime()
        val ok = try { fn(spark, sfDir).count(); true } catch { case _: Throwable => false }
        val t = (System.nanoTime() - t0) / 1e9
        spark.catalog.clearCache() // operator-local caches don't leak across timings
        // a failed run records the -1.0 sentinel, not a plausibly-fast
        // partial elapsed time; min() propagates it as the query's result
        timings(p)(name) = if (ok) t else -1.0
        if (ok) tot += t
      }
      tot
    }
    val results = names.map(n => n -> (0 until nPasses).map(timings(_)(n)).min)
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val passes = passTotals.mkString("[", ",", "]")
    // total sums only successful queries — the -1.0 sentinel stays
    // visible per-query, and failures are listed explicitly, so total
    // and the per-pass totals (which also skip failures) agree
    val total = results.collect { case (_, v) if v >= 0.0 => v }.sum
    val failed = results.collect { case (k, v) if v < 0.0 => "\"" + k + "\"" }
      .mkString("[", ",", "]")
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"passes":$passes,"failed":$failed,"sf":"$sfDir"}""")
    spark.stop()
  }
}
