package graft

/** Dev harness: bench-methodology timing (sf0.001 warmup x2, min of 5
  * noop-sink passes at the given data dir) for the round-13 additions
  * next to their nearest established neighbors — the measurement that
  * sized text_top_terms' df-aggregate fix and dedup_minhash_eval's
  * one-pass multi-banding pipeline.
  * Usage: Test/runMain graft.DevBandingBench [sfDir]
  */
object DevBandingBench {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.builder("dev-banding-bench").master("local[32]")
      .config("spark.sql.shuffle.partitions", 32).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val names = Seq("vdb_knn_maxsim", "text_top_terms", "vdb_more_like_this",
      "dedup_minhash_eval", "text_tfidf_sim", "vdb_hybrid_batch",
      "dedup_minhash_lsh", "dedup_ngram_jaccard")
    for (_ <- 1 to 2) {
      names.foreach { n =>
        SparkEntry.queries(n)(spark, "/root/testdata/sf0.001")
          .write.format("noop").mode("overwrite").save()
      }
      spark.catalog.clearCache()
    }
    val mins = scala.collection.mutable.Map.empty[String, Double].withDefaultValue(1e9)
    for (p <- 1 to 5) {
      new scala.util.Random(1000 + p).shuffle(names).foreach { n =>
        val t0 = System.nanoTime()
        val df = SparkEntry.queries(n)(spark, d)
        df.write.format("noop").mode("overwrite").save()
        val t = (System.nanoTime() - t0) / 1e9
        spark.catalog.clearCache()
        org.apache.spark.sql.graftshim.CheckpointInterop.unpersistCheckpoint(df)
        mins(n) = math.min(mins(n), t)
      }
    }
    names.foreach(n => println(f"MIN ${n}%-24s ${mins(n)}%6.2f s"))
    spark.stop()
  }
}
