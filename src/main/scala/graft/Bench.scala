package graft
object Bench {
  /** The host-speed probe: a FIXED in-memory aggregation — no IO, no
    * data dependence, fully codegen'd — timed min-of-3. Dividing pass
    * totals by its value normalizes host contention out of
    * round-over-round comparisons (see the per-pass stamps below).
    */
  private def calibProbe(spark: org.apache.spark.sql.SparkSession): Double =
    (0 until 3).map { _ =>
      val t0 = System.nanoTime()
      spark.range(0L, 200000000L, 1L, 32)
        .selectExpr("sum(id % 7 + (id >> 3)) AS s").head()
      (System.nanoTime() - t0) / 1e9
    }.min

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
          try fn(spark, warmDir).write.format("noop").mode("overwrite").save()
          catch { case _: Throwable => () }
        }
        spark.catalog.clearCache()
      }
      // JIT the calibration probe too: it now runs after EVERY pass
      // (per-pass host-speed stamps), so pass 1's stamp must not pay
      // the probe's own compilation
      calibProbe(spark)
    }
    // Five timed passes (SPARK_GRAFT_PASSES overrides), each visiting
    // the queries in a DIFFERENT deterministically-shuffled order; per
    // query the min across passes is reported. Single-shot timings on
    // shared hardware vary 2-5x, and a contention burst is minutes
    // long — randomized order means it lands on different queries each
    // pass (so the min recovers the clean timing), and the emitted
    // per-pass totals make a contended run diagnosable from the
    // artifact alone (one inflated pass total + clean per-query mins =
    // host contention, not a regression). BENCH_r07 showed 3 passes
    // can ALL land inside one long burst; 5 passes make that much
    // rarer at ~2 min extra sf0.1 wall time.
    val names = SparkEntry.queries.keys.toVector.sorted
    val nPasses = sys.env.get("SPARK_GRAFT_PASSES").map(_.trim) match {
      case Some(v) =>
        val n = try v.toInt catch {
          case _: NumberFormatException =>
            sys.error(s"SPARK_GRAFT_PASSES must be a positive integer, got '$v'")
        }
        require(n >= 1, s"SPARK_GRAFT_PASSES must be >= 1, got $n")
        n
      case None => 5
    }
    val timings = Array.fill(nPasses)(scala.collection.mutable.Map.empty[String, Double])
    val calibs = Array.fill(nPasses)(0.0)
    (0 until nPasses).foreach { p =>
      val order = new scala.util.Random(1000 + p).shuffle(names)
      order.foreach { name =>
        val fn = SparkEntry.queries(name)
        val t0 = System.nanoTime()
        val df = try Some(fn(spark, sfDir)) catch { case _: Throwable => None }
        // force through the noop sink, NOT count(): count() lets column
        // pruning drop unused aggregate functions and final-project
        // expressions, so any query ending in groupBy().agg(heavy) or a
        // computed projection times a PHANTOM plan. Round 12 caught
        // ScaleSmoke's knn JOIN reporting 3.8 s for a plan whose
        // cosine + heap had been pruned out; the real number was 33 s.
        // The noop sink materializes every output column and writes
        // nothing — the standard Spark benchmarking sink.
        val ok = try {
          df.foreach(_.write.format("noop").mode("overwrite").save()); df.isDefined
        } catch { case _: Throwable => false }
        val t = (System.nanoTime() - t0) / 1e9
        spark.catalog.clearCache() // operator-local caches don't leak across timings
        // checkpoint blocks (iterative queries localCheckpoint their
        // result) aren't CacheManager entries — release them too, or
        // executor storage grows by one frame per timing pass
        df.foreach(org.apache.spark.sql.graftshim.CheckpointInterop.unpersistCheckpoint)
        // a failed run records the -1.0 sentinel, not a plausibly-fast
        // partial elapsed time; min() propagates it as the query's result
        timings(p)(name) = if (ok) t else -1.0
      }
      // Host-speed calibration PER PASS (round 13): a contention burst
      // is minutes long — one post-suite calib can miss the burst that
      // inflated pass 2, leaving the artifact ambiguous. A stamp after
      // every pass localizes contention to the passes it hit, so
      // round-over-round comparison (tools/bench_compare.py) can
      // normalize or discard exactly the contended passes.
      calibs(p) = calibProbe(spark)
    }
    val results = names.map(n => n -> (0 until nPasses).map(timings(_)(n)).min)
    // the single `calib` stays (min across passes — the run's best
    // host state) so older comparisons keep working
    val calib = calibs.min
    // the every-pass-succeeded query set: total sums its mins, and the
    // per-pass totals sum over the SAME set, so the two views agree by
    // construction (a query failing in any pass is excluded everywhere
    // and listed in `failed` instead)
    val okNames = names.filter(n => (0 until nPasses).forall(timings(_)(n) >= 0.0))
    // The driver archives only the final ~2kB of output and parses the
    // JSON line out of that tail — BENCH_r03..r05 all came back
    // `parsed: null` because full-precision doubles pushed the line past
    // 2000 bytes and its opening brace fell off the front. Millisecond
    // precision keeps the whole line (~1.85kB at 76 queries) inside the
    // window alongside sbt's trailer; full detail isn't lost — run-to-run
    // variance on this host exceeds 10ms anyway. Per-query values carry
    // 2 decimals (80 queries at 3 left only ~15 bytes of headroom);
    // pass totals keep 3.
    def fN(n: Int)(v: Double): String = s"%.${n}f".formatLocal(java.util.Locale.ROOT, v)
    def f3(v: Double): String = fN(3)(v)
    val passes = (0 until nPasses)
      .map(p => f3(okNames.map(timings(p)).sum)).mkString("[", ",", "]")
    val calibsJson = calibs.map(f3).mkString("[", ",", "]")
    val total = results.collect { case (k, v) if okNames.contains(k) => v }.sum
    val failed = names.filterNot(okNames.contains).map("\"" + _ + "\"")
      .mkString("[", ",", "]")
    val sfShort = sfDir.split("/").last.stripPrefix("sf")
    // ONE self-contained JSON line: the archiver keeps only the final
    // ~2kB of stdout and parses the JSON line found there, so everything
    // (per-query mins, per-pass totals for contention diagnosis, failures)
    // rides the same line. sbt's run task inherits stdout (build.sbt
    // outputStrategy), so the line starts with '{' at column 0.
    def lineAt(dec: Int): String = {
      val qs = results
        .map { case (k, v) => "\"" + k + "\":" + fN(dec)(v) }.mkString("{", ",", "}")
      s"""{"queries":$qs,"passes":$passes,"calib":${f3(calib)},"calibs":$calibsJson,"failed":$failed,"n_failed":${names.size - okNames.size},"sf":"$sfShort","unit":"sec","metric":"total","value":${f3(total)}}"""
    }
    // graceful degradation measured on the WHOLE line (query count,
    // value widths, and failure lists all move it): shed per-query
    // decimals rather than the parse. Budget: 2000B tail minus sbt's
    // ~75B success trailer and the trailing newline -> 1900 leaves a
    // margin for a longer trailer. Last rung: past ~95 queries the
    // NAME mass alone outgrows the tail at any precision, so keep the
    // SLOWEST queries — the set plan audits read — plus an explicit
    // omission count; the full map goes to stderr. A parseable,
    // diagnostic headline beats completeness.
    // Full-precision per-query detail, ARCHIVED ON DISK: the stdout
    // tail keeps ~2kB, so past ~95 queries the headline line sheds the
    // FASTEST queries (q_omitted) — exactly the ones whose silent 2x
    // regressions round-over-round tracking needs. bench_detail.json
    // (committed each round) carries every query at 3 decimals;
    // SPARK_GRAFT_DETAIL overrides the path, empty disables.
    val detailPath = sys.env.getOrElse("SPARK_GRAFT_DETAIL", "bench_detail.json")
    if (detailPath.nonEmpty) {
      val qs = results.map { case (k, v) => "\"" + k + "\":" + f3(v) }
        .mkString("{", ",", "}")
      val detail =
        s"""{"queries":$qs,"passes":$passes,"calib":${f3(calib)},"calibs":$calibsJson,"failed":$failed,"n_failed":${names.size - okNames.size},"sf":"$sfShort","unit":"sec","metric":"total","value":${f3(total)}}"""
      java.nio.file.Files.write(java.nio.file.Paths.get(detailPath),
        (detail + "\n").getBytes("UTF-8"))
    }
    val line = Seq(lineAt(2), lineAt(1), lineAt(0)).find(_.length <= 1900).getOrElse {
      System.err.println("bench: per-query map exceeds the archived-tail budget; " +
        "keeping the slowest queries. Full map: " + lineAt(3))
      val sorted = results.filter(r => okNames.contains(r._1)).sortBy(-_._2)
      def lineTop(k: Int): String = {
        val qs = sorted.take(k)
          .map { case (n, v) => "\"" + n + "\":" + fN(2)(v) }.mkString("{", ",", "}")
        s"""{"queries":$qs,"q_omitted":${results.size - k},"passes":$passes,"calib":${f3(calib)},"calibs":$calibsJson,"failed":$failed,"n_failed":${names.size - okNames.size},"sf":"$sfShort","unit":"sec","metric":"total","value":${f3(total)}}"""
      }
      (sorted.size to 0 by -1).view.map(lineTop).find(_.length <= 1900)
        .getOrElse(lineTop(0))
    }
    println(line)
    spark.stop()
  }
}
