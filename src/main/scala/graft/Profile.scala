package graft

import scala.collection.mutable.ArrayBuffer

/** Per-stage profiler for registered queries (optimization-round
  * measurement harness, guide §1/§7): warms the query twice (JIT +
  * codegen settle, same discipline as Bench), then runs it once
  * through the noop sink with a stage listener attached and prints a
  * per-stage table — wall ms, task count, summed executor run time,
  * input / shuffle-read / shuffle-write bytes — plus the job count.
  * A single-task stage carrying most of the run time is the
  * unsplittable-input signature (guide §2.5); fetch-heavy stages show
  * up as shuffle-read bytes.
  *
  * Usage: runMain graft.Profile [sfDir] [query ...]
  */
object Profile {
  private case class St(id: Int, wallMs: Long, tasks: Int, runMs: Long,
                        inB: Long, srB: Long, swB: Long, name: String)

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = if (args.length > 1) args.tail.toSeq
      else sys.error("name at least one registered query")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.builder("graft-profile")
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    @volatile var collect = false
    val stages = new java.util.concurrent.ConcurrentLinkedQueue[St]()
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(
          e: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit =
        if (collect) {
          val si = e.stageInfo; val m = si.taskMetrics
          stages.add(St(si.stageId,
            si.completionTime.getOrElse(0L) - si.submissionTime.getOrElse(0L),
            si.numTasks, m.executorRunTime,
            m.inputMetrics.bytesRead, m.shuffleReadMetrics.totalBytesRead,
            m.shuffleWriteMetrics.bytesWritten, si.name.takeWhile(_ != '\n')))
        }
      override def onJobStart(
          e: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        if (collect) jobs.incrementAndGet()
    })

    def runOnce(n: String): Double = {
      val t0 = System.nanoTime()
      val df = SparkEntry.queries(n)(spark, sfDir)
      df.write.format("noop").mode("overwrite").save()
      val t = (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache()
      org.apache.spark.sql.graftshim.CheckpointInterop.unpersistCheckpoint(df)
      t
    }

    // min-of-N like Bench: single-shot timings on shared hardware vary;
    // the min is the comparable statistic (guide §1). Stage table comes
    // from the LAST measured run.
    val reps = sys.env.getOrElse("SPARK_GRAFT_PROFILE_REPS", "3").toInt
    names.foreach { n =>
      (1 to 2).foreach(_ => try runOnce(n) catch { case _: Throwable => () })
      var tMin = Double.MaxValue
      (1 until reps).foreach { _ =>
        try tMin = math.min(tMin, runOnce(n)) catch { case _: Throwable => () }
      }
      stages.clear(); jobs.set(0); collect = true
      val t = try math.min(tMin, runOnce(n)) catch { case e: Throwable =>
        println(s"$n FAILED: ${e.getMessage}"); -1.0 }
      Thread.sleep(400) // let the async listener bus drain
      collect = false
      val ss = { val b = ArrayBuffer.empty[St]
        val it = stages.iterator(); while (it.hasNext) b += it.next(); b }
        .sortBy(-_.wallMs)
      println(f"%n=== $n%s: total $t%.3f s, ${jobs.get}%d jobs, ${ss.size}%d stages ===")
      println("  wall_ms tasks  run_ms    input_kB   shufR_kB   shufW_kB  name")
      ss.foreach(s => println(
        f"  ${s.wallMs}%7d ${s.tasks}%5d ${s.runMs}%7d ${s.inB / 1024}%10d " +
          f"${s.srB / 1024}%10d ${s.swB / 1024}%10d  ${s.name}%s [${s.id}%d]"))
    }
    spark.stop()
  }
}
