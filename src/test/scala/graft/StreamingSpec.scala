package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.EventStream
import graft.streaming.EventStream.Event

class StreamingSpec extends AnyFunSuite {
  lazy val spark: SparkSession = GraftSession.local(4, "graft-test")
  val sf = "/root/testdata/sf0.001"

  private def batchEvents = Tables.events(spark, sf)

  test("streaming hourly counts match the batch twin") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val rows = batchEvents.as[Event].collect()
    input.addData(rows.toSeq)

    val q = EventStream.hourlyCounts(input.toDF())
      .writeStream.format("memory").queryName("hourly")
      .outputMode("complete").start()
    try { q.processAllAvailable() } finally q.stop()

    val got = spark.table("hourly")
      .select("hour_epoch", "event_type", "n_events", "sum_value")
    val want = SparkEntry.queries("q_events_hourly")(spark, sf)
      .select("hour_epoch", "event_type", "n_events", "sum_value")
    assert(got.exceptAll(want).count() === 0 && want.exceptAll(got).count() === 0)
  }

  test("stream-stream interval join matches the batch twin") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val rows = batchEvents.as[Event].collect()
    input.addData(rows.toSeq)

    val stream = input.toDF()
    val q = EventStream.errorContextJoin(
        stream.filter(col("event_type") === "error"),
        stream.filter(col("event_type") === "view"))
      .writeStream.format("memory").queryName("ctx_join")
      .outputMode("append").start()
    try { q.processAllAvailable() } finally q.stop()

    val got = spark.table("ctx_join")
    // batch twin: identical predicate over the static frame
    val be = batchEvents
    val errors = be.filter(col("event_type") === "error")
      .select(col("user_id"), col("event_id").as("error_id"), col("ts").as("error_ts"))
    val views = be.filter(col("event_type") === "view")
      .select(col("user_id").as("view_user"), col("event_id").as("view_id"),
        col("ts").as("view_ts"))
    val want = errors.join(views,
        col("user_id") === col("view_user") &&
          col("view_ts") >= expr("error_ts - INTERVAL 10 minutes") &&
          col("view_ts") <= col("error_ts"))
      .select(col("user_id"), col("error_id"),
        unix_micros(col("error_ts")).as("error_us"),
        col("view_id"), unix_micros(col("view_ts")).as("view_us"))
    assert(want.count() > 0, "twin must exercise real matches")
    assert(got.exceptAll(want).count() === 0 && want.exceptAll(got).count() === 0)
  }

  test("streaming hourly anomaly flags match the batch twin row-for-row") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val base = 1700000000000L // top of an hour? not necessarily — hours derive from epoch/3600 either way
    // per hour h, a deterministic "normal" count plus one planted spike
    // hour per type; a second type exercises the state keying
    def hourEvents(tpe: String, h: Long, n: Long): Seq[Event] =
      (0L until n).map(i => Event(h * 1000 + i,
        new java.sql.Timestamp((base / 3600000L + h) * 3600000L + i * 1000L),
        user_id = i % 7, tpe, 0.0))
    def countFor(tpe: String, h: Long): Long =
      if (tpe == "view" && h == 20) 80L else 8L + (h + tpe.length) % 3
    val all = (0L until 28L).flatMap(h =>
      Seq("view", "click").flatMap(t => hourEvents(t, h, countFor(t, h))))

    val q = EventStream.anomalyFlags(input.toDS())
      .writeStream.format("memory").queryName("anomflags")
      .outputMode("append").start()
    try {
      // two deliveries so state carries across micro-batches, then a
      // far-future flush event pushes the watermark past every real
      // hour — all 28 close
      val (first, second) = all.partition(_.ts.getTime < base + 14L * 3600000L)
      input.addData(first: _*)
      q.processAllAvailable()
      input.addData(second: _*)
      q.processAllAvailable()
      input.addData(Event(999999L,
        new java.sql.Timestamp(base + 1000L * 3600000L), 0L, "flush", 0.0))
      q.processAllAvailable()
    } finally q.stop()

    val got = spark.table("anomflags")
      .filter(col("event_type") =!= "flush")
      .select("hour_epoch", "event_type", "n_events", "w_n", "mean_x1e4", "is_anomaly")
    // batch twin over the SAME events (flush excluded: its hour never
    // closed in the stream) — rows must match exactly
    val batchEvents = all.toDF()
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"),
        col("value").cast("decimal(18,2)").as("value"))
    val want = graft.analytics.Analytics.hourlyAnomalyFrame(batchEvents)
    assert(got.count() === 56L, "all 28 hours x 2 types must close")
    assert(got.exceptAll(want).count() === 0 && want.exceptAll(got).count() === 0,
      "streamed flags must equal the batch twin row-for-row")
    // and the planted spike is the only flagged cell
    val flagged = got.filter(col("is_anomaly") === 1)
      .select("event_type", "hour_epoch").collect()
    assert(flagged.length === 1 && flagged.head.getString(0) === "view")
  }

  test("flatMapGroupsWithState sessionizer closes sessions on gap") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val base = 1700000000000L
    def ev(id: Long, user: Long, offsetMin: Long): Event =
      Event(id, new java.sql.Timestamp(base + offsetMin * 60000L), user, "view", 1.0)

    val q = EventStream.sessionize(input.toDS())
      .writeStream.format("memory").queryName("sessions")
      .outputMode("append").start()
    try {
      // user 1: two bursts 45 minutes apart -> first burst closes
      input.addData(ev(1, 1, 0), ev(2, 1, 10), ev(3, 1, 55), ev(4, 1, 60))
      q.processAllAvailable()
      val afterFirst = spark.table("sessions").as[EventStream.Session].collect()
      assert(afterFirst.length === 1)
      assert(afterFirst.head.n_events === 2)
      assert(afterFirst.head.start_us === base * 1000L)
      // another gap closes the second session
      input.addData(ev(5, 1, 200))
      q.processAllAvailable()
      assert(spark.table("sessions").count() === 2)
    } finally q.stop()
  }

  test("approx distinct stays within the configured HLL error bound") {
    val got = SparkEntry.queries("q_approx_distinct")(spark, sf)
      .join(SparkEntry.queries("q_distinct_users")(spark, sf), "event_type")
    val bad = got.filter(
      abs(col("approx_users") - col("n_users")) > col("n_users") * 0.05 + 1)
    assert(bad.count() === 0)
  }

  test("approx percentiles sit at the right RANK per event type") {
    // the KLL-style sketch guarantees rank error, not value error (and
    // the exact query INTERPOLATES between order statistics while the
    // sketch returns an actual sample) — so assert each approximate
    // percentile's empirical rank: fraction of values <= it must be
    // within rank tolerance of the target quantile
    val got = SparkEntry.queries("q_approx_percentiles")(spark, sf)
    val ranked = Tables.events(spark, sf).join(got, "event_type")
      .groupBy("event_type")
      .agg(
        avg(when(col("value") <= col("p50a"), 1.0).otherwise(0.0)).as("r50"),
        avg(when(col("value") <= col("p90a"), 1.0).otherwise(0.0)).as("r90"),
        avg(when(col("value") <= col("p99a"), 1.0).otherwise(0.0)).as("r99"),
        count(lit(1)).as("n"))
    val bad = ranked.filter(
      abs(col("r50") - 0.5) > lit(0.01) + lit(2.0) / col("n") ||
      abs(col("r90") - 0.9) > lit(0.01) + lit(2.0) / col("n") ||
      abs(col("r99") - 0.99) > lit(0.01) + lit(2.0) / col("n"))
    assert(bad.count() === 0, ranked.collect().mkString("\n"))
  }

  test("streaming dedup drops duplicate event ids within the watermark") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[Event]
    val base = 1700000000000L
    def ev(id: Long, off: Long) =
      Event(id, new java.sql.Timestamp(base + off * 1000L), 1L, "view", 1.0)
    val q = input.toDS()
      .withWatermark("ts", "10 minutes")
      .dropDuplicatesWithinWatermark("event_id")
      .writeStream.format("memory").queryName("dedup_stream")
      .outputMode("append").start()
    try {
      input.addData(ev(1, 0), ev(2, 1), ev(1, 2)) // id 1 duplicated
      q.processAllAvailable()
      input.addData(ev(2, 3), ev(3, 4))           // id 2 duplicated
      q.processAllAvailable()
    } finally q.stop()
    assert(spark.table("dedup_stream").select("event_id").as[Long].collect().sorted
      === Array(1L, 2L, 3L))
  }

  test("StreamingDedup keeps the first occurrence per content fingerprint") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, java.sql.Timestamp, String)]
    val base = 1700000000000L
    def doc(id: Long, off: Long, text: String) =
      (id, new java.sql.Timestamp(base + off * 1000L), text)
    val q = graft.streaming.StreamingDedup
      .dedup(input.toDF().toDF("doc_id", "ts", "text"))
      .writeStream.format("memory").queryName("sdedup")
      .outputMode("append").start()
    try {
      input.addData(doc(1, 0, "a b c"), doc(2, 1, "d e f"), doc(3, 2, "a b c"))
      q.processAllAvailable()
      // duplicate content arriving in a LATER micro-batch still drops
      input.addData(doc(4, 3, "d e f"), doc(5, 4, "g h i"))
      q.processAllAvailable()
    } finally q.stop()
    assert(spark.table("sdedup").select("doc_id").as[Long].collect().sorted
      === Array(1L, 2L, 5L))
  }

  test("StreamingDedup state survives a query restart from the checkpoint") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, java.sql.Timestamp, String)]
    val base = 1700000000000L
    val ckpt = java.nio.file.Files.createTempDirectory("graft-sdedup-ckpt").toString
    val out = java.nio.file.Files.createTempDirectory("graft-sdedup-out").toString
    def doc(id: Long, off: Long, text: String) =
      (id, new java.sql.Timestamp(base + off * 1000L), text)
    // file sink: the one that supports checkpoint recovery (memory
    // sink refuses to restart from a checkpoint)
    def run(): org.apache.spark.sql.streaming.StreamingQuery =
      graft.streaming.StreamingDedup
        .dedup(input.toDF().toDF("doc_id", "ts", "text"))
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append").start()
    val q1 = run()
    try {
      input.addData(doc(1, 0, "a b c"), doc(2, 1, "d e f"))
      q1.processAllAvailable()
    } finally q1.stop()
    assert(spark.read.parquet(out).count() === 2)
    // restart from the same checkpoint: the fingerprint state store
    // reloads, so a dup of a PRE-restart doc still drops
    input.addData(doc(3, 2, "a b c"), doc(4, 3, "j k l"))
    val q2 = run()
    try q2.processAllAvailable() finally q2.stop()
    assert(spark.read.parquet(out).select("doc_id").as[Long].collect().sorted
      === Array(1L, 2L, 4L), "doc 3 must drop against restored pre-restart state")
  }

  test("streaming curation + batch closer matches the batch pipeline's survivors") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val base = 1700000000000L
    def doc(id: Long, off: Long, text: String) =
      (id, new java.sql.Timestamp(base + off * 1000L), text)
    val w12 = (1 to 12).map(i => s"w$i").mkString(" ")       // quality-passing body
    val w40 = (1 to 40).map(i => s"v$i").mkString(" ")
    val nearA = w40 + " delta"
    val nearB = w40 + " epsilon" // one word of 41 differs: Jaccard ~ 0.87
    val batch1 = Seq(
      doc(1, 0, w12 + " one"),
      doc(2, 1, w12 + " one"),          // exact dup, same batch -> in-stream drop
      doc(3, 2, "too short"),           // quality gate -> in-stream drop
      doc(4, 3, nearA))
    // advances the watermark to ~3100s, evicting batch1's fingerprints
    // (distinct vocabulary: doc 7 must not be a near-dup of doc 1)
    val batch2 = Seq(doc(7, 3702, (1 to 12).map(i => s"u$i").mkString(" ") + " two"))
    val batch3 = Seq(
      doc(5, 3700, w12 + " one"),       // exact dup BEYOND watermark -> only finish() drops
      doc(6, 3701, nearB))              // near-dup CROSS batch -> only finish() drops
    val outDir = java.nio.file.Files.createTempDirectory("graft-scur-out").toString + "/docs"
    val ckpt = java.nio.file.Files.createTempDirectory("graft-scur-ck").toString
    val input = MemoryStream[(Long, java.sql.Timestamp, String)]
    val q = graft.streaming.StreamingCuration.start(
      input.toDF().toDF("doc_id", "ts", "text"), outDir, ckpt, watermark = "10 minutes")
    try {
      input.addData(batch1: _*)
      q.processAllAvailable()
      input.addData(batch2: _*)
      q.processAllAvailable()
      input.addData(batch3: _*)
      q.processAllAvailable()
    } finally q.stop()

    // the stream pass dropped what it could see: same-batch exact dup
    // and the quality gate; the beyond-watermark dup and the
    // cross-batch near-dup got through
    val streamed = spark.read.parquet(outDir).select("doc_id").as[Long].collect().sorted
    assert(streamed === Array(1L, 4L, 5L, 6L, 7L))

    // the batch closer finishes the job, and the final survivor set
    // matches the batch pipeline run directly over the full corpus
    val r = graft.streaming.StreamingCuration.finish(spark, outDir)
    val got = r.kept.select("doc_id").as[Long].collect().sorted
    val all = (batch1 ++ batch2 ++ batch3).toDF("doc_id", "ts", "text").drop("ts")
    val want = graft.pipeline.CurationPipeline.curate(spark, all)
      .kept.select("doc_id").as[Long].collect().sorted
    assert(got === want, s"streaming+finish ${got.toSeq} vs batch ${want.toSeq}")
    assert(got === Array(1L, 4L, 7L))
    assert(r.droppedExact === 1L && r.droppedNearDup === 1L)
  }

  test("streaming curation gates micro-batches against a static corpus") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val base = 1700000000000L
    def doc(id: Long, off: Long, text: String) =
      (id, new java.sql.Timestamp(base + off * 1000L), text)
    val w40 = (1 to 40).map(i => s"c$i").mkString(" ")
    val corpus = Seq(
      (1L, (1 to 12).map(i => s"k$i").mkString(" ")),
      (2L, w40)).toDF("doc_id", "text")
    // 100: exact copy of corpus 1 -> gate drops; 101: near-dup of
    // corpus 2 (1 of 41 words differs, J ~ 0.87) -> gate drops;
    // 102: fresh -> lands. Second batch: 103 fresh -> lands, proving
    // the gate re-applies per micro-batch.
    val outDir = java.nio.file.Files.createTempDirectory("graft-scg-out").toString + "/docs"
    val ckpt = java.nio.file.Files.createTempDirectory("graft-scg-ck").toString
    val input = MemoryStream[(Long, java.sql.Timestamp, String)]
    val q = graft.streaming.StreamingCuration.start(
      input.toDF().toDF("doc_id", "ts", "text"), outDir, ckpt,
      corpus = Some(corpus))
    try {
      input.addData(
        doc(100, 0, (1 to 12).map(i => s"k$i").mkString(" ")),
        doc(101, 1, w40 + " delta"),
        doc(102, 2, (1 to 12).map(i => s"f$i").mkString(" ")))
      q.processAllAvailable()
      input.addData(doc(103, 3, (1 to 12).map(i => s"g$i").mkString(" ")))
      q.processAllAvailable()
    } finally q.stop()
    assert(spark.read.parquet(outDir).select("doc_id").as[Long].collect().sorted
      === Array(102L, 103L))
  }

  test("session_window batch result agrees with the lag/cumsum sessionizer") {
    val sw = EventStream.sessionWindows(batchEvents)
      .select("user_id", "start_us", "n_events", "sum_value")
    val twin = SparkEntry.queries("q_sessionize")(spark, sf)
      .select("user_id", "start_us", "n_events", "sum_value")
    assert(sw.exceptAll(twin).count() === 0 && twin.exceptAll(sw).count() === 0)
  }
}
