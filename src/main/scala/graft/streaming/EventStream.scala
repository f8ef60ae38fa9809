package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** Structured Streaming pipelines over the events stream (SURVEY §2
  * block G). The batch twins are Analytics.q_events_hourly /
  * q_sessionize — same shapes, checked by the driver oracle; these
  * run them incrementally with watermark-bounded state.
  *
  * Scale notes: all operators are keyed-state streaming aggregations —
  * state is partitioned by (window, event_type) or user_id across
  * executors, and the watermark bounds state size; at 100 TB/day the
  * knobs are watermark width and shuffle partition count (state store
  * instances = shuffle partitions).
  */
object EventStream {

  case class Event(event_id: Long, ts: Timestamp, user_id: Long,
                   event_type: String, value: Double)

  case class SessionState(startUs: Long, lastUs: Long, n: Long, sum: Double)
  case class Session(user_id: Long, start_us: Long, end_us: Long,
                     n_events: Long, sum_value: Double)

  /** Hourly tumbling-window counts — streaming twin of q_events_hourly. */
  def hourlyCounts(events: DataFrame, watermark: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast(DecimalType(18, 2))).cast(DoubleType).as("sum_value"))
      .select(unix_timestamp(col("window.start")).as("hour_epoch"),
        col("event_type"), col("n_events"), col("sum_value"))

  /** Gap-based sessions via the built-in session_window — works
    * identically in batch and streaming.
    */
  def sessionWindows(events: DataFrame, gap: String = "30 minutes",
                     watermark: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(session_window(col("ts"), gap), col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast(DecimalType(18, 2))).cast(DoubleType).as("sum_value"))
      .select(col("user_id"),
        unix_micros(col("session_window.start")).as("start_us"),
        col("n_events"), col("sum_value"))

  /** Watermarked stream-stream interval join: each error event picks up
    * the SAME user's view events from the `lookback` window before it —
    * the "what was the user doing when it broke" context join, run
    * incrementally. The equi-key (user_id) partitions join state across
    * executors; the watermark plus the event-time range condition lets
    * Spark drop buffered rows once they can no longer match (state is
    * bounded by lookback + watermark per side — without the time bounds
    * a stream-stream join buffers forever).
    *
    * Batch twin: the same join predicate over the static frame
    * (StreamingSpec cross-checks them row-for-row).
    */
  def errorContextJoin(errors: DataFrame, views: DataFrame,
                       lookback: String = "10 minutes",
                       watermark: String = "10 minutes"): DataFrame = {
    val e = errors.select(col("user_id"), col("event_id").as("error_id"),
        col("ts").as("error_ts"))
      .withWatermark("error_ts", watermark)
    val v = views.select(col("user_id").as("view_user"),
        col("event_id").as("view_id"), col("ts").as("view_ts"))
      .withWatermark("view_ts", watermark)
    e.join(v,
      col("user_id") === col("view_user") &&
        col("view_ts") >= expr(s"error_ts - INTERVAL $lookback") &&
        col("view_ts") <= col("error_ts"))
      .select(col("user_id"), col("error_id"),
        unix_micros(col("error_ts")).as("error_us"),
        col("view_id"), unix_micros(col("view_ts")).as("view_us"))
  }

  case class HourCount(hour: Long, n: Long)
  case class AnomalyState(open: List[HourCount], trail: List[HourCount])
  case class HourlyAnomaly(hour_epoch: Long, event_type: String, n_events: Long,
                           w_n: Long, mean_x1e4: Option[Long], is_anomaly: Long)

  /** Streaming twin of q_hourly_anomaly: per (closed hour, event
    * type), flag event-volume anomalies against the TRAILING 24
    * observed hours' mean — the alert the batch query produces after
    * the fact, emitted live as each hour's books close.
    *
    * Why custom state: the trailing comparison is a window ACROSS
    * completed hourly aggregates, and streaming can't chain a window
    * (or a second stateful agg) behind a windowed aggregation in
    * append mode — so one `flatMapGroupsWithState` keyed by event_type
    * holds both halves: the open hours' partial counts, and the last
    * 24 CLOSED hour counts (the trailing stats window). An hour closes
    * when the event-time watermark passes its end; closing emits its
    * flag row computed against the trail (exact same statistic as the
    * batch query: HALF_UP x1e4 mean, sample-variance 3σ test squared
    * and division-cleared) and pushes it onto the trail. State per
    * type is ≤ open hours + 24 longs — bounded by the watermark, and
    * event-type cardinality is small by schema.
    *
    * Parity contract (spec-checked against
    * `Analytics.hourlyAnomalyFrame` row-for-row): identical for
    * in-watermark data. Events later than the watermark for an
    * already-closed hour are DROPPED (standard streaming-aggregation
    * late-data semantics) — a batch re-run over the full log would
    * count them; that is the inherent batch/stream boundary, not a
    * bug (same posture as hourlyCounts).
    */
  def anomalyFlags(events: Dataset[Event],
                   watermark: String = "10 minutes"): Dataset[HourlyAnomaly] = {
    import events.sparkSession.implicits._
    def micros(ts: Timestamp): Long = ts.getTime * 1000L + (ts.getNanos / 1000L) % 1000L
    def emitFor(tpe: String, hc: HourCount, trail: List[HourCount]): HourlyAnomaly = {
      val wn = trail.length.toLong
      val wsum = trail.map(_.n).sum
      val wsumsq = trail.map(h => h.n.toDouble * h.n).sum
      // HALF_UP like Spark's round(double, 0) in the batch twin
      val mean = if (wn > 0)
        Some(java.math.BigDecimal.valueOf(wsum * 10000.0 / wn)
          .setScale(0, java.math.RoundingMode.HALF_UP).longValue) else None
      val anom = if (wn >= 6 &&
          math.pow(hc.n - wsum.toDouble / wn, 2) * (wn - 1) >
            9.0 * (wsumsq - wsum.toDouble * wsum / wn)) 1L else 0L
      HourlyAnomaly(hc.hour * 3600L, tpe, hc.n, wn, mean, anom)
    }
    def fn(tpe: String, it: Iterator[Event],
           state: GroupState[AnomalyState]): Iterator[HourlyAnomaly] = {
      val wmMs = state.getCurrentWatermarkMs()
      var st = state.getOption.getOrElse(AnomalyState(Nil, Nil))
      if (!state.hasTimedOut) {
        val byHour = it.map(e => micros(e.ts) / 3600000000L).toSeq
          .groupBy(identity).view.mapValues(_.size.toLong).toMap
        val open = scala.collection.mutable.Map(st.open.map(h => h.hour -> h.n): _*)
        byHour.foreach { case (h, c) =>
          // an hour at-or-below the watermark that is not currently
          // open has already closed (or arrived too late to ever
          // open): drop, or emission order vs the trail would break
          if (!((h + 1) * 3600000L <= wmMs && !open.contains(h)))
            open(h) = open.getOrElse(h, 0L) + c
        }
        st = st.copy(open = open.toList.sortBy(_._1).map { case (h, c) => HourCount(h, c) })
      }
      // close every open hour the watermark has passed, ascending, so
      // each flag sees exactly the trail the batch window would
      val (done, still) = st.open.partition(h => (h.hour + 1) * 3600000L <= wmMs)
      var trail = st.trail
      val out = done.sortBy(_.hour).map { hc =>
        val row = emitFor(tpe, hc, trail)
        trail = (trail :+ hc).takeRight(24)
        row
      }
      state.update(AnomalyState(still, trail))
      // re-arm on the earliest still-open hour; a type with no open
      // hours keeps only its 24-long trail (small, low-cardinality key)
      still.sortBy(_.hour).headOption.foreach { h =>
        state.setTimeoutTimestamp(math.max((h.hour + 1) * 3600000L, wmMs + 1))
      }
      out.iterator
    }
    events.withWatermark("ts", watermark)
      .groupByKey(_.event_type)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(fn)
  }

  /** Custom-state sessionization with flatMapGroupsWithState: emits a
    * session when a gap larger than `gapUs` arrives or the state times
    * out. Demonstrates arbitrary keyed state for semantics
    * session_window can't express (e.g. per-session running custom
    * aggregates).
    */
  def sessionize(events: Dataset[Event], gapUs: Long = 1800000000L): Dataset[Session] = {
    import events.sparkSession.implicits._
    // full microsecond precision: Timestamp.getTime is ms-truncated,
    // the sub-ms part lives in getNanos (matches unix_micros in the
    // batch twin)
    def micros(ts: Timestamp): Long = ts.getTime * 1000L + (ts.getNanos / 1000L) % 1000L
    def fn(userId: Long, it: Iterator[Event], state: GroupState[SessionState]): Iterator[Session] = {
      var closed = List.empty[Session]
      var cur = state.getOption
      if (state.hasTimedOut) {
        // idle user: flush the trailing session and drop the state
        cur.foreach(st => closed ::= Session(userId, st.startUs, st.lastUs, st.n, st.sum))
        state.remove()
        return closed.iterator
      }
      val sorted = it.toSeq.sortBy(e => (micros(e.ts), e.event_id))
      sorted.foreach { e =>
        val tus = micros(e.ts)
        cur match {
          case Some(st) if tus - st.lastUs > gapUs =>
            closed ::= Session(userId, st.startUs, st.lastUs, st.n, st.sum)
            cur = Some(SessionState(tus, tus, 1, e.value))
          case Some(st) =>
            cur = Some(st.copy(lastUs = tus, n = st.n + 1, sum = st.sum + e.value))
          case None =>
            cur = Some(SessionState(tus, tus, 1, e.value))
        }
      }
      cur.foreach { st =>
        state.update(st)
        // bound state: when the EVENT-TIME watermark passes the
        // session's gap deadline, the timeout branch above flushes the
        // open session and removes the state — deterministic (driven
        // by data, not wall clock) and safe with processAllAvailable.
        val deadlineMs = st.lastUs / 1000L + gapUs / 1000L
        state.setTimeoutTimestamp(math.max(deadlineMs, state.getCurrentWatermarkMs() + 1))
      }
      closed.reverseIterator
    }
    events.withWatermark("ts", "10 minutes")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(fn)
  }
}
