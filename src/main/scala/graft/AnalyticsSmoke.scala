package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Analytics-side scale smoke — the event/TPC-H leg of the "plans
  * survive 100x" claim (ScaleSmoke covers vectors and dedup). Runs
  * the REGISTERED plan shapes (q_sessionize, q_funnel,
  * q_hourly_anomaly, q3) over deterministic synthetic data ~10x the
  * sf0.1 test volume: 1M events / 50k users, and an sf1-ish TPC-H
  * slice (150k customers, 1.5M orders, 6M lineitems). The queries
  * here mirror the Analytics implementations (the registered ones
  * read the driver parquet via Tables, so the shapes are inlined
  * over generated frames); what is being measured is the
  * plan class — one user-keyed window shuffle for sessionization, one
  * partial-agg pass + tiny-window for the funnel and anomaly flags,
  * join order + partial aggregation for q3 — not the testdata.
  *
  * Usage: runMain graft.AnalyticsSmoke [nEvents] [nLineitem]
  */
object AnalyticsSmoke {
  def main(args: Array[String]): Unit = {
    val nEv = args.headOption.map(_.toInt).getOrElse(1000000)
    val nLi = args.drop(1).headOption.map(_.toInt).getOrElse(6000000)
    val nOrd = nLi / 4
    val nCust = nLi / 40
    val spark = GraftSession.local(32, "graft-analytics-smoke")
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    def timed[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[asmoke] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    // --- synthetic events: 1M rows, 50k users, 30 days ----------------
    val baseUs = 1700000000000000L
    val types = Seq("view", "click", "purchase", "error", "search")
    val typePick = pmod(xxhash64(col("id") + 2), lit(10L))
    val events = spark.range(0, nEv, 1, 64).select(
        col("id").as("event_id"),
        pmod(xxhash64(col("id")), lit(nEv / 20L)).as("user_id"),
        timestamp_micros(lit(baseUs) +
          pmod(xxhash64(col("id") + 1), lit(30L * 86400L * 1000000L))).as("ts"),
        when(typePick < 5, types(0)).when(typePick < 7, types(1))
          .when(typePick < 8, types(2)).when(typePick < 9, types(3))
          .otherwise(types(4)).as("event_type"),
        (pmod(xxhash64(col("id") + 3), lit(10000L)) / 100.0)
          .cast("decimal(18,2)").as("value"))
      .cache()
    println(s"[asmoke] events: ${events.count()} rows, " +
      s"${events.select("user_id").distinct().count()} users")

    // q_sessionize shape: lag + cumulative-sum windows, both over ONE
    // user-keyed shuffle, then the session rollup reuses the same
    // partitioning (no second exchange on user_id)
    val sessions = timed(s"sessionize ($nEv events, 30-min gap)") {
      val byUser = Window.partitionBy("user_id").orderBy(asc("ts"), asc("event_id"))
      val df = events
        .withColumn("tus", unix_micros(col("ts")))
        .withColumn("prev_tus", lag(col("tus"), 1).over(byUser))
        .withColumn("new_s",
          when(col("prev_tus").isNull || col("tus") - col("prev_tus") > 1800000000L, 1L)
            .otherwise(0L))
        .withColumn("session_id",
          sum(col("new_s")).over(byUser.rowsBetween(Window.unboundedPreceding, 0)))
        .groupBy("user_id", "session_id")
        .agg(count(lit(1)).as("n_events"), min("tus").as("start_us"))
      df.count()
    }
    println(s"[asmoke] sessions: $sessions")

    // q_funnel shape: conditional-MIN first-occurrence times — one
    // partial-aggregated pass, no self-joins or sequence sorts
    val funnel = timed(s"funnel depth ($nEv events)") {
      events.filter(col("event_type").isin("view", "click", "purchase"))
        .groupBy("user_id")
        .agg(
          min(when(col("event_type") === "view", unix_micros(col("ts")))).as("t_view"),
          min(when(col("event_type") === "click", unix_micros(col("ts")))).as("t_click"),
          min(when(col("event_type") === "purchase", unix_micros(col("ts")))).as("t_purchase"))
        .select(
          when(col("t_view").isNull, 0L)
            .when(col("t_click").isNull || col("t_click") <= col("t_view"), 1L)
            .when(col("t_purchase").isNull || col("t_purchase") <= col("t_click"), 2L)
            .otherwise(3L).as("funnel_depth"))
        .groupBy("funnel_depth").agg(count(lit(1)).as("n_users"))
        .collect().sortBy(_.getLong(0))
    }
    println(s"[asmoke] funnel depths: ${funnel.map(r =>
      s"${r.getLong(0)}:${r.getLong(1)}").mkString(" ")}")

    // q_hourly_anomaly shape: aggregate-then-window — the trailing-24h
    // 3-sigma flags run over the HOURLY ROLLUP (~720 x types rows),
    // never the raw events. Same statistic as the registered query:
    // (n - mean)^2 (w_n - 1) > 9 (sumsq - sum^2/w_n), w_n >= 6
    val anomalies = timed(s"hourly anomaly flags ($nEv events -> hourly rollup -> window)") {
      val hourly = events.groupBy(
          (unix_micros(col("ts")) / 3600000000L).cast(LongType).as("hour"),
          col("event_type"))
        .agg(count(lit(1)).as("n_events"))
      val w = Window.partitionBy("event_type").orderBy("hour").rowsBetween(-24, -1)
      hourly
        .withColumn("w_n", count(col("n_events")).over(w))
        .withColumn("w_sum", sum("n_events").over(w))
        .withColumn("w_sumsq", sum(col("n_events").cast("double") * col("n_events")).over(w))
        .filter(col("w_n") >= 6 &&
          pow(col("n_events") - col("w_sum").cast("double") / col("w_n"), 2)
            * (col("w_n") - 1) >
            lit(9.0) * (col("w_sumsq") - col("w_sum").cast("double") * col("w_sum") / col("w_n")))
        .count()
    }
    println(s"[asmoke] anomalous (hour, type) cells: $anomalies")
    events.unpersist()

    // --- sf1-ish TPC-H slice for the q3 shape -------------------------
    val cust = spark.range(0, nCust, 1, 32).select(
        col("id").as("c_custkey"),
        when(pmod(xxhash64(col("id")), lit(5L)) === 0, "BUILDING")
          .otherwise("OTHER").as("c_mktsegment"))
      .cache()
    val orders = spark.range(0, nOrd, 1, 64).select(
        col("id").as("o_orderkey"),
        pmod(xxhash64(col("id") + 11), lit(nCust.toLong)).as("o_custkey"),
        timestamp_micros(lit(baseUs) +
          pmod(xxhash64(col("id") + 12), lit(700L * 86400L * 1000000L))).as("o_orderdate"))
      .cache()
    val li = spark.range(0, nLi, 1, 64).select(
        pmod(xxhash64(col("id") + 21), lit(nOrd.toLong)).as("l_orderkey"),
        (pmod(xxhash64(col("id") + 22), lit(9000000L)) / 100.0 + 1.0)
          .cast("decimal(18,2)").as("l_extendedprice"),
        (pmod(xxhash64(col("id") + 23), lit(11L)) / 100.0)
          .cast("decimal(18,2)").as("l_discount"),
        timestamp_micros(lit(baseUs) +
          pmod(xxhash64(col("id") + 24), lit(900L * 86400L * 1000000L))).as("l_shipdate"))
      .cache()
    println(s"[asmoke] tpch: ${cust.count()} customers, ${orders.count()} orders, " +
      s"${li.count()} lineitems")

    // q3 shape: selective dim filter -> join through orders -> partial-
    // aggregated revenue rollup -> TakeOrdered(10). The cut timestamp
    // splits the generated ranges so both filters keep real volume.
    val cutUs = baseUs + 350L * 86400L * 1000000L
    def q3Shape(): Array[(Long, java.math.BigDecimal)] =
      orders.filter(col("o_orderdate") < timestamp_micros(lit(cutUs)))
        .join(cust.filter(col("c_mktsegment") === "BUILDING").select("c_custkey"),
          col("o_custkey") === col("c_custkey"))
        .join(li.filter(col("l_shipdate") > timestamp_micros(lit(cutUs))),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderkey")
        .agg(sum((col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .cast("decimal(18,4)")).as("revenue"))
        .orderBy(desc("revenue"), asc("o_orderkey")).limit(10)
        .collect().map(r => (r.getLong(0), r.getDecimal(1)))
    val top = timed(s"q3 top-10 revenue ($nLi lineitems x $nOrd orders x $nCust customers)") {
      q3Shape()
    }
    println(s"[asmoke] q3 top revenue orderkey=${top.head._1} revenue=${top.head._2}")
    spark.stop()
  }
}
