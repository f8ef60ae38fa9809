package graft.analytics

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.{QueryModule, Tables}

/** General analytics surface over the TPC-H-ish corpus: scan-filter-agg,
  * multi-way joins (broadcast where a side is small), window functions,
  * semi/anti joins, time-bucketed event aggregation and gap
  * sessionization (the batch twins of the streaming pipeline).
  *
  * Oracle-parity conventions (see SURVEY §4): money aggregates go
  * through DECIMAL(18,2|4) so the sum is exact, then cast to DOUBLE;
  * averages are sum/count in double, rounded to 4; timestamps leave the
  * query as epoch seconds/micros BIGINT.
  *
  * Scale notes: joins to region/nation/supplier/part are broadcast
  * (dims stay small at any SF); fact-fact joins (orders x lineitem)
  * shuffle on the join key which is also the grouping key, so the agg
  * reuses the join's partitioning and adds no extra exchange. Top-k is
  * ORDER BY + LIMIT which Spark executes as TakeOrderedAndProject —
  * per-partition heaps, no global sort.
  */
object Analytics extends QueryModule {

  private def dec2(c: Column): Column = c.cast(DecimalType(18, 2))
  private def dec4(c: Column): Column = c.cast(DecimalType(18, 4))
  private def sumMoney2(c: Column): Column = sum(dec2(c)).cast(DoubleType)
  private def sumMoney4(c: Column): Column = sum(dec4(c)).cast(DoubleType)
  private def ts(lit0: String): Column = lit(lit0).cast(TimestampType)
  /** Averages leave queries as x10^4-scaled BIGINTs: fractional
    * ROUND(x, 4) can differ between engines at boundary doubles (the
    * oracle's round scales by 10^4 internally, which itself rounds);
    * rounding an explicitly-scaled double to integer is engine-stable.
    */
  private def avgX1e4(sumCol: Column): Column =
    round(sumCol / count(lit(1)) * 10000.0, 0).cast(org.apache.spark.sql.types.LongType)

  // --- q1: pricing summary (filter + groupBy agg) --------------------
  private def q1(s: SparkSession, d: String): DataFrame = {
    // single-row-group input: fan the scan before the decimal partial
    // aggregation (guide §2.5); the shipdate filter still pushes below
    // the exchange to the parquet scan (PushedFilters unchanged)
    Tables.fanned(Tables.lineitem(s, d), col("l_orderkey"))
      .filter(col("l_shipdate") <= ts("1998-09-02 00:00:00"))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        sumMoney2(col("l_quantity")).as("sum_qty"),
        sumMoney2(col("l_extendedprice")).as("sum_base_price"),
        sumMoney4(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("sum_disc_price"),
        avgX1e4(sumMoney2(col("l_quantity"))).as("avg_qty_x1e4"),
        avgX1e4(sumMoney2(col("l_extendedprice"))).as("avg_price_x1e4"),
        count(lit(1)).as("count_order"))
  }

  private val q1Sql =
    """SELECT l_returnflag, l_linestatus,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
      |  CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS sum_disc_price,
      |  CAST(ROUND(CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) * 10000.0) AS BIGINT) AS avg_qty_x1e4,
      |  CAST(ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) * 10000.0) AS BIGINT) AS avg_price_x1e4,
      |  COUNT(*) AS count_order
      |FROM lineitem
      |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
      |GROUP BY l_returnflag, l_linestatus""".stripMargin

  // --- q3: top-10 revenue orders (3-way join + top-k) ----------------
  private def q3(s: SparkSession, d: String): DataFrame = {
    val c = Tables.customer(s, d).filter(col("c_mktsegment") === "BUILDING")
      .select("c_custkey")
    val o = Tables.orders(s, d).filter(col("o_orderdate") < ts("1998-01-01 00:00:00"))
      .select("o_orderkey", "o_custkey", "o_orderdate")
    // fanned: the probe side of the broadcast joins + the decimal
    // partial agg all sit in the single-split scan stage (guide §2.5)
    val l = Tables.fanned(Tables.lineitem(s, d), col("l_orderkey"))
      .filter(col("l_shipdate") > ts("1998-01-01 00:00:00"))
      .select("l_orderkey", "l_extendedprice", "l_discount")
    // customer grows linearly with SF, so no forced broadcast: AQE picks
    // broadcast at small SF and shuffle-hash/sort-merge at scale.
    o.join(c, col("o_custkey") === col("c_custkey"))
      .join(l, col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderkey", "o_orderdate")
      .agg(sumMoney4(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"))
      .select(col("o_orderkey"), col("revenue"),
        unix_timestamp(col("o_orderdate")).as("orderdate_epoch"))
      .orderBy(desc("revenue"), asc("o_orderkey"))
      .limit(10)
  }

  private val q3Sql =
    """SELECT o.o_orderkey,
      |  CAST(SUM(CAST(l.l_extendedprice * (1.0 - l.l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
      |  CAST(epoch(o.o_orderdate) AS BIGINT) AS orderdate_epoch
      |FROM customer c, orders o, lineitem l
      |WHERE c.c_mktsegment = 'BUILDING' AND c.c_custkey = o.o_custkey
      |  AND l.l_orderkey = o.o_orderkey
      |  AND o.o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
      |  AND l.l_shipdate > TIMESTAMP '1998-01-01 00:00:00'
      |GROUP BY o.o_orderkey, o.o_orderdate
      |ORDER BY revenue DESC, o.o_orderkey ASC
      |LIMIT 10""".stripMargin

  // --- q5: revenue per nation within a region (6-way join) -----------
  private def q5(s: SparkSession, d: String): DataFrame = {
    val r = Tables.region(s, d).filter(col("r_name") === "ASIA")
    val n = Tables.nation(s, d)
    val sup = Tables.supplier(s, d)
    val c = Tables.customer(s, d)
    val o = Tables.orders(s, d)
      .filter(col("o_orderdate") >= ts("1996-01-01 00:00:00") &&
              col("o_orderdate") < ts("1998-01-01 00:00:00"))
    val l = Tables.fanned(Tables.lineitem(s, d), col("l_orderkey")) // §2.5
    // region/nation are bounded dims (5/25 rows, SF-invariant): keep those
    // broadcast. customer/supplier/orders/lineitem all scale with SF, so
    // their joins are left to AQE (broadcast at small SF, shuffle at scale).
    l.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(c, col("o_custkey") === col("c_custkey"))
      .join(sup,
        col("l_suppkey") === col("s_suppkey") &&
        col("c_nationkey") === col("s_nationkey"))
      .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
      .groupBy("n_name")
      .agg(sumMoney4(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"))
  }

  private val q5Sql =
    """SELECT n_name,
      |  CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue
      |FROM customer, orders, lineitem, supplier, nation, region
      |WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
      |  AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
      |  AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
      |  AND r_name = 'ASIA'
      |  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      |  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
      |GROUP BY n_name""".stripMargin

  // --- q6: forecast revenue change (tight filter + single agg) -------
  private def q6(s: SparkSession, d: String): DataFrame = {
    Tables.lineitem(s, d)
      .filter(col("l_shipdate") >= ts("1996-01-01 00:00:00") &&
              col("l_shipdate") < ts("1997-01-01 00:00:00") &&
              col("l_discount") >= 0.03 && col("l_discount") <= 0.07 &&
              col("l_quantity") < 24.0)
      .agg(
        sumMoney4(col("l_extendedprice") * col("l_discount")).as("revenue"),
        count(lit(1)).as("n_rows"))
  }

  private val q6Sql =
    """SELECT
      |  CAST(SUM(CAST(l_extendedprice * l_discount AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
      |  COUNT(*) AS n_rows
      |FROM lineitem
      |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      |  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
      |  AND l_discount >= 0.03 AND l_discount <= 0.07
      |  AND l_quantity < 24.0""".stripMargin

  // --- window: top-3 customers per nation by balance -----------------
  private def qWindowTopcust(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("c_nationkey")
      .orderBy(desc("c_acctbal"), asc("c_custkey"))
    Tables.customer(s, d)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .select(col("c_nationkey").cast(LongType).as("nationkey"),
        col("rn").cast(LongType).as("rn"),
        col("c_custkey").as("custkey"), col("c_acctbal").as("acctbal"))
  }

  private val qWindowTopcustSql =
    """SELECT CAST(c_nationkey AS BIGINT) AS nationkey, CAST(rn AS BIGINT) AS rn,
      |       c_custkey AS custkey, c_acctbal AS acctbal
      |FROM (SELECT c_custkey, c_nationkey, c_acctbal,
      |        ROW_NUMBER() OVER (PARTITION BY c_nationkey
      |                           ORDER BY c_acctbal DESC, c_custkey ASC) AS rn
      |      FROM customer)
      |WHERE rn <= 3""".stripMargin

  // --- semi join: orders containing a high-quantity line -------------
  private def qSemiJoin(s: SparkSession, d: String): DataFrame = {
    val hi = Tables.lineitem(s, d).filter(col("l_quantity") >= 48.0)
      .select("l_orderkey")
    Tables.orders(s, d)
      .join(hi, col("o_orderkey") === col("l_orderkey"), "left_semi")
      .select(col("o_orderkey"), col("o_totalprice"),
        unix_timestamp(col("o_orderdate")).as("orderdate_epoch"))
  }

  private val qSemiJoinSql =
    """SELECT o_orderkey, o_totalprice,
      |       CAST(epoch(o_orderdate) AS BIGINT) AS orderdate_epoch
      |FROM orders o
      |WHERE EXISTS (SELECT 1 FROM lineitem l
      |              WHERE l.l_orderkey = o.o_orderkey AND l.l_quantity >= 48.0)""".stripMargin

  // --- anti join: customers with no recent orders --------------------
  private def qAntiJoin(s: SparkSession, d: String): DataFrame = {
    val recent = Tables.orders(s, d)
      .filter(col("o_orderdate") >= ts("2000-01-01 00:00:00"))
      .select("o_custkey")
    Tables.customer(s, d)
      .join(recent, col("c_custkey") === col("o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_name"), col("c_acctbal"))
  }

  private val qAntiJoinSql =
    """SELECT c_custkey, c_name, c_acctbal
      |FROM customer c
      |WHERE NOT EXISTS (SELECT 1 FROM orders o
      |                  WHERE o.o_custkey = c.c_custkey
      |                    AND o.o_orderdate >= TIMESTAMP '2000-01-01 00:00:00')""".stripMargin

  // --- events: hourly tumbling window (batch twin of streaming) ------
  private def qEventsHourly(s: SparkSession, d: String): DataFrame = {
    Tables.events(s, d)
      .groupBy(unix_timestamp(date_trunc("hour", col("ts"))).as("hour_epoch"),
        col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sumMoney2(col("value")).as("sum_value"),
        avgX1e4(sumMoney2(col("value"))).as("avg_value_x1e4"))
  }

  private val qEventsHourlySql =
    """SELECT CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS hour_epoch, event_type,
      |  COUNT(*) AS n_events,
      |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value,
      |  CAST(ROUND(CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) * 10000.0) AS BIGINT) AS avg_value_x1e4
      |FROM events
      |GROUP BY 1, 2""".stripMargin

  // --- events: trailing-window volume anomalies ----------------------
  /** Hourly event-volume anomaly detection — the metrics-monitoring
    * query an ops team runs on its event firehose: per (hour, type),
    * flag hours whose count sits more than 3 sigma from the TRAILING
    * 24-observed-hours mean. Aggregate-then-window: the window runs
    * over the tiny hourly rollup (hours × types rows), never the raw
    * events — at 100 TB the wide work is the one hash aggregate, and
    * the windows cost nothing.
    *
    * Engine parity: mean/variance come from window sums (sum, sum of
    * squares, count) combined in double arithmetic with the IDENTICAL
    * expression shape on both sides — built-in stddev would compare
    * Welford-vs-naive float paths and flip the flag at boundaries. The
    * sigma test is squared (no sqrt) and cleared of division by
    * (w_n − 1): (n − mean)²·(w_n−1) > 9·(Σn² − (Σn)²/w_n). The squared
    * term is summed as DOUBLE on both engines: counts are window sums
    * of ≤24 hourly values, exact in a double below 2^53, while Long
    * n² wraps silently past ~3e9 events/hour under non-ANSI Spark —
    * the 100 TB regime this query's Scaladoc targets. Hours with
    * fewer than 6 trailing observations are never flagged.
    */
  private def qHourlyAnomaly(s: SparkSession, d: String): DataFrame =
    hourlyAnomalyFrame(Tables.events(s, d))

  /** The frame-level core of q_hourly_anomaly, shared with the
    * streaming twin's spec (`EventStream.anomalyFlags` must reproduce
    * these exact rows for in-watermark data).
    */
  private[graft] def hourlyAnomalyFrame(events: DataFrame): DataFrame = {
    val hourly = events
      .groupBy(unix_timestamp(date_trunc("hour", col("ts"))).as("hour_epoch"),
        col("event_type"))
      .agg(count(lit(1)).as("n_events"))
    val w = Window.partitionBy("event_type").orderBy(asc("hour_epoch"))
      .rowsBetween(-24, -1)
    hourly
      .withColumn("w_n", count(col("n_events")).over(w))
      .withColumn("w_sum", sum(col("n_events")).over(w))
      .withColumn("w_sumsq",
        sum(col("n_events").cast("double") * col("n_events")).over(w))
      .select(col("hour_epoch"), col("event_type"), col("n_events"), col("w_n"),
        when(col("w_n") > 0,
          round(col("w_sum") * 10000.0 / col("w_n"), 0).cast(LongType)).as("mean_x1e4"),
        when(col("w_n") >= 6 &&
            pow(col("n_events") - col("w_sum").cast("double") / col("w_n"), 2)
              * (col("w_n") - 1) >
              lit(9.0) * (col("w_sumsq") - col("w_sum").cast("double") * col("w_sum") / col("w_n")),
          1L).otherwise(0L).as("is_anomaly"))
  }

  private val qHourlyAnomalySql =
    """WITH hourly AS (
      |  SELECT CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS hour_epoch, event_type,
      |         COUNT(*) AS n_events
      |  FROM events GROUP BY 1, 2),
      |w AS (
      |  SELECT hour_epoch, event_type, n_events,
      |    COUNT(n_events) OVER win AS w_n,
      |    SUM(n_events) OVER win AS w_sum,
      |    SUM(CAST(n_events AS DOUBLE) * n_events) OVER win AS w_sumsq
      |  FROM hourly
      |  WINDOW win AS (PARTITION BY event_type ORDER BY hour_epoch
      |                 ROWS BETWEEN 24 PRECEDING AND 1 PRECEDING))
      |SELECT hour_epoch, event_type, n_events, w_n,
      |  CASE WHEN w_n > 0 THEN CAST(ROUND(w_sum * 10000.0 / w_n) AS BIGINT) END AS mean_x1e4,
      |  CAST(CASE WHEN w_n >= 6 AND
      |    POWER(n_events - CAST(w_sum AS DOUBLE) / w_n, 2) * (w_n - 1) >
      |      9.0 * (w_sumsq - CAST(w_sum AS DOUBLE) * w_sum / w_n)
      |    THEN 1 ELSE 0 END AS BIGINT) AS is_anomaly
      |FROM w""".stripMargin

  // --- events: gap-based sessionization (30-min gap) -----------------
  private def qSessionize(s: SparkSession, d: String): DataFrame = {
    val byUser = Window.partitionBy("user_id").orderBy(asc("ts"), asc("event_id"))
    Tables.events(s, d)
      .withColumn("tus", unix_micros(col("ts")))
      .withColumn("prev_tus", lag(col("tus"), 1).over(byUser))
      .withColumn("new_s",
        when(col("prev_tus").isNull || col("tus") - col("prev_tus") > 1800000000L, 1L)
          .otherwise(0L))
      .withColumn("session_id",
        sum(col("new_s")).over(byUser.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy("user_id", "session_id")
      .agg(count(lit(1)).as("n_events"),
        min(col("tus")).as("start_us"), max(col("tus")).as("end_us"),
        sumMoney2(col("value")).as("sum_value"))
  }

  private val qSessionizeSql =
    """WITH x AS (
      |  SELECT user_id, event_id, value, epoch_us(ts) AS tus,
      |         LAG(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_tus
      |  FROM events),
      |y AS (
      |  SELECT *, CASE WHEN prev_tus IS NULL OR tus - prev_tus > 1800000000 THEN 1 ELSE 0 END AS new_s
      |  FROM x),
      |z AS (
      |  SELECT *, SUM(new_s) OVER (PARTITION BY user_id ORDER BY tus, event_id
      |                             ROWS UNBOUNDED PRECEDING) AS session_id
      |  FROM y)
      |SELECT user_id, CAST(session_id AS BIGINT) AS session_id, COUNT(*) AS n_events,
      |       MIN(tus) AS start_us, MAX(tus) AS end_us,
      |       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
      |FROM z GROUP BY user_id, session_id""".stripMargin

  // --- approx distinct: the 100 TB path (rows-only oracle; spec
  //     asserts HLL error < 5% vs exact) -----------------------------
  private def qApproxDistinct(s: SparkSession, d: String): DataFrame =
    // NOT fanned: the HLL partial agg is too cheap to pay the exchange
    // (measured 0.49 -> 0.67 s with the fan, r15)
    Tables.events(s, d)
      .groupBy("event_type")
      .agg(approx_count_distinct("user_id", 0.02).as("approx_users"),
        approx_count_distinct("event_id", 0.02).as("approx_events"))

  // --- approx percentiles: the sketch path beside q_percentiles ------
  /** The 100 TB alternative to exact percentiles: exact
    * `percentile()` buffers every value per group; `percentile_approx`
    * is Spark's KLL-style mergeable quantile sketch — fixed memory per
    * group, partial-aggregated map-side, one shuffle of sketch
    * buffers. Rows-only by design (Spark's sketch layout has no DuckDB
    * twin); the spec bounds its error against the exact query.
    */
  private def qApproxPercentiles(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .groupBy("event_type")
      .agg(expr("percentile_approx(value, array(0.5D, 0.9D, 0.99D), 10000)").as("p"))
      .select(col("event_type"),
        round(element_at(col("p"), 1), 4).as("p50a"),
        round(element_at(col("p"), 2), 4).as("p90a"),
        round(element_at(col("p"), 3), 4).as("p99a"))

  // --- events: exact distinct users per type -------------------------
  private def qDistinctUsers(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .groupBy("event_type")
      .agg(countDistinct("user_id").as("n_users"),
        count(lit(1)).as("n_events"))

  private val qDistinctUsersSql =
    """SELECT event_type, COUNT(DISTINCT user_id) AS n_users, COUNT(*) AS n_events
      |FROM events GROUP BY event_type""".stripMargin

  // --- pivot: daily event counts per type ----------------------------
  private val EventTypes = Seq("click", "error", "purchase", "signup", "view")
  private def qPivot(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .withColumn("day_epoch", unix_timestamp(date_trunc("day", col("ts"))))
      .groupBy("day_epoch")
      .pivot("event_type", EventTypes)
      .agg(count(lit(1)))
      .na.fill(0L, EventTypes)

  private val qPivotSql = {
    val cols = EventTypes.map(t =>
      s"""COUNT(*) FILTER (WHERE event_type = '$t') AS "$t"""").mkString(",\n  ")
    s"""SELECT CAST(epoch(date_trunc('day', ts)) AS BIGINT) AS day_epoch,
       |  $cols
       |FROM events GROUP BY 1""".stripMargin
  }

  // --- cube: all grouping-set combinations ---------------------------
  private def qCube(s: SparkSession, d: String): DataFrame =
    Tables.fanned(Tables.orders(s, d), col("o_orderkey")) // §2.5
      .cube("o_orderstatus", "o_orderpriority")
      .agg(sumMoney2(col("o_totalprice")).as("sum_price"),
        count(lit(1)).as("n_orders"))

  private val qCubeSql =
    """SELECT o_orderstatus, o_orderpriority,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
      |  COUNT(*) AS n_orders
      |FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)""".stripMargin

  // --- outliers via exact-decimal variance ---------------------------
  /** |v - mean| > 3 sigma per event type. Mean and variance come from
    * DECIMAL-exact sums (sum, sum of squares), so the 3-sigma boundary
    * is the same double on both engines — no summation-order
    * nondeterminism in the filter.
    */
  private def qOutliers(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
    val stats = ev.groupBy(col("event_type").as("et")).agg(
      sumMoney2(col("value")).as("sv"),
      sum((col("value") * col("value")).cast(DecimalType(28, 4))).cast(DoubleType).as("svv"),
      count(lit(1)).cast(DoubleType).as("n"))
      .select(col("et"), (col("sv") / col("n")).as("mean"),
        sqrt((col("svv") - col("sv") * col("sv") / col("n")) / (col("n") - 1.0)).as("sd"))
    ev.join(broadcast(stats), col("event_type") === col("et"))
      .filter(abs(col("value") - col("mean")) > col("sd") * 3.0)
      .select(col("event_id"), col("event_type"), col("value"),
        (round(col("mean") * 10000.0, 0) / 10000.0).as("type_mean"))
  }

  private val qOutliersSql =
    """WITH stats AS (
      |  SELECT event_type AS et,
      |    CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) /
      |      CAST(COUNT(*) AS DOUBLE) AS mean,
      |    sqrt((CAST(SUM(CAST(value * value AS DECIMAL(28,4))) AS DOUBLE)
      |          - CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE)
      |            * CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE)
      |            / CAST(COUNT(*) AS DOUBLE))
      |         / (CAST(COUNT(*) AS DOUBLE) - 1.0)) AS sd
      |  FROM events GROUP BY event_type)
      |SELECT e.event_id, e.event_type, e.value,
      |       ROUND(s.mean * 10000.0) / 10000.0 AS type_mean
      |FROM events e JOIN stats s ON e.event_type = s.et
      |WHERE abs(e.value - s.mean) > s.sd * 3.0""".stripMargin

  // --- rollup: revenue by returnflag with subtotal rows --------------
  private def qRollup(s: SparkSession, d: String): DataFrame =
    // fan before Expand×3 + decimal partial agg (single-split input)
    Tables.fanned(Tables.lineitem(s, d), col("l_orderkey"))
      .rollup("l_returnflag", "l_linestatus")
      .agg(sumMoney2(col("l_extendedprice")).as("sum_price"),
        count(lit(1)).as("n_rows"))

  private val qRollupSql =
    """SELECT l_returnflag, l_linestatus,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
      |  COUNT(*) AS n_rows
      |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)""".stripMargin

  // --- as-of join: latest prior event per error event ----------------
  private def qAsof(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
      .select(col("user_id"), col("event_id"), col("event_type"),
        unix_micros(col("ts")).as("tus"))
    val errors = ev.filter(col("event_type") === "error")
      .select("user_id", "event_id", "tus")
    graft.operators.AsOfJoin.join(errors, ev, by = "user_id",
        leftTs = "tus", rightTs = "tus", payload = col("tus"))
      .select(col("event_id"), col("asof_value").cast(LongType).as("prev_tus"))
  }

  private val qAsofSql =
    """SELECT a.event_id, CAST(epoch_us(b.ts) AS BIGINT) AS prev_tus
      |FROM (SELECT * FROM events WHERE event_type = 'error') a
      |ASOF JOIN events b ON a.user_id = b.user_id AND b.ts < a.ts""".stripMargin

  // --- range join: views inside each error's 10-minute window --------
  /** Interval join via [[graft.operators.RangeJoin]]'s bucket
    * blocking: each error event opens a 10-minute window [ts, ts+600s]
    * and we count the view events (any user) falling inside it. A
    * naive plan is a broadcast-nested-loop over |errors|·|views|
    * predicate pairs; the blocked plan explodes each window into ≤ 2
    * bucket rows, buckets each view into exactly one, and equi-joins
    * on the bucket — output-sized work at any scale. Windows overlap,
    * so a view legitimately counts toward several errors.
    */
  private def qRangeJoin(s: SparkSession, d: String): DataFrame = {
    val winUs = 600000000L // 10 min in micros; also the bucket width
    val ev = Tables.events(s, d).withColumn("us", unix_micros(col("ts")))
    val errors = ev.filter(col("event_type") === "error")
      .select(col("event_id").as("error_id"), col("us").as("w_start"),
        (col("us") + winUs).as("w_end"))
    val views = ev.filter(col("event_type") === "view")
      .select(col("event_id").as("view_id"), col("us").as("v_us"))
    graft.operators.RangeJoin
      .pointInInterval(errors, views, "w_start", "w_end", "v_us", bucketWidth = winUs)
      .groupBy("error_id")
      .agg(count(lit(1)).as("n_views"), min("view_id").as("first_view"))
  }

  private val qRangeJoinSql =
    """SELECT e.event_id AS error_id, COUNT(*) AS n_views, MIN(v.event_id) AS first_view
      |FROM (SELECT * FROM events WHERE event_type = 'error') e
      |JOIN (SELECT * FROM events WHERE event_type = 'view') v
      |  ON epoch_us(v.ts) BETWEEN epoch_us(e.ts) AND epoch_us(e.ts) + 600000000
      |GROUP BY 1""".stripMargin

  // --- exact interpolated percentiles per event type -----------------
  private def qPercentiles(s: SparkSession, d: String): DataFrame =
    // NOT fanned: the percentile buffers ship whole either way; the
    // exchange cost +0.09 s (bench A/B r15)
    Tables.events(s, d)
      .groupBy("event_type")
      .agg(round(expr("percentile(value, 0.5)"), 4).as("p50"),
        round(expr("percentile(value, 0.9)"), 4).as("p90"),
        round(expr("percentile(value, 0.99)"), 4).as("p99"))

  private val qPercentilesSql =
    """SELECT event_type,
      |  ROUND(quantile_cont(value, 0.5), 4) AS p50,
      |  ROUND(quantile_cont(value, 0.9), 4) AS p90,
      |  ROUND(quantile_cont(value, 0.99), 4) AS p99
      |FROM events GROUP BY event_type""".stripMargin

  // --- fixed-width histogram of event values -------------------------
  private def qHistogram(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .withColumn("bucket", least(floor(col("value") / 25.0), lit(19)).cast(LongType))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n"),
        sumMoney2(col("value")).as("sum_value"))

  private val qHistogramSql =
    """SELECT CAST(LEAST(FLOOR(value / 25.0), 19) AS BIGINT) AS bucket,
      |  COUNT(*) AS n,
      |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
      |FROM events GROUP BY 1""".stripMargin

  // --- data-quality profile of the events table ----------------------
  private def qProfile(s: SparkSession, d: String): DataFrame =
    // NOT fanned: countDistinct's expand already shuffles; the extra
    // exchange cost +0.15 s (bench A/B r15)
    Tables.events(s, d).agg(
      count(lit(1)).as("n_rows"),
      countDistinct("event_id").as("n_distinct_ids"),
      countDistinct("user_id").as("n_users"),
      countDistinct("event_type").as("n_types"),
      sum(when(col("props").isNull || col("props") === "", 1L).otherwise(0L)).as("n_empty_props"),
      round(min("value"), 4).as("min_value"),
      round(max("value"), 4).as("max_value"))

  private val qProfileSql =
    """SELECT COUNT(*) AS n_rows,
      |  COUNT(DISTINCT event_id) AS n_distinct_ids,
      |  COUNT(DISTINCT user_id) AS n_users,
      |  COUNT(DISTINCT event_type) AS n_types,
      |  CAST(SUM(CASE WHEN props IS NULL OR props = '' THEN 1 ELSE 0 END) AS BIGINT) AS n_empty_props,
      |  ROUND(MIN(value), 4) AS min_value,
      |  ROUND(MAX(value), 4) AS max_value
      |FROM events""".stripMargin

  // --- semi-structured: parse JSON props, aggregate extracted field --
  private def qJsonExtract(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .withColumn("k", get_json_object(col("props"), "$.k").cast(LongType))
      .groupBy("event_type")
      .agg(count(col("k")).as("n_with_k"),
        sum(col("k")).as("sum_k"),
        min(col("k")).as("min_k"), max(col("k")).as("max_k"))

  private val qJsonExtractSql =
    """SELECT event_type,
      |  COUNT(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS n_with_k,
      |  CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
      |  MIN(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS min_k,
      |  MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k
      |FROM events GROUP BY event_type""".stripMargin

  // --- sliding window: 2h windows sliding by 1h ----------------------
  private def qSlidingWindow(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .groupBy(window(col("ts"), "2 hours", "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"))
      .select(unix_timestamp(col("window.start")).as("window_epoch"),
        col("event_type"), col("n_events"))

  // each event belongs to the 1h-grid windows starting at
  // trunc(ts) and trunc(ts)-1h (width 2h, slide 1h)
  private val qSlidingWindowSql =
    """SELECT CAST(epoch(date_trunc('hour', ts) - k * INTERVAL 1 HOUR) AS BIGINT) AS window_epoch,
      |       event_type, COUNT(*) AS n_events
      |FROM events, UNNEST([0, 1]) AS t(k)
      |GROUP BY 1, 2""".stripMargin

  // --- argmax: each user's latest event --------------------------------
  private def qLastEvent(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .withColumn("tus", unix_micros(col("ts")))
      .groupBy("user_id")
      // (user_id, ts) is unique in the corpus, so plain argmax on the
      // timestamp is deterministic
      .agg(max_by(col("event_id"), col("tus")).as("last_event_id"),
        max(col("tus")).as("last_tus"),
        count(lit(1)).as("n_events"))

  private val qLastEventSql =
    """SELECT user_id,
      |  arg_max(event_id, epoch_us(ts)) AS last_event_id,
      |  MAX(epoch_us(ts)) AS last_tus,
      |  COUNT(*) AS n_events
      |FROM events GROUP BY user_id""".stripMargin

  // --- Markov transitions: event_type -> next event_type ---------------
  /** First-order transition matrix over per-user event sequences — the
    * behavioral-model input (what follows a `view`? how often does
    * `error` self-loop?). One lead() window partitioned by user (same
    * shuffle shape as sessionization: per-user partitions, never a
    * global sort), then a groupBy on (from, to) whose cardinality is
    * |event_types|^2 regardless of corpus size — partial aggregation
    * collapses it map-side, so the second shuffle carries a handful of
    * rows per partition at any SF. Probabilities leave as x1e4 BIGINTs
    * (the avg convention, SURVEY §4); the per-from normalizer is a
    * window over the |types|^2-row aggregate, not over the events.
    */
  private def qEventTransitions(s: SparkSession, d: String): DataFrame = {
    val byUser = Window.partitionBy("user_id").orderBy(asc("ts"), asc("event_id"))
    Tables.events(s, d)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withColumn("to_type", lead(col("event_type"), 1).over(byUser))
      .filter(col("to_type").isNotNull)
      .groupBy(col("event_type").as("from_type"), col("to_type"))
      .agg(count(lit(1)).as("n"))
      .withColumn("p_x1e4",
        round(col("n") * 10000.0 / sum(col("n")).over(Window.partitionBy("from_type")), 0)
          .cast(LongType))
  }

  private val qEventTransitionsSql =
    """WITH seq AS (
      |  SELECT event_type AS from_type,
      |    LEAD(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS to_type
      |  FROM events),
      |agg AS (
      |  SELECT from_type, to_type, COUNT(*) AS n
      |  FROM seq WHERE to_type IS NOT NULL GROUP BY 1, 2)
      |SELECT from_type, to_type, n,
      |  CAST(ROUND(n * 10000.0 / SUM(n) OVER (PARTITION BY from_type), 0) AS BIGINT) AS p_x1e4
      |FROM agg""".stripMargin

  // --- set ops: INTERSECT / EXCEPT -----------------------------------
  private def qSetOps(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
    val buyers = ev.filter(col("event_type") === "purchase").select("user_id").distinct()
    val erroring = ev.filter(col("event_type") === "error").select("user_id").distinct()
    val heavyViewers = ev.filter(col("event_type") === "view")
      .groupBy("user_id").agg(count(lit(1)).as("n"))
      .filter(col("n") > 13).select("user_id")
    buyers.intersect(erroring).except(heavyViewers)
  }

  private val qSetOpsSql =
    """SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase'
      |INTERSECT
      |SELECT DISTINCT user_id FROM events WHERE event_type = 'error'
      |EXCEPT
      |SELECT user_id FROM events WHERE event_type = 'view'
      |GROUP BY user_id HAVING COUNT(*) > 13""".stripMargin

  // --- ordered-event funnel ------------------------------------------
  /** view -> click -> purchase funnel depth per user, via the
    * conditional-min formulation: ONE shuffle on user_id collects each
    * stage's first-occurrence time as a filtered MIN (partial-agg
    * friendly), then the depth is a pure projection — no self-joins,
    * no per-user sequence sort, at any event volume.
    */
  private def qFunnel(s: SparkSession, d: String): DataFrame = {
    val firsts = Tables.events(s, d)
      .filter(col("event_type").isin("view", "click", "purchase"))
      .groupBy("user_id")
      .agg(
        min(when(col("event_type") === "view", unix_micros(col("ts")))).as("t_view"),
        min(when(col("event_type") === "click", unix_micros(col("ts")))).as("t_click"),
        min(when(col("event_type") === "purchase", unix_micros(col("ts")))).as("t_purchase"))
    firsts.select(
      when(col("t_view").isNull, 0L)
        .when(col("t_click").isNull || col("t_click") <= col("t_view"), 1L)
        .when(col("t_purchase").isNull || col("t_purchase") <= col("t_click"), 2L)
        .otherwise(3L).as("funnel_depth"))
      .groupBy("funnel_depth")
      .agg(count(lit(1)).as("n_users"))
  }

  private val qFunnelSql =
    """WITH firsts AS (
      |  SELECT user_id,
      |    MIN(CASE WHEN event_type = 'view' THEN epoch_us(ts) END) AS t_view,
      |    MIN(CASE WHEN event_type = 'click' THEN epoch_us(ts) END) AS t_click,
      |    MIN(CASE WHEN event_type = 'purchase' THEN epoch_us(ts) END) AS t_purchase
      |  FROM events WHERE event_type IN ('view', 'click', 'purchase')
      |  GROUP BY 1)
      |SELECT CAST(CASE WHEN t_view IS NULL THEN 0
      |            WHEN t_click IS NULL OR t_click <= t_view THEN 1
      |            WHEN t_purchase IS NULL OR t_purchase <= t_click THEN 2
      |            ELSE 3 END AS BIGINT) AS funnel_depth,
      |       COUNT(*) AS n_users
      |FROM firsts GROUP BY 1""".stripMargin

  // --- weekly cohort retention ---------------------------------------
  /** Cohort = each user's first-event epoch week; retention counts how
    * many of the cohort come back k weeks later (k = 0..3). Cohorts
    * and activity are both per-user aggregates FIRST, so the join
    * carries one row per user(-week), never one per event — broadcast
    * at test scale, a same-key shuffle join at corpus scale (both
    * sides already hash-partitioned by user_id from their aggregates).
    */
  private def qRetention(s: SparkSession, d: String): DataFrame = {
    val week = (unix_timestamp(col("ts")) / 604800L).cast(LongType)
    val events = Tables.events(s, d)
    val cohorts = events.groupBy("user_id").agg(min(week).as("cohort_week"))
    val active = events.select(col("user_id"), week.as("week")).distinct()
    cohorts.join(active, "user_id")
      .withColumn("weeks_later", col("week") - col("cohort_week"))
      .filter(col("weeks_later").between(0, 3))
      .groupBy("cohort_week", "weeks_later")
      .agg(count(lit(1)).as("n_users"))
  }

  private val qRetentionSql =
    """WITH cohorts AS (
      |  SELECT user_id, MIN(CAST(FLOOR(epoch(ts) / 604800) AS BIGINT)) AS cohort_week
      |  FROM events GROUP BY 1),
      |active AS (
      |  SELECT DISTINCT user_id, CAST(FLOOR(epoch(ts) / 604800) AS BIGINT) AS week
      |  FROM events)
      |SELECT c.cohort_week, a.week - c.cohort_week AS weeks_later,
      |       COUNT(*) AS n_users
      |FROM cohorts c JOIN active a USING (user_id)
      |WHERE a.week - c.cohort_week BETWEEN 0 AND 3
      |GROUP BY 1, 2""".stripMargin

  // --- correlation from exact sums ------------------------------------
  /** Pearson correlation of quantity vs extended price per return
    * flag. NOT the built-in `corr()`: both engines implement it with
    * order-dependent floating accumulation, so a shuffled Spark run
    * and sequential DuckDB disagree in late decimals. Here the five
    * moments (Sx, Sy, Sxy, Sxx, Syy) accumulate as DECIMAL — exact,
    * order-independent — and the correlation is one double-arithmetic
    * chain over those exact sums, identical on both engines. The agg
    * is a single partial-aggregate-friendly pass; the formula is a
    * projection on the k-row result.
    */
  private def qCorrelation(s: SparkSession, d: String): DataFrame = {
    val x = col("l_quantity")
    val y = col("l_extendedprice")
    // the five decimal-moment partial sums are the whole query's cost
    // and ran on ONE core against the single-row-group test file —
    // fan the scan first (guide §2.5; gated no-op on real layouts)
    val agg = Tables.fanned(Tables.lineitem(s, d), col("l_orderkey"))
      .groupBy("l_returnflag").agg(
      count(lit(1)).cast(DoubleType).as("n"),
      sum(dec2(x)).cast(DoubleType).as("sx"),
      sum(dec2(y)).cast(DoubleType).as("sy"),
      sum((x * y).cast(DecimalType(28, 4))).cast(DoubleType).as("sxy"),
      sum((x * x).cast(DecimalType(28, 4))).cast(DoubleType).as("sxx"),
      sum((y * y).cast(DecimalType(28, 4))).cast(DoubleType).as("syy"))
    agg.select(col("l_returnflag"),
      round((col("n") * col("sxy") - col("sx") * col("sy")) /
        sqrt((col("n") * col("sxx") - col("sx") * col("sx")) *
          (col("n") * col("syy") - col("sy") * col("sy"))), 4).as("corr_qty_price"))
  }

  private val qCorrelationSql =
    """WITH a AS (
      |  SELECT l_returnflag,
      |    CAST(COUNT(*) AS DOUBLE) AS n,
      |    CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sx,
      |    CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sy,
      |    CAST(SUM(CAST(l_quantity * l_extendedprice AS DECIMAL(28,4))) AS DOUBLE) AS sxy,
      |    CAST(SUM(CAST(l_quantity * l_quantity AS DECIMAL(28,4))) AS DOUBLE) AS sxx,
      |    CAST(SUM(CAST(l_extendedprice * l_extendedprice AS DECIMAL(28,4))) AS DOUBLE) AS syy
      |  FROM lineitem GROUP BY 1)
      |SELECT l_returnflag,
      |  ROUND((n * sxy - sx * sy) /
      |        sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)), 4) AS corr_qty_price
      |FROM a""".stripMargin

  // --- robust outliers: median absolute deviation --------------------
  /** MAD-based outliers — the robust twin of [[qOutliers]]'s 3-sigma
    * rule: mean/stddev are themselves dragged by the outliers they
    * hunt (masking), while median and MAD have a 50% breakdown point,
    * so heavy-tailed telemetry doesn't hide its own anomalies.
    * Flag |v - median| > 3 * 1.4826 * MAD (1.4826 scales MAD to sigma
    * under normality).
    *
    * Exact MAD is irreducibly two passes (the second percentile needs
    * the first's result in its argument); both are per-group exact
    * percentiles with the per-type results broadcast back. At 100 TB
    * swap `percentile` for `percentile_approx` and the same plan
    * becomes two fixed-memory sketch passes.
    */
  private def qOutliersMad(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
    val med = ev.groupBy(col("event_type").as("et"))
      .agg(expr("percentile(value, 0.5)").as("med"))
    val dev = ev.join(broadcast(med), col("event_type") === col("et"))
      .groupBy("et").agg(expr("percentile(abs(value - med), 0.5)").as("mad"))
    val stats = med.join(dev, "et")
    ev.join(broadcast(stats), col("event_type") === col("et"))
      .filter(abs(col("value") - col("med")) > col("mad") * 3.0 * 1.4826)
      .select(col("event_id"), col("event_type"), col("value"),
        (round(col("med") * 10000.0, 0) / 10000.0).as("type_median"))
  }

  private val qOutliersMadSql =
    """WITH med AS (
      |  SELECT event_type AS et, quantile_cont(value, 0.5) AS med
      |  FROM events GROUP BY 1),
      |dev AS (
      |  SELECT e.event_type AS et, quantile_cont(abs(e.value - m.med), 0.5) AS mad
      |  FROM events e JOIN med m ON e.event_type = m.et GROUP BY 1),
      |s AS (SELECT med.et, med.med, dev.mad FROM med JOIN dev USING (et))
      |SELECT e.event_id, e.event_type, e.value,
      |       ROUND(s.med * 10000.0) / 10000.0 AS type_median
      |FROM events e JOIN s ON e.event_type = s.et
      |WHERE abs(e.value - s.med) > s.mad * 3.0 * 1.4826""".stripMargin

  // --- gap fill over a generated hour spine --------------------------
  /** Hourly per-type event counts with missing (hour, type) cells
    * zero-filled from a generated spine — the densification step every
    * time-series consumer needs before charting/forecasting (a plain
    * groupBy silently drops empty buckets). The spine is
    * `sequence(min_hour, max_hour) x distinct types`: dimension-sized
    * (hours-in-range x type cardinality) regardless of event volume,
    * so the left join broadcasts the aggregated side and the only
    * corpus-wide work is the counting aggregation itself.
    */
  private def qGapFill(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d).select(
      floor(unix_timestamp(col("ts")) / 3600).cast(LongType).as("h"),
      col("event_type"))
    val counts = ev.groupBy("h", "event_type").agg(count(lit(1)).as("n"))
    // range AND types both derive from `counts`, not from `ev`: the
    // three uses then share one identical aggregation Exchange, which
    // physical planning dedupes (ReusedExchange) — events is scanned
    // once, not three times
    // the type universe is dimension-sized by definition — declare it
    // (the hint is also what the plan audit keys on: a loop join is
    // only legal against a provably-bounded or declared-bounded side)
    val spine = counts.agg(min("h").as("lo"), max("h").as("hi"))
      .select(explode(sequence(col("lo"), col("hi"))).as("h"))
      .crossJoin(broadcast(counts.select("event_type").distinct()))
    spine.join(counts, Seq("h", "event_type"), "left")
      .select((col("h") * 3600).as("hour_epoch"), col("event_type"),
        coalesce(col("n"), lit(0L)).as("n_events"))
  }

  private val qGapFillSql =
    """WITH b AS (
      |  SELECT CAST(FLOOR(epoch(ts) / 3600) AS BIGINT) AS h, event_type, COUNT(*) AS n
      |  FROM events GROUP BY 1, 2),
      |r AS (SELECT MIN(h) AS lo, MAX(h) AS hi FROM b),
      |spine AS (
      |  SELECT g.i AS h, t.event_type
      |  FROM r, UNNEST(generate_series(r.lo, r.hi)) AS g(i),
      |       (SELECT DISTINCT event_type FROM events) t)
      |SELECT s.h * 3600 AS hour_epoch, s.event_type, COALESCE(b.n, 0) AS n_events
      |FROM spine s LEFT JOIN b ON s.h = b.h AND s.event_type = b.event_type""".stripMargin

  // --- skew-safe salted join -----------------------------------------
  /** Per-supplier shipped volume via [[graft.operators.SaltedJoin]]:
    * the fact side is salted into `salts` sub-keys and the supplier dim
    * replicated once per salt, so a hot supplier's rows spread over
    * `salts` reducers instead of one straggler task. The oracle is the
    * PLAIN join + aggregate — salting must be semantically invisible,
    * and the hash-match proves it row-for-row. On this synthetic
    * (uniform) corpus AQE's skew handling would suffice; the query
    * exists to keep the manual operator oracle-checked for the cases
    * AQE can't touch (skewed aggregations, sub-threshold stragglers).
    * total_qty stays exact: quantities are integral-valued doubles, so
    * the double sum is order-independent.
    */
  private def qSkewJoin(s: SparkSession, d: String): DataFrame = {
    val li = Tables.lineitem(s, d).select(col("l_suppkey"), col("l_quantity"))
    val sup = Tables.supplier(s, d)
      .select(col("s_suppkey").as("l_suppkey"), col("s_name"))
    graft.operators.SaltedJoin.join(li, sup, "l_suppkey", salts = 8)
      .groupBy("s_name")
      .agg(count(lit(1)).as("n_items"), sum(col("l_quantity")).as("total_qty"))
  }

  private val qSkewJoinSql =
    """SELECT s_name, COUNT(*) AS n_items, SUM(l_quantity) AS total_qty
      |FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
      |GROUP BY 1""".stripMargin

  // --- decile stats: ntile bucketing of order values -----------------
  /** Order-value deciles: every order ranked into 10 equal-population
    * buckets, then per-bucket population stats — the "where does the
    * money concentrate" profile (decile 10's share vs the rest).
    *
    * NTILE needs a TOTAL order ((o_totalprice, o_orderkey) — ties on
    * price are broken by key) or bucket boundaries are
    * nondeterministic between engines. Plan shape: the window is one
    * global sort — exact decile edges are order statistics and
    * genuinely need it. The 100 TB variant replaces NTILE with
    * approx-percentile cut-points (q_approx_percentiles machinery)
    * broadcast back as a projection-only bucket assignment; registered
    * query keeps the exact form for oracle parity. Sums go through
    * DECIMAL so per-bucket totals are order-independent (file header).
    */
  private def qDeciles(s: SparkSession, d: String): DataFrame = {
    val w = Window.orderBy(col("o_totalprice"), col("o_orderkey"))
    Tables.orders(s, d)
      .select(col("o_orderkey"), col("o_totalprice"),
        // Spark's NTILE is int, DuckDB's is bigint — align on bigint
        ntile(10).over(w).cast(LongType).as("decile"))
      .groupBy("decile")
      .agg(
        count(lit(1)).as("n_orders"),
        min(col("o_totalprice")).as("min_price"),
        max(col("o_totalprice")).as("max_price"),
        sumMoney2(col("o_totalprice")).as("sum_price"))
  }

  private val qDecilesSql =
    """SELECT decile, COUNT(*) AS n_orders,
      |  MIN(o_totalprice) AS min_price, MAX(o_totalprice) AS max_price,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
      |FROM (SELECT o_orderkey, o_totalprice,
      |        NTILE(10) OVER (ORDER BY o_totalprice, o_orderkey) AS decile
      |      FROM orders) t
      |GROUP BY decile""".stripMargin

  /** The 100 TB decile plan [[qDeciles]]'s scaladoc promises: decile
    * EDGES from a KLL sketch (one partial-aggregated pass, 9 doubles
    * out), broadcast back, bucket assignment as a pure projection —
    * no global sort anywhere. Registered rows-only (sketch edges are
    * engine-specific); CurationOpsSpec bounds the per-bucket
    * population drift vs the exact NTILE at ≤2 rows + 1% on testdata.
    * Ties land left of the edge (`> cut`), matching NTILE's
    * first-bucket bias closely enough for the spec bound.
    */
  private def qDecilesApprox(s: SparkSession, d: String): DataFrame = {
    val o = Tables.orders(s, d)
    val cuts = o.agg(percentile_approx(col("o_totalprice"),
      typedlit((1 to 9).map(_ / 10.0)), lit(10000)).as("cuts"))
    val bucket = aggregate(
      transform(col("cuts"), c => when(col("o_totalprice") > c, 1L).otherwise(0L)),
      lit(1L), _ + _)
    o.crossJoin(broadcast(cuts))
      .select(col("o_orderkey"), col("o_totalprice"), bucket.as("decile"))
      .groupBy("decile")
      .agg(
        count(lit(1)).as("n_orders"),
        min(col("o_totalprice")).as("min_price"),
        max(col("o_totalprice")).as("max_price"),
        sumMoney2(col("o_totalprice")).as("sum_price"))
  }

  override val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_deciles"        -> (qDeciles _),
    "q_deciles_approx" -> (qDecilesApprox _),
    "q_correlation"    -> (qCorrelation _),
    "q_outliers_mad"   -> (qOutliersMad _),
    "q_gap_fill"       -> (qGapFill _),
    "q_skew_join"      -> (qSkewJoin _),
    "q_retention"      -> (qRetention _),
    "q_funnel"         -> (qFunnel _),
    "q_sliding_window" -> (qSlidingWindow _),
    "q_last_event"     -> (qLastEvent _),
    "q_event_transitions" -> (qEventTransitions _),
    "q_set_ops"        -> (qSetOps _),
    "q_json_extract"   -> (qJsonExtract _),
    "q_asof_join"      -> (qAsof _),
    "q_range_join"     -> (qRangeJoin _),
    "q_percentiles"    -> (qPercentiles _),
    "q_histogram"      -> (qHistogram _),
    "q_profile"        -> (qProfile _),
    "q_pivot_daily"    -> (qPivot _),
    "q_cube"           -> (qCube _),
    "q_outliers"       -> (qOutliers _),
    "q_rollup"         -> (qRollup _),
    "q_distinct_users" -> (qDistinctUsers _),
    "q_approx_distinct" -> (qApproxDistinct _),
    "q_approx_percentiles" -> (qApproxPercentiles _),
    "q1_pricing"       -> (q1 _),
    "q3_topk_join"     -> (q3 _),
    "q5_region_volume" -> (q5 _),
    "q6_forecast"      -> (q6 _),
    "q_window_topcust" -> (qWindowTopcust _),
    "q_semi_join"      -> (qSemiJoin _),
    "q_anti_join"      -> (qAntiJoin _),
    "q_events_hourly"  -> (qEventsHourly _),
    "q_hourly_anomaly" -> (qHourlyAnomaly _),
    "q_sessionize"     -> (qSessionize _))

  override val oracleSql: Map[String, String] = Map(
    "q_deciles"        -> qDecilesSql,
    "q_correlation"    -> qCorrelationSql,
    "q_outliers_mad"   -> qOutliersMadSql,
    "q_gap_fill"       -> qGapFillSql,
    "q_skew_join"      -> qSkewJoinSql,
    "q_retention"      -> qRetentionSql,
    "q_funnel"         -> qFunnelSql,
    "q_sliding_window" -> qSlidingWindowSql,
    "q_last_event"     -> qLastEventSql,
    "q_event_transitions" -> qEventTransitionsSql,
    "q_set_ops"        -> qSetOpsSql,
    "q_json_extract"   -> qJsonExtractSql,
    "q_asof_join"      -> qAsofSql,
    "q_range_join"     -> qRangeJoinSql,
    "q_percentiles"    -> qPercentilesSql,
    "q_histogram"      -> qHistogramSql,
    "q_profile"        -> qProfileSql,
    "q_pivot_daily"    -> qPivotSql,
    "q_cube"           -> qCubeSql,
    "q_outliers"       -> qOutliersSql,
    "q_rollup"         -> qRollupSql,
    "q_distinct_users" -> qDistinctUsersSql,
    "q1_pricing"       -> q1Sql,
    "q3_topk_join"     -> q3Sql,
    "q5_region_volume" -> q5Sql,
    "q6_forecast"      -> q6Sql,
    "q_window_topcust" -> qWindowTopcustSql,
    "q_semi_join"      -> qSemiJoinSql,
    "q_anti_join"      -> qAntiJoinSql,
    "q_events_hourly"  -> qEventsHourlySql,
    "q_hourly_anomaly" -> qHourlyAnomalySql,
    "q_sessionize"     -> qSessionizeSql)
}
