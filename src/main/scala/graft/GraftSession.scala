package graft

import org.apache.spark.sql.SparkSession

/** Session factory with the engine's tuned defaults.
  *
  * Local mode uses `local[N]` with N shuffle partitions; on a real
  * cluster the same builder is used minus `master`, and
  * `spark.sql.shuffle.partitions` should be sized to ~2-3x total
  * executor cores (AQE coalesces the tail). All graft operators assume
  * AQE is on (skew-join splitting, dynamic coalescing) and session
  * timezone UTC (oracle parity).
  */
object GraftSession {
  def builder(appName: String = "graft"): SparkSession.Builder =
    SparkSession.builder()
      .appName(appName)
      .withExtensions(new GraftExtensions)
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      // events.parquet stores ts as TIMESTAMP(NANOS): Spark has no nanos
      // type, so read as Long and convert in Tables.events.
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.filterPushdown", "true")
      // a service running this library compiles hundreds of distinct
      // generated classes (80+ queries x several stages, plus per-query
      // literal codebooks); the default 100-entry codegen cache thrashes
      // and re-JITs plans that will run again — size it to hold the
      // working set (entries are weak-referenced class bytecode, cheap)
      .config("spark.sql.codegen.cache.maxEntries", "2000")
      .config("spark.ui.enabled", "false")

  def local(cores: Int = 32, appName: String = "graft"): SparkSession =
    builder(appName).master(s"local[$cores]").getOrCreate()
}
