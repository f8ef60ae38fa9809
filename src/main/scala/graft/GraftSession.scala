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
      // A service running the full suite compiles hundreds of distinct
      // generated classes (80+ queries x several stages); the default
      // 100-entry codegen cache thrashes and re-JITs steady-state plans
      // (~30% suite-wide cost measured at r6). The cache is a size-bounded
      // Guava cache holding generated classes STRONGLY until eviction, and
      // loaded classes occupy metaspace until their classloader is
      // collected — so a big cache trades driver metaspace for JIT time.
      // Default sized for this suite's working set; applications with few
      // distinct plans should dial it down via SPARK_GRAFT_CODEGEN_CACHE
      // (or override spark.sql.codegen.cache.maxEntries on the session).
      .config("spark.sql.codegen.cache.maxEntries",
        sys.env.getOrElse("SPARK_GRAFT_CODEGEN_CACHE", "2000"))
      // ObjectHashAggregateExec (every TypedImperativeAggregate: TopKAgg,
      // MinHashAgg, SimHashAgg, CountMinAgg, VectorSumAgg) falls back to
      // SORT-BASED aggregation after this many DISTINCT KEYS per task —
      // Spark's default is 128, sized for giant per-key sketches, not for
      // bounded buffers. Our groups are queries (knn/bm25 serving joins)
      // or documents (minhash/simhash signatures): thousands-to-millions
      // of keys with K-bounded buffers of a few hundred bytes each. At
      // the 5k-query x 1M-vector knn JOIN the fallback sorts the whole
      // joined stream per task: 173 s vs 40 s with hashing kept (measured
      // round 12, RangeProfile). 64k keys x ~1 kB sketch ≈ 64 MB per
      // task worst-case — safe at executor sizes this engine targets;
      // override via SPARK_GRAFT_OBJ_AGG_KEYS for memory-tight clusters.
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold",
        sys.env.getOrElse("SPARK_GRAFT_OBJ_AGG_KEYS", "65536"))
      // Let the planner pick shuffled-hash over sort-merge when its
      // size conditions hold (guide §3.1: "often faster when one side
      // is moderately small per partition" — SHJ skips both sides'
      // sorts; join strategy never changes results). The suite's SMJs
      // are shortlist/model-sized frames where the sort is pure
      // overhead; at cluster scale the planner's own per-partition
      // size checks still guard the hash build, and memory-tight
      // deployments can flip it back via SPARK_GRAFT_PREFER_SMJ=true.
      .config("spark.sql.join.preferSortMergeJoin",
        sys.env.getOrElse("SPARK_GRAFT_PREFER_SMJ", "false"))
      .config("spark.ui.enabled", "false")

  def local(cores: Int = 32, appName: String = "graft"): SparkSession =
    builder(appName).master(s"local[$cores]").getOrCreate()
}
