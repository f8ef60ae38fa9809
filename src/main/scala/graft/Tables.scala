package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the test corpus (TPC-H-ish star schema + events stream
  * table + documents/embeddings for the vector & LLM-pipeline ops).
  *
  * All reads are plain parquet scans: column pruning and predicate
  * pushdown are left to Catalyst — callers `select`/`filter` and the
  * scan narrows (verify via `PushedFilters`/`ReadSchema` in explain).
  */
object Tables {
  private def t(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** Fan a scan across cores BEFORE heavy per-row work when the source
    * layout cannot: the test parquet ships one row group per table, so
    * the scan is a single input split and every narrow operator above
    * it (explodes, per-doc scoring, decimal partial aggregation) runs
    * on ONE core while the other 31 idle (guide §2.5: "input skew: one
    * huge unsplittable file … otherwise repartition immediately after
    * the read"). GATED on the actual scan parallelism vs the
    * cluster's, so on a real multi-file corpus this is the identity —
    * an unconditional repartition here would add a full-table shuffle
    * exactly where the scan is already parallel, which is the wrong
    * 100 TB plan for aggregation-shaped queries whose partial
    * aggregates otherwise run before any exchange.
    *
    * Keyed repartition (hash on a high-cardinality column, no
    * round-robin) keeps row placement deterministic without the local
    * sort `repartition(n)` pays (SPARK-23207), and consumers keep the
    * repo's order-independence conventions (integer/decimal sums,
    * tie-broken windows), so results are partitioning-invariant.
    */
  private[graft] def fanned(df: DataFrame,
                            key: org.apache.spark.sql.Column): DataFrame = {
    val s = df.sparkSession
    val p = s.sparkContext.defaultParallelism
    // Scan-parallelism estimate from the FILE INDEX ONLY — deliberately
    // not df.rdd.getNumPartitions: materializing the RDD plans the
    // whole query AND fires a QueryExecutionListener event per call
    // (Spark 4 emits "rdd" actions), which broke the pipeline
    // accounting specs and costs a full planning pass. The estimate
    // replicates FilePartition.maxSplitBytes' sizing (min(maxPartition,
    // max(openCost, total/minPartitionNum))) over the relation's
    // sizeInBytes — identical asymptotics: ~1 split for a small
    // single-file table (fan), thousands at corpus scale (identity).
    val conf = s.sessionState.conf
    val est = df.queryExecution.analyzed.collect {
      case l: org.apache.spark.sql.execution.datasources.LogicalRelation =>
        l.relation match {
          case h: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
            val bytes = h.location.sizeInBytes
            val nFiles = math.max(h.location.inputFiles.length, 1)
            val maxSplit = math.max(conf.filesOpenCostInBytes,
              math.min(conf.filesMaxPartitionBytes, bytes / math.max(p, 1)))
            math.min(nFiles * 32L, // openCost packs ≥ this many per split
              math.max(1L, (bytes + maxSplit - 1) / maxSplit))
          case _ => Long.MaxValue
        }
    }
    // no file relation (in-memory/checkpointed input): keep the
    // pre-gate behavior and fan — such frames are test fixtures or
    // already-bounded intermediates, never a 100 TB scan
    if (est.isEmpty || est.sum < p) df.repartition(p, key) else df
  }

  def region(s: SparkSession, d: String): DataFrame    = t(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = t(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = t(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = t(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = t(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = t(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = t(s, d, "lineitem")
  /** events.ts has shipped in three parquet encodings across testdata
    * generations; normalize all of them to session-tz TimestampType so
    * downstream window / unix_micros / session_window consumers see one
    * shape:
    *  - TIMESTAMP(NANOS): with spark.sql.legacy.parquet.nanosAsLong=true
    *    it reads as Long nanos → floor-divide to micros, rebuild.
    *  - timestamp[us] without tz: reads as TIMESTAMP_NTZ → cast to
    *    TimestampType. The session tz is pinned UTC (GraftSession), so
    *    the wall-clock reinterpretation is the identity on the instant
    *    and DuckDB oracle parity holds.
    *  - timestamp with tz: already TimestampType, pass through.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    val raw = t(s, d, "events")
    raw.schema("ts").dataType match {
      case LongType =>
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType =>
        raw.withColumn("ts", col("ts").cast(TimestampType))
      case _ => raw
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = t(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = t(s, d, "embeddings")
}

/** A named block of driver-checkable queries with their DuckDB oracle
  * SQL. `SparkEntry` unions all modules. Keys with no oracle entry get
  * the driver's weaker rows-only check (non-SQL-expressible ops).
  */
trait QueryModule {
  def queries: Map[String, (SparkSession, String) => DataFrame]
  def oracleSql: Map[String, String]
}
