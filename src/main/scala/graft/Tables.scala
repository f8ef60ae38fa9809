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
