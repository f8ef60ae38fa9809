package graft.vector

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

import graft.{QueryModule, Tables}

/** Int8 scalar quantization for embedding columns — the storage/IO
  * lever at 100 TB: a 64-dim float vector (256 B) becomes 64 int8s +
  * one float scale (~68 B), and cosine on dequantized vectors loses
  * almost no recall (QuantizeSpec asserts recall@10 vs exact).
  *
  * Per-vector symmetric quantization: scale = 127 / max|x|;
  * q_i = round(x_i * scale); dequant r_i = q_i / scale. Pure
  * column-level HOF arithmetic — map-only, no shuffle, and exactly
  * mirrorable in the DuckDB oracle.
  */
object Quantize extends QueryModule {

  private def maxAbs(v: Column): Column =
    array_max(transform(v, x => abs(x)))

  /** array<tinyint>-ish quantized codes (kept as int for parquet
    * friendliness) + the per-vector scale.
    */
  def quantize(df: DataFrame, vecCol: String = "embedding"): DataFrame = {
    val v = col(vecCol).cast("array<double>")
    df.withColumn("q_scale",
        when(maxAbs(v) === 0, 1.0).otherwise(lit(127.0) / maxAbs(v)))
      .withColumn("q_codes", transform(v, x => round(x * col("q_scale"), 0).cast("int")))
  }

  /** Dequantized array<double> column from quantize() output. */
  def dequantize(df: DataFrame): DataFrame =
    df.withColumn("deq", transform(col("q_codes"), c => c.cast(DoubleType) / col("q_scale")))

  /** Per-vector quantization quality: scale and reconstruction error. */
  private def quantError(s: SparkSession, d: String): DataFrame = {
    val q = dequantize(quantize(Tables.embeddings(s, d)))
    val err = zip_with(col("embedding").cast("array<double>"), col("deq"),
      (a, b) => abs(a - b))
    q.select(col("vec_id"),
      round(col("q_scale"), 4).as("q_scale"),
      round(array_max(err), 6).as("max_abs_err"))
  }

  private val quantErrorSql =
    """WITH q AS (
      |  SELECT vec_id, embedding::DOUBLE[] AS v,
      |    CASE WHEN list_max(list_transform(embedding::DOUBLE[], x -> abs(x))) = 0 THEN 1.0
      |         ELSE 127.0 / list_max(list_transform(embedding::DOUBLE[], x -> abs(x))) END AS s
      |  FROM embeddings)
      |SELECT vec_id, ROUND(s, 4) AS q_scale,
      |  ROUND(list_max(list_transform(v, x -> abs(x - CAST(round(x * s, 0) AS INT) / s))), 6)
      |    AS max_abs_err
      |FROM q""".stripMargin

  override val queries: Map[String, (SparkSession, String) => DataFrame] =
    Map("vdb_quantize" -> (quantError _))
  override val oracleSql: Map[String, String] = Map("vdb_quantize" -> quantErrorSql)
}
