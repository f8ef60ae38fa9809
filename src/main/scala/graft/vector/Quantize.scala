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

  // --- int8 serving path: quantized shortlist + exact re-rank --------
  /** knn over the int8-compressed corpus: score DEQUANTIZED codes
    * (q_i / scale — a map-side projection over 68 B/row instead of
    * 256 B/row, the 4x scan-IO win that is the point of SQ at 100 TB),
    * TakeOrdered a 64-wide shortlist (per-partition heaps, no global
    * sort), then re-rank the shortlist against the RAW vectors via a
    * broadcast id join — id-pushdown makes the raw-side read
    * shortlist-sized. Exact whenever the shortlist covers the true
    * top-10 (QuantizeSourcesSpec asserts end-to-end equality with
    * vdb_knn_exact at two SFs; int8 reconstruction error
    * ~1e-2 per dim vs neighbor gaps ~1e-1 on the test corpus), so the
    * oracle is plain exact cosine knn — the same contract as
    * vdb_knn_pq/vdb_knn_opq, one rung up the compression ladder
    * (SQ8 4x < PQ 16x) with no codebook training at all.
    */
  private def knnSq(s: SparkSession, d: String): DataFrame = {
    import graft.expressions.VectorExpressions._
    val e = Tables.embeddings(s, d)
    val q = e.filter(col("vec_id") === 0)
      .select(col("embedding").cast("array<double>")).head().getSeq[Double](0).toArray
    val corp = quantize(e.filter(col("vec_id") =!= 0))
    val deq = transform(col("q_codes"), c => c.cast(DoubleType) / col("q_scale"))
    val short = corp
      .withColumn("s0", cosineSim(deq, typedlit(q.toSeq)))
      .orderBy(desc("s0"), asc("vec_id")).limit(64)
      .select("vec_id")
    e.filter(col("vec_id") =!= 0).join(broadcast(short), "vec_id")
      .withColumn("score0", cosineSim(col("embedding").cast("array<double>"), typedlit(q.toSeq)))
      .orderBy(desc("score0"), asc("vec_id"))
      .limit(10)
      .select(col("vec_id"), round(col("score0"), 4).as("score"))
  }

  // exact re-rank reproduces plain exact knn (vdb_knn_exact's contract)
  private val knnSqSql =
    """SELECT b.vec_id,
      |  ROUND(list_cosine_similarity(b.embedding::DOUBLE[], a.embedding::DOUBLE[]), 4) AS score
      |FROM embeddings a JOIN embeddings b ON b.vec_id <> 0
      |WHERE a.vec_id = 0
      |ORDER BY list_cosine_similarity(b.embedding::DOUBLE[], a.embedding::DOUBLE[]) DESC, b.vec_id
      |LIMIT 10""".stripMargin

  override val queries: Map[String, (SparkSession, String) => DataFrame] =
    Map("vdb_quantize" -> (quantError _),
        "vdb_knn_sq"   -> (knnSq _))
  override val oracleSql: Map[String, String] =
    Map("vdb_quantize" -> quantErrorSql,
        "vdb_knn_sq"   -> knnSqSql)
}
