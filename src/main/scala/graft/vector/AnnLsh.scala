package graft.vector

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import graft.{QueryModule, Tables}
import graft.expressions.VectorExpressions._

/** Random-hyperplane LSH ANN (SURVEY §2 block D) — the bucketed scale
  * path for similarity search. L tables of b sign bits each; a
  * candidate pair must collide in at least one table. Bucketing,
  * scoring and per-query top-k are all equi-join/window work: shuffle
  * keys are (table, bucket), never all-pairs.
  *
  * Deterministic hyperplanes from a fixed seed, so results are stable
  * across runs (rows-only driver check; AnnLshSpec asserts recall
  * against the exact top-k).
  */
object AnnLsh extends QueryModule {
  private val Dim = 64
  private val NumTables = 4
  private val BitsPerTable = 6

  /** Deterministic gaussian hyperplanes: result(t)(p) is one
    * dim-vector; one seeded stream fills tables then planes then
    * components, so the same (seed, shape) always yields the same
    * planes across runs and JVMs.
    */
  private[graft] def hyperplanesFor(numTables: Int, bitsPerTable: Int,
                                    dim: Int, seed: Long): Array[Array[Array[Double]]] = {
    val rnd = new scala.util.Random(seed)
    Array.fill(numTables, bitsPerTable)(Array.fill(dim)(rnd.nextGaussian()))
  }

  /** hyperplanes(t)(p) is one Dim-vector; seed fixed per (table, plane). */
  private[vector] val hyperplanes: Array[Array[Array[Double]]] =
    hyperplanesFor(NumTables, BitsPerTable, Dim, seed = 7)

  /** Sign-bit bucket id of vector `v` against one table's planes — a
    * pure projection (bitsPerTable dot products against plan-literal
    * hyperplanes).
    */
  private[graft] def bucketIn(v: Column, planes: Array[Array[Double]]): Column =
    planes.zipWithIndex.map { case (h, i) =>
      when(dotProduct(v, typedlit(h.toSeq)) > 0, lit(1L << i)).otherwise(lit(0L))
    }.reduce((a, b) => a.bitwiseOR(b))

  private[vector] def bucket(v: Column, t: Int): Column = bucketIn(v, hyperplanes(t))

  /** (id, table, bucket) exploded bucketing of a vector DataFrame with
    * explicit table-count/width — more tables with fewer bits pushes
    * candidate recall up at the cost of larger buckets; callers pick
    * the point on that curve for their similarity threshold.
    */
  private[graft] def bucketsWith(df: DataFrame, idCol: String, vecCol: String,
                                 numTables: Int, bitsPerTable: Int,
                                 dim: Int = Dim, seed: Long = 7): DataFrame = {
    val planes = hyperplanesFor(numTables, bitsPerTable, dim, seed)
    df.select(col(idCol), posexplode(array((0 until numTables).map(t =>
      bucketIn(col(vecCol), planes(t))): _*)).as(Seq("table", "bucket")))
  }

  /** (id, table, bucket) exploded bucketing of a vector DataFrame. */
  private[graft] def buckets(df: DataFrame, idCol: String, vecCol: String): DataFrame =
    df.select(col(idCol), posexplode(array((0 until NumTables).map(t =>
      bucket(col(vecCol), t)): _*)).as(Seq("table", "bucket")))

  /** Top-5 bucketed-candidate neighbors for each query (vec_id < 20). */
  private def lshTopk(s: SparkSession, d: String): DataFrame = {
    val e = Tables.embeddings(s, d)
    val b = buckets(e, "vec_id", "embedding")
    val qb = b.filter(col("vec_id") < 20)
      .withColumnRenamed("vec_id", "query_id")
    val cand = qb.join(b, Seq("table", "bucket"))
      .filter(col("vec_id") =!= col("query_id"))
      .select("query_id", "vec_id").distinct()
    val vecs = e.select(col("vec_id"), col("embedding"))
    cand
      .join(vecs.withColumnRenamed("vec_id", "query_id").withColumnRenamed("embedding", "qv"),
        "query_id")
      .join(vecs, "vec_id")
      .withColumn("score0", cosineSim(col("embedding"), col("qv")))
      .groupBy("query_id")
      .agg(graft.expressions.TopKAgg.topK(col("score0"), col("vec_id"), 5).as("tops"))
      .select(col("query_id"), posexplode(col("tops")).as(Seq("pos", "t")))
      .select(col("query_id"), (col("pos") + 1).cast(LongType).as("rank"),
        col("t.id").as("vec_id"), round(col("t.score"), 4).as("score"))
  }

  override val queries: Map[String, (SparkSession, String) => DataFrame] =
    Map("ann_lsh_topk" -> (lshTopk _))
  override val oracleSql: Map[String, String] = Map.empty
}
