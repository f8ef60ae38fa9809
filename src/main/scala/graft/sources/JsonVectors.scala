package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** JSON-lines vector interchange in the reference's on-disk shape:
  * `{"id": ..., "vector": [...]}` (storage_server.py stores exactly
  * this JSON per row in SQLite). Lets a reference deployment dump its
  * shards and bulk-load them here, and vice versa.
  *
  * The reference keys vectors by TEXT (storage_server.py:17-20,
  * `id TEXT PRIMARY KEY`), so ids default to strings; pass
  * `idType = LongType` for numeric-id corpora.
  *
  * Schema is always supplied on read — at 100 TB, schema inference is
  * a full extra pass over the data.
  */
object JsonVectors {
  def schemaFor(idType: DataType): StructType = StructType(Seq(
    StructField("id", idType, nullable = false),
    StructField("vector", ArrayType(DoubleType, containsNull = false), nullable = false)))

  /** Reference-shaped schema: TEXT ids. */
  val schema: StructType = schemaFor(StringType)

  def write(df: DataFrame, path: String, idCol: String = "id", vecCol: String = "vector"): Unit =
    df.select(col(idCol).as("id"),
        col(vecCol).cast("array<double>").as("vector"))
      .write.mode(SaveMode.Overwrite).json(path)

  def read(spark: SparkSession, path: String, idType: DataType = StringType): DataFrame =
    spark.read.schema(schemaFor(idType)).json(path)
}
