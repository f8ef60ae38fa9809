package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** JSON-lines vector interchange in the reference's on-disk shape:
  * `{"id": ..., "vector": [...]}` (storage_server.py stores exactly
  * this JSON per row in SQLite). Lets a reference deployment dump its
  * shards and bulk-load them here, and vice versa.
  *
  * Schema is always supplied on read — at 100 TB, schema inference is
  * a full extra pass over the data.
  */
object JsonVectors {
  val schema: StructType = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("vector", ArrayType(DoubleType, containsNull = false), nullable = false)))

  def write(df: DataFrame, path: String, idCol: String = "id", vecCol: String = "vector"): Unit =
    df.select(col(idCol).cast(LongType).as("id"),
        col(vecCol).cast("array<double>").as("vector"))
      .write.mode(SaveMode.Overwrite).json(path)

  def read(spark: SparkSession, path: String): DataFrame =
    spark.read.schema(schema).json(path)
}
