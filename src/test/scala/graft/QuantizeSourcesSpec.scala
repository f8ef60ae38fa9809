package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.expressions.VectorExpressions._
import graft.sources.JsonVectors
import graft.vector.Quantize

class QuantizeSourcesSpec extends AnyFunSuite {
  lazy val spark: SparkSession = GraftSession.local(4, "graft-test")
  val sf = "/root/testdata/sf0.001"

  test("int8 quantized knn keeps high recall@10 vs exact") {
    val e = Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("embedding"))
    val deq = Quantize.dequantize(Quantize.quantize(e))
      .select(col("vec_id"), col("deq"))
    val q = e.filter(col("vec_id") === 0).head().getSeq[Double](1).toArray

    def topk(df: org.apache.spark.sql.DataFrame, vcol: String): Seq[Long] =
      df.filter(col("vec_id") =!= 0)
        .select(col("vec_id"), cosineSim(col(vcol), typedlit(q.toSeq)).as("s"))
        .orderBy(desc("s"), col("vec_id").asc).limit(10)
        .collect().map(_.getLong(0)).toSeq

    val exact = topk(e, "embedding").toSet
    val quant = topk(deq, "deq").toSet
    val recall = (exact intersect quant).size.toDouble / exact.size
    assert(recall >= 0.9, s"quantized recall@10 = $recall")
  }

  test("quantization error bounded by half a code step") {
    val df = SparkEntry.queries("vdb_quantize")(spark, sf)
    // max per-element error is 0.5/scale; outputs are rounded (scale
    // to 4 dp, err to 6 dp) so allow matching slack
    assert(df.filter(col("max_abs_err") > lit(0.5) / col("q_scale") + 1e-4).count() === 0)
  }

  test("JSON vector source round-trips the reference interchange shape") {
    val dir = Files.createTempDirectory("graft-json").toString + "/vecs"
    val e = Tables.embeddings(spark, sf)
      .select(col("vec_id").as("id"), col("embedding").as("vector"))
    JsonVectors.write(e, dir)
    val back = JsonVectors.read(spark, dir, idType = org.apache.spark.sql.types.LongType)
    assert(back.count() === e.count())
    // values survive the round trip
    val a = e.filter(col("id") === 5).select(col("vector").cast("array<double>"))
      .head().getSeq[Double](0)
    val b = back.filter(col("id") === 5).select("vector").head().getSeq[Double](0)
    assert(a.zip(b).forall { case (x, y) => math.abs(x - y) < 1e-6 })
    // raw file lines are the reference's {"id":...,"vector":[...]} shape
    val line = spark.read.text(dir).head().getString(0)
    assert(line.contains("\"id\"") && line.contains("\"vector\""))
  }
}
