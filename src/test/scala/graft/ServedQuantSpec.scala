package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.vector.{Opq, ProductQuantizer, ServedQuant}

/** Served PQ/OPQ codebook artifacts: serve-many equals train-per-call
  * bit-identically, repeat serves don't retrain, and a content edit —
  * even count-preserving — rebuilds (the servedIdx staleness
  * contract).
  */
class ServedQuantSpec extends AnyFunSuite {
  lazy val spark: SparkSession = GraftSession.local(4, "graft-test")
  import spark.implicits._

  private def writeVecs(dir: String, scale: Double, n: Int = 300): Unit =
    (0 until n).map { i =>
      (i.toLong, Array.tabulate(64)(d => scale * math.sin(i * 13 + d * 3)))
    }.toDF("vec_id", "embedding")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")

  test("served PQ == per-call trained PQ, and repeat serve skips training") {
    val dir = java.nio.file.Files.createTempDirectory("graft-servpq").toString
    writeVecs(dir, 1.0)
    ServedQuant.invalidateServed()
    val (served, codes) = ServedQuant.servedPq(spark, dir, numSubspaces = 16)
    val direct = ProductQuantizer.train(
      Tables.embeddings(spark, dir).sample(0.2, 42L), numSubspaces = 16)
    assert(served.subDim === direct.subDim)
    assert(served.centroids.flatten.flatten.toSeq ===
      direct.centroids.flatten.flatten.toSeq,
      "served codebook must be bit-identical to a per-call train")
    assert(codes.count() === 300L)
    // repeat serve: same artifact (meta mtime untouched — no rewrite)
    val metaFiles = new java.io.File(
      graft.text.TextAnalysis.termIdxDir(dir, "-pq-m16-v1") + "/meta").listFiles()
    val mtime = metaFiles.map(_.lastModified).max
    val (again, _) = ServedQuant.servedPq(spark, dir, numSubspaces = 16)
    assert(again.centroids.flatten.flatten.toSeq ===
      direct.centroids.flatten.flatten.toSeq)
    assert(metaFiles.map(_.lastModified).max === mtime,
      "a repeat serve must not rewrite the artifact")
  }

  test("count-preserving vector edit retrains PQ (stamp catches mutation)") {
    val dir = java.nio.file.Files.createTempDirectory("graft-servpq2").toString
    writeVecs(dir, 1.0)
    ServedQuant.invalidateServed()
    val (m1, _) = ServedQuant.servedPq(spark, dir, numSubspaces = 16)
    writeVecs(dir, 2.5) // same count, same dims, different content
    ServedQuant.invalidateServed()
    val (m2, codes2) = ServedQuant.servedPq(spark, dir, numSubspaces = 16)
    val direct2 = ProductQuantizer.train(
      Tables.embeddings(spark, dir).sample(0.2, 42L), numSubspaces = 16)
    assert(m2.centroids.flatten.flatten.toSeq ===
      direct2.centroids.flatten.flatten.toSeq,
      "the edited corpus must serve a RETRAINED codebook")
    assert(m1.centroids.flatten.flatten.toSeq !==
      m2.centroids.flatten.flatten.toSeq,
      "scaled vectors must move the codebook")
    assert(codes2.count() === 300L)
  }

  test("served OPQ rotation + books round-trip bit-identically") {
    val dir = java.nio.file.Files.createTempDirectory("graft-servopq").toString
    writeVecs(dir, 1.0)
    ServedQuant.invalidateServed()
    val (served, codes) = ServedQuant.servedOpq(spark, dir, dim = 64,
      numSubspaces = 16, numCodes = 16, iters = 3)
    val direct = Opq.train(Tables.embeddings(spark, dir).sample(0.2, 42L),
      "vec_id", "embedding", dim = 64, numSubspaces = 16, numCodes = 16,
      iters = 3)
    assert(served.rotation.mean.toSeq === direct.rotation.mean.toSeq)
    assert(served.rotation.components.flatten.toSeq ===
      direct.rotation.components.flatten.toSeq,
      "served rotation must round-trip bit-identically")
    assert(served.pq.centroids.flatten.flatten.toSeq ===
      direct.pq.centroids.flatten.flatten.toSeq)
    // stored codes equal a fresh encode under the same model
    val fresh = Opq.encode(Tables.embeddings(spark, dir), direct)
      .select(col("vec_id").cast("long").as("vec_id"), col("pq_codes"))
    assert(codes.exceptAll(fresh).count() === 0 &&
      fresh.exceptAll(codes).count() === 0,
      "stored codes must equal a fresh encode under the served model")
  }
}
