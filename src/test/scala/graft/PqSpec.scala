package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.expressions.VectorExpressions._
import graft.vector.ProductQuantizer

class PqSpec extends AnyFunSuite {
  lazy val spark: SparkSession = GraftSession.local(4, "graft-test")
  val sf = "/root/testdata/sf0.01"

  test("ADC distance equals the sum of per-subspace codeword distances") {
    val e = Tables.embeddings(spark, sf)
    val model = ProductQuantizer.train(e)
    val enc = ProductQuantizer.encode(e, model)
    val q = e.filter(col("vec_id") === 0)
      .select(col("embedding").cast("array<double>")).head().getSeq[Double](0).toArray
    // hand-compute the ADC for one row from its codes and the codebooks
    val row = enc.filter(col("vec_id") === 7)
      .select(col("pq_codes"),
        ProductQuantizer.adcDistance(col("pq_codes"), q, model).as("adc"))
      .head()
    val codes = row.getSeq[Int](0)
    val want = (0 until model.numSubspaces).map { m =>
      val c = model.centroids(m)(codes(m))
      (0 until model.subDim).map { i =>
        val d = q(m * model.subDim + i) - c(i); d * d
      }.sum
    }.sum
    assert(math.abs(row.getDouble(1) - want) < 1e-9)
  }

  test("PQ codes compress to M small ints and search recalls exact L2 neighbors") {
    val e = Tables.embeddings(spark, sf)
    val model = ProductQuantizer.train(e)
    val enc = ProductQuantizer.encode(e, model).cache()
    assert(enc.filter(size(col("pq_codes")) =!= 8).count() === 0)
    assert(enc.filter(array_max(col("pq_codes")) > 15 || array_min(col("pq_codes")) < 0)
      .count() === 0)

    val q = e.filter(col("vec_id") === 0)
      .select(col("embedding").cast("array<double>")).head().getSeq[Double](0).toArray
    val exact = e.filter(col("vec_id") =!= 0)
      .withColumn("d", l2Dist(col("embedding"), typedlit(q.toSeq)))
      .orderBy(asc("d"), asc("vec_id")).limit(10)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    // the raw 4-bit sketch is coarse: its job is shortlisting. With the
    // driver query's 16x16 model — trained on the SAME deterministic
    // 20% sample the driver query uses — the ADC top-256 must cover
    // the true top-10 (what the rerank relies on)
    val m16 = ProductQuantizer.train(e.sample(0.2, 42L), numSubspaces = 16)
    val enc16 = ProductQuantizer.encode(e.filter(col("vec_id") =!= 0), m16)
    val short256 = ProductQuantizer.search(enc16, q, m16, topK = 256)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(exact.subsetOf(short256),
      s"ADC shortlist misses true neighbors: ${exact -- short256}")
    // rerank of the shortlist reproduces exact knn
    val rerank = ProductQuantizer.searchRerank(
        enc16.select(col("vec_id"), col("pq_codes")),
        e.filter(col("vec_id") =!= 0), q, m16, shortlist = 256)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(rerank === exact)
    enc.unpersist()
  }

  test("driver query vdb_knn_pq is deterministic across runs") {
    val rows = SparkEntry.queries("vdb_knn_pq")(spark, sf).collect()
    assert(rows.length === 10)
    val again = SparkEntry.queries("vdb_knn_pq")(spark, sf).collect()
    assert(rows.map(r => (r.getLong(0), r.getDouble(1))).toSeq ===
      again.map(r => (r.getLong(0), r.getDouble(1))).toSeq)
  }
}
