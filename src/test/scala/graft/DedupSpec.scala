package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class DedupSpec extends AnyFunSuite {
  lazy val spark: SparkSession = GraftSession.local(4, "graft-test")
  val sf = "/root/testdata/sf0.001"

  private def pairs(name: String): Set[(Long, Long)] =
    SparkEntry.queries(name)(spark, sf)
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  test("minhash-LSH finds exactly the exact-Jaccard near-dup pairs") {
    val exact = pairs("dedup_ngram_jaccard")
    val lsh = pairs("dedup_minhash_lsh")
    assert(exact.nonEmpty, "test corpus should contain injected near-dups")
    assert(lsh === exact)
  }

  test("simhash recalls most true near-dup pairs") {
    val exact = pairs("dedup_ngram_jaccard")
    val sim = pairs("dedup_simhash")
    // J~0.8 pairs can exceed hamming 6 (measured up to 12 on this
    // corpus): simhash is a recall/precision tradeoff, not exact.
    val recall = (sim intersect exact).size.toDouble / exact.size
    assert(recall >= 0.75, s"simhash recall = $recall")
    assert(sim.nonEmpty)
  }

  test("exact dedup fingerprints are unique per distinct content") {
    val df = SparkEntry.queries("dedup_exact")(spark, sf)
    val docs = Tables.documents(spark, sf)
    assert(df.agg(sum("n_copies")).head().getLong(0) === docs.count())
    assert(df.count() === docs.select(countDistinct("text")).head().getLong(0))
  }

  test("embedding near-dup pairs are symmetric-free and above threshold") {
    val df = SparkEntry.queries("dedup_embedding")(spark, sf)
    assert(df.filter(col("id_a") >= col("id_b")).count() === 0)
    assert(df.filter(col("score") < 0.40).count() === 0)
  }
}
