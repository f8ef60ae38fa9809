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

  test("LSH-blocked embedding dedup finds exactly the all-pairs result") {
    def rows(name: String): Set[(Long, Long, Double)] =
      SparkEntry.queries(name)(spark, sf)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val exact = rows("dedup_embedding")
    val blocked = rows("dedup_embedding_blocked")
    assert(exact.nonEmpty)
    assert(blocked === exact)
  }

  test("shingle df-cap bounds candidates under a corpus-wide hot shingle") {
    import spark.implicits._
    val n = 300
    // every doc opens with the same hot trigram; each then has a unique
    // tail, except docs 0/1 which are genuine near-dups of each other
    val docs = (0 until n).map { i =>
      val tail =
        if (i <= 1) s"alpha beta gamma delta epsilon zeta eta theta iota kappa w$i"
        else (0 until 10).map(j => s"u${i}_$j").mkString(" ")
      (i.toLong, s"hot hot hot $tail")
    }.toDF("doc_id", "text")
    val sh = graft.dedup.Dedup.shinglesOf(docs).cache()
    val cand = graft.dedup.Dedup.ngramCandidates(sh, docs,
      graft.dedup.Dedup.DefaultMaxDfFraction, graft.dedup.Dedup.DefaultDfCapFloor)
    // uncapped, the hot shingle alone would yield n*(n-1)/2 = 44850
    // candidates; capped, only genuinely-shared rare shingles pair up
    val nCand = cand.count()
    assert(nCand < 50, s"candidates not bounded: $nCand")
    // and the true near-dup pair survives, with exact Jaccard over the
    // capped universe (hot shingle excluded from both sets)
    val pairs = graft.dedup.Dedup.ngramJaccardPairs(docs, threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs === Set((0L, 1L)))
    sh.unpersist()
  }

  test("df-cap knob: raising the floor re-admits hot-cluster pairs") {
    import spark.implicits._
    // 30 identical docs — every shingle has df=30, above the default
    // floor of 20, so candidate generation drops them all (exact dedup
    // is the right tool for identical clusters); with a floor >= 30
    // the same pairs come back with jaccard 1.0
    val docs = (0 until 30).map(i =>
      (i.toLong, "one two three four five six seven eight")).toDF("doc_id", "text")
    val capped = graft.dedup.Dedup.ngramJaccardPairs(docs).count()
    assert(capped === 0L)
    val uncapped = graft.dedup.Dedup.ngramJaccardPairs(docs, dfCapFloor = 30L)
    assert(uncapped.count() === 30L * 29 / 2)
    assert(uncapped.filter(col("jaccard") =!= 1.0).count() === 0)
  }
}
