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
    // the registered query delegates to the exact kernel in this
    // regime (see embeddingPairsBlocked); force the LSH overflow path
    // with explicit banding and require the same exact-recall result
    val lsh = graft.dedup.Dedup.embeddingPairsBlocked(
        Tables.embeddings(spark, sf), numTables = 48, bitsPerTable = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(lsh === exact)
  }

  test("high-threshold blocked embedding dedup is selective AND recall-complete") {
    import spark.implicits._
    import graft.expressions.VectorExpressions._
    // synthetic near-dup corpus in the regime real dedup runs at:
    // 1500 random 64-d vectors + 50 noisy copies (cos ~ 0.94)
    val rnd = new scala.util.Random(123)
    val base = (0 until 1500).map(i => (i.toLong, Array.fill(64)(rnd.nextGaussian())))
    val dups = (0 until 50).map { j =>
      (2000L + j, base(j)._2.map(_ + 0.35 * rnd.nextGaussian()))
    }
    val emb = (base ++ dups).map { case (id, v) => (id, v.toSeq) }
      .toDF("vec_id", "embedding")
    val t = 0.85
    val b = emb.select(col("vec_id").as("id_b"), col("embedding").as("emb_b"))
    val exact = emb.join(broadcast(b), col("vec_id") < col("id_b"))
      .withColumn("s", cosineSim(col("embedding"), col("emb_b")))
      .filter(col("s") >= t)
      .select(col("vec_id").as("id_a"), col("id_b"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.size === 50, "every injected dup pairs with its base, nothing else")
    val blocked = graft.dedup.Dedup.embeddingPairsBlocked(emb, threshold = t)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(blocked === exact)
    // and the banding genuinely prunes: candidates far below all-pairs
    val (nt, bt) = graft.dedup.Dedup.bandingFor(t)
    val nCand = graft.dedup.Dedup.embeddingCandidates(
      emb.select(col("vec_id"), col("embedding").cast("array<double>").as("embedding")),
      nt, bt).count()
    val allPairs = 1550L * 1549 / 2
    assert(nCand < allPairs / 4, s"candidates $nCand not selective vs $allPairs pairs")
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

  test("over-cap band buckets degrade to bounded star candidates") {
    import spark.implicits._
    // 300 identical docs (every band bucket holds all 300 -> over cap)
    // plus one genuine duplicate pair over a disjoint vocabulary
    val mega = (0 until 300).map(i =>
      (i.toLong, "lorem ipsum dolor sit amet consectetur adipiscing elit sed do"))
    val pair = Seq(1000L, 1001L).map(id =>
      (id, "zulu yankee xray whiskey victor uniform tango sierra romeo quebec"))
    val docs = (mega ++ pair).toDF("doc_id", "text")
    val capped = graft.dedup.Dedup.simhashPairs(docs)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // the mega cluster contributes a STAR around doc 0 — 299 bounded
    // pairs, every member still marked a dup of the representative —
    // never the 44850-pair clique; the small cluster is untouched
    val expectedStar = (1 until 300).map(i => (0L, i.toLong)).toSet + ((1000L, 1001L))
    assert(capped === expectedStar)
    // raising the floor restores the full clique
    val uncapped = graft.dedup.Dedup.simhashPairs(docs, bucketCapFloor = 1000L).count()
    assert(uncapped === 300L * 299 / 2 + 1)
    // minhash banding degrades the same way
    val mh = graft.dedup.Dedup.minhashPairs(docs)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(mh === expectedStar)
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

  test("semdedup drops exactly the vectors with a lower-id same-cluster near-dup peer") {
    val e = Tables.embeddings(spark, sf)
    val out = SparkEntry.queries("dedup_semdedup")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.length === e.count())
    assert(out.forall(r => r._3 == 0L || r._3 == 1L))
    // independent replay of the rule from the all-pairs result + routing
    val shard = out.map(r => r._1 -> r._2).toMap
    val expectedDropped = SparkEntry.queries("dedup_embedding")(spark, sf)
      .select("id_a", "id_b").collect()
      .filter(r => shard(r.getLong(0)) == shard(r.getLong(1)))
      .map(_.getLong(1)).toSet
    assert(out.filter(_._3 == 0L).map(_._1).toSet === expectedDropped)
  }

  test("semdedup pair-salting never changes the result") {
    val e = Tables.embeddings(spark, sf)
    def rows(salt: Int) =
      graft.dedup.Dedup.semDedup(e, pairSalt = salt)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(rows(1) === rows(7))
  }

  test("semdedup adaptive salting bounds the hot cluster's per-task pairs, verdicts unchanged") {
    // mega-cluster: 300 of 500 vectors land in one cluster (the twins
    // of vec 0 all route to its centroid), the rest spread — exactly
    // the skew the per-cluster salt sizing exists for
    val base = Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("embedding"))
      .filter(col("vec_id") < 200)
    val hot = base.filter(col("vec_id") === 0)
      .crossJoin(spark.range(1, 301).select(col("id")))
      .select((col("id") + 100000).as("vec_id"),
        transform(col("embedding"), x => x + col("id") % 7 * lit(0.001)).as("embedding"))
    val corpus = base.unionByName(hot)
    val plain  = graft.dedup.Dedup.semDedup(corpus, threshold = 0.75)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val salted = graft.dedup.Dedup.semDedup(corpus, threshold = 0.75,
        maxPairsPerTask = 1000L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // result-invariance: the adaptive salt changes task layout only
    assert(salted === plain)
    // salt sizing: the hot cluster (>= 300 members -> >= 44850 pairs)
    // must fan out over >= 45 tasks at 1000 pairs/task; a balanced
    // small cluster stays unsalted
    val e = corpus.select(col("vec_id"), col("embedding"))
    val cents = graft.vector.Centroids.deterministicInit(e, k = 4)
    val assigned = e.withColumn("shard",
      graft.vector.Centroids.nearestShard(col("embedding"), cents))
    val salts = graft.dedup.Dedup.adaptiveSalts(assigned, 1000L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val sizes = assigned.groupBy("shard").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    sizes.foreach { case (sh, n) =>
      val expect = math.max(1L, math.ceil(n * (n - 1) / 2.0 / 1000.0).toLong)
      assert(salts(sh) === expect, s"shard $sh size $n")
    }
    assert(sizes.values.max >= 300L)
    assert(salts(sizes.maxBy(_._2)._1) >= 45L)
  }

  test("semdedup drops planted near-identical twins") {
    val base = Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("embedding"))
    val twins = base.filter(col("vec_id") < 10)
      .select((col("vec_id") + 100000).as("vec_id"),
        transform(col("embedding"), x => x + lit(0.05)).as("embedding"))
    val out = graft.dedup.Dedup.semDedup(base.unionByName(twins), threshold = 0.75)
    val twinRows = out.filter(col("vec_id") >= 100000).collect()
    assert(twinRows.length === 10)
    // a +0.05 shift keeps cosine ~0.97 with the original, which routes
    // to the same centroid and has the lower id -> every twin drops
    assert(twinRows.forall(_.getLong(2) == 0L))
  }

  test("cross-source matrix rolls up near-dup pairs per unordered source pair") {
    import spark.implicits._
    val w40 = (1 to 40).map(i => s"w$i")
    // near-dup pairs: (1,2) across srcA/srcB, (3,4) within srcB;
    // doc 5 is unrelated — no row for its source
    val docs = Seq(
      (1L, w40.mkString(" "), "srcB"),
      (2L, (w40 :+ "delta").mkString(" "), "srcA"),
      (3L, w40.map(_ + "x").mkString(" "), "srcB"),
      (4L, (w40.map(_ + "x") :+ "eps").mkString(" "), "srcB"),
      (5L, (1 to 40).map(i => s"z$i").mkString(" "), "srcC")
    ).toDF("doc_id", "text", "source")
    val got = graft.dedup.Dedup.crossSourceMatrix(docs)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(got === Map(("srcA", "srcB") -> 1L, ("srcB", "srcB") -> 1L))
  }

  test("incremental dedup judges the new batch against the old corpus only") {
    import spark.implicits._
    val words = (0 until 40).map(i => s"w$i")
    val oldDocs = Seq(
      (1L, words.mkString(" ")),
      (2L, words.map(w => w + "x").mkString(" ")),
      (3L, "tiny doc here")).toDF("doc_id", "text")
    // 100: exact copy of old 1; 101: near-dup of old 2 (one word
    // changed, J ~ 0.92); 102: fresh; 103: exact copy of new 102 —
    // within-batch, so it must still be 'keep'
    val newDocs = Seq(
      (100L, words.mkString(" ")),
      (101L, (words.map(w => w + "x").init :+ "zzz").mkString(" ")),
      (102L, (0 until 40).map(i => s"q$i").mkString(" ")),
      (103L, (0 until 40).map(i => s"q$i").mkString(" "))).toDF("doc_id", "text")
    val v = graft.dedup.Dedup.incrementalVerdicts(
        oldDocs.unionByName(newDocs), col("doc_id") >= 100)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(v === Map(100L -> "exact", 101L -> "near", 102L -> "keep", 103L -> "keep"))
  }

  test("connected components resolve transitivity that pairwise removal misses") {
    import spark.implicits._
    // chain 1-2-3-4 (diameter 3), clique {10,11,12}, lone pair (20,21),
    // plus the pairwise-removal blind spot: pairs (30,32),(31,32) where
    // dropping id_b leaves BOTH 30 and 31 though they share a near-dup
    val pairs = Seq(
      (1L, 2L), (2L, 3L), (3L, 4L),
      (10L, 11L), (10L, 12L), (11L, 12L),
      (20L, 21L),
      (30L, 32L), (31L, 32L)).toDF("id_a", "id_b")
    val comp = graft.dedup.Dedup.connectedComponents(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(Seq(1L, 2L, 3L, 4L).forall(comp(_) == 1L))
    assert(Seq(10L, 11L, 12L).forall(comp(_) == 10L))
    assert(Seq(20L, 21L).forall(comp(_) == 20L))
    assert(Seq(30L, 31L, 32L).forall(comp(_) == 30L))
    assert(comp.size === 12)
  }

  test("banding recall eval: coherent counts, nested-recall monotone, ratios recompute") {
    val docs = Tables.documents(spark, sf)
    val rows = graft.dedup.Dedup.evalBandingRecall(docs)
      .orderBy("bands").collect()
    assert(rows.map(_.getLong(0)).toSeq === Seq(8L, 16L, 32L, 64L))
    // truth denominator is the exact-Jaccard pair count on every row
    // (caps are inert at this SF, so the registered exact query agrees)
    val nTruth = pairs("dedup_ngram_jaccard").size.toLong
    assert(nTruth > 0)
    assert(rows.forall(_.getLong(2) === nTruth))
    rows.foreach { r =>
      val (truth, cand, hit) = (r.getLong(2), r.getLong(3), r.getLong(4))
      assert(hit <= truth && hit <= cand)
      assert(r.getLong(5) === math.round(hit * 10000.0 / math.max(truth, 1L)))
      assert(r.getLong(6) === math.round(hit * 10000.0 / math.max(cand, 1L)))
    }
    // aligned halvings nest: a collision in an 8-row band implies one in
    // both its 4-row halves, so PRE-CAP candidates — and with them
    // measured recall — can only grow as bands double. The property
    // holds pre-cap only (a wider banding's bigger buckets can cross
    // the bucket cap and legally degrade to star candidates), so the
    // monotonicity run disables the cap to match the property under test
    val uncapped = graft.dedup.Dedup.evalBandingRecall(docs,
        maxBucketFraction = 1.0, bandCapFloor = Long.MaxValue)
      .orderBy("bands").collect()
    val recalls = uncapped.map(_.getLong(5)).toSeq
    assert(recalls === recalls.sorted,
      s"pre-cap recall must be nondecreasing in bands, got $recalls")
    // 16x8 is the published banding the minhash-LSH === exact spec rides
    assert(rows(1).getLong(5) === 10000L,
      "16x8 must recall every true pair on this corpus (minhash-LSH spec invariant)")
  }

  test("banding eval sample: sample==full on test corpora, tuner pick identical, hot-shingle truth refused") {
    val docs = Tables.documents(spark, sf)
    val full = graft.dedup.Dedup.evalBandingRecall(docs)
      .orderBy("bands").collect().map(_.toSeq)
    // the registered query's sample (2000) covers every test corpus, so
    // the measured curve is bit-for-bit the full-corpus curve
    val sampled = graft.dedup.Dedup.evalBandingRecall(docs, sampleDocs = 2000)
      .orderBy("bands").collect().map(_.toSeq)
    assert(sampled.toSeq === full.toSeq)
    // the sample is lowest-md5, not input-order: a reshuffled corpus
    // measures the identical curve even under a GENUINE sub-sample
    val half = docs.count().toInt / 2
    val a = graft.dedup.Dedup.evalBandingRecall(docs, sampleDocs = half)
      .orderBy("bands").collect().map(_.toSeq)
    val b = graft.dedup.Dedup.evalBandingRecall(
        docs.orderBy(desc("text")), sampleDocs = half)
      .orderBy("bands").collect().map(_.toSeq)
    assert(a.toSeq === b.toSeq)
    // and the tuner picks the same banding from the half-sample curve
    assert(graft.dedup.Dedup.bandingAtRecall(docs, target = 0.95) ===
      graft.dedup.Dedup.bandingAtRecall(docs, target = 0.95, sampleDocs = half))
    // cap-disabled ground truth REFUSES a hot shingle instead of going
    // quadratic: 6 docs sharing one trigram, bound set below that
    import spark.implicits._
    val hot = (1L to 6L).map(i => (i, s"shared trigram here unique$i"))
      .toDF("doc_id", "text")
    val ex = intercept[IllegalStateException] {
      graft.dedup.Dedup.evalBandingRecall(hot, truthDfBound = 5L)
    }
    assert(ex.getMessage.contains("truthDfBound"))
    assert(ex.getMessage.contains("sampleDocs"))
  }

  test("bandingAtRecall picks the cheapest SERVABLE banding meeting the target, falls back to max recall") {
    val docs = Tables.documents(spark, sf)
    // the servable set mirrors the serving guard: theoretical recall
    // >= 0.6 at the threshold (measured recall is corpus-specific; the
    // s-curve floor is the contract minhashPairs/judge enforce)
    val curve = graft.dedup.Dedup.evalBandingRecall(docs)
      .select("bands", "n_cand", "recall_x1e4", "theo_recall_x1e4").collect()
      .map(r => (r.getLong(0).toInt, r.getLong(1), r.getLong(2), r.getLong(3)))
      .filter(_._4 >= 6000L)
    assert(curve.nonEmpty)
    val (b, r) = graft.dedup.Dedup.bandingAtRecall(docs, target = 0.95)
    assert(b * r === 128)
    val picked = curve.find(_._1 == b).get
    assert(picked._3 >= 9500L)
    assert(curve.filter(_._3 >= 9500L).forall(_._2 >= picked._2),
      "a cheaper servable banding met the target but was not picked")
    // impossible target: fall back to the highest-recall servable banding
    val (bMax, _) = graft.dedup.Dedup.bandingAtRecall(docs, target = 2.0)
    assert(curve.find(_._1 == bMax).get._3 === curve.map(_._3).max)
  }

  test("minhashPairs banding knob: low thresholds refused on 16x8, served by 64x2") {
    val docs = Tables.documents(spark, sf)
    // 16x8's theoretical recall at 0.5 is ~0.008 — must refuse loudly
    val ex = intercept[IllegalArgumentException] {
      graft.dedup.Dedup.minhashPairs(docs, threshold = 0.5)
    }
    assert(ex.getMessage.contains("bandingAtRecall"))
    // 64x2 covers 0.5 (theoretical ~1.0) and the exact verify keeps the
    // result equal to the declarative exact-Jaccard pairs
    val mh = graft.dedup.Dedup.minhashPairs(docs, threshold = 0.5, bands = 64)
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = graft.dedup.Dedup.ngramJaccardPairs(docs, threshold = 0.5)
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.nonEmpty)
    assert(mh === exact)
  }
}
