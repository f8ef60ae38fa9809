package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.PipelineOps

class PipelineOpsSpec extends AnyFunSuite {
  lazy val spark: SparkSession = GraftSession.local(4, "graft-test")
  val sf = "/root/testdata/sf0.01"

  test("stratified sample honors quotas, is deterministic, and is shuffle-bounded") {
    val docs = Tables.documents(spark, sf)
    val s1 = PipelineOps.sampleStratified(docs, "source", quota = 25)
    val counts = s1.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val strata = docs.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    strata.foreach { case (src, n) =>
      assert(counts(src) === math.min(25L, n), s"stratum $src")
    }
    // deterministic across runs
    val a = s1.orderBy("source", "rank").collect().map(_.toSeq)
    val b = PipelineOps.sampleStratified(docs, "source", quota = 25)
      .orderBy("source", "rank").collect().map(_.toSeq)
    assert(a.toSeq === b.toSeq)
    // the plan aggregates with the bounded heap, not a row_number window
    val plan = s1.queryExecution.executedPlan.toString
    assert(plan.contains("topkagg") || plan.contains("TopKAgg"),
      s"expected bounded-heap aggregate in plan:\n$plan")
    assert(!plan.contains("Window"), "sampling must not use a window sort")
  }

  test("doc_chunk windows tile every token with the declared overlap") {
    import spark.implicits._
    val docs = Seq(
      (1L, (1 to 10).map(i => s"w$i").mkString(" ")),   // short: one partial chunk
      (2L, (1 to 32).map(i => s"w$i").mkString(" ")),   // exactly one full chunk
      (3L, (1 to 33).map(i => s"w$i").mkString(" ")),   // 1 straddling token -> 2 chunks
      (4L, (1 to 100).map(i => s"w$i").mkString(" "))   // 4 chunks, short tail
    ).toDF("doc_id", "text")
    val out = PipelineOps.chunkDocuments(docs, size = 32, stride = 24)
      .orderBy("doc_id", "chunk_id").collect()
    val byDoc = out.groupBy(_.getLong(0))
    assert(byDoc(1L).length === 1 && byDoc(2L).length === 1)
    assert(byDoc(3L).length === 2 && byDoc(4L).length === 4)
    // chunk 0 of doc 1 holds all 10 tokens; doc 3's second chunk starts
    // at token 25 (overlap 8) and holds the remaining 9
    assert(byDoc(1L).head.getLong(3) === 10L)
    val d3c2 = byDoc(3L)(1)
    assert(d3c2.getLong(2) === 25L && d3c2.getLong(3) === 9L)
    // tiling: starts advance by exactly the stride, and each chunk's
    // tokens reach the next start + overlap - 1 (full chunks) so no gap
    byDoc.values.foreach { chunks =>
      chunks.sliding(2).foreach {
        case Array(a, b) =>
          assert(b.getLong(2) - a.getLong(2) === 24L)
          assert(a.getLong(2) + a.getLong(3) - 1 >= b.getLong(2) - 1, "no token gap")
        case _ => ()
      }
    }
    // every doc's final chunk ends exactly at its word count
    assert(byDoc(4L).last.getLong(2) + byDoc(4L).last.getLong(3) - 1 === 100L)
    // deterministic hash of a known slice
    val expected = java.security.MessageDigest.getInstance("MD5")
      .digest((25 to 33).map(i => s"w$i").mkString(" ").getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    assert(d3c2.getString(4) === expected)
    // scan-bound at any corpus size: the chunker is a pure projection
    val plan = PipelineOps.chunkDocuments(Tables.documents(spark, sf))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"chunking must not shuffle:\n$plan")
  }

  test("sequence packing fills contiguous windows within capacity + straddle") {
    val docs = Tables.documents(spark, sf)
    val capacity = 512L
    val packed = PipelineOps.packSequences(docs, capacity).cache()
    // every doc lands in exactly one window
    assert(packed.agg(sum("n_docs")).head().getLong(0) === docs.count())
    // contiguous fill: a window overflows only by its straddling doc,
    // so tokens < capacity + that stratum's longest doc
    val maxDoc = docs.agg(max(size(split(col("text"), " ")))).head().getInt(0)
    assert(packed.filter(col("n_tokens") >= capacity + maxDoc).count() === 0)
    // window ids start at 0 and never exceed total-tokens/capacity per
    // source (ids may legitimately skip when a long doc covers a whole
    // window: assignment is floor(tokens_before/capacity))
    val bySource = packed.groupBy("source")
      .agg(min("window_id").as("lo"), max("window_id").as("hi"),
        sum("n_tokens").as("tot"))
    assert(bySource.filter(col("lo") =!= 0 ||
      col("hi") > col("tot").cast("double") / capacity).count() === 0)
    packed.unpersist()
  }

  test("blocked packing handles sparse 64-bit hashed doc_ids") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    // TextDocs-style ids: xxhash64 output spread over the full signed
    // 64-bit range. A fixed id-divisor blocking puts each doc in its
    // own block (corpus-sized "tiny" offsets table, broadcast bomb);
    // range-spanned blocks must keep block count ~n/blockSize AND
    // reproduce the naive result bit-for-bit
    val docs = (0 until 3000).map { i =>
      val id = org.apache.spark.unsafe.hash.Murmur3_x86_32
        .hashLong(i.toLong, 42).toLong << 32 | (i.toLong & 0xffffffffL)
      (id, s"s${i % 3}", Seq.fill(1 + i % 20)("w").mkString(" "))
    }.toDF("doc_id", "source", "text")
    val blocked = PipelineOps.packSequences(docs, capacity = 256, blockSize = 128)
    val w = Window.partitionBy("source").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    val naive = docs
      .withColumn("n_tokens", size(split(col("text"), " ")).cast("long"))
      .withColumn("window_id",
        floor(coalesce(sum(col("n_tokens")).over(w), lit(0L)) / 256))
      .groupBy(col("source"), col("window_id"))
      .agg(count(lit(1)).as("n_docs"), sum("n_tokens").as("n_tokens"),
        min("doc_id").as("first_doc"))
    val a = blocked.orderBy("source", "window_id").collect().map(_.toSeq)
    val b = naive.orderBy("source", "window_id").collect().map(_.toSeq)
    assert(a.toSeq === b.toSeq)
  }

  test("blocked packing matches the naive per-stratum window on a mega-stratum") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    // 90% of docs in one source — the skew case whose naive plan would
    // sort the whole stratum in ONE task. doc_ids deliberately sparse
    // (x3+7) so blocks are uneven.
    val docs = (0 until 5000).map { i =>
      val src = if (i % 10 == 0) s"minor${i % 3}" else "mega"
      (i.toLong * 3 + 7, src, Seq.fill(1 + i % 40)("w").mkString(" "))
    }.toDF("doc_id", "source", "text")
    val blocked = PipelineOps.packSequences(docs, capacity = 512, blockSize = 256)
    // naive twin: unbounded per-stratum cumulative-sum window
    val w = Window.partitionBy("source").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    val naive = docs
      .withColumn("n_tokens", size(split(col("text"), " ")).cast("long"))
      .withColumn("window_id",
        floor(coalesce(sum(col("n_tokens")).over(w), lit(0L)) / 512))
      .groupBy(col("source"), col("window_id"))
      .agg(count(lit(1)).as("n_docs"), sum("n_tokens").as("n_tokens"),
        min("doc_id").as("first_doc"))
    val a = blocked.orderBy("source", "window_id").collect().map(_.toSeq)
    val b = naive.orderBy("source", "window_id").collect().map(_.toSeq)
    assert(a.toSeq === b.toSeq)
    // the doc-level running sum must partition by (source, __blk): no
    // Window over docs keyed by the stratum alone (the block-offset
    // window runs over per-block totals, not docs — it carries
    // __blk_tokens, never n_tokens)
    val plan = blocked.queryExecution.optimizedPlan.toString
    val docWindows = plan.linesIterator
      .filter(l => l.contains("windowspecdefinition") && l.contains("n_tokens"))
      .toSeq
    assert(docWindows.nonEmpty, s"expected a doc-level window in plan:\n$plan")
    docWindows.foreach(l => assert(l.contains("__blk"),
      s"doc-level window not blocked:\n$l"))
  }

  test("precomputed benchmark shingles match in-plan shingling at multi-MB scale") {
    import java.nio.file.Files
    // multi-MB synthetic eval suite: 4000 docs x 120 words
    val bench = spark.range(0, 4000)
      .select(col("id").as("doc_id"),
        concat_ws(" ", (0 until 120).map(i =>
          concat(lit("b"), (abs(xxhash64(col("id") * 120 + i, lit(3))) % 5000).cast("string"))): _*)
          .as("text"))
    assert(bench.agg(sum(length(col("text")))).head().getLong(0) > 2L * 1024 * 1024)
    // corpus: 50 verbatim benchmark copies + 50 disjoint-vocabulary docs
    val contaminated = bench.filter(col("doc_id") < 50)
      .select((col("doc_id") + 100000).as("doc_id"), col("text"))
    val clean = spark.range(0, 50)
      .select((col("id") + 200000).as("doc_id"),
        concat_ws(" ", (0 until 120).map(i =>
          concat(lit("c"), ((col("id") * 120 + i) % 7000).cast("string"))): _*).as("text"))
    val corpus = contaminated.unionByName(clean)

    // write-once, read-back, broadcast-many
    val dir = Files.createTempDirectory("graft-benchsh").toString
    PipelineOps.benchmarkShingles(bench).write.mode("overwrite").parquet(dir)
    val fromDisk = spark.read.parquet(dir)
    val pre = PipelineOps.decontaminateWith(corpus, fromDisk)
      .orderBy("doc_id").collect().map(_.toSeq)
    val oneShot = PipelineOps.decontaminate(corpus, bench)
      .orderBy("doc_id").collect().map(_.toSeq)
    assert(pre.toSeq === oneShot.toSeq)
    assert(pre.length === 50, "exactly the contaminated docs flag")
  }

  test("decontamination flags docs overlapping the benchmark, not clean docs") {
    import spark.implicits._
    val bench = Seq((1L, "the quick brown fox jumps over the lazy dog every day"))
      .toDF("doc_id", "text")
    val corpus = Seq(
      // verbatim contamination: shares many trigrams
      (100L, "prefix words then the quick brown fox jumps over the lazy dog every day"),
      // clean doc: disjoint vocabulary
      (101L, "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda"),
      // short overlap below the threshold: only two shared trigrams
      (102L, "the quick brown fox ran somewhere else entirely unlike anything before"))
      .toDF("doc_id", "text")
    val flagged = PipelineOps.decontaminate(corpus, bench, minShared = 5)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(flagged.contains(100L) && flagged(100L) >= 5L)
    assert(!flagged.contains(101L))
    assert(!flagged.contains(102L))
  }

  test("split assignment is exhaustive, stable under corpus growth, map-side") {
    val docs = Tables.documents(spark, sf)
    val assigned = PipelineOps.splitAssign(docs).cache()
    try {
      // every doc gets exactly one split; buckets live in [0, 100)
      assert(assigned.count() === docs.count())
      assert(assigned.filter(col("bucket") < 0 || col("bucket") >= 100).count() === 0)
      val m = assigned.groupBy("split").count().collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(m.keySet.subsetOf(Set("train", "val", "test")))
      // 90/5/5 in expectation; the 500-doc corpus should land within a
      // generous binomial envelope
      val n = assigned.count().toDouble
      assert(m("train") / n > 0.8 && m("train") / n < 0.97, s"train share ${m("train") / n}")

      // STABILITY: the property that justifies hash splits — assignment
      // of a doc never changes when the corpus around it does
      val half = PipelineOps.splitAssign(docs.filter(col("doc_id") % 2 === 0))
      val joined = assigned.as("a").join(half.as("h"), "doc_id")
        .filter(col("a.split") =!= col("h.split")).count()
      assert(joined === 0, "split must be a function of the id alone")

      // pure projection: no shuffle in the plan
      assert(!assigned.queryExecution.executedPlan.toString.contains("Exchange"),
        "split assignment must be map-side")
    } finally assigned.unpersist()
  }

  test("corpus shuffle is a deterministic permutation that varies by seed") {
    val docs = Tables.documents(spark, sf)
    val n = docs.count()
    val s1 = PipelineOps.shuffleOrder(docs)
    // a permutation: every doc exactly once, (bucket, pos) unique,
    // pos contiguous 1..count within each bucket
    assert(s1.count() === n)
    assert(s1.select("bucket", "pos").distinct().count() === n)
    val perBucket = s1.groupBy("bucket")
      .agg(count(lit(1)).as("c"), max("pos").as("mx"), min("pos").as("mn")).collect()
    perBucket.foreach(r =>
      assert(r.getLong(2) === r.getLong(1) && r.getLong(3) === 1L, s"bucket ${r.get(0)}"))
    // deterministic under re-evaluation; a new seed reorders
    def order(seed: String) = PipelineOps.shuffleOrder(docs, seed = seed)
      .orderBy("bucket", "pos").select("doc_id").collect().map(_.getLong(0)).toSeq
    assert(order("ep0") === order("ep0"))
    assert(order("ep0") !== order("ep1"))
    // not the identity order either
    assert(order("ep0") !== docs.orderBy("doc_id").collect().map(_.getLong(0)).toSeq)
  }

  test("dsir weights rank target-domain docs above off-domain docs") {
    import spark.implicits._
    // two vocabularies: "sci" (the target domain) and "web" (noise).
    // Target = docs 0-4 (pure sci). Raw pool: sci-like docs 10-19,
    // web docs 20-29. DSIR must score every sci-like raw doc above
    // every web doc — that ordering IS the selection semantics.
    val sci = "quantum electron proton neutrino boson fermion lattice spin"
    val web = "click here buy now free offer deal sale shop cart"
    val docs = (
      (0L to 4L).map(i => (i, sci)) ++
      (10L to 19L).map(i => (i, sci + s" variant$i")) ++
      (20L to 29L).map(i => (i, web + s" variant$i"))
    ).toDF("doc_id", "text")
    val w = PipelineOps.dsirWeights(docs, col("doc_id") < 5)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    val sciMin = (10L to 19L).map(w).min
    val webMax = (20L to 29L).map(w).max
    assert(sciMin > webMax,
      s"sci-like min $sciMin must exceed web max $webMax")
    // weights are per-token comparable: target docs themselves score
    // highest of all (their tokens define p_target)
    assert((0L to 4L).map(w).min >= sciMin)

    // Gumbel top-k selection over those weights: the raw pool is 10
    // sci-like + 10 web docs; weight gaps dominate the noise, so a
    // k=10 draw (target docs excluded) is overwhelmingly sci-like
    val weights = PipelineOps.dsirWeights(docs, col("doc_id") < 5)
      .filter(col("doc_id") >= 5)
    val picked = PipelineOps.dsirSample(weights, k = 10)
      .collect().map(_.getLong(0)).toSet
    val sciPicked = picked.count(id => id >= 10L && id <= 19L)
    assert(sciPicked >= 8, s"only $sciPicked of 10 picks were sci-like: $picked")
    // deterministic: same corpus, same draw
    assert(PipelineOps.dsirSample(weights, k = 10)
      .collect().map(_.getLong(0)).toSet === picked)
  }

  test("quality gate keeps exactly the at-or-above-median docs per language") {
    val kept = SparkEntry.queries("corpus_quality_gate")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val all = graft.text.TextAnalysis.qualityScores(Tables.documents(spark, sf))
      .select(col("doc_id"), col("lang"), col("quality_bp"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(kept.nonEmpty && kept.length < all.length)
    val keptIds = kept.map(_._1).toSet
    all.groupBy(_._2).foreach { case (lang, docs) =>
      val (k, dropped) = docs.partition(d => keptIds.contains(d._1))
      // the gate is a pure value threshold: every dropped doc scores
      // strictly below every kept doc of its language
      if (k.nonEmpty && dropped.nonEmpty)
        assert(dropped.map(_._3).max < k.map(_._3).min,
          s"lang $lang: a dropped doc scores >= a kept doc")
      // at-or-above-median keeps at least half of the language
      assert(k.length * 2 >= docs.length,
        s"lang $lang kept ${k.length} of ${docs.length} — below the median floor")
      // and the threshold is per-language: each language independently
      // keeps, so no language is wiped out
      assert(k.nonEmpty, s"lang $lang wiped out by the gate")
    }
  }
}
