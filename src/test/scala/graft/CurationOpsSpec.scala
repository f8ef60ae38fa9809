package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.dedup.Dedup
import graft.pipeline.PipelineOps
import graft.text.TextAnalysis

/** Semantic checks for the round-7 curation additions (containment
  * dedup, token-budget selection, split-leakage audit, perplexity
  * bucketing, decile stats) — each beyond what the hash-match oracle
  * proves: directionality, prefix-closure, bucket balance.
  */
class CurationOpsSpec extends AnyFunSuite {
  lazy val spark: SparkSession = GraftSession.local(4, "graft-test")
  val sf = "/root/testdata/sf0.01"

  test("containment catches doc-in-doc pairs that Jaccard misses") {
    import spark.implicits._
    // doc 1 = the first 30 words of doc 2 (100 words): every shingle of
    // 1 is in 2, so C(1 in 2) = 1.0, but J = 28/98 ~ 0.29 — far below
    // the 0.8 Jaccard gate
    val w = (1 to 100).map(i => s"tok$i")
    val docs = Seq(
      (1L, w.take(30).mkString(" ")),
      (2L, w.mkString(" ")),
      (3L, (1 to 50).map(i => s"other$i").mkString(" "))
    ).toDF("doc_id", "text")
    val jac = Dedup.ngramJaccardPairs(docs).collect()
    assert(jac.isEmpty, "Jaccard@0.8 must NOT flag the contained pair")
    val cont = Dedup.containmentPairs(docs).collect()
    assert(cont.length === 1)
    val r = cont.head
    assert(r.getLong(0) === 1L && r.getLong(1) === 2L)
    assert(r.getDouble(2) === 1.0, "all of doc 1's shingles are in doc 2")
    assert(r.getDouble(3) < 0.5, "doc 2 is NOT contained in doc 1")
  }

  test("containment pair set is a superset of Jaccard pairs on the corpus") {
    val docs = Tables.documents(spark, sf)
    val jacIds = Dedup.ngramJaccardPairs(docs).select("id_a", "id_b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // the corpus-independent invariant: J >= t guarantees max
    // containment >= 2t/(1+t) (equal-size worst case) = 0.889 at
    // t=0.8, so compare against the gate BELOW that bound — the
    // default 0.9 gate may legitimately exclude a borderline pair
    val contIds = Dedup.containmentPairs(docs, threshold = 0.88)
      .select("id_a", "id_b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(jacIds.subsetOf(contIds),
      s"missing: ${jacIds.diff(contIds).take(5)}")
    assert(Dedup.containmentPairs(docs).count() > 0,
      "the registered 0.9 gate still fires on this corpus")
  }

  test("token budget selection is the per-lang best-quality prefix") {
    val docs = Tables.documents(spark, sf)
    val budget = 2000L
    val sel = PipelineOps.tokenBudgetSelect(docs, budget)
    // scoring rides the scan projection: one documents scan, no
    // corpus-sized self-join before the per-lang window
    val plan = sel.queryExecution.executedPlan.toString
    assert(!plan.contains("SortMergeJoin") && !plan.contains("BroadcastHashJoin"),
      s"token budget must not join the corpus to itself:\n$plan")
    assert("Scan parquet".r.findAllIn(plan).size === 1, "exactly one scan")
    val out = sel.collect()
    // recompute the expected prefix driver-side from the same scores
    val scored = TextAnalysis.qualityScores(docs)
      .select(col("doc_id"), col("lang"),
        size(split(col("text"), " ")).cast("long").as("n_tokens"),
        col("quality_bp")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    val expected = scored.groupBy(_._2).toSeq.flatMap { case (_, rows) =>
      var cum = 0L
      rows.sortBy(r => (-r._4, r._1)).takeWhile { r =>
        cum += r._3; cum <= budget
      }.toSeq
    }.map(_._1).toSet
    val got = out.map(_.getLong(0)).toSet
    assert(got === expected)
    // and the running totals respect the budget per lang
    out.groupBy(_.getString(1)).foreach { case (lang, rows) =>
      val sum = rows.map(_.getLong(2)).sum
      assert(sum <= budget, s"lang $lang over budget: $sum")
      assert(rows.map(_.getLong(4)).max === sum, s"lang $lang cum_tokens mismatch")
    }
  }

  test("approx token budget: subset of the exact cut, within budget, sort-free") {
    val docs = Tables.documents(spark, sf)
    val budget = 2000L
    val exact = PipelineOps.tokenBudgetSelect(docs, budget).collect()
    val approx = PipelineOps.tokenBudgetSelectApprox(docs, budget).collect()
    val exactIds = exact.map(_.getLong(0)).toSet
    val approxRows = approx.map(r =>
      (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    // greedy whole-bucket keep can only UNDERSHOOT the exact prefix:
    // every approx doc is in the exact selection, never past it
    assert(approxRows.map(_._1).toSet.subsetOf(exactIds),
      "approx must select a subset of the exact cut")
    assert(approxRows.nonEmpty)
    // per-lang budget respected, and the undershoot is bounded by the
    // first DROPPED bucket's mass (the docs a finer cut would split)
    val exactByLang = exact.groupBy(_.getString(1))
      .view.mapValues(_.map(_.getLong(2)).sum).toMap
    approxRows.groupBy(_._2).foreach { case (lang, rows) =>
      val mass = rows.map(_._3).sum
      assert(mass <= budget, s"lang $lang over budget: $mass")
      assert(mass <= exactByLang.getOrElse(lang, 0L),
        s"lang $lang approx mass must not exceed the exact cut's")
    }
    // scale shape: the cut never sorts the corpus — the one window
    // runs over the (lang, bucket) rollup (an Aggregate feeds it),
    // never over per-doc rows
    val wins = PipelineOps.tokenBudgetSelectApprox(docs, budget)
      .queryExecution.optimizedPlan.collect {
        case w: org.apache.spark.sql.catalyst.plans.logical.Window => w
      }
    assert(wins.size === 1)
    assert(wins.head.child.collect {
      case a: org.apache.spark.sql.catalyst.plans.logical.Aggregate => a
    }.nonEmpty, "the running sum must consume the bucket rollup, not docs")
  }

  test("split leakage flags exactly the cross-split near-dup pairs") {
    val docs = Tables.documents(spark, sf)
    val out = PipelineOps.splitLeakage(docs).collect()
    val jacIds = Dedup.ngramJaccardPairs(docs).select("id_a", "id_b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(out.map(r => (r.getLong(0), r.getLong(1))).toSet === jacIds,
      "every near-dup pair is audited, none invented")
    val splits = PipelineOps.splitAssign(docs).select("doc_id", "split")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    out.foreach { r =>
      assert(r.getString(3) === splits(r.getLong(0)))
      assert(r.getString(4) === splits(r.getLong(1)))
      assert(r.getBoolean(5) === (r.getString(3) != r.getString(4)))
    }
    assert(out.exists(_.getBoolean(5)), "corpus has at least one leak")
  }

  test("approx deciles track the exact NTILE within sketch tolerance, sans sort") {
    val approx = SparkEntry.queries("q_deciles_approx")(spark, sf)
    val plan = approx.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), "approx path must not use a window")
    assert(!plan.toLowerCase.contains("sortmergejoin"), "no shuffle join")
    val a = approx.orderBy("decile").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val e = SparkEntry.queries("q_deciles")(spark, sf).orderBy("decile").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(a.keySet === (1L to 10L).toSet)
    val total = e.values.sum
    (1L to 10L).foreach { dIdx =>
      val tol = 2 + total / 1000  // sketch accuracy 10000 => ~n/10000 rank error
      assert(math.abs(a(dIdx) - e(dIdx)) <= tol,
        s"decile $dIdx: approx ${a(dIdx)} vs exact ${e(dIdx)}")
    }
    assert(a.values.sum === total, "every order lands in exactly one bucket")
  }

  test("keep-best picks each cluster's max-quality member") {
    val docs = Tables.documents(spark, sf)
    val out = Dedup.keepBest(docs).collect()
    val labels = Dedup.connectedComponents(Dedup.ngramJaccardPairs(docs))
      .collect().map(r => r.getLong(0) -> r.getLong(1))
    val quality = TextAnalysis.qualityScores(docs).select("doc_id", "quality_bp")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val byCluster = labels.groupBy(_._2).view.mapValues(_.map(_._1)).toMap
    assert(out.map(_.getLong(0)).toSet === byCluster.keySet)
    out.foreach { r =>
      val members = byCluster(r.getLong(0))
      assert(r.getLong(3) === members.length.toLong)
      val expect = members.minBy(id => (-quality(id), id))
      assert(r.getLong(1) === expect, s"cluster ${r.getLong(0)}")
      assert(r.getLong(2) === quality(expect))
      assert(members.length >= 2, "singletons never appear in pair-derived clusters")
    }
  }

  test("perplexity buckets are balanced terciles in score order") {
    val out = SparkEntry.queries("text_ppl_bucket")(spark, sf).collect()
    val byBucket = out.groupBy(_.getString(2))
    assert(byBucket.keySet === Set("head", "middle", "tail"))
    val sizes = byBucket.view.mapValues(_.length).toMap
    assert(sizes.values.max - sizes.values.min <= 1, s"unbalanced: $sizes")
    // head holds the highest scores (most corpus-typical)
    def scores(b: String) = byBucket(b).map(_.getLong(1))
    assert(scores("head").min >= scores("middle").max)
    assert(scores("middle").min >= scores("tail").max)
  }

  test("approx ppl terciles track the exact buckets within sketch tolerance") {
    val approx = SparkEntry.queries("text_ppl_bucket_approx")(spark, sf)
    assert(!approx.queryExecution.executedPlan.toString.contains("Window"),
      "approx path must not use a window")
    val a = approx.collect()
    val byBucket = a.groupBy(_.getString(2))
    assert(byBucket.keySet === Set("head", "middle", "tail"))
    // score ordering holds exactly (thresholds construct it)
    assert(byBucket("head").map(_.getLong(1)).min >
      byBucket("middle").map(_.getLong(1)).max)
    assert(byBucket("middle").map(_.getLong(1)).min >
      byBucket("tail").map(_.getLong(1)).max)
    // sizes drift from n/3 only by sketch error + tie mass at the cut
    val n = a.length
    val exact = SparkEntry.queries("text_ppl_bucket")(spark, sf).collect()
      .groupBy(_.getString(2)).view.mapValues(_.length).toMap
    byBucket.foreach { case (b, rows) =>
      assert(math.abs(rows.length - exact(b)) <= 2 + n / 100,
        s"bucket $b: approx ${rows.length} vs exact ${exact(b)}")
    }
  }

  test("deciles partition orders into 10 balanced, ordered buckets") {
    val out = SparkEntry.queries("q_deciles")(spark, sf)
      .orderBy("decile").collect()
    assert(out.length === 10)
    val total = Tables.orders(spark, sf).count()
    assert(out.map(_.getLong(1)).sum === total)
    assert(out.map(_.getLong(1)).max - out.map(_.getLong(1)).min <= 1)
    // value ranges are non-overlapping and ascending
    out.sliding(2).foreach { case Array(a, b) =>
      assert(a.getDouble(3) <= b.getDouble(2),
        s"decile ${a.getLong(0)} max ${a.getDouble(3)} > decile ${b.getLong(0)} min ${b.getDouble(2)}")
    }
  }
}
