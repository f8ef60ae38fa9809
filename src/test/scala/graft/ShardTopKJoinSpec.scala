package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.expressions.VectorExpressions.cosineSim
import graft.plans.ShardTopKJoin

/** The fused shard-join + bounded-top-k operator must be a drop-in for
  * the declarative `join → cosine → groupBy.agg(topK)` pipeline:
  * bit-identical rows (scores included — the oracle hashes them),
  * salt-invariant, broadcast-free, and shaped like a shuffled join in
  * the physical plan.
  */
class ShardTopKJoinSpec extends AnyFunSuite {
  lazy val spark: SparkSession = GraftSession.local(4, "graft-test")
  import spark.implicits._

  /** Deterministic little corpus: 200 vectors in 4 shards, dim 8. */
  private def corpus(n: Int = 200, shards: Int = 4): DataFrame =
    (0 until n).map { i =>
      val v = Array.tabulate(8)(d => math.sin(i * 31 + d * 7).abs + 0.01 * d)
      (i.toLong, (i % shards).toLong, v)
    }.toDF("id", "shard", "vec").select($"id", $"shard",
      $"vec".cast("array<double>").as("vec"))

  /** Probes: every 10th vector asks, probing its own shard and the
    * next (two replicas per query — the nprobe=2 shape).
    */
  private def probes(n: Int = 200, shards: Int = 4): DataFrame =
    (0 until n by 10).flatMap { i =>
      val v = Array.tabulate(8)(d => math.sin(i * 31 + d * 7).abs + 0.01 * d)
      Seq((i.toLong, (i % shards).toLong, v),
        (i.toLong, ((i + 1) % shards).toLong, v))
    }.toDF("query_id", "shard", "qv").select($"query_id", $"shard",
      $"qv".cast("array<double>").as("qv"))

  /** The declarative pipeline the exec replaces, same inputs. */
  private def declarative(c: DataFrame, p: DataFrame, k: Int,
                          excludeSelf: Boolean): Seq[(Long, Long, Long, Double)] = {
    val j = c.join(p, Seq("shard"))
    val f = if (excludeSelf) j.filter($"id" =!= $"query_id") else j
    f.withColumn("s", cosineSim($"vec", $"qv"))
      .groupBy("query_id")
      .agg(graft.expressions.TopKAgg.topK($"s", $"id", k).as("t"))
      .select($"query_id", posexplode($"t").as(Seq("pos", "e")))
      .select($"query_id", ($"pos" + 1).cast("long").as("rank"),
        $"e.id".as("id"), $"e.score".as("score"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toSeq.sortBy(t => (t._1, t._2))
  }

  private def canon(df: DataFrame): Seq[(Long, Long, Long, Double)] =
    df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toSeq.sortBy(t => (t._1, t._2))

  test("fused ranked == declarative join+agg, scores bit-identical") {
    val exp = declarative(corpus(), probes(), k = 5, excludeSelf = false)
    val got = canon(ShardTopKJoin.ranked(corpus(), probes(), k = 5,
      excludeSelf = false))
    assert(got === exp)
    assert(exp.nonEmpty)
  }

  test("excludeSelf drops the self match before ranking") {
    val exp = declarative(corpus(), probes(), k = 3, excludeSelf = true)
    val got = canon(ShardTopKJoin.ranked(corpus(), probes(), k = 3,
      excludeSelf = true))
    assert(got === exp)
    assert(!got.exists(t => t._1 == t._3), "self id must never appear")
  }

  test("salted (packed-key) path is result-invariant vs unsalted") {
    val base = canon(ShardTopKJoin.ranked(corpus(), probes(), k = 4,
      excludeSelf = true))
    // maxRowsPerTask small enough to force saltc >= 2 on every shard
    val salted = canon(ShardTopKJoin.ranked(corpus(), probes(), k = 4,
      excludeSelf = true, maxRowsPerTask = 10L,
      saltOn = Some(col("id"))))
    assert(salted === base)
  }

  test("plan: fused node present, shuffles on both sides, no broadcast join") {
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    try {
      val df = ShardTopKJoin.partials(corpus(), probes(), k = 3,
        excludeSelf = false)
      df.collect() // force through AQE so the final plan is real
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("ShardTopKJoin"), s"fused exec missing:\n$plan")
      assert(!plan.contains("BroadcastHashJoin") &&
        !plan.contains("BroadcastNestedLoopJoin"),
        s"fused plan must not broadcast either side:\n$plan")
      assert("Exchange hashpartitioning".r.findAllIn(plan).size >= 2,
        s"both children must shuffle on the key:\n$plan")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", prev)
    }
  }

  test("zero-norm vectors score 0.0 (kernel parity), empty probes OK") {
    val c = Seq((1L, 0L, Array(0.0, 0.0)), (2L, 0L, Array(1.0, 0.0)))
      .toDF("id", "shard", "vec")
    val p = Seq((9L, 0L, Array(1.0, 1.0))).toDF("query_id", "shard", "qv")
    val got = canon(ShardTopKJoin.ranked(c, p, k = 5, excludeSelf = false))
    val exp = declarative(c, p, k = 5, excludeSelf = false)
    assert(got === exp)
    assert(got.exists(t => t._3 == 1L && t._4 == 0.0),
      "zero-norm corpus row must score 0.0 like VectorKernels.cosine")
    // probes hitting no corpus shard → query absent, not erroring
    val p2 = Seq((9L, 7L, Array(1.0, 1.0))).toDF("query_id", "shard", "qv")
    assert(ShardTopKJoin.ranked(c, p2, k = 5, excludeSelf = false).count() === 0)
  }

  test("L2 metric == declarative l2Dist + heap on negated distance") {
    import graft.expressions.VectorExpressions.l2Dist
    val exp = {
      val j = corpus().join(probes(), Seq("shard"))
        .filter($"id" =!= $"query_id")
        .withColumn("s", -l2Dist($"vec", $"qv"))
        .groupBy("query_id")
        .agg(graft.expressions.TopKAgg.topK($"s", $"id", 4).as("t"))
        .select($"query_id", posexplode($"t").as(Seq("pos", "e")))
        .select($"query_id", ($"pos" + 1).cast("long").as("rank"),
          $"e.id".as("id"), (-$"e.score").as("score"))
      j.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
        .toSeq.sortBy(t => (t._1, t._2))
    }
    val got = canon(ShardTopKJoin.ranked(corpus(), probes(), k = 4,
      excludeSelf = true, metric = ShardTopKJoin.Metric.L2))
    assert(got === exp)
    // rank ascends distance
    got.groupBy(_._1).values.foreach { rows =>
      val byRank = rows.sortBy(_._2).map(_._4)
      assert(byRank === byRank.sorted, "L2 rank must ascend the distance")
    }
  }

  test("Ip metric == declarative dotProduct + heap; salted path invariant") {
    import graft.expressions.VectorExpressions.dotProduct
    val exp = {
      val j = corpus().join(probes(), Seq("shard"))
        .filter($"id" =!= $"query_id")
        .withColumn("s", dotProduct($"vec", $"qv"))
        .groupBy("query_id")
        .agg(graft.expressions.TopKAgg.topK($"s", $"id", 4).as("t"))
        .select($"query_id", posexplode($"t").as(Seq("pos", "e")))
        .select($"query_id", ($"pos" + 1).cast("long").as("rank"),
          $"e.id".as("id"), $"e.score".as("score"))
      j.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
        .toSeq.sortBy(t => (t._1, t._2))
    }
    val got = canon(ShardTopKJoin.ranked(corpus(), probes(), k = 4,
      excludeSelf = true, metric = ShardTopKJoin.Metric.Ip))
    assert(got === exp)
    // rank descends the (unnormalized) score
    got.groupBy(_._1).values.foreach { rows =>
      val byRank = rows.sortBy(_._2).map(_._4)
      assert(byRank === byRank.sorted.reverse, "Ip rank must descend the score")
    }
    // salt packing is result-invariant under ip too
    val salted = canon(ShardTopKJoin.ranked(corpus(), probes(), k = 4,
      excludeSelf = true, maxRowsPerTask = 17L,
      metric = ShardTopKJoin.Metric.Ip))
    assert(salted === exp)
    // broadcast exec shares the kernel: keyed broadcast == shuffle exec
    val bc = canon(graft.plans.BroadcastTopKJoin.ranked(
      corpus(), probes(), k = 4, excludeSelf = true, keyed = true,
      metric = ShardTopKJoin.Metric.Ip))
    assert(bc === exp)
  }

  test("DotOverNorm metric == the declarative compressed __approx column") {
    import graft.expressions.VectorExpressions.{dotProduct, vecNorm}
    // corpus carries a STORED norm that is deliberately NOT the norm
    // of the scored array (the ADC-reconstruction shape)
    val c4 = corpus().withColumn("norm",
      when($"id" % 17 === 0, lit(0.0)).otherwise(vecNorm($"vec") * 1.1))
      .select($"id", $"shard", $"vec", $"norm")
    val exp = {
      val j = corpus().withColumn("norm",
        when($"id" % 17 === 0, lit(0.0)).otherwise(vecNorm($"vec") * 1.1))
        .join(probes(), Seq("shard"))
        .withColumn("qn", vecNorm($"qv"))
        .withColumn("s", when($"norm" === 0.0 || $"qn" === 0.0, 0.0)
          .otherwise(dotProduct($"qv", $"vec") / ($"norm" * $"qn")))
        .groupBy("query_id")
        .agg(graft.expressions.TopKAgg.topK($"s", $"id", 5).as("t"))
        .select($"query_id", posexplode($"t").as(Seq("pos", "e")))
        .select($"query_id", ($"pos" + 1).cast("long").as("rank"),
          $"e.id".as("id"), $"e.score".as("score"))
      j.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
        .toSeq.sortBy(t => (t._1, t._2))
    }
    val got = canon(ShardTopKJoin.ranked(c4, probes(), k = 5,
      excludeSelf = false, metric = ShardTopKJoin.Metric.DotOverNorm))
    assert(got === exp)
    assert(exp.nonEmpty)
  }

  test("salted packing passes the norm column through (4-col corpus)") {
    import graft.expressions.VectorExpressions.vecNorm
    val c4 = corpus().withColumn("norm", vecNorm($"vec"))
      .select($"id", $"shard", $"vec", $"norm")
    val base = canon(ShardTopKJoin.ranked(c4, probes(), k = 3,
      excludeSelf = true, metric = ShardTopKJoin.Metric.DotOverNorm))
    val salted = canon(ShardTopKJoin.ranked(c4, probes(), k = 3,
      excludeSelf = true, maxRowsPerTask = 10L, saltOn = Some(col("id")),
      metric = ShardTopKJoin.Metric.DotOverNorm))
    assert(salted === base)
  }

  test("Adc metric == a driver LUT mirror: rotation + residual + per-shard books + salt") {
    // dim 8, M = 4 subspaces of 2 dims, K = 4 codewords; per-SHARD
    // books, an orthonormal rotation (reversal permutation), residual
    // centroids, and a stored vnorm that is sometimes zero — every
    // AdcState field exercised at once
    val n = 200; val shards = 4; val dim = 8; val M = 4; val K = 4
    val subDim = dim / M
    def book(s: Int): Array[Array[Array[Double]]] =
      Array.tabulate(M, K, subDim)((m, k, j) =>
        math.sin(s * 13 + m * 7 + k * 3 + j).abs + 0.01)
    val rot: Array[Array[Double]] =
      Array.tabulate(dim, dim)((i, j) => if (j == dim - 1 - i) 1.0 else 0.0)
    def cent(s: Int): Array[Double] =
      Array.tabulate(dim)(j => math.cos(s * 5 + j) * 0.5)
    def codesOf(id: Int): Array[Int] = Array.tabulate(M)(m => (id + m) % K)
    def vnormOf(id: Int): Double = if (id % 17 == 0) 0.0 else 1.0 + (id % 7) * 0.1
    val c = (0 until n).map { i =>
      (i.toLong, (i % shards).toLong, codesOf(i), vnormOf(i))
    }.toDF("id", "shard", "codes", "vnorm")
      .select($"id", $"shard", $"codes".cast("array<int>").as("codes"), $"vnorm")
    val p = probes(n, shards)
    val state = ShardTopKJoin.AdcState(
      books = (0 until shards).map(s => s -> book(s)).toMap,
      rotation = Some(rot),
      residual = Some((0 until shards).map(s => s -> cent(s)).toMap))
    // driver mirror, SAME accumulation order as the exec: rotate the
    // query, LUT per (m, k) in j order, approx = off + Σ_m lut —
    // bit-identical, not approximately equal
    val pRows = p.collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getSeq[Double](2).toArray))
    val exp = pRows.groupBy(_._1).toSeq.flatMap { case (qid, reps) =>
      val qv = reps.head._3
      var nb = 0.0; var i = 0
      while (i < qv.length) { nb += qv(i) * qv(i); i += 1 }
      val qn = math.sqrt(nb)
      val qr = rot.map { row =>
        var s = 0.0; var j = 0
        while (j < qv.length) { s += row(j) * qv(j); j += 1 }
        s
      }
      val probedShards = reps.map(_._2).toSet
      val scored = (0 until n).filter(id => probedShards((id % shards).toLong))
        .map { id =>
          val s = id % shards
          val bk = book(s)
          var acc = { // off
            val cc = cent(s); var o = 0.0; var j = 0
            while (j < qv.length) { o += qv(j) * cc(j); j += 1 }
            o
          }
          val codes = codesOf(id)
          var m = 0
          while (m < M) {
            val cw = bk(m)(codes(m)); var lv = 0.0; var j = 0
            while (j < subDim) { lv += qr(m * subDim + j) * cw(j); j += 1 }
            acc += lv; m += 1
          }
          val vn = vnormOf(id)
          val score = if (vn == 0.0 || qn == 0.0) 0.0 else acc / (vn * qn)
          (id.toLong, score)
        }
      scored.sortBy(t => (-t._2, t._1)).take(5).zipWithIndex.map {
        case ((id, sc), r) => (qid, (r + 1).toLong, id, sc) }
    }.sortBy(t => (t._1, t._2))
    val got = canon(ShardTopKJoin.ranked(c, p, k = 5, excludeSelf = false,
      metric = ShardTopKJoin.Metric.Adc, adc = Some(state)))
    assert(got === exp, "fused ADC scores must equal the driver LUT mirror exactly")
    assert(exp.exists(_._4 != 0.0))
    // packed-salt path: shard unpacks from the fused key for book,
    // residual, and LUT resolution — result-invariant
    val salted = canon(ShardTopKJoin.ranked(c, p, k = 5, excludeSelf = false,
      maxRowsPerTask = 10L, saltOn = Some(col("id")),
      metric = ShardTopKJoin.Metric.Adc, adc = Some(state)))
    assert(salted === exp, "salting must not change ADC results")
    // global-books fallback under key -1
    val globalState = ShardTopKJoin.AdcState(books = Map(-1 -> book(0)),
      rotation = None, residual = None)
    val g = canon(ShardTopKJoin.ranked(c, p, k = 3, excludeSelf = false,
      metric = ShardTopKJoin.Metric.Adc, adc = Some(globalState)))
    assert(g.nonEmpty && g.forall(_._2 <= 3L))
    // an AdcState without Metric.Adc (and vice versa) refuses
    intercept[IllegalArgumentException](ShardTopKJoin.ranked(c, p, k = 3,
      excludeSelf = false, metric = ShardTopKJoin.Metric.Adc))
  }

  test("ragged dimensions fail loudly, matching the expression kernel") {
    val c = Seq((1L, 0L, Array(1.0, 2.0, 3.0))).toDF("id", "shard", "vec")
    val p = Seq((9L, 0L, Array(1.0, 1.0))).toDF("query_id", "shard", "qv")
    val ex = intercept[Exception] {
      ShardTopKJoin.ranked(c, p, k = 1, excludeSelf = false).collect()
    }
    assert(ex.getMessage.contains("mismatched dimensions") ||
      Option(ex.getCause).exists(_.getMessage.contains("mismatched dimensions")))
  }
}
