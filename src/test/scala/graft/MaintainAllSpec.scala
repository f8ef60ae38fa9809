package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** One [[Maintenance.maintainAll]] call heals every stale artifact
  * family at once — a routing change (stale recall curve), an index
  * append past the fold bound, and a stale banding curve — each
  * through its own health signal, the round-14 one-verb contract.
  */
class MaintainAllSpec extends AnyFunSuite {
  lazy val spark: SparkSession = GraftSession.local(4, "graft-test")

  private def w(prefix: String, n: Int) =
    (1 to n).map(i => s"$prefix$i").mkString(" ")

  test("one call heals routing-staled curves, folds an over-batched index, re-measures a stale banding curve") {
    import spark.implicits._

    // --- vector store with a measured recall curve
    val corpus = spark.range(0, 800, 1, 8).select(col("id"),
      array((0 until 32).map { d =>
        when(pmod(col("id"), lit(4)) === d / 8, 5.0).otherwise(0.0) +
          (pmod(hash(col("id"), lit(d)), lit(101)).cast("double") - 50.0) * 0.003
      }: _*).as("vector"))
    val vsDir = Files.createTempDirectory("graft-mall-vs").toString
    val vs = new graft.vector.VectorStore(spark, vsDir, numShards = 8)
    vs.build(corpus, iters = 3)
    vs.evalRecall(nQueries = 16, topK = 5)
    assert(vs.nprobeFor(0.9) >= 1)

    // --- term index one append over the fold bound
    val docs = (1L to 20L).map(i => (i, w(s"t${i}_", 30))).toDF("doc_id", "text")
    val tiDir = Files.createTempDirectory("graft-mall-ti").toString
    val ti = new graft.text.TermIndex(spark, tiDir)
    ti.build(docs)
    ti.append(Seq((100L, w("x", 30))).toDF("doc_id", "text"), "b1")
    ti.append(Seq((101L, w("y", 30))).toDF("doc_id", "text"), "b2")

    // --- shingle index with a measured banding curve, then an append
    // that moves the corpus stamp (bandingFor refuses until re-measured)
    val shDir = Files.createTempDirectory("graft-mall-sh").toString
    val sh = new graft.dedup.ShingleIndex(spark, shDir)
    sh.build(docs)
    sh.measureBanding(threshold = 0.8)
    sh.bandingFor(0.8)
    sh.append(Seq((200L, w("z", 30))).toDF("doc_id", "text"), "sb1")
    intercept[IllegalStateException](sh.bandingFor(0.8))

    // --- routing change stales the recall curve
    vs.build(corpus, iters = 2)
    intercept[IllegalStateException](vs.nprobeFor(0.9))

    // --- ONE call
    val r = Maintenance.maintainAll(
      store = Some(vs), termIdx = Some(ti), shingleIdx = Some(sh),
      maxBatches = 1)

    assert(r.curvesRefreshed >= 1, "the routing-staled recall curve re-measures")
    assert(vs.nprobeFor(0.9) >= 1, "healed curve serves")
    assert(r.termFolded, "the over-batched text index folds")
    assert(r.bandingRemeasured === 1, "the stale banding curve re-measures")
    assert(sh.bandingFor(0.8)._1 * sh.bandingFor(0.8)._2 === 128,
      "healed banding curve serves the tuner")
    // the store itself was NOT retrained: a rebuild leaves zero drift,
    // and a healthy store must not be touched by a maintenance tick
    assert(!r.storeMaintained && r.vectorsRerouted === 0L)
    assert(r.anythingRepaired)

    // a second tick is a no-op across every family
    val r2 = Maintenance.maintainAll(
      store = Some(vs), termIdx = Some(ti), shingleIdx = Some(sh),
      maxBatches = 256)
    assert(!r2.anythingRepaired, s"fresh families must be untouched: $r2")
  }

  test("the term-index fold runs BEFORE curve maintenance: one tick leaves the fusion curve fresh") {
    import spark.implicits._
    // a measured fusion curve + a term index one append over the fold
    // bound: the fold moves the index's content stamp (fusion-curve
    // provenance), so folding AFTER maintainCurves would re-stale the
    // curve the same tick healed (review regression) — the tick must
    // end with nprobeForFusion serving and the next tick a no-op
    val docs = (1L to 30L).map(i => (i, w(s"d${i}_", 25))).toDF("doc_id", "text")
    val base = Files.createTempDirectory("graft-mall-ord").toString
    val vs = new graft.vector.VectorStore(spark, s"$base/vs", numShards = 4)
    vs.build(graft.embed.HashEmbedder.embed(docs)
      .select(col("doc_id").as("id"), col("embedding").as("vector")), iters = 2)
    val ti = new graft.text.TermIndex(spark, s"$base/ti")
    ti.build(docs)
    val sample = vs.fusionSampleFrom(ti, nQueries = 8)
    vs.evalFusionRecall(ti, sample)
    assert(vs.nprobeForFusion(ti, 0.9) >= 1)
    ti.append(Seq((100L, w("x", 25))).toDF("doc_id", "text"), "b1")
    ti.append(Seq((101L, w("y", 25))).toDF("doc_id", "text"), "b2")
    // the appends already staled the curve; ONE tick must fold AND
    // leave a healed, fold-stamped curve behind
    // hash-embedding vectors have weak cluster structure (residual
    // drift ~0.37 after any sampled retrain) — gate the store out so
    // the test isolates the fold-vs-curves ordering
    val r = Maintenance.maintainAll(store = Some(vs), termIdx = Some(ti),
      maxBatches = 1, storeDriftX1e6 = 1000000L)
    assert(r.termFolded && r.curvesRefreshed >= 1, s"got $r")
    assert(vs.nprobeForFusion(ti, 0.9) >= 1,
      "the tick's curve heal must survive its own fold")
    val r2 = Maintenance.maintainAll(store = Some(vs), termIdx = Some(ti),
      maxBatches = 256, storeDriftX1e6 = 1000000L)
    assert(!r2.anythingRepaired, s"second tick must be a no-op: $r2")
  }

  test("the drift gate self-calibrates: one repair teaches the noise floor, ticks stop oscillating") {
    import spark.implicits._
    // hash-embedding vectors: weak cluster structure, so even a fresh
    // repair leaves residual drift (~0.3 L2) ABOVE the 0.1 default
    // gate — without calibration every tick would retrain forever
    // 30 docs x 25 hash-words / 4 shards: the ordering test's exact
    // shape, whose post-build drift measures ~0.37 (40 docs converge
    // to zero drift in 2 iters — the floor is fixture-sensitive)
    val docs = (1L to 30L).map(i => (i, w(s"d${i}_", 25))).toDF("doc_id", "text")
    val base = Files.createTempDirectory("graft-mall-gate").toString
    val vs = new graft.vector.VectorStore(spark, s"$base/vs", numShards = 4)
    vs.build(graft.embed.HashEmbedder.embed(docs)
      .select(col("doc_id").as("id"), col("embedding").as("vector")), iters = 2)
    assert(vs.driftBaseline().isEmpty, "no baseline before the first maintain")
    val r1 = Maintenance.maintainAll(store = Some(vs))
    assert(r1.storeMaintained,
      s"a floor above the default gate must trigger the first repair: $r1")
    assert(vs.driftBaseline().exists(_ > 0L),
      "the repair records its residual drift as the baseline")
    val r2 = Maintenance.maintainAll(store = Some(vs))
    assert(!r2.storeMaintained,
      s"the calibrated gate (2x baseline) must stop the oscillation: $r2")

    // the baseline write is tmp-swap, not delete-then-write: simulate
    // the crash window (live renamed out, fresh copy parked) — the
    // next read must recover the baseline instead of reverting the
    // gate to the uncalibrated default
    val baseline = vs.driftBaseline().get
    val live = new org.apache.hadoop.fs.Path(s"$base/vs/drift_baseline")
    val fs = live.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val old = new org.apache.hadoop.fs.Path(
      live.getParent, s"_${live.getName}__swap_old")
    assert(fs.rename(live, old), "simulated crash: live parked in old/")
    assert(vs.driftBaseline() === Some(baseline),
      "a crashed swap must not lose the calibration")
    assert(fs.exists(live) && !fs.exists(old), "recovery restores the live dir")
  }
}
