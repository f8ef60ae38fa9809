package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.vector.Serving

class ServingSpec extends AnyFunSuite {
  lazy val spark: SparkSession = GraftSession.local(4, "graft-test")
  val sf = "/root/testdata/sf0.001"

  private def cos(a: Array[Double], b: Array[Double]): Double = {
    val dot = a.zip(b).map { case (x, y) => x * y }.sum
    val na = math.sqrt(a.map(x => x * x).sum)
    val nb = math.sqrt(b.map(x => x * x).sum)
    dot / (na * nb)
  }

  private def vecsOf(ids: Set[Long]): Map[Long, Array[Double]] =
    Tables.embeddings(spark, sf)
      .filter(col("vec_id").isin(ids.toSeq: _*))
      .select(col("vec_id"), col("embedding").cast("array<double>"))
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap

  test("MMR first pick is the exact top-1, result is k deterministic rows") {
    val mmr1 = SparkEntry.queries("vdb_mmr")(spark, sf).collect()
    val mmr2 = SparkEntry.queries("vdb_mmr")(spark, sf).collect()
    assert(mmr1.map(_.toSeq).toSeq === mmr2.map(_.toSeq).toSeq, "non-deterministic")
    assert(mmr1.length === 10)
    val top1 = SparkEntry.queries("vdb_knn_exact")(spark, sf)
      .orderBy(desc("score"), asc("vec_id")).head().getLong(0)
    assert(mmr1.head.getLong(1) === top1,
      "with no prior picks the MMR objective reduces to relevance, so pick 1 = exact top-1")
  }

  test("MMR set is no more self-similar than the plain top-10") {
    def maxPairSim(ids: Seq[Long]): Double = {
      val vs = vecsOf(ids.toSet)
      (for { a <- ids; b <- ids if a < b } yield cos(vs(a), vs(b))).max
    }
    val mmrIds = SparkEntry.queries("vdb_mmr")(spark, sf)
      .collect().map(_.getLong(1)).toSeq
    val plainIds = SparkEntry.queries("vdb_knn_exact")(spark, sf)
      .collect().map(_.getLong(0)).toSeq
    // the redundancy penalty can only push near-duplicates OUT of the
    // selection, never in — tolerance covers the equal case where the
    // top-10 is already diverse
    assert(maxPairSim(mmrIds) <= maxPairSim(plainIds) + 1e-9)
  }

  test("mmrSelect spreads picks across duplicate groups before repeating") {
    // 3 groups of identical vectors; relevance favors group A slightly.
    // Plain top-3 = all of group A; MMR(λ=0.5) must visit all 3 groups:
    // a second same-group pick scores λ·rel − (1−λ)·1.0 < 0, while an
    // unpicked group still scores λ·rel > 0.
    val a = Array(1.0, 0.0, 0.0)
    val b = Array(0.0, 1.0, 0.0)
    val c = Array(0.0, 0.0, 1.0)
    val cands = Seq(
      (1L, a, 0.99), (2L, a, 0.98), (3L, a, 0.97),
      (4L, b, 0.90), (5L, b, 0.89),
      (6L, c, 0.80))
    val picked = Serving.mmrSelect(cands, k = 3, lambda = 0.5).map(_._1)
    assert(picked === Seq(1L, 4L, 6L))
  }

  test("vdb_mmr_batch: query 0's slice is the single-query vdb_mmr row-for-row") {
    val batch = SparkEntry.queries("vdb_mmr_batch")(spark, sf).collect()
    // every query contributes its full k rows, deterministically
    assert(batch.map(_.getLong(0)).distinct.sorted === Array(0L, 1L, 2L))
    assert(batch.length === 30)
    val batch2 = SparkEntry.queries("vdb_mmr_batch")(spark, sf).collect()
    assert(batch.map(_.toSeq).toSeq === batch2.map(_.toSeq).toSeq,
      "non-deterministic")
    // same shortlist depth, k, and lambda as vdb_mmr → query 0's
    // slice must reproduce the single-query greedy exactly
    val single = SparkEntry.queries("vdb_mmr")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3))).toSeq
    val slice0 = batch.filter(_.getLong(0) == 0L)
      .map(r => (r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4))).toSeq
    assert(slice0 === single,
      "the batch kernel must equal the single-query selection per query")
  }

  test("store mmrJoin equals a per-query shortlist + mmrSelect loop") {
    import spark.implicits._
    val n = 128
    val corpus = spark.range(0, n, 1, 4).select(col("id"),
      array((0 until 12).map(d =>
        (pmod(hash(col("id"), lit(d)), lit(101)).cast("double") - 50.0) / 50.0): _*)
        .as("vector"))
    val dir = java.nio.file.Files.createTempDirectory("graft-mmrjoin").toString
    val vs = new graft.vector.VectorStore(spark, dir, numShards = 4)
    vs.build(corpus, iters = 2)
    val vecs = corpus.select(col("id"), col("vector").cast("array<double>"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    val qIds = Seq(5L, 17L, 90L)
    val queries = qIds.map(id => (id, vecs(id).toSeq)).toDF("query_id", "qv")
    val got = vs.mmrJoin(queries, topK = 5, lambda = 0.5, shortlist = 15,
      nprobe = 2).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4))).toSeq.sortBy(t => (t._1, t._2))
    // the mirror: the independent single-query search path supplies
    // each query's shortlist, then the same greedy
    val want = qIds.sorted.flatMap { id =>
      val shortlist = vs.search(vecs(id), topK = 15, nprobe = 2).collect()
        .map(r => (r.getLong(0), vecs(r.getLong(0)), r.getDouble(2))).toSeq
      Serving.mmrSelect(shortlist, k = 5, lambda = 0.5).zipWithIndex.map {
        case ((pid, rel, sc), i) => (id, i + 1L, pid,
          math.rint(rel * 1e4) / 1e4, math.rint(sc * 1e4) / 1e4)
      }
    }
    assert(got === want, "batched MMR must equal the per-query loop")
  }

  test("ivfBatchArm: the fused-shuffle arm equals the broadcast arm, allowed slice included") {
    // the hybrid/tri vector arm goes size-conditional in round 13:
    // page-sized batches broadcast (corpus never shuffles), larger
    // frames ride knnJoinFrame's fused ShardTopKJoin exec — this pins
    // the two plans bit-identical so the switch can never reorder a
    // fusion, and pins the plan shapes so the condition really routes
    val qIds = Seq(0L, 1L, 2L, 5L, 9L)
    def canon(df: org.apache.spark.sql.DataFrame) = {
      val rows = df.collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
      (rows, df.queryExecution.executedPlan.toString.contains("ShardTopKJoin"))
    }
    val (bcRows, bcFused) = canon(Serving.ivfBatchArm(spark, sf, qIds, None))
    val (fRows, fFused) = canon(Serving.ivfBatchArm(spark, sf, qIds, None, fusedMin = 1))
    assert(fFused, "fusedMin <= batch size must take the fused exec")
    assert(!bcFused, "a page-sized batch must stay on the broadcast plan")
    assert(fRows === bcRows, "fused and broadcast arms must agree exactly")
    val en = Tables.documents(spark, sf).filter(col("lang") === "en").select("doc_id")
    val (bcA, _) = canon(Serving.ivfBatchArm(spark, sf, qIds, Some(en)))
    val (fA, fAF) = canon(Serving.ivfBatchArm(spark, sf, qIds, Some(en), fusedMin = 1))
    assert(fAF && fA === bcA, "the allowed slice must restrict both plans identically")
    assert(fA !== fRows, "the slice must actually restrict on this data")
  }

  test("weighted hybrid: 2:1 keyword weights reorder the equal-weight fusion") {
    def rowsOf(name: String) = SparkEntry.queries(name)(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    val equal = rowsOf("vdb_hybrid_batch")
    val weighted = rowsOf("vdb_hybrid_weighted")
    // both arms' SHORTLISTS are weight-independent — weights only
    // rescale the fusion — so per (query, doc) the rank_kw/rank_vec
    // pairs agree wherever a doc appears in both top-10s
    val eqRanks = equal.map(t => (t._1, t._3) -> (t._4, t._5)).toMap
    weighted.foreach { case (q, _, doc, rk, rv, _) =>
      eqRanks.get((q, doc)).foreach(p => assert(p === ((rk, rv)),
        s"arm ranks must be weight-independent for ($q, $doc)"))
    }
    // the 2:1 keyword boost must actually reorder something (else the
    // knob is untested on this data)
    val eqOrder = equal.sortBy(t => (t._1, t._2)).map(t => (t._1, t._3)).toSeq
    val wOrder = weighted.sortBy(t => (t._1, t._2)).map(t => (t._1, t._3)).toSeq
    assert(eqOrder !== wOrder, "weights changed nothing — widen the spec data")
    // and a fused score must dominate where the keyword rank is better
    weighted.foreach { case (_, _, _, rk, rv, x) =>
      assert(x > 0L)
      assert(rk > 0 || rv > 0)
    }
  }

  test("compressed mmrJoin equals the raw arm at a covering ADC shortlist") {
    import spark.implicits._
    val n = 128
    val corpus = spark.range(0, n, 1, 4).select(col("id"),
      array((0 until 16).map(d =>
        (pmod(hash(col("id"), lit(d)), lit(101)).cast("double") - 50.0) / 50.0): _*)
        .as("vector"))
    val dir = java.nio.file.Files.createTempDirectory("graft-mmrpq").toString
    val vs = new graft.vector.VectorStore(spark, dir, numShards = 4)
    vs.build(corpus, iters = 2, pqSubspaces = 16)
    val vecs = corpus.select(col("id"), col("vector").cast("array<double>"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    val queries = Seq(5L, 90L).map(id => (id, vecs(id).toSeq))
      .toDF("query_id", "qv")
    def canon(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4))).toSet
    // a covering shortlist makes the ADC pass exact (every true
    // top-15 member re-ranked on raw vectors), so the diversified
    // result must be identical — while the selection scan stayed
    // codes-only
    val raw = canon(vs.mmrJoin(queries, topK = 5, shortlist = 15, nprobe = 2))
    val comp = vs.mmrJoin(queries, topK = 5, shortlist = 15, nprobe = 2,
      compressed = true, adcShortlist = 300)
    assert(canon(comp) === raw,
      "compressed MMR with a covering ADC shortlist must equal the raw arm")
  }

  test("recall_eval is integer-exact and bounded") {
    val rows = SparkEntry.queries("vdb_recall_eval")(spark, sf).collect()
    assert(rows.length === 20)
    rows.foreach { r =>
      val (nExact, nHit, recall) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(nExact === 10L)
      assert(nHit >= 0L && nHit <= nExact)
      assert(recall === nHit * 10000L / nExact)
    }
    // nprobe=2 of 4 shards must beat the ~50%-corpus-coverage floor on
    // average — each query's own shard holds its densest neighborhood
    val mean = rows.map(_.getLong(3)).sum / rows.length
    assert(mean >= 5000L, s"mean recall_x1e4 = $mean")
  }

  test("hybrid search rank fields are consistent with the fused score") {
    val rows = SparkEntry.queries("vdb_hybrid_search")(spark, sf).collect()
    assert(rows.length === 10)
    rows.foreach { r =>
      val (rankKw, rankVec, rrf) = (r.getLong(2), r.getLong(3), r.getLong(4))
      val expect = math.rint(((if (rankKw > 0) 1.0 / (60 + rankKw) else 0.0) +
        (if (rankVec > 0) 1.0 / (60 + rankVec) else 0.0)) * 1e6).toLong
      assert(rrf === expect)
      assert(rankKw > 0 || rankVec > 0, "a fused row must come from at least one shortlist")
    }
    // ranks strictly increase with position (the output IS the fused order)
    assert(rows.map(_.getLong(0)).toSeq === (1L to 10L))
  }

  test("knn classify votes match an independent majority over the same neighbor lists") {
    val e = Tables.embeddings(spark, sf).select(col("vec_id"),
      col("embedding").cast("array<double>").as("embedding"))
    val n = e.count()
    // the registered query's own neighbor lists (same bound, same k)…
    val nn = Serving.knnJoinFrame(e, maxRowsPerTask = math.max(2L, n / 32L), k = 10)
      .select("query_id", "vec_id").collect()
      .map(r => r.getLong(0) -> r.getLong(1))
    val labels = Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("label").cast("long"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // …tallied independently in Scala: majority, ties to the SMALLER label
    val expect = nn.groupBy(_._1).map { case (q, rows) =>
      val votes = rows.map(r => labels(r._2)).groupBy(identity)
        .map { case (l, v) => (l, v.length.toLong) }
      val (lab, cnt) = votes.toSeq.minBy { case (l, c) => (-c, l) }
      q -> ((lab, cnt))
    }
    val got = SparkEntry.queries("vdb_knn_classify")(spark, sf).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got === expect, "max(struct) vote fold diverged from the Scala tally")
    assert(got.nonEmpty && got.keySet.size === got.size)
    // ties exist in this corpus or the tie-break arm would be untested;
    // prove at least one query had a non-unanimous vote
    assert(got.values.exists(_._2 < 10L), "every vote unanimous — widen the spec corpus")
  }

  test("fusion recall: one-pass curve persists, tunes serving, refuses EITHER index stale") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-fusrec").toString
    val docs = Tables.documents(spark, sf).select("doc_id", "text")
    val embIn = Tables.embeddings(spark, sf)
      .select(col("vec_id").as("id"), col("embedding").as("vector"))
    val vs = new graft.vector.VectorStore(spark, s"$dir/vs", numShards = 4)
    vs.build(embIn, iters = 3)
    val idx = new graft.text.TermIndex(spark, s"$dir/ti")
    idx.build(docs)
    val queries = Seq(
      (0L, Seq("vector", "merge", "scan")),
      (1L, Seq("scan", "filter", "join")),
      (2L, Seq("table", "stream"))).toDF("query_id", "terms")
      .join(Tables.embeddings(spark, sf)
        .select(col("vec_id").as("query_id"), col("embedding").as("qv")), "query_id")
      .select("query_id", "terms", "qv")

    val curve = vs.evalFusionRecall(idx, queries)
      .orderBy("nprobe").collect()
    assert(curve.length === 4)
    val rec = curve.map(_.getAs[Long]("recall_x1e4"))
    assert(rec.last === 10000L, "full probing IS the exact page — recall 1 by construction")
    assert(rec.zip(rec.tail).forall { case (a, b) => a <= b },
      s"page recall must be monotone in probe depth, got ${rec.mkString(",")}")

    // tuner: the cheapest depth whose measured page recall meets the
    // target; target = the depth-1 recall must tune to depth 1
    val pFull = vs.nprobeForFusion(idx, 1.0)
    assert(pFull === curve.indexWhere(_.getAs[Long]("recall_x1e4") === 10000L) + 1)
    assert(vs.nprobeForFusion(idx, rec.head / 10000.0) === 1)
    // unmeasured parameterization falls back to full probing (exact)
    assert(vs.nprobeForFusion(idx, 0.9, shortlist = 17) === 4)

    // the serving hook resolves the tune once at construction and is
    // page-equal to the explicitly-probed session
    val fsAt = Serving.fusionServingAtRecall(idx, vs, targetRecall = 1.0,
      excludeSelf = true)
    val fsEx = Serving.fusionServing(idx, vs, nprobe = pFull, excludeSelf = true)
    val qb = queries
    val (aAt, aEx) = (fsAt.arms(qb), fsEx.arms(qb))
    val pageOf = (fs: Serving.FusionServing, a: Serving.FusionArms) =>
      fs.hybrid(a).collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(pageOf(fsAt, aAt) === pageOf(fsEx, aEx))
    aAt.release(); aEx.release()

    // staleness is two-sided: mutate the TEXT index → refuse
    idx.append(docs.filter(col("doc_id") < 3)
      .withColumn("doc_id", col("doc_id") + 100000L), "b1")
    val exIdx = intercept[IllegalStateException](vs.nprobeForFusion(idx, 0.9))
    assert(exIdx.getMessage.contains("text index"))
    assert(vs.nprobeForFusion(idx, 0.9, checkFresh = false) >= 1)
    // re-measure clears it (merge keeps the parameterization keyed)
    vs.evalFusionRecall(idx, queries)
    vs.nprobeForFusion(idx, 0.9)
    // mutate the STORE's routing → refuse
    vs.refreshCentroids(sampleFraction = 1.0, iters = 2)
    val exVs = intercept[IllegalStateException](vs.nprobeForFusion(idx, 0.9))
    assert(exVs.getMessage.contains("routing centroids"))
  }

  test("filtered-slice fusion curve: slice-keyed rows, drift refusal, maintenance heals from persisted ids") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-fusrec-s").toString
    val docs = Tables.documents(spark, sf).select("doc_id", "text")
    val embIn = Tables.embeddings(spark, sf)
      .select(col("vec_id").as("id"), col("embedding").as("vector"))
    val vs = new graft.vector.VectorStore(spark, s"$dir/vs", numShards = 4)
    vs.build(embIn, iters = 3)
    val idx = new graft.text.TermIndex(spark, s"$dir/ti")
    idx.build(docs)
    val queries = Seq(
      (0L, Seq("vector", "merge", "scan")),
      (1L, Seq("scan", "filter", "join")),
      (2L, Seq("table", "stream"))).toDF("query_id", "terms")
      .join(Tables.embeddings(spark, sf)
        .select(col("vec_id").as("query_id"), col("embedding").as("qv")), "query_id")
      .select("query_id", "terms", "qv")
    val slice = Tables.embeddings(spark, sf)
      .filter(pmod(col("vec_id"), lit(2)) === 0).select(col("vec_id").as("id"))

    vs.evalFusionRecall(idx, queries)
    val pCorpus = vs.nprobeForFusion(idx, 0.95)
    // unmeasured slice: full probe fallback, never another slice's tune
    assert(vs.nprobeForFusion(idx, 0.95, allowed = Some(slice)) === 4)

    val t = vs.evalFusionRecall(idx, queries, allowed = Some(slice))
    val stamps = t.select("allowed_stamp").distinct()
      .collect().map(_.getLong(0)).toSet
    assert(stamps.size === 2 && stamps.contains(0L),
      s"slice and corpus rows must coexist mode-keyed, got $stamps")
    val sliceCurve = t.filter(col("allowed_stamp") =!= 0L)
      .orderBy("nprobe").collect().map(_.getAs[Long]("recall_x1e4"))
    assert(sliceCurve.last === 10000L,
      "full probing IS the slice's exact page — recall 1 by construction")
    val pSlice = vs.nprobeForFusion(idx, 0.95, allowed = Some(slice))
    assert(pSlice >= 1 && pSlice <= 4)
    // the corpus tune is untouched by the slice measurement
    assert(vs.nprobeForFusion(idx, 0.95) === pCorpus)

    // drifted slice -> loud refusal
    val drifted = slice.filter(col("id") =!= slice.head().getLong(0))
    val ex = intercept[IllegalStateException] {
      vs.nprobeForFusion(idx, 0.95, allowed = Some(drifted))
    }
    assert(ex.getMessage.contains("DIFFERENT"))

    // routing change stales BOTH; maintainCurves heals the slice mode
    // from its persisted ids + query sample without the caller
    vs.refreshCentroids(sampleFraction = 1.0, iters = 2)
    intercept[IllegalStateException] {
      vs.nprobeForFusion(idx, 0.95, allowed = Some(slice))
    }
    val m = vs.maintainCurves(Some(idx))
    assert(m.fusionRefreshed >= 2 && m.fusionSkipped === 0,
      s"corpus AND slice fusion modes must re-measure, got $m")
    assert(vs.nprobeForFusion(idx, 0.95, allowed = Some(slice)) >= 1,
      "healed slice fusion curve serves")
    assert(vs.nprobeForFusion(idx, 0.95) >= 1, "healed corpus curve serves")
  }

  test("compressed fusion recall: covering shortlist reproduces the raw curve, modes merge") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-fusrec-c").toString
    val docs = Tables.documents(spark, sf).select("doc_id", "text")
    val embIn = Tables.embeddings(spark, sf)
      .select(col("vec_id").as("id"), col("embedding").as("vector"))
    val vs = new graft.vector.VectorStore(spark, s"$dir/vs", numShards = 4)
    vs.build(embIn, iters = 3, pqSubspaces = 16)
    val idx = new graft.text.TermIndex(spark, s"$dir/ti")
    idx.build(docs)
    val queries = Seq(
      (0L, Seq("vector", "merge", "scan")),
      (1L, Seq("scan", "filter", "join")),
      (2L, Seq("table", "stream"))).toDF("query_id", "terms")
      .join(Tables.embeddings(spark, sf)
        .select(col("vec_id").as("query_id"), col("embedding").as("qv")), "query_id")
      .select("query_id", "terms", "qv")

    def curveOf(df: org.apache.spark.sql.DataFrame, comp: Boolean): Seq[(Long, Long)] =
      df.filter(col("compressed") === comp)
        .orderBy("nprobe")
        .collect().map(r =>
          (r.getAs[Long]("nprobe"), r.getAs[Long]("recall_x1e4"))).toSeq

    val raw = curveOf(vs.evalFusionRecall(idx, queries), comp = false)
    // a COVERING ADC shortlist (larger than any probed population's
    // contribution to the page) re-ranks exactly — the compressed
    // page equals the raw page at every depth, so the curves match
    val withComp = vs.evalFusionRecall(idx, queries,
      compressed = true, vecShortlist = 4000)
    assert(curveOf(withComp, comp = true) === raw,
      "covering-shortlist compressed fusion must reproduce the raw curve")
    // the raw parameterization survived the compressed re-measure
    assert(curveOf(withComp, comp = false) === raw,
      "merge must not clobber the raw mode")
    // tuner reads the matching mode
    assert(vs.nprobeForFusion(idx, 1.0, compressed = true, vecShortlist = 4000) ===
      vs.nprobeForFusion(idx, 1.0))
    // an unmeasured compressed parameterization falls back to full probing
    assert(vs.nprobeForFusion(idx, 0.9, compressed = true, vecShortlist = 7) === 4)
    // a TRUNCATING shortlist must still match a literal per-depth
    // searchJoin(compressed = true) + RRF mirror — the one-pass
    // packed-replica plan reproduces each depth's ADC cut + exact
    // re-rank bit-for-bit, so the integer curves agree exactly
    import org.apache.spark.sql.expressions.Window
    val kwArm = idx.searchBatch(queries.select("query_id", "terms"), k = 50)
      .withColumn("rank_kw", row_number().over(
        Window.partitionBy("query_id").orderBy(desc("bm25"), asc("doc_id"))))
      .select("query_id", "doc_id", "rank_kw")
    def mirrorPage(p: Int, comp: Boolean, vecShortlist: Int) = {
      val arm = vs.searchJoin(queries.select("query_id", "qv"), topK = 50,
        nprobe = p, excludeSelf = true, compressed = comp,
        shortlist = vecShortlist)
      val vecArm = arm.select(col("query_id"),
        col(arm.columns(2)).as("doc_id"), col("rank").cast("int").as("rank_vec"))
      kwArm.join(vecArm, Seq("query_id", "doc_id"), "full_outer")
        .select(col("query_id"), col("doc_id"),
          (coalesce(lit(1.0) / (col("rank_kw") + 60), lit(0.0)) +
            coalesce(lit(1.0) / (col("rank_vec") + 60), lit(0.0))).as("rrf"))
        .withColumn("rank", row_number().over(
          Window.partitionBy("query_id").orderBy(desc("rrf"), asc("doc_id"))))
        .filter(col("rank") <= 10)
        .select("query_id", "doc_id")
    }
    val mirrorExact = mirrorPage(4, comp = false, vecShortlist = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val mirrorCurve = (1 to 4).map { p =>
      val page = mirrorPage(p, comp = true, vecShortlist = 10)
        .collect().map(r => (r.getLong(0), r.getLong(1)))
      (p.toLong, page.count(mirrorExact) * 10000L / (3L * 10L))
    }
    val tight = vs.evalFusionRecall(idx, queries,
      compressed = true, vecShortlist = 10)
    val tightCurve = tight.filter(col("compressed") === true &&
        col("vec_shortlist") === 10L)
      .orderBy("nprobe").collect()
      .map(r => (r.getAs[Long]("nprobe"), r.getAs[Long]("recall_x1e4"))).toSeq
    assert(tightCurve === mirrorCurve,
      s"one-pass compressed curve $tightCurve != per-depth mirror $mirrorCurve")
  }

  test("fusionSampleFrom + bootstrap: a never-measured store gets a curve from its own docs") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-fusboot").toString
    val docs = Tables.documents(spark, sf).select("doc_id", "text")
    val embIn = Tables.embeddings(spark, sf)
      .select(col("vec_id").as("id"), col("embedding").as("vector"))
    val vs = new graft.vector.VectorStore(spark, s"$dir/vs", numShards = 4)
    vs.build(embIn, iters = 3)
    val idx = new graft.text.TermIndex(spark, s"$dir/ti")
    idx.build(docs)

    // the sample pairs each low-id vector with ITS OWN doc's most
    // characteristic terms — every term must come from that doc's text
    val sample = vs.fusionSampleFrom(idx, nQueries = 8, termsPerQuery = 3)
    val rows = sample.collect()
    assert(rows.nonEmpty && rows.forall(_.getSeq[String](1).size <= 3))
    val texts = docs.filter(col("doc_id") < 8).collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ").toSet).toMap
    rows.foreach { r =>
      val own = texts(r.getLong(0))
      assert(r.getSeq[String](1).forall(own),
        s"doc ${r.getLong(0)}: sampled terms must come from its own text")
    }

    // stratified sampling spreads probes across the store's OWN
    // clustering: with ceil(8/4) = 2 per shard, all four shards are
    // represented (the lowest-id default may cluster wherever ids do)
    val strat = vs.fusionSampleFrom(idx, nQueries = 8, termsPerQuery = 2,
      stratified = true)
    val stratIds = strat.select("query_id").collect().map(_.getLong(0)).toSet
    val shardOf = spark.read.parquet(s"$dir/vs/vectors")
      .select(col("id").cast("long"), col("shard").cast("long")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(stratIds.map(shardOf).size === 4,
      s"stratified sample must cover every shard, got shards ${stratIds.map(shardOf)}")

    // never measured: the tuner falls back to full probing; the
    // opt-in bootstrap measures a curve from the store's own docs
    assert(vs.nprobeForFusion(idx, 0.9) === 4)
    assert(vs.maintainCurves(Some(idx)).fusionRefreshed === 0,
      "without bootstrapFusion a missing curve stays missing")
    val r1 = vs.maintainCurves(Some(idx), bootstrapFusion = true)
    assert(r1.fusionRefreshed === 1 && r1.fusionSkipped === 0, s"got $r1")
    assert(vs.nprobeForFusion(idx, 0.5) >= 1)
    // measured now: a second bootstrap call is a no-op
    assert(vs.maintainCurves(Some(idx), bootstrapFusion = true).refreshed === 0)
  }

  test("maintainCurves re-measures exactly the stale tuning curves") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-curves").toString
    val docs = Tables.documents(spark, sf).select("doc_id", "text")
    val embIn = Tables.embeddings(spark, sf)
      .select(col("vec_id").as("id"), col("embedding").as("vector"))
    val vs = new graft.vector.VectorStore(spark, s"$dir/vs", numShards = 4)
    vs.build(embIn, iters = 3)
    val idx = new graft.text.TermIndex(spark, s"$dir/ti")
    idx.build(docs)
    val queries = Seq(
      (0L, Seq("vector", "merge", "scan")),
      (1L, Seq("scan", "filter", "join"))).toDF("query_id", "terms")
      .join(Tables.embeddings(spark, sf)
        .select(col("vec_id").as("query_id"), col("embedding").as("qv")), "query_id")
      .select("query_id", "terms", "qv")

    // measure all three curve families
    vs.evalRecall(nQueries = 16, topK = 5)
    vs.evalRangeRecall(minScore = 0.25, nQueries = 16)
    vs.evalFusionRecall(idx, queries)
    // everything fresh: maintain is a no-op
    val noop = vs.maintainCurves(Some(idx))
    assert(noop.refreshed === 0 && noop.fusionSkipped === 0,
      s"fresh curves must not re-measure, got $noop")

    // routing change: ALL THREE families go stale, every nprobeFor*
    // refuses, and one maintain call heals them
    vs.refreshCentroids(sampleFraction = 1.0, iters = 2)
    intercept[IllegalStateException](vs.nprobeFor(0.9, metric = "cosine"))
    intercept[IllegalStateException](vs.nprobeForRange(0.25, 0.9))
    intercept[IllegalStateException](vs.nprobeForFusion(idx, 0.9))
    val healed = vs.maintainCurves(Some(idx))
    assert(healed.recallRefreshed === 1 && healed.rangeRefreshed === 1 &&
      healed.fusionRefreshed === 1 && healed.fusionSkipped === 0, s"got $healed")
    vs.nprobeFor(0.9, metric = "cosine")
    vs.nprobeForRange(0.25, 0.9)
    vs.nprobeForFusion(idx, 0.9)

    // text-index mutation: ONLY the fusion family is stale
    idx.append(docs.filter(col("doc_id") < 3)
      .withColumn("doc_id", col("doc_id") + 200000L), "mc1")
    val fusionOnly = vs.maintainCurves(Some(idx))
    assert(fusionOnly.recallRefreshed === 0 && fusionOnly.rangeRefreshed === 0 &&
      fusionOnly.fusionRefreshed === 1, s"got $fusionOnly")
    vs.nprobeForFusion(idx, 0.9)

    // without the TermIndex, a store-stale fusion curve is SKIPPED,
    // not silently dropped — and the store families still heal
    vs.refreshCentroids(sampleFraction = 1.0, iters = 1)
    val noIdx = vs.maintainCurves(None)
    assert(noIdx.recallRefreshed === 1 && noIdx.rangeRefreshed === 1 &&
      noIdx.fusionRefreshed === 0 && noIdx.fusionSkipped === 1, s"got $noIdx")
    intercept[IllegalStateException](vs.nprobeForFusion(idx, 0.9))
    assert(vs.maintainCurves(Some(idx)).fusionRefreshed === 1)
    vs.nprobeForFusion(idx, 0.9)
  }

  test("more-like-this: self-free pages, rrf recomputes from arms, lexical arm is oracle-anchored") {
    val out = SparkEntry.queries("vdb_more_like_this")(spark, sf).collect()
    val byQ = out.groupBy(_.getLong(0))
    assert(byQ.keySet === Set(0L, 1L, 2L))
    byQ.foreach { case (qid, rows) =>
      assert(rows.length === 10, s"query $qid page size")
      val sorted = rows.sortBy(_.getLong(1))
      assert(sorted.map(_.getLong(1)).toSeq === (1L to 10L), "ranks dense 1..10")
      // rrf strictly ordered by rank (ties broken by doc_id upstream,
      // but the x1e6 value must be nonincreasing)
      val rrfs = sorted.map(_.getLong(5)).toSeq
      assert(rrfs === rrfs.sortBy(-_))
      sorted.foreach { r =>
        assert(r.getLong(2) !== qid, "the example itself must never rank")
        val (rl, rv) = (r.getLong(3), r.getLong(4))
        assert(rl > 0 || rv > 0, "a fused doc must come from at least one arm")
        val expect = math.round(
          ((if (rl > 0) 1.0 / (60 + rl) else 0.0) +
            (if (rv > 0) 1.0 / (60 + rv) else 0.0)) * 1e6)
        assert(r.getLong(5) === expect, "rrf must recompute from the emitted ranks")
      }
    }
    // the lexical arm is the text_tfidf_sim kernel: its top-5 per
    // example must be exactly the oracle-proven query's rows
    val lex = graft.text.TextAnalysis
      .tfidfCosineNeighbors(spark, sf, Seq(0L, 1L, 2L), k = 5)
      .select("q_id", "rank", "doc_id").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    val sim = SparkEntry.queries("text_tfidf_sim")(spark, sf)
      .select("q_id", "rank", "doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1).toInt, r.getLong(2))).toSet
    assert(lex === sim)
  }
}
