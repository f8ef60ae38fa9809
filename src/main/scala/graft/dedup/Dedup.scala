package graft.dedup

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftshim.CheckpointInterop
import org.apache.spark.sql.types.{DoubleType, LongType}

import graft.{QueryModule, Tables}
import graft.expressions.VectorExpressions._

/** Document deduplication suite (SURVEY §2 block C) — the operators a
  * training-data pipeline runs over a 100 TB text corpus.
  *
  * Shared scale shape: candidate generation is ALWAYS an equi-join on
  * a compact blocking key (content hash, shingle, minhash band,
  * simhash band) — never an n^2 comparison. Verification (true
  * Jaccard / hamming) runs only on candidates. Hot blocking keys (a
  * stop-shingle shared by half the corpus) are the skew risk: AQE
  * skew-join splitting is on, shingles above the document-frequency
  * cap (see [[ngramJaccardPairs]]) leave the similarity universe, and
  * over-cap band buckets degrade to star candidates
  * ([[bandedCandidates]]) — AQE can redistribute a hot key but cannot
  * shrink its n^2 pair count; only capping can.
  *
  * The pair helpers cache intermediate shingle/fingerprint tables for
  * the lifetime of the returned (lazy) plan; a long-lived session
  * should `spark.catalog.clearCache()` after consuming results, as
  * Bench does between timings.
  */
object Dedup extends QueryModule {

  /** 1-based word-trigram shingles, mirroring the DuckDB oracle's
    * `ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]` exactly.
    */
  private def shingles(docs: DataFrame): DataFrame = {
    // test parquet is one row group -> one input split; fan the cheap
    // doc rows across cores before the explode-heavy work. (On a real
    // multi-file corpus the scan is already parallel and AQE elides
    // needless exchanges.)
    // docs under 3 words produce NO shingles (oracle's generate_series
    // is empty there); sequence(1, 0) would count DOWN and explode on
    // element_at(ws, 0), so guard explicitly.
    // The split MATERIALIZES as its own projection before the lambda
    // touches it: expressions referenced from inside a higher-order
    // function's lambda sit outside common-subexpression elimination,
    // so an inline split(text) would re-tokenize the document for
    // every element_at — 3x per shingle (measured ~2x on this kernel
    // at sf0.1, round 12)
    val ws = col("__ws")
    // Tables.fanned pins the partition count: a bare repartition(col)
    // leaves the count to AQE, which coalesces the ~sub-MB test-scale
    // shuffle to ONE partition by byte size — serializing the
    // CPU-heavy explode above it (measured 1-task stages, r15)
    Tables.fanned(docs, col("doc_id"))
      .select(col("doc_id"), split(col("text"), " ").as("__ws"))
      .select(col("doc_id"),
        explode(when(size(ws) >= 3,
          array_distinct(transform(
            sequence(lit(1), size(ws) - 2),
            i => concat_ws(" ", element_at(ws, i), element_at(ws, i + 1), element_at(ws, i + 2)))))
          .otherwise(array())).as("s"))
  }

  // --- exact dedup: content-hash groups ------------------------------
  private def exact(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .groupBy(md5(col("text")).as("fingerprint"))
      .agg(count(lit(1)).as("n_copies"), min("doc_id").as("survivor_id"))

  private val exactSql =
    """SELECT md5(text) AS fingerprint, COUNT(*) AS n_copies, MIN(doc_id) AS survivor_id
      |FROM documents GROUP BY 1""".stripMargin

  // --- near-dup cluster resolution (connected components) ------------
  /** Resolve near-dup PAIRS into clusters — the principled step
    * between pair detection and survivor selection: pairwise removal
    * can't see transitivity (pairs (a,c),(b,c) leave both a and b even
    * though they share a near-dup), components can.
    *
    * Algorithm: alternating large-star/small-star (Kiveris et al.
    * 2014, "Connected Components in MapReduce and Beyond"). Each
    * round rewires edges toward component minima — large-star hangs
    * every larger neighbor off the neighborhood min, small-star
    * collapses each node's smaller neighbors onto it — and the edge
    * set converges to per-component stars in O(log n) rounds
    * INDEPENDENT of graph diameter. The earlier min-label propagation
    * needed diameter rounds, and chained boilerplate (doc A shares a
    * span with B, B with C, ...) makes long paths at corpus scale;
    * star contraction's doubling behavior caps a million-node chain
    * at ~20 rounds. Per round the work is the same shape as before:
    * two groupBy-min + equi-join passes over the edge set — shuffles
    * scale with |edges|, never edges², at any corpus size.
    *
    * Returns (doc_id, cluster_id = min doc_id of the component) for
    * every doc appearing in a pair. The result is a localCheckpoint'd
    * frame — its blocks are NOT CacheManager entries, so
    * `spark.catalog.clearCache()` won't free them: long-lived sessions
    * should call `CheckpointInterop.unpersistCheckpoint(result)` once
    * downstream output is materialized (Bench does this between
    * timings), after which the frame is no longer recomputable.
    */
  def connectedComponents(pairs: DataFrame, idA: String = "id_a", idB: String = "id_b",
                          maxIters: Int = 50,
                          maxDriverEdges: Long = DRIVER_CC_MAX_EDGES,
                          knownRawCount: Option[Long] = None): DataFrame =
    connectedComponentsWithRounds(pairs, idA, idB, maxIters, maxDriverEdges,
      knownRawCount)._1

  /** Threshold for the model-sized fast path: a RAW pair set at or
    * under this count (an upper bound on the distinct edge set) is
    * collected and labeled with a driver union-find (~32 MB of longs
    * at the bound) instead of scheduled star rounds. Near-dup edge
    * sets are DUP-VOLUME-sized, not corpus-sized — at a sane dup rate
    * even a 100 TB corpus's cluster graph fits here, and the star
    * rounds' per-round scheduling (4+ tiny shuffles + checkpoint +
    * convergence count, times log n rounds) costs more than the data
    * at any cluster size; below the bound even the node/edge DISTINCT
    * shuffles fold into the collect. The distributed rounds remain
    * the plan ABOVE the bound (a pathological everything-matches
    * corpus), chosen from one count over the checkpointed pair
    * projection — the same bounded-collect discipline as centroids
    * and MMR shortlists.
    */
  private val DRIVER_CC_MAX_EDGES = 2000000L

  /** Driver union-find with min-id roots — semantically identical to
    * the star fixed point (cluster_id = min doc_id of the component).
    * Fully primitive: nodes arrive SORTED UNIQUE, ids map to indices
    * by binary search, parents are an Int array (no boxed maps — at
    * the 2M-edge bound the transient footprint is tens of MB, not
    * hundreds). Duplicate and self edges are harmless (union is
    * idempotent), so callers need not dedupe.
    */
  private def unionFindLabels(edges: Array[(Long, Long)],
                              sortedNodes: Array[Long]): Array[(Long, Long)] = {
    val parent = Array.tabulate(sortedNodes.length)(identity)
    def find(i0: Int): Int = {
      var x = i0
      var p = parent(x)
      while (p != x) { // path halving
        val gp = parent(p)
        parent(x) = gp
        x = gp
        p = parent(x)
      }
      x
    }
    var e = 0
    while (e < edges.length) {
      val a = edges(e)._1
      val b = edges(e)._2
      if (a != b) {
        val ra = find(java.util.Arrays.binarySearch(sortedNodes, a))
        val rb = find(java.util.Arrays.binarySearch(sortedNodes, b))
        // sortedNodes ascending ⇒ lower index IS lower id: the min id
        // becomes the root, so roots ARE component minima
        if (ra != rb) { if (ra < rb) parent(rb) = ra else parent(ra) = rb }
      }
      e += 1
    }
    Array.tabulate(sortedNodes.length)(i => (sortedNodes(i), sortedNodes(find(i))))
  }

  /** Large-star step: for every node u with neighborhood Γ(u) (both
    * orientations), emit (v, min(Γ(u) ∪ {u})) for each v ∈ Γ(u) with
    * v > u. Output stays (bigger, smaller)-oriented and self-loop-free
    * by construction (v > u ≥ m).
    */
  private def largeStar(e: DataFrame): DataFrame = {
    val sym = e.unionByName(e.select(col("v").as("u"), col("u").as("v")))
    val mins = sym.groupBy("u").agg(min("v").as("mn"))
      .select(col("u"), least(col("u"), col("mn")).as("m"))
    sym.join(mins, "u").filter(col("v") > col("u"))
      .select(col("v").as("u"), col("m").as("v")).distinct()
  }

  /** Small-star step over (bigger, smaller)-oriented edges: for every
    * node u, m = min of its smaller neighbors; rewire each other
    * smaller neighbor to m and keep (u, m). Orientation and
    * self-loop-freedom preserved (every emitted dst is the group min).
    */
  private def smallStar(e: DataFrame): DataFrame = {
    val mins = e.groupBy("u").agg(min("v").as("m"))
    e.join(mins, "u").filter(col("v") =!= col("m"))
      .select(col("v").as("u"), col("m").as("v"))
      .unionByName(mins.select(col("u"), col("m").as("v")))
      .distinct()
  }

  /** [[connectedComponents]] plus the round count it converged in —
    * exposed for the spec that pins the O(log n) behavior (a planted
    * 1000-node chain must converge in ~log₂ rounds, not 1000).
    */
  private[graft] def connectedComponentsWithRounds(
      pairs: DataFrame, idA: String = "id_a", idB: String = "id_b",
      maxIters: Int = 50,
      maxDriverEdges: Long = DRIVER_CC_MAX_EDGES,
      knownRawCount: Option[Long] = None): (DataFrame, Int) = {
    // ids cast to LONG up front (both paths label as long; integral
    // ids are the dedup pipeline's contract everywhere) and the raw
    // pair projection checkpointed ONCE — the caller's candidate
    // pipeline executes exactly once regardless of path
    val pe = pairs
      .select(col(idA).cast(org.apache.spark.sql.types.LongType).as("a"),
        col(idB).cast(org.apache.spark.sql.types.LongType).as("b"))
      .localCheckpoint(true)
    // a caller that already knows the pair cardinality (ServedPairs'
    // artifact meta) spares the extra count action — the bound check
    // needs only a count that equals or upper-bounds the frame's rows
    val rawCount = knownRawCount.getOrElse(pe.count())
    if (rawCount <= maxDriverEdges) {
      // model-sized fast path (see [[DRIVER_CC_MAX_EDGES]]): the raw
      // pair volume bounds the distinct edge set from above, so the
      // node/edge distincts, the star rounds, and their convergence
      // counts all collapse into one collect + driver union-find.
      // Typed collect (no Row intermediates), primitive sort+unique
      // for the node set, and no edge dedup at all (union is
      // idempotent over duplicates). Rounds = 0 marks the path taken.
      val sp = pairs.sparkSession
      import sp.implicits._
      val raw = pe.as[(Long, Long)].collect()
      CheckpointInterop.unpersistCheckpoint(pe)
      val ns0 = new Array[Long](raw.length * 2)
      var i = 0
      while (i < raw.length) {
        ns0(2 * i) = raw(i)._1; ns0(2 * i + 1) = raw(i)._2; i += 1
      }
      java.util.Arrays.sort(ns0)
      var n = 0
      i = 0
      while (i < ns0.length) {
        if (n == 0 || ns0(i) != ns0(n - 1)) { ns0(n) = ns0(i); n += 1 }
        i += 1
      }
      val ns = java.util.Arrays.copyOf(ns0, n)
      val rdd = sp.sparkContext.parallelize(
        unionFindLabels(raw, ns).toIndexedSeq,
        math.max(1, ns.length / 250000 + 1))
      return (rdd.toDF("doc_id", "cluster_id").localCheckpoint(true), 0)
    }
    // eager localCheckpoints truncate lineage: without them every round
    // NESTS the previous round's plan plus the caller's whole candidate
    // pipeline, and plan construction itself (AQE explain, optimizer)
    // blows up long before the data does — the standard posture for
    // iterative graph algorithms on DataFrames
    val nodes = pe.select(col("a").as("doc_id"))
      .unionByName(pe.select(col("b").as("doc_id")))
      .distinct().localCheckpoint(true)
    var edges = pe
      .select(greatest(col("a"), col("b")).as("u"), least(col("a"), col("b")).as("v"))
      .filter(col("u") =!= col("v")).distinct().localCheckpoint(true)
    CheckpointInterop.unpersistCheckpoint(pe)
    var edgeCount = edges.count()
    var converged = false
    var it = 0
    while (!converged && it < maxIters) {
      val next = smallStar(largeStar(edges)).localCheckpoint(true)
      // both sides are distinct sets: equal counts + an empty one-sided
      // anti-join ⇔ identical edge sets (the fixed point of both stars).
      // The previous round's count is carried, so a non-converged round
      // costs one count job; the anti-join runs only on count equality.
      val nextCount = next.count()
      converged = nextCount == edgeCount &&
        next.join(edges, Seq("u", "v"), "left_anti").isEmpty
      edgeCount = nextCount
      // `next` is eagerly materialized, so the previous round's
      // checkpoint blocks are superseded — release them, or executor
      // storage grows by one edges-frame per round for the session
      CheckpointInterop.unpersistCheckpoint(edges)
      edges = next
      it += 1
    }
    // exhausting maxIters means the edge set had not reached the star
    // fixed point — labels read off it would be hop-bounded minima,
    // NOT component minima, and silently returning them would keep
    // spurious "survivors" downstream. Fail loudly; the default 50
    // rounds covers any component star contraction can meet (log₂
    // scale — ~2^50 nodes).
    if (!converged) {
      CheckpointInterop.unpersistCheckpoint(edges)
      CheckpointInterop.unpersistCheckpoint(nodes)
      throw new IllegalStateException(
        s"connectedComponents did not converge in $maxIters rounds; " +
          "labels would be non-canonical — raise maxIters")
    }
    // converged state is one star per component, oriented (member,
    // root): every non-root appears exactly once on the u side. Roots
    // (and any node whose every pair self-collapsed) label themselves.
    val labels = edges.select(col("u").as("doc_id"), col("v").as("cluster_id"))
      .unionByName(nodes
        .join(edges.select(col("u").as("doc_id")), Seq("doc_id"), "left_anti")
        .withColumn("cluster_id", col("doc_id")))
      .localCheckpoint(true)
    CheckpointInterop.unpersistCheckpoint(edges)
    CheckpointInterop.unpersistCheckpoint(nodes)
    (labels, it)
  }

  // registered consumers serve the corpus-stamped pair artifact
  // ([[ServedPairs]]): candidate generation runs once per corpus
  // state, not once per query, and the clusters path reads its edge
  // cardinality from the artifact meta instead of a count() action
  private def clusters(s: SparkSession, d: String): DataFrame = {
    val (p, n) = ServedPairs.pairsWithCount(s, d)
    connectedComponents(p, knownRawCount = Some(n))
  }

  // --- survivor selection: keep the best doc per cluster -------------
  /** The decision step a dedup pass exists for: for every near-dup
    * cluster, KEEP the highest-quality member (composite quality
    * score, ties to the lowest doc_id — deterministic) and report the
    * cluster size. min-of-struct aggregation, not a row_number window:
    * partial aggregation reduces each cluster map-side, so the shuffle
    * carries one row per (partition, cluster), never the full
    * membership sorted. Membership is pairs-volume (docs in no pair
    * are implicitly kept), so the quality join is dup-volume-sized
    * against the scored scan, broadcastable whenever the dup rate is
    * sane.
    */
  def keepBest(docs: DataFrame): DataFrame =
    keepBestLabeled(docs, connectedComponents(ngramJaccardPairs(docs)))

  /** [[keepBest]] over caller-supplied cluster labels — the served
    * route ([[ServedPairs]]) and the one-shot route share everything
    * after pair generation.
    */
  private[graft] def keepBestLabeled(docs: DataFrame, labels: DataFrame): DataFrame = {
    val scored = graft.text.TextAnalysis.qualityScores(docs)
      .select(col("doc_id"), col("quality_bp"))
    labels.join(scored, "doc_id")
      .groupBy("cluster_id")
      .agg(
        count(lit(1)).as("n_members"),
        min(struct((-col("quality_bp")).as("nq"), col("doc_id"))).as("best"))
      .select(col("cluster_id"), col("best.doc_id").as("kept_doc"),
        (-col("best.nq")).as("kept_quality_bp"), col("n_members"))
  }

  private def keepBestQuery(s: SparkSession, d: String): DataFrame = {
    val (p, n) = ServedPairs.pairsWithCount(s, d)
    keepBestLabeled(Tables.documents(s, d),
      connectedComponents(p, knownRawCount = Some(n)))
  }

  private lazy val keepBestSql =
    s"""WITH labels AS (SELECT * FROM ($clustersSql) z),
      |q AS (SELECT * FROM (${graft.text.TextAnalysis.qualitySql}) y)
      |SELECT cluster_id, doc_id AS kept_doc, quality_bp AS kept_quality_bp, n_members
      |FROM (SELECT l.cluster_id, l.doc_id, q.quality_bp,
      |        ROW_NUMBER() OVER (PARTITION BY l.cluster_id
      |                           ORDER BY q.quality_bp DESC, l.doc_id) AS rn,
      |        COUNT(*) OVER (PARTITION BY l.cluster_id) AS n_members
      |      FROM labels l JOIN q ON l.doc_id = q.doc_id) t
      |WHERE rn = 1""".stripMargin

  // --- paragraph-level dedup: repeated 10-word chunks ----------------
  /** Sub-document exact dedup (the CCNet-style paragraph pass): carve
    * each doc into NON-overlapping 10-word chunks, fingerprint each,
    * and report chunks appearing in 2+ distinct docs. Where whole-doc
    * exact dedup misses boilerplate shared across otherwise-different
    * pages, this catches it — and stays one explode + one hash
    * aggregation, no joins: linear at any corpus size (chunk count =
    * token count / 10). countDistinct is per-chunk-group, never global.
    */
  def paragraphDups(docs: DataFrame, chunkWords: Int = 10): DataFrame = {
    // __ws materialized before the lambda — see shingles()
    val ws = col("__ws")
    val nFull = floor(size(ws) / chunkWords).cast("int")
    // bare keyed repartition ON PURPOSE: the chunk-hash explode is
    // cheap enough that AQE's byte-sized width beats a pinned 32
    // (bench A/B r15: pinning cost +0.18 s)
    docs.repartition(col("doc_id"))
      .select(col("doc_id"), split(col("text"), " ").as("__ws"))
      .select(col("doc_id"),
        explode(when(nFull > 0,
          transform(sequence(lit(0), nFull - 1),
            j => md5(concat_ws(" ", slice(ws, j * chunkWords + 1, lit(chunkWords))))))
          .otherwise(array())).as("chunk_hash"))
      .groupBy("chunk_hash")
      .agg(countDistinct(col("doc_id")).as("n_docs"), min("doc_id").as("first_doc"))
      .filter(col("n_docs") >= 2)
  }

  private def paragraph(s: SparkSession, d: String): DataFrame =
    paragraphDups(Tables.documents(s, d))

  private val paragraphSql =
    """WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
      |ch AS (
      |  SELECT doc_id, md5(array_to_string(ws[j*10+1 : j*10+10], ' ')) AS chunk_hash
      |  FROM w, UNNEST(generate_series(0, CAST(FLOOR(len(ws) / 10) AS INT) - 1)) AS t(j)
      |  WHERE len(ws) >= 10)
      |SELECT chunk_hash, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
      |       MIN(doc_id) AS first_doc
      |FROM ch GROUP BY 1
      |HAVING COUNT(DISTINCT doc_id) >= 2""".stripMargin

  // --- n-gram Jaccard near-dup pairs ---------------------------------
  /** Shingle document-frequency cap defaults: a shingle kept for
    * candidate generation may appear in at most
    * max(dfCapFloor, ceil(maxDfFraction * n_docs)) documents.
    */
  val DefaultMaxDfFraction = 0.005
  val DefaultDfCapFloor = 20L

  /** Shingle rows with the df-cap applied: shingles whose document
    * frequency exceeds max(dfCapFloor, ceil(maxDfFraction * n_docs))
    * are removed. Exposed for DedupSpec's boundedness assertions.
    */
  private[graft] def cappedShingles(sh: DataFrame, docs: DataFrame,
                                    maxDfFraction: Double,
                                    dfCapFloor: Long): DataFrame = {
    // corpus size folded into the plan (1-row agg, broadcast) rather
    // than a driver-side count() action
    val nDocs = docs.agg(countDistinct(col("doc_id")).as("n_docs"))
    val cap = greatest(lit(dfCapFloor), ceil(col("n_docs") * maxDfFraction))
    val keep = sh.groupBy("s").agg(count(lit(1)).as("df"))
      .crossJoin(broadcast(nDocs))
      .filter(col("df") <= cap)
      .select("s")
    sh.join(keep, "s")
  }

  /** df-capped candidate pairs — exposed for DedupSpec. */
  private[graft] def ngramCandidates(sh: DataFrame, docs: DataFrame,
                                     maxDfFraction: Double,
                                     dfCapFloor: Long): DataFrame = {
    val shc = cappedShingles(sh, docs, maxDfFraction, dfCapFloor)
    shc.as("a").join(shc.as("b"),
        col("a.s") === col("b.s") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
      .distinct()
  }

  private[graft] def shinglesOf(docs: DataFrame): DataFrame = shingles(docs)

  /** N-gram Jaccard near-dup pairs with a shingle df-cap.
    *
    * At corpus scale one stop-shingle shared by half the corpus makes
    * an uncapped shingle self-join quadratic in that shingle's df, and
    * AQE skew-split can redistribute but not shrink the pair count.
    * The cap removes such shingles from the similarity UNIVERSE — the
    * stopword-removal semantics: similarity is exact Jaccard over each
    * document's CAPPED shingle set, so ultra-common boilerplate
    * neither generates candidates nor inflates scores. Within that
    * universe, candidates and intersection counts come from ONE capped
    * self-join + groupBy (no per-pair re-join), keeping total cost
    * proportional to sum(df^2) over KEPT shingles only — bounded by
    * cap * |shingle rows|, i.e. linear in the corpus for a fixed cap.
    * Classic full-set Jaccard is recovered with
    * dfCapFloor = Long.MaxValue; on corpora with no shingle above the
    * cap (true of every test SF) the two are identical.
    */
  /** Shared candidate generation for the set-similarity pair
    * operators: (id_a, id_b, i = |A∩B|, na = |A|, nb = |B|) over the
    * df-capped shingle universe. One cached explode + one capped
    * self-join + the two size joins — [[ngramJaccardPairs]] and
    * [[containmentPairs]] differ only in the measure they project
    * from these counts, so cap semantics / cache policy / skew
    * handling live in exactly one place.
    */
  private[dedup] def sizedCandidates(docs: DataFrame, maxDfFraction: Double,
                              dfCapFloor: Long): DataFrame =
    // cache the exploded shingles (referenced by the df table AND the
    // join side): one explode pass total, not one per reference
    sizedCandidatesFrom(shingles(docs).cache(), docs, maxDfFraction, dfCapFloor)

  /** [[sizedCandidates]] over a CALLER-built (cached) shingle frame —
    * lets [[evalBandingRecall]] share one explode between its ground
    * truth and its signatures. A disabled cap (dfCapFloor =
    * Long.MaxValue) skips the df-count-and-keep join entirely: every
    * shingle passes it by construction.
    */
  private[dedup] def sizedCandidatesFrom(sh: DataFrame, docs: DataFrame,
                                  maxDfFraction: Double,
                                  dfCapFloor: Long): DataFrame = {
    val shc = (if (dfCapFloor == Long.MaxValue) sh
               else cappedShingles(sh, docs, maxDfFraction, dfCapFloor)).cache()
    val sizes = shc.groupBy("doc_id").agg(count(lit(1)).as("n"))
    val inter = shc.as("a").join(shc.as("b"),
        col("a.s") === col("b.s") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
      .agg(count(lit(1)).as("i"))
    inter
      .join(sizes.withColumnRenamed("doc_id", "id_a").withColumnRenamed("n", "na"), "id_a")
      .join(sizes.withColumnRenamed("doc_id", "id_b").withColumnRenamed("n", "nb"), "id_b")
  }

  /** The Jaccard projection over a sized-candidate frame (id_a, id_b,
    * i, na, nb) — pure integer arithmetic, so applying it to candidates
    * recomputed inline or re-read from [[ServedPairs]]' parquet
    * artifact is bit-identical by construction. ONE definition for
    * both paths, so the served route can never drift from the
    * one-shot route.
    */
  private[graft] def jaccardOf(cands: DataFrame, threshold: Double): DataFrame = {
    val jac = col("i").cast(DoubleType) / (col("na") + col("nb") - col("i"))
    cands.filter(jac >= threshold)
      // engine-stable 4-dp rounding for an integer ratio (see SURVEY §4)
      .select(col("id_a"), col("id_b"), (round(jac * 10000.0, 0) / 10000.0).as("jaccard"))
  }

  def ngramJaccardPairs(docs: DataFrame, threshold: Double = 0.8,
                        maxDfFraction: Double = DefaultMaxDfFraction,
                        dfCapFloor: Long = DefaultDfCapFloor): DataFrame =
    jaccardOf(sizedCandidates(docs, maxDfFraction, dfCapFloor), threshold)

  private def ngramJaccard(s: SparkSession, d: String): DataFrame =
    ServedPairs.pairs(s, d)

  // --- shingle containment: asymmetric near-dup ----------------------
  /** Containment pairs: C(A⊂B) = |A∩B| / |A| over the capped shingle
    * sets, reported when either direction reaches `threshold`. Jaccard
    * under-scores doc-in-doc duplication — a page quoting 95% of a
    * much longer one has J ≈ |A|/|B| (small) but C(A⊂B) ≈ 0.95 — so
    * a Jaccard-only pass keeps wrapped reposts and quoted boilerplate
    * that containment catches (Broder 1997 distinguishes resemblance
    * from containment for exactly this case; reference analogue: none
    * — its dedup is whole-vector equality only, storage_server.py).
    *
    * Plan shape is IDENTICAL to [[ngramJaccardPairs]] (same capped
    * shingle equi-join, same size join; only the final projection
    * differs), so the 100 TB posture — candidate generation is an
    * equi-join on shingles with hot shingles df-capped out — carries
    * over unchanged. Both directions emit so the consumer can tell
    * which side is the contained one.
    */
  def containmentPairs(docs: DataFrame, threshold: Double = 0.9,
                       maxDfFraction: Double = DefaultMaxDfFraction,
                       dfCapFloor: Long = DefaultDfCapFloor): DataFrame =
    containmentOf(sizedCandidates(docs, maxDfFraction, dfCapFloor), threshold)

  /** Rounded [[containmentRawOf]] — the display projection shared by
    * the one-shot and [[ServedPairs]]-served routes.
    */
  private[graft] def containmentOf(cands: DataFrame, threshold: Double): DataFrame =
    // engine-stable 4-dp rounding for an integer ratio (see SURVEY §4)
    containmentRawOf(cands, threshold)
      .select(col("id_a"), col("id_b"),
        (round(col("__c_a_in_b") * 10000.0, 0) / 10000.0).as("c_a_in_b"),
        (round(col("__c_b_in_a") * 10000.0, 0) / 10000.0).as("c_b_in_a"))

  /** [[containmentPairs]] with the UNROUNDED containment columns
    * (`__c_a_in_b`, `__c_b_in_a`) — for consumers that branch on the
    * threshold (the curation gate): deciding which side to drop from
    * the 4-dp display rounding would flip direction when a
    * sub-threshold value rounds up to it (0.89996 → 0.9000).
    */
  private[graft] def containmentPairsRaw(docs: DataFrame, threshold: Double,
                                         maxDfFraction: Double = DefaultMaxDfFraction,
                                         dfCapFloor: Long = DefaultDfCapFloor): DataFrame =
    containmentRawOf(sizedCandidates(docs, maxDfFraction, dfCapFloor), threshold)

  /** Containment projection over a sized-candidate frame — see
    * [[jaccardOf]] for the shared-definition rationale.
    */
  private[graft] def containmentRawOf(cands: DataFrame, threshold: Double): DataFrame = {
    val cAinB = col("i").cast(DoubleType) / col("na")
    val cBinA = col("i").cast(DoubleType) / col("nb")
    cands
      .filter(greatest(cAinB, cBinA) >= threshold)
      .select(col("id_a"), col("id_b"),
        cAinB.as("__c_a_in_b"), cBinA.as("__c_b_in_a"))
  }

  private def containment(s: SparkSession, d: String): DataFrame =
    containmentOf(ServedPairs.candidates(s, d), 0.9)

  // --- cross-source duplication matrix -------------------------------
  /** Provenance overlap: which sources duplicate each other. Every
    * verified near-dup pair ([[ngramJaccardPairs]]'s df-capped
    * candidates + exact Jaccard) annotated with both sides' `source`
    * and rolled up per unordered source pair — the matrix a curation
    * team reads to find mirror sites, syndication feeds, and
    * scraper overlap before deciding which source to drop wholesale.
    * Same-source rows are kept: intra-source dup rate is the other
    * half of that decision.
    *
    * Scale shape: pair volume (never corpus²) from the shared capped-
    * shingle plan; the two source lookups are pairs-volume equi-joins
    * against a (doc_id, source) projection of the scan; the rollup is
    * one hash aggregate on a low-cardinality key.
    */
  def crossSourceMatrix(docs: DataFrame, threshold: Double = 0.8): DataFrame =
    crossSourceFrom(docs, ngramJaccardPairs(docs, threshold))

  /** [[crossSourceMatrix]] over caller-supplied verified pairs — the
    * [[ServedPairs]]-served route's entry point.
    */
  private[graft] def crossSourceFrom(docs: DataFrame, pairs: DataFrame): DataFrame = {
    val src = docs.select(col("doc_id"), col("source"))
    pairs
      .join(src.select(col("doc_id").as("id_a"), col("source").as("__sa")), "id_a")
      .join(src.select(col("doc_id").as("id_b"), col("source").as("__sb")), "id_b")
      .groupBy(least(col("__sa"), col("__sb")).as("source_a"),
        greatest(col("__sa"), col("__sb")).as("source_b"))
      .agg(count(lit(1)).as("n_pairs"))
  }

  private def crossSource(s: SparkSession, d: String): DataFrame =
    crossSourceFrom(Tables.documents(s, d), ServedPairs.pairs(s, d))

  // lazy: interpolates candSqlCtes/jaccardPairsSelectSql, which are
  // declared later in the object (same pattern as keepBestSql)
  private lazy val crossSourceSql =
    s"""$candSqlCtes,
       |pairs AS ($jaccardPairsSelectSql)
       |SELECT LEAST(sa.source, sb.source) AS source_a,
       |       GREATEST(sa.source, sb.source) AS source_b,
       |       CAST(COUNT(*) AS BIGINT) AS n_pairs
       |FROM pairs
       |JOIN documents sa ON sa.doc_id = pairs.id_a
       |JOIN documents sb ON sb.doc_id = pairs.id_b
       |GROUP BY 1, 2""".stripMargin

  // --- incremental dedup: new batch vs existing corpus ---------------
  /** Dedup an INCOMING batch against an existing corpus — the shape a
    * continuously-fed pipeline actually runs (daily crawl increments),
    * asymmetric where the corpus-wide passes above are symmetric: old
    * docs are never re-judged, and a new doc is dropped the moment it
    * duplicates anything already kept. Verdict per new doc:
    * 'exact' (content hash already in the corpus), 'near' (capped-
    * shingle Jaccard >= threshold against some old doc), else 'keep'.
    * Within-batch duplicates are NOT judged here — that is the
    * corpus-wide pass's job on the merged result.
    *
    * Scale shape: the exact check is a semi-join on 16-byte
    * fingerprints (batch side broadcastable); the near check reuses
    * the df-capped shingle universe (cap over old ∪ new, so a
    * boilerplate shingle is judged on its full frequency) but joins
    * ONLY new-side shingles against old-side shingles — candidate
    * volume is batch-bounded, never corpus². A production deployment
    * keeps the old corpus's capped shingles + sizes as a maintained
    * incremental index instead of re-shingling per batch; the
    * dataframes here are exactly the tables that index persists.
    */
  def incrementalVerdicts(docs: DataFrame, isNew: org.apache.spark.sql.Column,
                          threshold: Double = 0.8,
                          maxDfFraction: Double = DefaultMaxDfFraction,
                          dfCapFloor: Long = DefaultDfCapFloor): DataFrame =
    incrementalVerdictsCached(docs, isNew, threshold, maxDfFraction, dfCapFloor)._1

  /** [[incrementalVerdicts]] plus the cached intermediate frames, for
    * callers that run it repeatedly in one session (the streaming
    * micro-batch gate): unpersist them once the verdicts are consumed,
    * or one shingle cache accumulates per batch for the stream's
    * lifetime.
    */
  private[graft] def incrementalVerdictsCached(
      docs: DataFrame, isNew: org.apache.spark.sql.Column, threshold: Double,
      maxDfFraction: Double = DefaultMaxDfFraction,
      dfCapFloor: Long = DefaultDfCapFloor): (DataFrame, Seq[DataFrame]) = {
    val sh = shingles(docs).cache()
    val shc = cappedShingles(sh, docs, maxDfFraction, dfCapFloor).cache()
    val ids = docs.select(col("doc_id"), isNew.as("__is_new"), md5(col("text")).as("__fp"))
    val newIds = ids.filter(col("__is_new"))
    val oldIds = ids.filter(!col("__is_new"))
    val exactDup = newIds
      .join(oldIds.select(col("__fp")).distinct(), Seq("__fp"), "left_semi")
      .select(col("doc_id")).withColumn("__exact", lit(1L))
    val sizes = shc.groupBy("doc_id").agg(count(lit(1)).as("n"))
    val shNew = shc.join(newIds.select("doc_id"), Seq("doc_id"), "left_semi")
    val shOld = shc.join(oldIds.select("doc_id"), Seq("doc_id"), "left_semi")
    val inter = shNew.as("a").join(shOld.as("b"), col("a.s") === col("b.s"))
      .groupBy(col("a.doc_id").as("id_new"), col("b.doc_id").as("id_old"))
      .agg(count(lit(1)).as("i"))
    val jac = col("i").cast(DoubleType) / (col("na") + col("nb") - col("i"))
    val nearDup = inter
      .join(sizes.withColumnRenamed("doc_id", "id_new").withColumnRenamed("n", "na"), "id_new")
      .join(sizes.withColumnRenamed("doc_id", "id_old").withColumnRenamed("n", "nb"), "id_old")
      .filter(jac >= threshold)
      .select(col("id_new").as("doc_id")).distinct().withColumn("__near", lit(1L))
    val verdicts = newIds.select("doc_id")
      .join(exactDup, Seq("doc_id"), "left")
      .join(nearDup, Seq("doc_id"), "left")
      .select(col("doc_id"),
        when(col("__exact").isNotNull, "exact")
          .when(col("__near").isNotNull, "near")
          .otherwise("keep").as("verdict"))
    (verdicts, Seq(sh, shc))
  }

  /** [[incrementalVerdicts]] with the old/new split given as two
    * frames — the shape a streaming micro-batch gate calls with.
    * doc_ids must be disjoint across the frames (the ingest
    * contract). Returns (verdicts over `batch`'s docs, caches to
    * unpersist once consumed).
    */
  private[graft] def batchVerdictsCached(corpus: DataFrame, batch: DataFrame,
                                         threshold: Double = 0.8): (DataFrame, Seq[DataFrame]) = {
    val u = corpus.select(col("doc_id"), col("text")).withColumn("__new", lit(false))
      .unionByName(batch.select(col("doc_id"), col("text")).withColumn("__new", lit(true)))
    incrementalVerdictsCached(u, col("__new"), threshold)
  }

  /** [[incrementalVerdicts]] derived from an already-verified pair
    * frame instead of a fresh shingle pass — the [[ServedPairs]]
    * route. Exact by construction: the artifact's candidate universe
    * is capped over the WHOLE corpus (old ∪ new — the same universe
    * [[incrementalVerdicts]] builds), and its pairs at the threshold
    * are a superset of the new×old pairs the one-shot plan joins, so
    * filtering to mixed-flag pairs recovers the identical near set.
    * The extra work is two pairs-volume equi-joins against a
    * (doc_id, flag) projection — nothing corpus-sized.
    */
  private[graft] def incrementalVerdictsFromPairs(
      docs: DataFrame, isNew: org.apache.spark.sql.Column,
      pairs: DataFrame): DataFrame = {
    val ids = docs.select(col("doc_id"), isNew.as("__is_new"),
      md5(col("text")).as("__fp"))
    val newIds = ids.filter(col("__is_new"))
    val oldIds = ids.filter(!col("__is_new"))
    val exactDup = newIds
      .join(oldIds.select(col("__fp")).distinct(), Seq("__fp"), "left_semi")
      .select(col("doc_id")).withColumn("__exact", lit(1L))
    val flags = ids.select(col("doc_id"), col("__is_new"))
    val nearDup = pairs
      .join(flags.select(col("doc_id").as("id_a"), col("__is_new").as("__na")), "id_a")
      .join(flags.select(col("doc_id").as("id_b"), col("__is_new").as("__nb")), "id_b")
      .filter(col("__na") =!= col("__nb"))
      .select(when(col("__na"), col("id_a")).otherwise(col("id_b")).as("doc_id"))
      .distinct().withColumn("__near", lit(1L))
    newIds.select("doc_id")
      .join(exactDup, Seq("doc_id"), "left")
      .join(nearDup, Seq("doc_id"), "left")
      .select(col("doc_id"),
        when(col("__exact").isNotNull, "exact")
          .when(col("__near").isNotNull, "near")
          .otherwise("keep").as("verdict"))
  }

  private def incremental(s: SparkSession, d: String): DataFrame =
    incrementalVerdictsFromPairs(Tables.documents(s, d),
      col("doc_id") % 5 === 0, ServedPairs.pairs(s, d))

  private lazy val incrementalSql =
    s"""$candSqlCtes,
       |newdocs AS (SELECT doc_id, md5(text) AS fp FROM documents WHERE doc_id % 5 = 0),
       |olddocs AS (SELECT doc_id, md5(text) AS fp FROM documents WHERE doc_id % 5 <> 0),
       |exact_dup AS (SELECT DISTINCT n.doc_id FROM newdocs n JOIN olddocs o ON n.fp = o.fp),
       |inter2 AS (
       |  SELECT a.doc_id AS id_new, b.doc_id AS id_old, COUNT(*) AS i
       |  FROM shc a JOIN shc b ON a.s = b.s
       |  WHERE a.doc_id % 5 = 0 AND b.doc_id % 5 <> 0
       |  GROUP BY 1, 2),
       |near_dup AS (
       |  SELECT DISTINCT id_new AS doc_id FROM inter2
       |  JOIN sizes sa ON sa.doc_id = id_new
       |  JOIN sizes sb ON sb.doc_id = id_old
       |  WHERE CAST(i AS DOUBLE) / (sa.n + sb.n - i) >= 0.8)
       |SELECT n.doc_id,
       |  CASE WHEN e.doc_id IS NOT NULL THEN 'exact'
       |       WHEN nr.doc_id IS NOT NULL THEN 'near'
       |       ELSE 'keep' END AS verdict
       |FROM newdocs n
       |LEFT JOIN exact_dup e ON e.doc_id = n.doc_id
       |LEFT JOIN near_dup nr ON nr.doc_id = n.doc_id""".stripMargin

  // CTEs shared by ngramJaccardSql and editDistanceSql, mirroring
  // ngramJaccardPairs exactly: the df-cap removes hot shingles from the
  // similarity universe (sizes AND intersections over capped sets)
  private[graft] val candSqlCtes =
    """WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
      |sh AS (SELECT DISTINCT doc_id, ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] AS s
      |       FROM w, UNNEST(generate_series(1, len(ws)-2)) AS t(i)),
      |keep AS (SELECT s FROM sh GROUP BY s
      |         HAVING COUNT(*) <= GREATEST(20, CEIL(0.005 * (SELECT COUNT(DISTINCT doc_id) FROM documents)))),
      |shc AS (SELECT sh.doc_id, sh.s FROM sh JOIN keep USING (s)),
      |sizes AS (SELECT doc_id, COUNT(*) AS n FROM shc GROUP BY 1),
      |inter AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS i
      |          FROM shc a JOIN shc b ON a.s = b.s AND a.doc_id < b.doc_id
      |          GROUP BY 1, 2)""".stripMargin

  // the jaccard-pair SELECT over candSqlCtes' inter/sizes — shared
  // with PipelineOps.leakageSql so the oracle's pair set can never
  // silently diverge from dedup_ngram_jaccard's
  private[graft] val jaccardPairsSelectSql =
    """SELECT id_a, id_b,
      |       ROUND(CAST(i AS DOUBLE) / (sa.n + sb.n - i) * 10000.0) / 10000.0 AS jaccard
      |FROM inter
      |JOIN sizes sa ON sa.doc_id = id_a
      |JOIN sizes sb ON sb.doc_id = id_b
      |WHERE CAST(i AS DOUBLE) / (sa.n + sb.n - i) >= 0.8""".stripMargin

  private val ngramJaccardSql =
    s"""$candSqlCtes
      |$jaccardPairsSelectSql""".stripMargin

  private val containmentSql =
    s"""$candSqlCtes
      |SELECT id_a, id_b,
      |       ROUND(CAST(i AS DOUBLE) / sa.n * 10000.0) / 10000.0 AS c_a_in_b,
      |       ROUND(CAST(i AS DOUBLE) / sb.n * 10000.0) / 10000.0 AS c_b_in_a
      |FROM inter
      |JOIN sizes sa ON sa.doc_id = id_a
      |JOIN sizes sb ON sb.doc_id = id_b
      |WHERE GREATEST(CAST(i AS DOUBLE) / sa.n, CAST(i AS DOUBLE) / sb.n) >= 0.9""".stripMargin

  // the oracle resolves the same pair set with a recursive transitive
  // closure — fine at oracle scale, where Spark uses the iterative
  // min-label joins instead
  private val clustersSql =
    s"""${candSqlCtes.replaceFirst("WITH ", "WITH RECURSIVE ")},
      |pairs AS (
      |  SELECT id_a, id_b FROM inter
      |  JOIN sizes sa ON sa.doc_id = id_a
      |  JOIN sizes sb ON sb.doc_id = id_b
      |  WHERE CAST(i AS DOUBLE) / (sa.n + sb.n - i) >= 0.8),
      |edges AS (SELECT id_a AS src, id_b AS dst FROM pairs
      |          UNION ALL SELECT id_b, id_a FROM pairs),
      |reach(src, dst) AS (
      |  SELECT src, dst FROM edges
      |  UNION
      |  SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src)
      |SELECT src AS doc_id, LEAST(src, MIN(dst)) AS cluster_id
      |FROM reach GROUP BY src""".stripMargin

  // --- MinHash + LSH banding (rows-only oracle; MinHashSpec asserts
  //     it finds exactly the ngram-Jaccard pairs) ---------------------
  private[dedup] val P = graft.expressions.MinHashParams.P
  private[dedup] val NumPerms = graft.expressions.MinHashParams.NumPerms
  private[dedup] val Bands = 16 // 16 bands x 8 rows

  /** 128 minhashes in one grouped pass: h' = ((xxhash64 % P)+P)%P fed
    * to the single-buffer [[graft.expressions.MinHashAgg]] — one
    * partial-aggregated row of 128 longs per document on the shuffle.
    */
  private def signatures(sh: DataFrame): DataFrame = {
    val hNorm = ((xxhash64(col("s")) % P) + P) % P
    sh.withColumn("h", hNorm)
      .groupBy("doc_id")
      .agg(graft.expressions.MinHashAgg.minhashSigs(col("h")).as("sigs"))
  }

  /** (doc_id, band, bv) LSH band keys from a (doc_id, s) shingle frame:
    * 128 minhashes per doc ([[signatures]]) sliced into 16 bands of 8,
    * each band a 64-bit slice hash — a long join key, not a
    * concatenated string. Shared by [[minhashPairs]] and the
    * [[ShingleIndex]] banded candidate path (signatures there are
    * computed over the same capped shingle frames the Jaccard verify
    * uses, so candidate recall follows the published 16x8 s-curve).
    */
  private[graft] def bandKeys(sh: DataFrame): DataFrame =
    bandKeysFor(signatures(sh), Bands)

  /** Band keys at an arbitrary banding of the 128 minhashes — `bands`
    * slices of `128 / bands` rows each (so `bands` must divide 128).
    * Takes the SIGNATURE frame (not the shingles) so
    * [[evalBandingRecall]] shares one [[signatures]] pass across every
    * banding it measures.
    */
  private[graft] def bandKeysFor(sigs: DataFrame, bands: Int): DataFrame = {
    require(bands > 0 && NumPerms % bands == 0,
      s"bands must divide $NumPerms, got $bands")
    val rows = NumPerms / bands
    sigs.select(col("doc_id"),
      posexplode(array((0 until bands).map(j =>
        xxhash64(slice(col("sigs"), j * rows + 1, rows))): _*)).as(Seq("band", "bv")))
  }

  /** [[bandKeysFor]] from a shingle frame at an explicit banding — the
    * [[graft.dedup.ShingleIndex]]'s band-key writer once its banding
    * becomes a tunable (`reband`).
    */
  private[dedup] def bandKeysAt(sh: DataFrame, bands: Int): DataFrame =
    bandKeysFor(signatures(sh), bands)

  /** Theoretical LSH candidate recall of `bands` bands ×
    * `128 / bands` rows at Jaccard exactly `t`: 1 − (1 − t^r)^b.
    */
  private[graft] def bandingTheoreticalRecall(bands: Int, t: Double): Double =
    1.0 - math.pow(1.0 - math.pow(t, (NumPerms / bands).toDouble), bands.toDouble)

  private def minhashLsh(s: SparkSession, d: String): DataFrame =
    minhashPairs(Tables.documents(s, d))

  /** MinHash-LSH near-dup pairs (true Jaccard >= threshold, verified)
    * for any document DataFrame with (doc_id, text).
    *
    * The default 16x8 banding's s-curve is tuned for high thresholds:
    * pairs below ~0.7 similarity are unlikely to collide in any band,
    * so candidate recall degrades there — hence the guard on the
    * banding's THEORETICAL recall at the requested threshold. Lower
    * thresholds are served by a wider `bands` split of the same 128
    * signatures (64x2 covers ~0.5); pick one from the MEASURED curve
    * ([[evalBandingRecall]] / [[bandingAtRecall]]) rather than the
    * formula when the corpus is at hand.
    *
    * Band values are 64-bit slice hashes, so RANDOM collisions are
    * negligible — but a cluster of k identical (or near-identical)
    * documents shares band values and alone yields k^2/2 candidates.
    * Buckets above max(bandCapFloor, ceil(maxBucketFraction * n_docs))
    * docs degrade to star candidates around the bucket's lowest doc_id
    * (see [[bandedCandidates]]): the cluster still deduplicates
    * against its representative with O(k) work. No test-SF bucket
    * nears the floor, so results there are cap-invariant.
    */
  def minhashPairs(docs: DataFrame, threshold: Double = 0.8,
                   maxBucketFraction: Double = DefaultMaxDfFraction,
                   bandCapFloor: Long = 100L,
                   bands: Int = Bands): DataFrame = {
    // guard on the published s-curve itself, not a fixed threshold
    // floor: the default 16x8 banding passes at >= ~0.73, and a caller
    // serving a lower threshold can pick a wider banding from
    // evalBandingRecall / bandingAtRecall (64x2 covers ~0.5)
    val theo = bandingTheoreticalRecall(bands, threshold)
    require(theo >= 0.6,
      f"banding ($bands bands x ${NumPerms / bands} rows) has theoretical " +
        f"candidate recall $theo%.2f at threshold $threshold — pick a wider " +
        "banding (see evalBandingRecall / bandingAtRecall)")
    val sh = shingles(docs).cache()
    // The signature pass (128 MinHashAgg perms over every shingle) is
    // this operator's dominant cost and the band frame is referenced
    // THREE times downstream (bucket counts, the under-cap join side,
    // the over-cap star side) — each reference is its own job subtree
    // and several launch concurrently as broadcast builds, so an
    // un-cached signature pass ran 3-4x (profiled 20.7 s of task time
    // for a ~6 s computation at sf0.1, r15). An EAGER localCheckpoint
    // materializes the doc-sized signature table (n_docs x 128 longs —
    // the artifact a maintained index persists anyway, see
    // ShingleIndex) exactly once before the consumers race it; chosen
    // over .cache() because checkpoint blocks skip the columnar cache
    // build and cannot be raced (the same change cut dedup_simhash
    // 1.7 s -> 1.2 s). Blocks are doc-count-bounded and live until the
    // session's next clearCache-equivalent; the final frame holds
    // several references to this leaf, so per-call release would be
    // unsafe (see CheckpointInterop's multi-leaf contract).
    val sigs = signatures(sh).localCheckpoint(true)
    val bandFrame = bandKeysFor(sigs, bands)
    val cand = bandedCandidates(bandFrame, docs, maxBucketFraction, bandCapFloor)
    // verify candidates with true shingle-set Jaccard
    val sets = sh.groupBy("doc_id").agg(collect_set(col("s")).as("set"))
    val jac = size(array_intersect(col("sa"), col("sb"))).cast(DoubleType) /
      size(array_union(col("sa"), col("sb")))
    cand
      .join(sets.select(col("doc_id").as("id_a"), col("set").as("sa")), "id_a")
      .join(sets.select(col("doc_id").as("id_b"), col("set").as("sb")), "id_b")
      .filter(jac >= threshold)
      .select(col("id_a"), col("id_b"), (round(jac * 10000.0, 0) / 10000.0).as("jaccard"))
  }

  // --- measured banding recall: the dedup-side tuning curve ----------
  /** MEASURED LSH-banding recall/precision — the dedup counterpart of
    * the vector side's `evalRecall` curves: for each candidate banding
    * of the 128 minhashes, how many of the TRUE near-dup pairs
    * (exact full-set Jaccard ≥ `threshold`, the dfCapFloor = MaxValue
    * ground truth) the banded candidate generator actually surfaces on
    * THIS corpus, and at what candidate volume. The theoretical
    * s-curve 1 − (1 − t^r)^b rides along per row, but it only bounds
    * recall AT the threshold — real corpora hold pairs well above it
    * (where recall is better) and banding choice trades recall against
    * candidate volume, so the measured row is what a caller should
    * tune on ([[bandingAtRecall]] does).
    *
    * One [[signatures]] pass is shared across every banding (the
    * bandings are SLICES of the same 128 sigs); per banding the cost
    * is one posexplode + the banded-candidate equi-join + two counts —
    * offline-eval priced, every join equi-keyed, nothing corpus².
    * Ratios ship as correctly-rounded x1e4 BIGINTs of exact integer
    * counts (the engine-stable convention). The ground-truth pass
    * disables the df cap (truth must not inherit the candidate
    * generator's own blind spot), which is exactly the pass the cap
    * exists to bound — so at corpus scale, MEASURE ON A SAMPLE:
    * `sampleDocs > 0` restricts the eval to the `sampleDocs`
    * lowest-md5(doc_id) documents (the [[graft.pipeline.PipelineOps]]
    * sampling discipline — deterministic, corpus-order-independent,
    * and a superset-stable prefix as the corpus grows), and the truth
    * pass REFUSES loudly (`truthDfBound`) when an uncapped shingle in
    * the measured universe is shared by enough documents that the
    * ground-truth clique join would go quadratic — the eval fails
    * with instructions instead of silently becoming the one
    * cartesian-class scan in the suite.
    */
  def evalBandingRecall(docs: DataFrame, threshold: Double = 0.8,
                        bandings: Seq[Int] = Seq(8, 16, 32, 64),
                        maxBucketFraction: Double = DefaultMaxDfFraction,
                        bandCapFloor: Long = 100L,
                        sampleDocs: Int = 0,
                        truthDfBound: Long = DefaultTruthDfBound): DataFrame = {
    require(bandings.nonEmpty, "no bandings to evaluate")
    val measured = mdSample(docs, sampleDocs)
    val sh = shingles(measured).cache()
    guardTruthDf(sh, truthDfBound)
    // ground truth: exact Jaccard over the FULL shingle sets (cap
    // disabled), the pairs a perfect candidate generator would verify —
    // sharing the signatures' explode pass
    val jac = col("i").cast(DoubleType) / (col("na") + col("nb") - col("i"))
    val truth = sizedCandidatesFrom(sh, measured,
        maxDfFraction = 1.0, dfCapFloor = Long.MaxValue)
      .filter(jac >= threshold)
      .select("id_a", "id_b").cache()
    bandingCurve(sh, truth,
      measured.agg(countDistinct(col("doc_id")).as("n_docs")),
      threshold, bandings, maxBucketFraction, bandCapFloor)._1
  }

  /** Ceiling on any single shingle's document frequency inside a
    * cap-DISABLED ground-truth pass: a shingle shared by n docs makes
    * the truth self-join emit n·(n−1)/2 pairs, so 2000 bounds the
    * worst clique at ~2M pairs — eval-priced, never corpus².
    */
  val DefaultTruthDfBound = 2000L

  /** The `sampleDocs` lowest-md5(doc_id) documents (52-bit md5 prefix,
    * doc_id tiebreak) — the measurement verbs' deterministic sample.
    * `sampleDocs <= 0` or a corpus already within the bound passes
    * through unchanged (sort-limit is a distributed partial top-k, so
    * the pass-through costs one bounded heap scan, not a global sort).
    */
  private[dedup] def mdSample(docs: DataFrame, sampleDocs: Int): DataFrame =
    if (sampleDocs <= 0) docs
    else docs.orderBy(
      conv(substring(md5(col("doc_id").cast("string")), 1, 13), 16, 10)
        .cast(LongType),
      col("doc_id")).limit(sampleDocs)

  /** LOUD refusal when the cap-disabled truth universe holds a shingle
    * hot enough to blow the ground-truth clique join up quadratically
    * (the exact failure mode the serving-side df cap exists to bound —
    * ground truth cannot use the cap, so it must refuse instead).
    */
  private[dedup] def guardTruthDf(sh: DataFrame, truthDfBound: Long): Unit = {
    val hottest = sh.groupBy("s").agg(count(lit(1)).as("df"))
      .agg(coalesce(max("df"), lit(0L))).head().getLong(0)
    if (hottest > truthDfBound) throw new IllegalStateException(
      s"banding eval refused: a shingle in the measured universe is shared " +
        s"by $hottest documents (> truthDfBound=$truthDfBound), so the " +
        s"cap-disabled ground-truth join would generate ~${hottest * hottest / 2} " +
        "pairs from that clique alone — measure on a smaller sample " +
        "(sampleDocs) or raise truthDfBound if the cost is intended")
  }

  /** The measured-curve KERNEL over a caller-built (cached) shingle
    * frame and truth pair set — shared by [[evalBandingRecall]] (raw
    * docs, cap-disabled truth) and
    * [[graft.dedup.ShingleIndex.evalBanding]] (the index's own stored
    * capped shingles and ITS exact-Jaccard universe — measure the
    * generator you serve, against the verify you run). Returns the
    * curve plus ITS OWN internal caches (signatures + bucket counts) —
    * one-shot callers follow the session-cache convention, a REPEATED
    * maintenance caller (ShingleIndex.measureBanding) must unpersist
    * them (plus its sh/truth) once the result is pinned, or each
    * maintenance call leaks cached frames for the session's lifetime.
    */
  private[dedup] def bandingCurve(sh: DataFrame, truth: DataFrame,
                                  nDocs: DataFrame,
                                  threshold: Double, bandings: Seq[Int],
                                  maxBucketFraction: Double,
                                  bandCapFloor: Long): (DataFrame, Seq[DataFrame]) = {
    val sigs = signatures(sh).cache()
    // every banding rides ONE candidate pipeline: band keys carry a
    // `banding` tag and the bucket split / clique join / distinct /
    // truth join all group on it — 4 bandings cost one joined shuffle
    // chain, not 4 pipelines (the per-banding loop measured ~2x this
    // plan at sf0.1, pure stage-count overhead)
    // allBands is referenced by the bucket-count aggregate AND both
    // join sides of the bucket split — cached (sample-bounded: sample
    // docs x 120 band rows) and materialized eagerly so the signature
    // pass underneath runs once, not once per consumer (profiled 2
    // materializations, 7.9 s + 3.4 s task time, r15)
    val allBands = bandings.map(b =>
        bandKeysFor(sigs, b).withColumn("banding", lit(b)))
      .reduce(_ unionByName _)
      .cache()
    val bKeys = Seq("banding", "band", "bv")
    val cap = greatest(lit(bandCapFloor), ceil(col("n_docs") * maxBucketFraction))
    // two consumers (the under-cap keep and the over-cap star split)
    // — cache the bucket counts so the 600k-row groupBy runs once
    val counted = allBands.groupBy(bKeys.map(col): _*).agg(count(lit(1)).as("c"))
      .crossJoin(broadcast(nDocs))
      .cache()
    val bc = allBands.join(counted.filter(col("c") <= cap).select(bKeys.map(col): _*), bKeys)
    val clique = bc.as("a").join(bc.as("b"),
        bKeys.map(k => col(s"a.$k") === col(s"b.$k")).reduce(_ && _) &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.banding").as("banding"),
        col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
    val bigRows = allBands.join(counted.filter(col("c") > cap).select(bKeys.map(col): _*), bKeys)
    val reps = bigRows.groupBy(bKeys.map(col): _*).agg(min("doc_id").as("id_a"))
    val star = bigRows.join(reps, bKeys)
      .filter(col("doc_id") =!= col("id_a"))
      .select(col("banding"), col("id_a"), col("doc_id").as("id_b"))
    // one pass over the candidates computes volume AND hits: truth
    // pairs are unique, so the left join flags without duplicating
    val cand = clique.unionByName(star).distinct()
    val stats = cand
      .join(truth.withColumn("__hit", lit(1L)), Seq("id_a", "id_b"), "left")
      .groupBy("banding").agg(count(lit(1)).as("n_cand"),
        coalesce(sum("__hit"), lit(0L)).as("n_hit"))
    // base frame keeps zero-candidate bandings in the result (their
    // groupBy rows vanish), and carries the driver-computed constants
    val spark = sh.sparkSession
    import spark.implicits._
    val base = bandings.map(b => (b, NumPerms / b,
        math.round(bandingTheoreticalRecall(b, threshold) * 10000.0)))
      .toDF("banding", "rows_per_band", "theo_recall_x1e4")
    val curve = base
      .join(stats, Seq("banding"), "left")
      .crossJoin(truth.agg(count(lit(1)).as("n_truth")))
      .select(
        col("banding").cast(LongType).as("bands"),
        col("rows_per_band").cast(LongType).as("rows_per_band"),
        col("n_truth"),
        coalesce(col("n_cand"), lit(0L)).as("n_cand"),
        coalesce(col("n_hit"), lit(0L)).as("n_hit"),
        round(coalesce(col("n_hit"), lit(0L)) * 10000.0 /
            greatest(col("n_truth"), lit(1L)), 0)
          .cast(LongType).as("recall_x1e4"),
        round(coalesce(col("n_hit"), lit(0L)) * 10000.0 /
            greatest(coalesce(col("n_cand"), lit(0L)), lit(1L)), 0)
          .cast(LongType).as("precision_x1e4"),
        col("theo_recall_x1e4"))
    (curve, Seq(sigs, counted, allBands))
  }

  /** Pick a banding from the MEASURED curve: the fewest-candidate
    * banding whose measured recall meets `target` (candidate volume is
    * the verify cost), falling back to the highest-recall banding when
    * none does. Only SERVABLE bandings qualify — those passing
    * [[minhashPairs]]' theoretical-recall guard at this threshold: the
    * guard is the serving contract (a measured recall is corpus-
    * specific and rots as the corpus drifts; the s-curve floor does
    * not), so the tuner picks within it. Driver-side rows: one per
    * banding — model-sized, the bounded-collect discipline.
    */
  def bandingAtRecall(docs: DataFrame, threshold: Double = 0.8,
                      target: Double = 0.95,
                      bandings: Seq[Int] = Seq(8, 16, 32, 64),
                      sampleDocs: Int = 0,
                      truthDfBound: Long = DefaultTruthDfBound): (Int, Int) = {
    val rows = evalBandingRecall(docs, threshold, bandings,
        sampleDocs = sampleDocs, truthDfBound = truthDfBound)
      .select("bands", "n_cand", "recall_x1e4", "theo_recall_x1e4")
      .collect()
      .map(r => (r.getLong(0).toInt, r.getLong(1), r.getLong(2), r.getLong(3)))
    pickBanding(rows, threshold, target)
  }

  /** The shared tuner cut: servable rows only (the serving guard's
    * UNROUNDED theoretical-recall floor, recomputed from bands +
    * threshold so the cut can never disagree with minhashPairs/judge
    * on a rounding boundary), cheapest meeting `target`, else highest
    * measured recall. Rows are (bands, n_cand, recall_x1e4, theo_x1e4).
    */
  private[dedup] def pickBanding(rows: Array[(Int, Long, Long, Long)],
                                 threshold: Double, target: Double): (Int, Int) = {
    val servable = rows.filter(r =>
      bandingTheoreticalRecall(r._1, threshold) >= 0.6)
    require(servable.nonEmpty,
      s"no evaluated banding passes the serving guard (theoretical recall " +
        s">= 0.6) at threshold $threshold — widen the banding set")
    val meeting = servable.filter(_._3 >= math.round(target * 10000.0))
    val pick =
      if (meeting.nonEmpty) meeting.minBy(r => (r._2, r._1))._1
      else servable.maxBy(r => (r._3, -r._2))._1
    (pick, NumPerms / pick)
  }

  /** Registered banding-curve query, measured on the deterministic
    * 2000-doc lowest-md5 sample: test SFs (≤ sample) measure the full
    * corpus bit-for-bit (DedupSpec pins sample == full there), while
    * at scale the eval's cap-disabled truth pass is bounded by the
    * sample instead of going quadratic with the corpus's hottest
    * boilerplate shingle.
    */
  private def minhashEval(s: SparkSession, d: String): DataFrame =
    evalBandingRecall(Tables.documents(s, d), sampleDocs = 2000)
      .orderBy("bands")

  // --- SimHash (rows-only oracle; SimHashSpec) -----------------------
  /** 64-bit simhash over trigram shingles: per bit, +1 if the shingle
    * hash has the bit set else -1; the sign of the per-doc sum is the
    * fingerprint bit. 64 partial-aggregated sums per doc.
    */
  private[graft] def simhashDf(docs: DataFrame): DataFrame =
    shingles(docs).withColumn("h", xxhash64(col("s")))
      .groupBy("doc_id")
      .agg(graft.expressions.SimHashAgg.simhash(col("h")).as("simhash"))

  /** Candidate pairs from banded blocking with over-cap buckets
    * degraded to STARS: buckets up to the cap contribute every pair
    * (clique); a bucket above max(capFloor, ceil(maxFraction*n_docs))
    * instead links each member to the bucket's lowest doc_id — O(k)
    * pairs for a k-doc bucket, not O(k^2). A mega cluster of
    * near-identical docs thus still deduplicates (everything verifies
    * against the representative) with bounded work; only members
    * further than the verify threshold from the representative lose
    * recall, the price of bounding a quadratic. `bands` must have
    * (doc_id, band, bv) rows.
    */
  private def bandedCandidates(bands: DataFrame, docs: DataFrame,
                               maxBucketFraction: Double, capFloor: Long): DataFrame = {
    val nDocs = docs.agg(countDistinct(col("doc_id")).as("n_docs"))
    val cap = greatest(lit(capFloor), ceil(col("n_docs") * maxBucketFraction))
    val counted = bands.groupBy("band", "bv").agg(count(lit(1)).as("c"))
      .crossJoin(broadcast(nDocs))
    val bc = bands.join(counted.filter(col("c") <= cap).select("band", "bv"),
      Seq("band", "bv"))
    val clique = bc.as("a").join(bc.as("b"),
        col("a.band") === col("b.band") && col("a.bv") === col("b.bv") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
    val bigRows = bands.join(counted.filter(col("c") > cap).select("band", "bv"),
      Seq("band", "bv"))
    val reps = bigRows.groupBy("band", "bv").agg(min("doc_id").as("id_a"))
    val star = bigRows.join(reps, Seq("band", "bv"))
      .filter(col("doc_id") =!= col("id_a"))
      .select(col("id_a"), col("doc_id").as("id_b"))
    clique.unionByName(star).distinct()
  }

  /** SimHash near-dup pairs: 8 bands x 8 bits, so any pair at hamming
    * <= 7 shares at least one band (pigeonhole); results filtered to
    * `maxHamming`. Band VALUES are only 8 bits, so at corpus scale a
    * band bucket holds ~n/256 docs and a boilerplate-heavy corpus can
    * concentrate one value — the same skew bomb as a hot shingle.
    * Over-cap buckets degrade to star candidates around a
    * representative (see [[bandedCandidates]]): bounded work, dedup
    * recall preserved up to the cluster's radius around the
    * representative. No test-SF bucket comes near the default floor
    * (max observed: 47 at sf0.1), so results there are cap-invariant.
    */
  def simhashPairs(docs: DataFrame, maxHamming: Int = 6,
                   maxBucketFraction: Double = DefaultMaxDfFraction,
                   bucketCapFloor: Long = 100L): DataFrame = {
    // EAGER localCheckpoint: fp feeds FOUR concurrent consumers (band
    // explode + bucket counts + the two verify joins' broadcast
    // builds); racing them as an uncached subtree recomputed the
    // shingle explode + SimHashAgg pass 4x (profiled 20.7 s of task
    // time for a ~6 s pass, r15). The checkpoint materializes the
    // doc-sized fingerprint table once, synchronously, before the
    // fan-out (measured 1.7 s -> 1.2 s; a cache was raced by the
    // concurrent builds, an eager noop-write materialization of the
    // cache was slower than the race). Blocks are doc-count-bounded
    // (16 B/doc); the final frame references this leaf three times, so
    // per-call release is the multi-leaf no-op by design — see
    // CheckpointInterop.
    val fp = simhashDf(docs).localCheckpoint(true)
    val bands = fp.select(col("doc_id"),
      posexplode(array((0 until 8).map(j =>
        shiftright(col("simhash"), j * 8).bitwiseAND(0xFF)): _*)).as(Seq("band", "bv")))
    val cand = bandedCandidates(bands, docs, maxBucketFraction, bucketCapFloor)
    cand
      .join(fp.select(col("doc_id").as("id_a"), col("simhash").as("fa")), "id_a")
      .join(fp.select(col("doc_id").as("id_b"), col("simhash").as("fb")), "id_b")
      .select(col("id_a"), col("id_b"),
        bit_count(col("fa").bitwiseXOR(col("fb"))).cast(LongType).as("hamming"))
      .filter(col("hamming") <= maxHamming)
  }

  private def simhash(s: SparkSession, d: String): DataFrame =
    simhashPairs(Tables.documents(s, d))

  // --- edit-distance verification of near-dup candidates -------------
  /** Levenshtein only on the candidate pairs the cheap blocking pass
    * produced (never all pairs — edit distance is O(len^2) per pair).
    */
  private def editDistance(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d).select(col("doc_id"), col("text"))
    ngramJaccard(s, d)
      .join(docs.select(col("doc_id").as("id_a"), col("text").as("ta")), "id_a")
      .join(docs.select(col("doc_id").as("id_b"), col("text").as("tb")), "id_b")
      .select(col("id_a"), col("id_b"), col("jaccard"),
        levenshtein(col("ta"), col("tb")).cast(LongType).as("edit_dist"))
  }

  private val editDistanceSql =
    s"""$candSqlCtes,
      |verified AS (
      |  SELECT id_a, id_b,
      |         ROUND(CAST(i AS DOUBLE) / (sa.n + sb.n - i) * 10000.0) / 10000.0 AS jaccard
      |  FROM inter
      |  JOIN sizes sa ON sa.doc_id = id_a
      |  JOIN sizes sb ON sb.doc_id = id_b
      |  WHERE CAST(i AS DOUBLE) / (sa.n + sb.n - i) >= 0.8)
      |SELECT id_a, id_b, jaccard,
      |       CAST(levenshtein(da.text, db.text) AS BIGINT) AS edit_dist
      |FROM verified
      |JOIN documents da ON da.doc_id = id_a
      |JOIN documents db ON db.doc_id = id_b""".stripMargin

  // --- embedding cosine near-dup pairs (SQL oracle) ------------------
  /** Exact all-pairs at threshold: one side broadcast, codegen'd
    * cosine kernel, so sf0.1 is 2e6 comparisons in-memory. This is
    * the ORACLE-EXACTNESS path only — quadratic in the input — so it
    * REFUSES inputs above `maxRows` (the probe is a bounded
    * `limit(maxRows+1)` scan, not a full count) and points the caller
    * at [[embeddingPairsBlocked]], which finds the same pairs through
    * LSH bucket collisions without ever materializing n^2 pairs.
    */
  /** Row bound for the all-pairs oracle kernel — shared by
    * [[embeddingPairsExact]]'s guard and [[embeddingPairsBlocked]]'s
    * recall-first delegation probe, so the two can never drift apart.
    */
  val ExactPairsMaxRows = 100000

  /** The guardless all-pairs kernel: input must already be bounded
    * (callers run the [[ExactPairsMaxRows]] probe first).
    */
  private def exactPairsPlan(e: DataFrame, threshold: Double): DataFrame = {
    val b = e.select(col("vec_id").as("id_b"), col("embedding").as("emb_b"))
    e.join(broadcast(b), col("vec_id") < col("id_b"))
      .withColumn("score0", cosineSim(col("embedding"), col("emb_b")))
      .filter(col("score0") >= threshold)
      .select(col("vec_id").as("id_a"), col("id_b"), round(col("score0"), 4).as("score"))
  }

  def embeddingPairsExact(emb: DataFrame, threshold: Double = 0.40,
                          idCol: String = "vec_id", vecCol: String = "embedding",
                          maxRows: Int = ExactPairsMaxRows): DataFrame = {
    val over = emb.select(col(idCol)).limit(maxRows + 1).count() > maxRows
    require(!over,
      s"embeddingPairsExact is the all-pairs oracle path (quadratic): input exceeds " +
        s"$maxRows vectors — use Dedup.embeddingPairsBlocked for corpus-scale near-dup pairs")
    // cast to double BEFORE the join: once per row, not once per pair
    val e = emb
      .select(col(idCol).as("vec_id"), col(vecCol).cast("array<double>").as("embedding"))
    exactPairsPlan(e, threshold)
  }

  private def embedding(s: SparkSession, d: String): DataFrame =
    // fan the single-split scan: the broadcast all-pairs cosine kernel
    // above it ran on 2 tasks (guide §2.5; gated no-op on real layouts)
    embeddingPairsExact(Tables.fanned(Tables.embeddings(s, d), col("vec_id")))

  /** Banding sized to a cosine threshold, balancing recall at the
    * threshold edge against candidate selectivity. The physics: a
    * random-hyperplane bit agrees on a pair with probability
    * 1 - angle/pi, so how sharply banding separates target pairs from
    * random ones depends on how far the threshold angle sits from 90
    * degrees. Regimes:
    *  - t >= 0.75 (<= 41deg): genuinely selective — 32x8 keeps edge
    *    recall ~99.6% while a random pair collides in some table with
    *    p ~ 0.12 (an ~8x candidate cut that GROWS as similarity
    *    concentrates above the threshold, as near-dup corpora do).
    *  - 0.6 <= t < 0.75: 48x5 — edge recall ~99.99%, modest
    *    selectivity (random-pair collision ~0.78).
    *  - t < 0.6: 48x3 — recall-first and NEAR-EXHAUSTIVE by design: at
    *    66deg no sign-bit banding separates target from random pairs
    *    (random pairs collide with p ~ 0.998), so candidate volume
    *    approaches all-pairs. A corpus-wide 0.40-cosine join is
    *    inherently quadratic; use such thresholds only where the exact
    *    all-pairs cost is acceptable anyway.
    */
  def bandingFor(threshold: Double): (Int, Int) =
    if (threshold >= 0.75) (32, 8)
    else if (threshold >= 0.6) (48, 5)
    else (48, 3)

  /** One (id_a, id_b) row PER bucket collision (a pair colliding in t
    * tables appears t times) — the shared core of candidate
    * generation.
    */
  private def rawEmbeddingCandidates(e: DataFrame, numTables: Int, bitsPerTable: Int,
                                     dim: Int): DataFrame = {
    val b = graft.vector.AnnLsh.bucketsWith(e, "vec_id", "embedding",
      numTables, bitsPerTable, dim)
    b.as("a").join(b.as("b"),
        col("a.table") === col("b.table") && col("a.bucket") === col("b.bucket") &&
          col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("id_a"), col("b.vec_id").as("id_b"))
  }

  /** Distinct candidate pairs from hyperplane-LSH bucket collisions.
    * Exposed for DedupSpec selectivity asserts.
    */
  private[graft] def embeddingCandidates(e: DataFrame,
                                         numTables: Int, bitsPerTable: Int,
                                         dim: Int = 64): DataFrame =
    rawEmbeddingCandidates(e, numTables, bitsPerTable, dim).distinct()

  /** LSH-blocked embedding near-dup pairs — [[embedding]]'s semantics
    * without materializing an n^2 broadcast join. Candidates come from
    * seeded random-hyperplane bucket collisions, banded per
    * [[bandingFor]]'s threshold regime (pass numTables/bitsPerTable to
    * override); every candidate is verified with the exact cosine, so
    * precision is always exact and only candidate recall rides on the
    * banding. At the registered 0.40 threshold this reproduces the
    * exact variant's pairs on every test corpus (oracle-checked); the
    * selective high-threshold regime is spec-proven on a synthetic
    * near-dup corpus (DedupSpec).
    *
    * NOT fully lazy in the auto-banded recall-first regime: deciding
    * whether the corpus fits the exact kernel runs a bounded
    * `limit(N+1).count()` probe AT PLAN-CONSTRUCTION TIME (a Spark job
    * per call, repeated on repeated calls over uncached input). Callers
    * that build plans without executing them, or call in a loop, should
    * pass explicit numTables/bitsPerTable (always lazy, always LSH) or
    * cache the input before probing.
    */
  def embeddingPairsBlocked(emb: DataFrame, threshold: Double = 0.40,
                            idCol: String = "vec_id", vecCol: String = "embedding",
                            numTables: Int = -1, bitsPerTable: Int = -1,
                            dim: Int = 64): DataFrame = {
    val (tAuto, bAuto) = bandingFor(threshold)
    val nt = if (numTables > 0) numTables else tAuto
    val bt = if (bitsPerTable > 0) bitsPerTable else bAuto
    val e = emb.select(col(idCol).as("vec_id"),
      col(vecCol).cast("array<double>").as("embedding"))
    // RECALL-FIRST regime (auto-banding picked (48,3): threshold below
    // 0.6): banding physics makes candidates near-exhaustive (random-
    // pair collision p ~ 0.998 — see [[bandingFor]]), so the LSH
    // machinery pays its bucket self-join (every pair shuffled ~6-12
    // times as collision rows) to "select" essentially all pairs.
    // When the corpus fits the exact kernel's bound, DELEGATE to it:
    // the broadcast all-pairs cosine is one map-side codegen'd pass —
    // identical output (exact recall supersedes candidate recall),
    // measured 8.5s -> 1.0s at sf0.1. Past the bound the LSH path
    // still runs, with a distinct on the 8-byte id-pair rows before
    // the vector joins capping scoring multiplicity at 1 — a 0.40
    // corpus-wide cosine join is inherently quadratic at ANY plan
    // (the Scaladoc above prescribes the selective regime or SemDeDup
    // for corpus scale); the distinct just stops paying it twice.
    // Explicit numTables/bitsPerTable overrides always take the LSH
    // path — the recall specs exercise banding itself.
    val recallFirst = numTables <= 0 && bitsPerTable <= 0 && bAuto <= 3
    if (recallFirst &&
        e.select("vec_id").limit(ExactPairsMaxRows + 1).count() <= ExactPairsMaxRows) {
      // one bounded count probe, then straight to the guardless kernel
      // (re-entering embeddingPairsExact would run the same probe twice)
      exactPairsPlan(e, threshold)
    } else {
      val raw = rawEmbeddingCandidates(e, nt, bt, dim)
      // Scoring-multiplicity policy by regime:
      //  - SELECTIVE (bt >= 5): no pre-verify distinct — a pair
      //    colliding in t tables is scored t times map-side and
      //    deduplicated by the final aggregation; sparse collisions
      //    make that cheaper than distinct-first (4.4s -> 3.5s at
      //    sf0.1 when this plan was measured both ways).
      //  - RECALL-FIRST overflow (corpus past the exact bound):
      //    distinct BEFORE the vector joins — near-exhaustive
      //    candidates mean multiplicity ~nt/2 per pair, and the
      //    distinct shuffles bare id pairs instead of scoring each
      //    collision row.
      val cands = if (bt <= 3) raw.distinct() else raw
      cands
        .join(e.select(col("vec_id").as("id_a"), col("embedding").as("ea")), "id_a")
        .join(e.select(col("vec_id").as("id_b"), col("embedding").as("eb")), "id_b")
        .withColumn("score0", cosineSim(col("ea"), col("eb")))
        .filter(col("score0") >= threshold)
        .groupBy("id_a", "id_b")
        .agg(round(max(col("score0")), 4).as("score"))
    }
  }

  private def embeddingBlocked(s: SparkSession, d: String): DataFrame =
    embeddingPairsBlocked(Tables.fanned(Tables.embeddings(s, d), col("vec_id"))) // §2.5

  /** The SELECTIVE banding regime as a driver query — the 100 TB shape.
    * The registered 0.40-threshold queries are near-exhaustive by
    * banding physics (see [[bandingFor]]); real near-dup curation runs
    * at >= 0.75 where 32x8 banding cuts candidates ~8x. The test
    * embeddings are near-uniform (no natural pairs above 0.75), so the
    * query plants deterministic near-dup twins — a constant +0.05
    * shift of the first 50 vectors, cosine ~0.97 to their originals,
    * expressible identically in the DuckDB oracle — and the blocked
    * path must find EXACTLY the planted pairs (banding recall at
    * cosine ~0.97 is 1 - 1e-10; random pairs sit 6 sigma below the
    * threshold). The corpus is capped at 2000 base vectors so the
    * oracle's all-pairs verify stays cheap; the Spark side runs the
    * same plan it would at full volume.
    */
  private def embeddingSelective(s: SparkSession, d: String): DataFrame = {
    val base = Tables.fanned(Tables.embeddings(s, d), col("vec_id")) // §2.5
      .filter(col("vec_id") < 2000)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("embedding"))
    val twins = base.filter(col("vec_id") < 50)
      .select((col("vec_id") + 100000).as("vec_id"),
        transform(col("embedding"), x => x + lit(0.05)).as("embedding"))
    embeddingPairsBlocked(base.unionByName(twins), threshold = 0.75)
  }

  // --- SemDeDup: cluster-then-dedup keep/drop decisions --------------
  /** Semantic dedup via cluster-scoped pairwise cosine (SemDeDup,
    * Abbas et al. 2023): assign every embedding to its nearest
    * centroid, then WITHIN each cluster drop any vector that has a
    * lower-id cluster peer at cosine >= `threshold`; the kept set is
    * exactly the vectors with no such peer. Deterministic end to end:
    * centroids are the SURVEY §4 seeded init (lowest-id vectors), the
    * survivor rule is keep-lowest-id (the paper keeps an arbitrary
    * representative per similar group — low-id is that choice made
    * reproducible, so the DuckDB oracle can replay it).
    *
    * THIS is the 100 TB shape for embedding dedup: the quadratic is
    * bounded by cluster population, not corpus size. With k clusters
    * of ~n/k members the pair volume is n^2/k, and candidate
    * generation is a plain equi-join shuffle on the cluster id — the
    * paper runs k=11k clusters over 1.3B embeddings. k=4 here mirrors
    * the reference's NUM_SHARDS at test SF; at scale k is the knob
    * (size clusters to ~10k members). A pathological hot cluster
    * re-concentrates the quadratic on one task — pass
    * `maxPairsPerTask` to bound it: the salt is sized PER CLUSTER
    * from its population (see [[clusterKeepDrop]]), so the mega-
    * cluster's pair volume spreads over exactly as many tasks as it
    * needs while balanced clusters stay unsalted, and the pair set —
    * hence every keep/drop verdict — is unchanged.
    *
    * Output: one row per vector — (vec_id, shard, keep 0/1).
    */
  def semDedup(emb: DataFrame, k: Int = 4, threshold: Double = 0.40,
               idCol: String = "vec_id", vecCol: String = "embedding",
               pairSalt: Int = 1, maxPairsPerTask: Long = 0L): DataFrame = {
    val e = emb.select(col(idCol).as("vec_id"),
      col(vecCol).cast("array<double>").as("embedding"))
    val cents = graft.vector.Centroids.deterministicInit(e, k = k)
    val a = e.withColumn("shard",
      graft.vector.Centroids.nearestShard(col("embedding"), cents))
    clusterKeepDrop(a, threshold, pairSalt, maxPairsPerTask)
  }

  /** Keep/drop verdicts over cluster-assigned embeddings — the shared
    * core of [[semDedup]] and `VectorStore.semDedup`. Input columns:
    * (vec_id, shard, embedding); output one row per vector (vec_id,
    * shard, keep 0/1), keep-lowest-id survivor rule.
    *
    * The pair join's shuffle key is the cluster id: k distinct values
    * = at most k parallel tasks, regardless of executor count — the
    * per-cluster quadratic lands on one task each. Salting splits it
    * RESULT-INVARIANTLY: the probe side partitions by vec_id % salt,
    * the build side replicates to every salt value, the join keys on
    * (shard, salt) so each cluster's pair volume spreads over salt
    * tasks. Price: the build side shuffles salt copies — the standard
    * salting trade (same posture as the salted q_skew_join). The pair
    * SET is identical for any salt.
    *
    * HOT-CLUSTER MITIGATION (`maxPairsPerTask` > 0): a pathological
    * mega-cluster re-concentrates the quadratic on one task no matter
    * how many executors exist — the uniform `pairSalt` that is right
    * for balanced clusters is far too small for it. Adaptive mode
    * sizes the salt PER CLUSTER from its population: salt_c =
    * ceil(n_c·(n_c−1)/2 / maxPairsPerTask), so every task scores at
    * most ~maxPairsPerTask cosines regardless of how skewed the
    * cluster populations are. The per-cluster salts ride a k-row
    * broadcast (one tiny count aggregate), the pair set is provably
    * unchanged (salting is result-invariant), and replication cost
    * concentrates exactly where the skew is: a balanced cluster keeps
    * salt 1, the hot one pays its own fan-out. Total pair volume is
    * still n_c² — bounding THAT is a clustering-parameter decision
    * (raise k / re-cluster); this bounds the straggler.
    */
  /** Per-cluster salt sizing for the adaptive mode: (shard, __saltc)
    * with saltc = ceil(n_c·(n_c−1)/2 / maxPairsPerTask), min 1 — each
    * (shard, salt) join task then scores at most ~maxPairsPerTask
    * cosines. k-row output, broadcast by the caller.
    */
  private[graft] def adaptiveSalts(a: DataFrame, maxPairsPerTask: Long): DataFrame =
    a.groupBy("shard").agg(count(lit(1)).as("__n"))
      .select(col("shard"),
        greatest(lit(1L), ceil(col("__n") * (col("__n") - 1) / 2.0
          / maxPairsPerTask.toDouble).cast(LongType)).as("__saltc"))

  private[graft] def clusterKeepDrop(a: DataFrame, threshold: Double,
                                     pairSalt: Int, maxPairsPerTask: Long): DataFrame = {
    val (xs, ys, joinKeys) =
      if (maxPairsPerTask > 0L) {
        val withSalt = a.join(broadcast(adaptiveSalts(a, maxPairsPerTask)), "shard")
        (withSalt.withColumn("__salt", pmod(col("vec_id"), col("__saltc"))).as("x"),
          withSalt.withColumn("__salt",
            explode(sequence(lit(0L), col("__saltc") - 1))).as("y"),
          col("x.shard") === col("y.shard") && col("x.__salt") === col("y.__salt"))
      } else if (pairSalt <= 1) (a.as("x"), a.as("y"),
        col("x.shard") === col("y.shard"))
      else (
        a.withColumn("__salt", pmod(col("vec_id"), lit(pairSalt))).as("x"),
        a.withColumn("__salt",
          explode(array((0 until pairSalt).map(s => lit(s.toLong)): _*))).as("y"),
        col("x.shard") === col("y.shard") && col("x.__salt") === col("y.__salt"))
    // LEFT SEMI with the cosine IN the join condition (round 13): a
    // vector is dropped iff SOME lower-id cluster peer clears the
    // threshold — existence, not enumeration. SortMergeJoin's semi
    // mode emits each x row on its FIRST qualifying match and skips
    // the rest of the buffered group: early exit the old inner-join →
    // filter → DISTINCT plan could not express (it scored EVERY pair,
    // materialized every match, then shuffled the matches to dedup
    // them). Measured on the ScaleSmoke corpus (100k + 1k twins,
    // k=16): 23.9 → 14.0 s unsalted, 7.3 → 5.9 s at pairSalt=8,
    // 4.7 → 3.0 s on the adaptive hot-cluster leg — verdict parity on
    // all three (and the oracle hash pins it per round). This is the
    // fused-threshold-join candidate resolved WITHOUT a custom exec:
    // the early-exit semantics Spark's own semi join already has were
    // the win, not the pair-row plumbing ShardTopKJoinExec replaces.
    val dropped = xs.join(ys, joinKeys && col("y.vec_id") < col("x.vec_id")
        && cosineSim(col("x.embedding"), col("y.embedding")) >= lit(threshold),
        "left_semi")
      .select(col("x.vec_id"))
      .withColumn("__dup", lit(1L))
    a.join(dropped, Seq("vec_id"), "left")
      .select(col("vec_id"), col("shard"),
        when(col("__dup").isNull, 1L).otherwise(0L).as("keep"))
  }

  // registered with pairSalt = 4: the oracle is salt-blind, so a green
  // row PROVES the salted plan computes the identical pair set (the
  // same "salting proven invisible" contract as q_skew_join)
  private def semdedup(s: SparkSession, d: String): DataFrame =
    semDedup(Tables.embeddings(s, d), pairSalt = 4)

  private val semdedupSql =
    s"""WITH ${graft.vector.VectorQueries.centSql},
       |${graft.vector.VectorQueries.assignSql},
       |dropped AS (
       |  SELECT DISTINCT a.vec_id
       |  FROM assign a JOIN assign b ON a.shard = b.shard AND b.vec_id < a.vec_id
       |  JOIN embeddings ea ON ea.vec_id = a.vec_id
       |  JOIN embeddings eb ON eb.vec_id = b.vec_id
       |  WHERE list_cosine_similarity(ea.embedding::DOUBLE[], eb.embedding::DOUBLE[]) >= 0.40)
       |SELECT s.vec_id, s.shard,
       |       CAST(CASE WHEN d.vec_id IS NULL THEN 1 ELSE 0 END AS BIGINT) AS keep
       |FROM assign s LEFT JOIN dropped d ON d.vec_id = s.vec_id""".stripMargin

  /** Span-level exact dedup signal (Lee et al. 2021, "Deduplicating
    * Training Data Makes Language Models Better": repeated >=N-token
    * spans are the unit of training-data duplication, not whole
    * documents — boilerplate headers/footers and quoted passages
    * duplicate across documents whose full texts never hash-match).
    * Per document: its 8-word rolling windows, and how many of them
    * appear in at least one OTHER document — the span-duplication
    * fraction a curation pipeline thresholds on, integer-exact x1e4.
    *
    * Scale shape: the window explode is corpus x ~tokens volume (the
    * same class as the shingle-dedup passes); windows group internally
    * by [[spanKey]] — a 16-byte two-seed xxhash64 pair, so a spurious
    * merge needs a simultaneous collision in two independent 64-bit
    * hashes (~2^-128 per pair: negligible even at ~1e12 distinct
    * spans, where a single 64-bit key's birthday bound would already
    * merge a handful of counts — the oracle joins raw window STRINGS
    * for the same totals). The df count table partial-aggregates to
    * distinct-window volume, and the per-doc rollup is one more hash
    * aggregate. No sorts, no windows over the corpus.
    */
  def spanDupStats(docs0: DataFrame, spanWords: Int = 8): DataFrame = {
    val docs = Tables.fanned(docs0, col("doc_id")) // single-split input, guide §2.5
    // __ws materialized before the lambda — see shingles()
    val words = col("__ws")
    val win = when(size(words) >= spanWords,
      transform(sequence(lit(1), size(words) - (spanWords - 1)),
        i => array_join(slice(words, i, lit(spanWords)), " ")))
      .otherwise(array().cast("array<string>"))
    // cached: referenced by the df-count aggregate AND the join side —
    // without it the explode + per-window hashing subtree executes
    // twice (same convention as the shingle cache in sizedCandidates).
    // Hashing AFTER the explode lets codegen's common-subexpression
    // elimination share the span string across the two seed hashes;
    // the cache holds (doc_id, h1, h2) — 24 bytes/window, never the
    // strings
    val exploded = docs
      .select(col("doc_id"), split(col("text"), " ").as("__ws"))
      .select(col("doc_id"), explode(win).as("sp"))
      .select(col("doc_id"), xxhash64(col("sp")).as("h1"),
        xxhash64(col("sp"), lit(1L)).as("h2")).cache()
    val dfCounts = exploded.groupBy("h1", "h2").agg(countDistinct("doc_id").as("ndocs"))
    exploded.join(dfCounts, Seq("h1", "h2"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_windows"),
        sum(when(col("ndocs") > 1, 1L).otherwise(0L)).as("n_dup"))
      .select(col("doc_id"), col("n_windows"), col("n_dup"),
        expr("n_dup * 10000 div n_windows").as("dup_frac_x1e4"))
  }

  /** 128-bit span equivalence key: two xxhash64 passes under distinct
    * seeds (the second mixes a constant into the stream). Used instead
    * of raw span strings so the span-dedup shuffles move 16-byte keys;
    * the two-hash pair keeps the spurious-merge probability ~2^-128
    * per span pair — safe at web-corpus span cardinalities (~1e12+),
    * where a single 64-bit key's birthday bound is already visible.
    */
  private def spanKey(span: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    struct(xxhash64(span).as("h1"), xxhash64(span, lit(1L)).as("h2"))

  private def spanDup(s: SparkSession, d: String): DataFrame =
    spanDupStats(Tables.documents(s, d))

  /** The actionable half of the span-dup signal: WHICH spans are the
    * boilerplate — the top-N most-duplicated `spanWords`-word windows
    * with their text, document reach, and occurrence count. This is
    * the report a curation team reads before writing strip rules
    * (site chrome, license headers, navigation text all surface
    * here).
    *
    * Scale shape — [[spanDupStats]]'s [[spanKey]] discipline applied
    * to its sibling: the corpus×tokens explode shuffles (key, doc_id)
    * — 16-byte two-seed hash pairs, never the raw token stream as
    * strings (~2^-128 spurious-merge odds per pair; see spanKey) — and
    * span TEXT is recovered for the top-N candidates only, by a
    * second map-only derive pass filtered against the broadcast
    * winner-hash set. The winner set includes every row TIED with the
    * Nth (n_docs, n_occurrences) — a struct-min threshold from a
    * TakeOrdered(topN), kept lazy — so the final span-asc tiebreak
    * selects the identical rows the string-keyed plan would.
    * Deterministic total order: reach desc, occurrences desc, span
    * asc.
    */
  def topDupSpans(docs0: DataFrame, spanWords: Int = 8, topN: Int = 20): DataFrame = {
    val docs = Tables.fanned(docs0, col("doc_id")) // single-split input, guide §2.5
    // __ws materialized before the lambda — see shingles()
    val words = col("__ws")
    val win = when(size(words) >= spanWords,
      transform(sequence(lit(1), size(words) - (spanWords - 1)),
        i => array_join(slice(words, i, lit(spanWords)), " ")))
      .otherwise(array().cast("array<string>"))
    val spans = docs
      .select(col("doc_id"), split(col("text"), " ").as("__ws"))
      .select(col("doc_id"), explode(win).as("span"))
    val counts = spans
      .select(spanKey(col("span")).as("wh"), col("doc_id"))
      .groupBy("wh")
      .agg(countDistinct("doc_id").as("n_docs"), count(lit(1)).as("n_occurrences"))
      .filter(col("n_docs") >= 2)
    // worst (n_docs, n_occurrences) among the top N — 1-row frame via
    // per-partition heaps; ties AT the threshold all qualify, so the
    // candidate set is >= the final N and string order decides
    val thresh = counts
      .orderBy(desc("n_docs"), desc("n_occurrences")).limit(topN)
      .agg(min(struct(col("n_docs"), col("n_occurrences"))).as("__cut"))
    val winners = counts.crossJoin(thresh)
      .filter(struct(col("n_docs"), col("n_occurrences")) >= col("__cut"))
      .select("wh", "n_docs", "n_occurrences")
    // text recovery: re-derive the windows (CPU-only second scan) and
    // keep only winner hashes. NO broadcast hint: winners is USUALLY
    // ~topN rows, but the >= cut filter keeps the whole boundary tie
    // class, and on a pairwise-dup-dominated corpus that class can be
    // millions of rows (every span at exactly (2, 2)) — a forced
    // broadcast would OOM the driver exactly there. Left to the
    // planner, the tiny case still broadcasts (AQE sees the real
    // size) and the pathological case degrades to a shuffled join of
    // tie-class rows — bounded by the dup structure, never corpus².
    val texts = spans.select(col("span")).withColumn("wh", spanKey(col("span")))
      .join(winners.select("wh"), "wh")
      .distinct()
    winners.join(texts, "wh")
      .select(col("span"), col("n_docs"), col("n_occurrences"))
      .orderBy(desc("n_docs"), desc("n_occurrences"), asc("span"))
      .limit(topN)
  }

  private def topSpans(s: SparkSession, d: String): DataFrame =
    topDupSpans(Tables.documents(s, d))

  private val topSpansSql =
    """WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
      |sp AS (
      |  SELECT doc_id, array_to_string(ws[t.i:t.i+7], ' ') AS span
      |  FROM w, UNNEST(range(1, len(ws) - 6)) AS t(i)
      |  WHERE len(ws) >= 8)
      |SELECT span, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
      |       CAST(COUNT(*) AS BIGINT) AS n_occurrences
      |FROM sp GROUP BY span HAVING COUNT(DISTINCT doc_id) >= 2
      |ORDER BY n_docs DESC, n_occurrences DESC, span
      |LIMIT 20""".stripMargin

  private val spanDupSql =
    """WITH words AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
      |wins AS (
      |  SELECT doc_id, array_to_string(w[t.i:t.i+7], ' ') AS win
      |  FROM words, UNNEST(range(1, len(w) - 6)) AS t(i)
      |  WHERE len(w) >= 8),
      |dup AS (SELECT win FROM wins GROUP BY win HAVING COUNT(DISTINCT doc_id) > 1)
      |SELECT w.doc_id, CAST(COUNT(*) AS BIGINT) AS n_windows,
      |  CAST(SUM(CASE WHEN d.win IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_dup,
      |  CAST(SUM(CASE WHEN d.win IS NOT NULL THEN 1 ELSE 0 END) * 10000
      |       // COUNT(*) AS BIGINT) AS dup_frac_x1e4
      |FROM wins w LEFT JOIN dup d USING (win)
      |GROUP BY w.doc_id""".stripMargin

  private val embeddingSelectiveSql =
    """WITH aug AS (
      |  SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings WHERE vec_id < 2000
      |  UNION ALL
      |  SELECT vec_id + 100000, list_transform(embedding::DOUBLE[], x -> x + 0.05)
      |  FROM embeddings WHERE vec_id < 50)
      |SELECT a.vec_id AS id_a, b.vec_id AS id_b,
      |       ROUND(list_cosine_similarity(a.emb, b.emb), 4) AS score
      |FROM aug a JOIN aug b ON a.vec_id < b.vec_id
      |WHERE list_cosine_similarity(a.emb, b.emb) >= 0.75""".stripMargin

  private val embeddingSql =
    """SELECT a.vec_id AS id_a, b.vec_id AS id_b,
      |  ROUND(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 4) AS score
      |FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
      |WHERE list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) >= 0.40""".stripMargin

  override val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "dedup_paragraph"     -> (paragraph _),
    "dedup_clusters"      -> (clusters _),
    "dedup_exact"         -> (exact _),
    "dedup_ngram_jaccard" -> (ngramJaccard _),
    "dedup_containment"   -> (containment _),
    "dedup_keep_best"     -> (keepBestQuery _),
    "dedup_minhash_lsh"   -> (minhashLsh _),
    "dedup_minhash_eval"  -> (minhashEval _),
    "dedup_simhash"       -> (simhash _),
    "dedup_edit_distance" -> (editDistance _),
    "dedup_embedding"     -> (embedding _),
    "dedup_embedding_blocked" -> (embeddingBlocked _),
    "dedup_embedding_selective" -> (embeddingSelective _),
    "dedup_semdedup"      -> (semdedup _),
    "dedup_incremental"   -> (incremental _),
    "dedup_span_exact"    -> (spanDup _),
    "dedup_top_spans"     -> (topSpans _),
    "dedup_cross_source"  -> (crossSource _))

  override val oracleSql: Map[String, String] = Map(
    "dedup_paragraph"     -> paragraphSql,
    "dedup_clusters"      -> clustersSql,
    "dedup_exact"         -> exactSql,
    "dedup_ngram_jaccard" -> ngramJaccardSql,
    "dedup_containment"   -> containmentSql,
    "dedup_keep_best"     -> keepBestSql,
    "dedup_edit_distance" -> editDistanceSql,
    "dedup_embedding"     -> embeddingSql,
    // the blocked variant verifies candidates with the exact cosine,
    // and its banding is sized so candidate recall is total on the
    // test corpora — so the exact all-pairs SQL is its oracle too
    "dedup_embedding_blocked" -> embeddingSql,
    "dedup_embedding_selective" -> embeddingSelectiveSql,
    "dedup_semdedup"      -> semdedupSql,
    "dedup_incremental"   -> incrementalSql,
    "dedup_span_exact"    -> spanDupSql,
    "dedup_top_spans"     -> topSpansSql,
    "dedup_cross_source"  -> crossSourceSql)
}
