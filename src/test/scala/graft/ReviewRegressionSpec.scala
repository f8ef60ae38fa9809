package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.vector.VectorStore

/** Regressions for defects found in the round-1 self review. */
class ReviewRegressionSpec extends AnyFunSuite {
  lazy val spark: SparkSession = GraftSession.local(4, "graft-test")

  test("shingling tolerates documents under three words") {
    import spark.implicits._
    val docs = Seq(
      (1L, "hello world"), (2L, "one"), (3L, ""),
      (4L, "a b c d e f g h i j"), (5L, "a b c d e f g h i j")).toDF("doc_id", "text")
    // would previously throw INVALID_INDEX_OF_ZERO on docs 1-3
    val pairs = graft.dedup.Dedup.minhashPairs(docs).collect()
    assert(pairs.map(r => (r.getLong(0), r.getLong(1))).toSet === Set((4L, 5L)))
  }

  test("upsert/delete clean up a shard that loses all its vectors") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-empty-shard").toString
    // 2 well-separated clusters: ids 1,2 near (1,0); id 3 alone near (0,1)
    val vecs = Seq(
      (1L, Seq(1.0, 0.0)), (2L, Seq(0.9, 0.1)), (3L, Seq(0.0, 1.0))
    ).toDF("id", "vector")
    val vs = new VectorStore(spark, dir, numShards = 2)
    vs.build(vecs, iters = 2)
    val shardOf3 = vs.get(3).select("shard").head().get(0).asInstanceOf[Number].longValue()

    // move id 3 into the other cluster: its old shard empties
    vs.upsert(Seq((3L, Seq(0.95, 0.05))).toDF("id", "vector"))
    assert(vs.get(3).count() === 1, "stale copy must not survive in the emptied shard")
    assert(vs.listIds().agg(sum("n_vectors")).head().getLong(0) === 3)
    assert(!vs.listIds().select("shard").collect()
      .map(_.get(0).asInstanceOf[Number].longValue()).contains(shardOf3))

    // delete everything: the store must end up empty, not stale
    vs.delete(Seq(1L, 2L, 3L))
    val left = try spark.read.parquet(s"$dir/vectors").count() catch { case _: Throwable => 0L }
    assert(left === 0L)
  }

  test("salted join rejects small-side-preserving join types") {
    import spark.implicits._
    val a = Seq((1L, "x")).toDF("k", "v")
    intercept[IllegalArgumentException] {
      graft.operators.SaltedJoin.join(a, a, "k", joinType = "right_outer")
    }
  }

  test("minhashPairs rejects thresholds below the banding design point") {
    intercept[IllegalArgumentException] {
      graft.dedup.Dedup.minhashPairs(Tables.documents(spark, "/root/testdata/sf0.001"), 0.3)
    }
  }

  test("exact embedding dedup refuses corpus-scale input, points at blocked path") {
    val e = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val ex = intercept[IllegalArgumentException] {
      graft.dedup.Dedup.embeddingPairsExact(e, maxRows = 100)
    }
    assert(ex.getMessage.contains("embeddingPairsBlocked"))
    // under the bound it runs (same data, honest guard)
    assert(graft.dedup.Dedup.embeddingPairsExact(e, maxRows = 100000).count() > 0)
  }

  test("PQ train fails fast when the corpus has fewer vectors than codewords") {
    import spark.implicits._
    val tiny = (0 until 5).map(i => (i.toLong, Seq.fill(64)(i.toDouble)))
      .toDF("vec_id", "embedding")
    val ex = intercept[IllegalArgumentException] {
      graft.vector.ProductQuantizer.train(tiny, numCodes = 16)
    }
    assert(ex.getMessage.contains("16"))
  }

  test("compactDir survives a trailing-slash directory argument") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-compact-slash").toString + "/data"
    // many small files
    (0 until 40).foreach { i =>
      Seq((i.toLong, s"row$i")).toDF("id", "v")
        .write.mode("append").parquet(dir)
    }
    // the trailing slash previously nested the tmp dir INSIDE the data
    // dir, and the swap's recursive delete destroyed both copies
    val (before, after) = graft.sources.Compact.compactDir(spark, dir + "/", targetBytes = 1L << 30)
    assert(before >= 40 && after === 1)
    assert(spark.read.parquet(dir).count() === 40)
    // no tmp leftovers beside the data dir
    val parent = new org.apache.hadoop.fs.Path(dir).getParent
    val fs = parent.getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(fs.listStatus(parent).map(_.getPath.getName).toSet === Set("data"))
  }

  test("connectedComponents fails loudly instead of returning partial labels") {
    import spark.implicits._
    // a 6-node chain needs several star-contraction rounds: one
    // large-star/small-star alternation cannot canonicalize it
    // maxDriverEdges = 0 forces the distributed star rounds — the
    // failure contract under test is theirs (the driver union-find
    // has no round budget to exhaust)
    val chain = (0 until 5).map(i => (i.toLong, (i + 1).toLong)).toDF("id_a", "id_b")
    val ex = intercept[IllegalStateException] {
      graft.dedup.Dedup.connectedComponents(chain, maxIters = 1, maxDriverEdges = 0L)
    }
    assert(ex.getMessage.contains("converge"))
    // with enough rounds the same chain resolves to one component
    val labels = graft.dedup.Dedup.connectedComponents(chain, maxDriverEdges = 0L)
    assert(labels.select("cluster_id").distinct().count() === 1)
  }

  test("connectedComponents converges in O(log n) rounds on a long chain") {
    import spark.implicits._
    // the diameter-round killer: a 1000-node chain (diameter 999).
    // Min-label propagation needs 999 rounds; large-star/small-star
    // contraction must resolve it in ~log₂(1000) ≈ 10 (+ the fixed
    // point detection round), proving rounds track log n, not diameter
    val chain = (0 until 999).map(i => (i.toLong, (i + 1).toLong)).toDF("id_a", "id_b")
    val (labels, rounds) =
      graft.dedup.Dedup.connectedComponentsWithRounds(chain, maxIters = 20,
        maxDriverEdges = 0L)
    assert(rounds <= 15, s"expected O(log n) convergence, took $rounds rounds")
    val collected = labels.collect().map(r => r.getLong(0) -> r.getLong(1))
    assert(collected.length === 1000)
    assert(collected.forall(_._2 == 0L), "every chain node must label to the min id")
    org.apache.spark.sql.graftshim.CheckpointInterop.unpersistCheckpoint(labels)
  }

  test("driver union-find path labels identically to the distributed star rounds") {
    import spark.implicits._
    // a mixed fixture: two chains, a star, self-pairs, and singleton
    // components via self-edges — every labeling edge case at once
    val pairs = ((0 until 40).map(i => (i.toLong, (i + 1).toLong)) ++
      (100 until 120).map(i => (120L, i.toLong)) ++
      Seq((200L, 200L), (300L, 301L), (301L, 300L))).toDF("id_a", "id_b")
    val (viaDriver, r0) =
      graft.dedup.Dedup.connectedComponentsWithRounds(pairs)
    assert(r0 === 0, "a tiny edge set must take the driver path")
    val (viaStars, rN) =
      graft.dedup.Dedup.connectedComponentsWithRounds(pairs, maxDriverEdges = 0L)
    assert(rN > 0, "maxDriverEdges = 0 must force the star rounds")
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(canon(viaDriver) === canon(viaStars),
      "both paths must produce identical (doc_id, cluster_id) labels")
    org.apache.spark.sql.graftshim.CheckpointInterop.unpersistCheckpoint(viaDriver)
    org.apache.spark.sql.graftshim.CheckpointInterop.unpersistCheckpoint(viaStars)
  }

  test("rebuilding a store without PQ invalidates the memoized codebook") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-pq-memo").toString
    val vecs = (0 until 64).map(i => (i.toLong, Seq.fill(8)(i / 64.0 + i % 3)))
      .toDF("id", "vector")
    val vs = new VectorStore(spark, dir, numShards = 2)
    vs.build(vecs, iters = 2, pqSubspaces = 4, pqCodes = 4)
    assert(vs.pqModel().nonEmpty)
    vs.build(vecs, iters = 2) // plain rebuild deletes the codebook
    assert(vs.pqModel().isEmpty, "memoized codebook must not survive a rebuild")
    // and no refresh-tmp leftovers after a residual-store refresh
    vs.build(vecs, iters = 2, pqSubspaces = 4, pqCodes = 4)
    vs.refreshCentroids(sampleFraction = 1.0, iters = 1)
    val parent = new org.apache.hadoop.fs.Path(dir)
    val fs = parent.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val leftovers = fs.listStatus(parent).map(_.getPath.getName).filter(_.contains("__refresh_tmp"))
    assert(leftovers.isEmpty)
    assert(vs.search(Array.fill(8)(1.0), topK = 1, nprobe = 2).count() === 1)
  }
}
