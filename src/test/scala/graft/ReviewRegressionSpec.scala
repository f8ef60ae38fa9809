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
}
