package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.embed.HashEmbedder
import graft.expressions.VectorExpressions._
import graft.vector.VectorStore

/** End-to-end replay of the reference's test.py flow (test.py:87-147):
  * load documents -> embed -> compute centroids -> store routed ->
  * repeated top-k searches — as one Spark pipeline.
  */
class ReferencePipelineSpec extends AnyFunSuite {
  lazy val spark: SparkSession = GraftSession.local(4, "graft-test")
  val sf = "/root/testdata/sf0.001"

  test("embed -> build store -> search round trip") {
    val docs = Tables.documents(spark, sf)
    val emb = HashEmbedder.embed(docs)
      .select(col("doc_id").as("id"), col("embedding").as("vector"))

    // embeddings are unit vectors over 64 dims
    val norms = emb.select(vecNorm(col("vector")).as("n"))
    assert(norms.filter(abs(col("n") - 1.0) > 1e-9).count() === 0)

    val dir = Files.createTempDirectory("graft-pipe").toString
    val vs = new VectorStore(spark, dir, numShards = 4)
    vs.build(emb, iters = 3)

    // search with a document's own embedding: it must be its own
    // nearest neighbor at full probe (reference sanity property)
    val q = emb.filter(col("id") === 123).head().getSeq[Double](1).toArray
    val top = vs.search(q, topK = 3, nprobe = 4).collect()
    assert(top.head.getLong(0) === 123L)
    assert(math.abs(top.head.getDouble(2) - 1.0) < 1e-9)

    // near-duplicate documents embed to nearly identical vectors:
    // the known J>=0.8 near-dup pairs score way above random pairs
    val pair = SparkEntry.queries("dedup_ngram_jaccard")(spark, sf)
      .orderBy(desc("jaccard")).head()
    val (a, b) = (pair.getLong(0), pair.getLong(1))
    val va = emb.filter(col("id") === a).head().getSeq[Double](1).toArray
    val sim = vs.search(va, topK = 5, nprobe = 4)
      .filter(col("id") === b).collect()
    assert(sim.nonEmpty && sim.head.getDouble(2) > 0.9,
      s"near-dup pair ($a,$b) should be mutual top-5 with high cosine")
  }

  test("reference-style TEXT ids flow through embed -> store -> get -> search") {
    // the reference keys vectors by content-hash strings
    // (storage_server.py id TEXT PRIMARY KEY; REPLACE INTO dedupes) —
    // mirror that end to end
    val docs = Tables.documents(spark, sf)
    val emb = HashEmbedder.embed(docs)
      .join(docs.select("doc_id", "text"), "doc_id")
      .select(md5(col("text")).as("id"), col("embedding").as("vector"))
      .dropDuplicates("id") // REPLACE INTO semantics: same content, one row
    val dir = Files.createTempDirectory("graft-strpipe").toString
    val vs = new VectorStore(spark, dir, numShards = 4)
    vs.build(emb, iters = 2)

    val row = emb.orderBy("id").limit(1).head()
    val (qid, q) = (row.getString(0), row.getSeq[Double](1).toArray)
    // /get/{id} with a TEXT key
    assert(vs.get(qid).count() === 1)
    // self-search: own nearest neighbor at full probe
    val top = vs.search(q, topK = 3, nprobe = 4).collect()
    assert(top.head.getString(0) === qid)
    assert(math.abs(top.head.getDouble(2) - 1.0) < 1e-9)
  }
}
