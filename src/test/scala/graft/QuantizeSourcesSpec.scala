package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.expressions.VectorExpressions._
import graft.sources.JsonVectors
import graft.vector.Quantize

class QuantizeSourcesSpec extends AnyFunSuite {
  lazy val spark: SparkSession = GraftSession.local(4, "graft-test")
  val sf = "/root/testdata/sf0.001"

  test("TextDocs ingests line-per-doc and file-per-doc with stable ids") {
    import java.nio.file.{Files => JF, Paths}
    val dir = JF.createTempDirectory("graft-textdocs")
    JF.write(Paths.get(dir.toString, "a.txt"), "first doc\nsecond doc\n".getBytes)
    JF.write(Paths.get(dir.toString, "b.txt"), "third doc here\n".getBytes)

    val lines = graft.sources.TextDocs.readLines(spark, dir.toString)
    assert(lines.count() === 3)
    assert(lines.columns.toSeq === Seq("doc_id", "text", "source", "n_chars"))
    assert(lines.filter(col("source") === "a.txt").count() === 2)
    assert(lines.filter(col("text") === "third doc here" && col("n_chars") === 14).count() === 1)
    // ids deterministic across re-reads and distinct across docs
    val ids1 = lines.select("doc_id").collect().map(_.getLong(0)).sorted
    val ids2 = graft.sources.TextDocs.readLines(spark, dir.toString)
      .select("doc_id").collect().map(_.getLong(0)).sorted
    assert(ids1.sameElements(ids2) && ids1.distinct.length === 3)

    val files = graft.sources.TextDocs.readFiles(spark, dir.toString)
    assert(files.count() === 2)
    // whole-file text keeps the interior newline
    assert(files.filter(col("source") === "a.txt")
      .head().getString(1).contains("first doc\nsecond doc"))
    // the two shapes feed the same downstream ops: curation accepts both
    val r = graft.pipeline.CurationPipeline.curate(spark, lines, minWords = 1)
    assert(r.kept.count() === 3)
  }

  test("int8 quantized knn keeps high recall@10 vs exact") {
    val e = Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("embedding"))
    val deq = Quantize.dequantize(Quantize.quantize(e))
      .select(col("vec_id"), col("deq"))
    val q = e.filter(col("vec_id") === 0).head().getSeq[Double](1).toArray

    def topk(df: org.apache.spark.sql.DataFrame, vcol: String): Seq[Long] =
      df.filter(col("vec_id") =!= 0)
        .select(col("vec_id"), cosineSim(col(vcol), typedlit(q.toSeq)).as("s"))
        .orderBy(desc("s"), col("vec_id").asc).limit(10)
        .collect().map(_.getLong(0)).toSeq

    val exact = topk(e, "embedding").toSet
    val quant = topk(deq, "deq").toSet
    val recall = (exact intersect quant).size.toDouble / exact.size
    assert(recall >= 0.9, s"quantized recall@10 = $recall")
  }

  test("sq serving path (shortlist + exact re-rank) equals exact knn at two SFs") {
    for (dir <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
      val got = SparkEntry.queries("vdb_knn_sq")(spark, dir)
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      val exact = SparkEntry.queries("vdb_knn_exact")(spark, dir)
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      assert(got === exact, s"sq re-rank diverged from exact knn at $dir")
    }
  }

  test("quantization error bounded by half a code step") {
    val df = SparkEntry.queries("vdb_quantize")(spark, sf)
    // max per-element error is 0.5/scale; outputs are rounded (scale
    // to 4 dp, err to 6 dp) so allow matching slack
    assert(df.filter(col("max_abs_err") > lit(0.5) / col("q_scale") + 1e-4).count() === 0)
  }

  test("JSON vector source round-trips the reference interchange shape") {
    val dir = Files.createTempDirectory("graft-json").toString + "/vecs"
    val e = Tables.embeddings(spark, sf)
      .select(col("vec_id").as("id"), col("embedding").as("vector"))
    JsonVectors.write(e, dir)
    val back = JsonVectors.read(spark, dir, idType = org.apache.spark.sql.types.LongType)
    assert(back.count() === e.count())
    // values survive the round trip
    val a = e.filter(col("id") === 5).select(col("vector").cast("array<double>"))
      .head().getSeq[Double](0)
    val b = back.filter(col("id") === 5).select("vector").head().getSeq[Double](0)
    assert(a.zip(b).forall { case (x, y) => math.abs(x - y) < 1e-6 })
    // raw file lines are the reference's {"id":...,"vector":[...]} shape
    val line = spark.read.text(dir).head().getString(0)
    assert(line.contains("\"id\"") && line.contains("\"vector\""))
  }

  test("compaction collapses append churn without changing content") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-compact").toString + "/t"
    // 12 micro-appends -> a long tail of tiny files
    (0 until 12).foreach { b =>
      (b * 10 until b * 10 + 10).map(i => (i.toLong, s"v$i")).toDF("id", "v")
        .coalesce(1).write.mode("append").parquet(dir)
    }
    val before = spark.read.parquet(dir).orderBy("id").collect().map(_.toSeq)
    val (nBefore, nAfter) = graft.sources.Compact.compactDir(spark, dir, targetBytes = 1L << 30)
    assert(nBefore >= 12 && nAfter === 1, s"expected 12+ -> 1 files, got $nBefore -> $nAfter")
    val after = spark.read.parquet(dir).orderBy("id").collect().map(_.toSeq)
    assert(after.toSeq === before.toSeq)
  }

  test("compacting a VectorStore's shards preserves serving and restores sorted files") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-compact-vs").toString
    val emb = Tables.embeddings(spark, sf)
      .select(col("vec_id").as("id"), col("embedding").as("vector"))
    val vs = new graft.vector.VectorStore(spark, dir, numShards = 4)
    vs.build(emb.filter(col("id") < 100), iters = 2)
    // append churn: 8 micro-stores
    (0 until 8).foreach { b =>
      vs.store(emb.filter(col("id") >= 100 + b * 50 && col("id") < 100 + (b + 1) * 50))
    }
    val n0 = vs.listIds().agg(sum("n_vectors")).head().getLong(0)
    val report = graft.sources.Compact.compactPartitions(spark, s"$dir/vectors",
      targetBytes = 1L << 30, sortCols = Seq("id"))
    assert(report.nonEmpty && report.forall { case (_, b, a) => a <= b })
    assert(report.exists { case (_, b, a) => a < b }, "some shard must actually compact")
    // content and serving intact
    assert(vs.listIds().agg(sum("n_vectors")).head().getLong(0) === n0)
    val q = emb.filter(col("id") === 3)
      .select(col("vector").cast("array<double>")).head().getSeq[Double](0).toArray
    assert(vs.search(q, topK = 1, nprobe = 4).head().getLong(0) === 3L)
    assert(vs.get(250L).count() === 1)
  }
}
