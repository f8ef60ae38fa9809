package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.text.TermIndex

class TermIndexSpec extends AnyFunSuite {
  lazy val spark: SparkSession = GraftSession.local(4, "graft-test")
  val sf = "/root/testdata/sf0.001"

  private def topMap(df: org.apache.spark.sql.DataFrame): Seq[(Long, Double)] =
    df.collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq

  test("index-served BM25 equals the one-shot query on the test corpus") {
    val dir = Files.createTempDirectory("graft-tidx").toString
    val idx = new TermIndex(spark, dir)
    idx.build(Tables.documents(spark, sf).select("doc_id", "text"))
    val served = topMap(idx.search(Seq("table", "hash", "merge"), k = 10))
    val oneShot = topMap(
      graft.text.TextAnalysis.queries("text_bm25")(spark, sf))
    assert(served === oneShot,
      "the maintained index must reproduce the one-shot BM25 top-10 exactly")
  }

  test("query plan probes postings with the term filter pushed to the scan") {
    val dir = Files.createTempDirectory("graft-tidx2").toString
    val idx = new TermIndex(spark, dir)
    idx.build(Tables.documents(spark, sf).select("doc_id", "text"))
    val plan = idx.search(Seq("table", "hash"), k = 5)
      .queryExecution.executedPlan.toString
    assert(plan.contains(dir), "scoring must read the persisted postings")
    assert(plan.contains("PushedFilters") && plan.contains("In(term"),
      s"the query-term filter must reach the parquet scan:\n$plan")
    // corpus text is never read at query time — the only inputs are
    // the index directories
    assert(!plan.contains("documents.parquet"),
      "query time must not touch the document table")
  }

  test("append serves new docs, replays idempotently, and excludeLabel rewinds") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-tidx3").toString
    val idx = new TermIndex(spark, dir)
    val corpus = Seq(
      (1L, "alpha beta gamma"),
      (2L, "alpha alpha delta")).toDF("doc_id", "text")
    idx.build(corpus)
    val before = topMap(idx.search(Seq("alpha"), k = 10))
    assert(before.map(_._1) === Seq(2L, 1L), "tf=2 doc must outrank tf=1")

    val batch = Seq((10L, "alpha epsilon")).toDF("doc_id", "text")
    idx.append(batch, "b1")
    val after = topMap(idx.search(Seq("alpha"), k = 10))
    assert(after.map(_._1).toSet === Set(1L, 2L, 10L))
    // idempotent replay: same label overwrites, results identical
    idx.append(batch, "b1")
    assert(topMap(idx.search(Seq("alpha"), k = 10)) === after)
    // a replayed batch judged against the pre-append index
    assert(topMap(idx.search(Seq("alpha"), k = 10,
      excludeLabel = Some("b1"))) === before)
    // reserved labels refused
    intercept[IllegalArgumentException](idx.append(batch, "base"))
    intercept[IllegalArgumentException](idx.append(batch, "compact0"))
  }

  test("compact folds to one partition per table without changing results") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-tidx4").toString
    val idx = new TermIndex(spark, dir)
    idx.build(Seq((1L, "alpha beta")).toDF("doc_id", "text"))
    (0 until 3).foreach(i =>
      idx.append(Seq((10L + i, s"alpha w$i")).toDF("doc_id", "text"), s"b$i"))
    val before = topMap(idx.search(Seq("alpha", "beta"), k = 10))
    idx.compact()
    val fsys = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    Seq("post", "meta").foreach { t =>
      val parts = fsys.listStatus(new org.apache.hadoop.fs.Path(s"$dir/$t"))
        .map(_.getPath.getName).filter(_.startsWith("batch=")).sorted
      assert(parts.sameElements(Array("batch=compact0")),
        s"$t/ must fold to compact0, got ${parts.mkString(",")}")
    }
    assert(topMap(idx.search(Seq("alpha", "beta"), k = 10)) === before)
    // keepLabel: the in-flight batch survives the fold unfolded.
    // Exclusion rewinds the WHOLE corpus state (N, avgdl, df — not
    // just the hit list), so the reference is the pre-append search.
    val preB9 = topMap(idx.search(Seq("alpha"), k = 10))
    idx.append(Seq((99L, "alpha zeta")).toDF("doc_id", "text"), "b9")
    val withB9 = topMap(idx.search(Seq("alpha"), k = 10))
    idx.compact(keepLabel = Some("b9"))
    assert(topMap(idx.search(Seq("alpha"), k = 10)) === withB9)
    assert(topMap(idx.search(Seq("alpha"), k = 10, excludeLabel = Some("b9")))
      === preB9,
      "replay exclusion must keep working after a keepLabel fold")
  }
}
