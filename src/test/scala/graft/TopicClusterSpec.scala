package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.text.TopicCluster

class TopicClusterSpec extends AnyFunSuite {
  lazy val spark: SparkSession = GraftSession.local(4, "graft-test")
  val sf = "/root/testdata/sf0.001"

  test("clustering partitions the corpus and is deterministic") {
    val docs = Tables.documents(spark, sf)
    val a = TopicCluster.clusterDocs(docs)
    // a partition: one row per doc, sizes consistent
    assert(a.count() === docs.count())
    assert(a.select("doc_id").distinct().count() === docs.count())
    val sizes = a.groupBy("cluster").agg(
      count(lit(1)).as("n"), max("cluster_size").as("cs"), min("cluster_size").as("cs2"))
    sizes.collect().foreach { r =>
      assert(r.getLong(1) === r.getLong(2) && r.getLong(1) === r.getLong(3))
    }
    // deterministic under re-evaluation
    val b = TopicCluster.clusterDocs(docs)
    assert(a.exceptAll(b).count() === 0 && b.exceptAll(a).count() === 0)
  }

  test("two planted vocabularies separate into pure clusters at k=2") {
    import spark.implicits._
    val sci = "quantum electron proton neutrino boson fermion lattice spin orbit decay"
    val law = "court statute plaintiff defendant verdict appeal clause tort estoppel brief"
    def perturb(base: String, i: Long): String = {
      val ws = base.split(" ")
      // drop one word per doc so docs differ but stay in-domain
      (ws.take((i % ws.length).toInt) ++ ws.drop((i % ws.length).toInt + 1)).mkString(" ")
    }
    val docs = ((0L to 19L).map(i => (i, perturb(sci, i))) ++
      (20L to 39L).map(i => (i, perturb(law, i)))).toDF("doc_id", "text")
    val a = TopicCluster.clusterDocs(docs, k = 2).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val sciClusters = (0L to 19L).map(a).toSet
    val lawClusters = (20L to 39L).map(a).toSet
    assert(sciClusters.size === 1, s"sci docs split across $sciClusters")
    assert(lawClusters.size === 1, s"law docs split across $lawClusters")
    assert(sciClusters != lawClusters, "domains merged into one cluster")
  }

  test("served assignments equal a direct cluster run, cache, and rebuild on drift") {
    import spark.implicits._
    val dataDir = java.nio.file.Files.createTempDirectory("graft-servclu").toString
    def writeDocs(suffix: String): Unit =
      (0L until 40L).map(i => (i, s"w${i % 7} x${i % 5} y${i % 3}$suffix"))
        .toDF("doc_id", "text")
        .write.mode("overwrite").parquet(s"$dataDir/documents.parquet")
    writeDocs("")
    def canon(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1).toSeq
    val direct = canon(TopicCluster.clusterDocs(
      Tables.documents(spark, dataDir), k = 4))
    val served = canon(TopicCluster.servedAssignments(spark, dataDir, k = 4))
    assert(served === direct,
      "the served assignment must be byte-identical to a direct Lloyd run")
    assert(canon(TopicCluster.servedAssignments(spark, dataDir, k = 4)) === direct,
      "a repeat read serves the cached assignment unchanged")
    // corpus drift (same doc count, different tokens) must rebuild:
    // the token-count sum moves, the meta check fails, Lloyd reruns.
    // The per-JVM memo assumes immutable-in-session datasets, so an
    // in-session regeneration invalidates first (the documented
    // contract — a fresh JVM re-checks unprompted).
    writeDocs(" drifted tokens here")
    TopicCluster.invalidateServed()
    val drifted = canon(TopicCluster.servedAssignments(spark, dataDir, k = 4))
    assert(drifted === canon(TopicCluster.clusterDocs(
        Tables.documents(spark, dataDir), k = 4)),
      "a drifted corpus must re-cluster, not serve the stale assignment")
  }

  test("maintain assigns appended docs to the frozen model without moving old rows") {
    import spark.implicits._
    val dataDir = java.nio.file.Files.createTempDirectory("graft-mainclu").toString
    def gen(n: Long) = (0L until n).map(i => (i, s"w${i % 7} x${i % 5} y${i % 3}"))
      .toDF("doc_id", "text")
    gen(40).write.mode("overwrite").parquet(s"$dataDir/documents.parquet")
    def canon(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1).toSeq
    TopicCluster.invalidateServed()
    val before = canon(TopicCluster.servedAssignments(spark, dataDir, k = 4))
    gen(60).write.mode("overwrite").parquet(s"$dataDir/documents.parquet")
    TopicCluster.invalidateServed()
    val m = TopicCluster.maintainAssignments(spark, dataDir, k = 4)
    assert(m.nNew === 20L && m.nDocs === 60L && !m.retrained)
    val after = canon(TopicCluster.servedAssignments(spark, dataDir, k = 4))
    assert(after.size === 60)
    // old docs keep their (doc, cluster) pairs — the model was frozen,
    // not re-trained (sizes legitimately change with the arrivals)
    val beforeMap = before.map(t => t._1 -> t._2).toMap
    after.filter(_._1 < 40).foreach { case (id, c, _) =>
      assert(c === beforeMap(id), s"doc $id moved cluster under frozen maintain") }
    // sizes are consistent with the maintained rows
    val sizes = after.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    after.foreach { case (_, c, cs) => assert(cs === sizes(c)) }
    // a fresh-JVM-style re-check (memo dropped) serves without rebuild:
    // meta was re-stamped, so the served rows are the maintained ones
    TopicCluster.invalidateServed()
    assert(canon(TopicCluster.servedAssignments(spark, dataDir, k = 4)) === after,
      "maintain must leave the artifact content-fresh for serving")
    // maintain with nothing new is a cheap no-op ledger
    val m2 = TopicCluster.maintainAssignments(spark, dataDir, k = 4)
    assert(m2.nNew === 0L && m2.nDocs === 60L)
  }

  test("maintain refuses deletions; retrain re-converges and covers the shrunken corpus") {
    import spark.implicits._
    val dataDir = java.nio.file.Files.createTempDirectory("graft-retrclu").toString
    def gen(ids: Seq[Long]) = ids.map(i => (i, s"w${i % 7} x${i % 5} y${i % 3}"))
      .toDF("doc_id", "text")
    gen(0L until 40L).write.mode("overwrite").parquet(s"$dataDir/documents.parquet")
    TopicCluster.invalidateServed()
    TopicCluster.servedAssignments(spark, dataDir, k = 4).count()
    gen(10L until 40L).write.mode("overwrite").parquet(s"$dataDir/documents.parquet")
    TopicCluster.invalidateServed()
    val e = intercept[IllegalArgumentException] {
      TopicCluster.maintainAssignments(spark, dataDir, k = 4)
    }
    assert(e.getMessage.contains("append-only"),
      s"deletion must fail loudly, got: ${e.getMessage}")
    val m = TopicCluster.maintainAssignments(spark, dataDir, k = 4, retrain = true)
    assert(m.retrained && m.nDocs === 30L)
    val served = TopicCluster.servedAssignments(spark, dataDir, k = 4)
    assert(served.count() === 30L)
    assert(served.select("doc_id").distinct().count() === 30L)
    // maintaining against an unserved dataset fails loudly
    val fresh = java.nio.file.Files.createTempDirectory("graft-noserve").toString
    gen(0L until 5L).write.mode("overwrite").parquet(s"$fresh/documents.parquet")
    val e2 = intercept[IllegalArgumentException] {
      TopicCluster.maintainAssignments(spark, fresh, k = 4)
    }
    assert(e2.getMessage.contains("serve"),
      s"maintain without a served model must fail loudly, got: ${e2.getMessage}")
  }
}
