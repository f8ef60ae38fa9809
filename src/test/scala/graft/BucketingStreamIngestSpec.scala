package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.vector.VectorStore

class BucketingStreamIngestSpec extends AnyFunSuite {
  // NB: all suites share one JVM SparkSession via getOrCreate, so
  // builder-time configs would be silently ignored here — use
  // runtime conf + explicit external table paths instead.
  lazy val spark: SparkSession = GraftSession.local(4, "graft-test")
  val sf = "/root/testdata/sf0.001"

  test("bucketed fact-fact join runs without a shuffle exchange") {
    val wh = Files.createTempDirectory("graft-wh").toString
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ to expose exchanges
    try {
      Tables.orders(spark, sf).write.mode("overwrite")
        .option("path", s"$wh/orders_b")
        .bucketBy(8, "o_orderkey").sortBy("o_orderkey").saveAsTable("orders_b")
      Tables.lineitem(spark, sf).write.mode("overwrite")
        .option("path", s"$wh/lineitem_b")
        .bucketBy(8, "l_orderkey").sortBy("l_orderkey").saveAsTable("lineitem_b")

      val joined = spark.table("lineitem_b")
        .join(spark.table("orders_b"), col("l_orderkey") === col("o_orderkey"))
      val plan = joined.queryExecution.executedPlan.toString

      // co-located bucketed tables join without ShuffleExchange
      assert(!plan.contains("ShuffleExchange") && !plan.contains("Exchange hashpartitioning"),
        s"expected shuffle-free bucketed join, got:\n$plan")
      assert(joined.count() === Tables.lineitem(spark, sf).count())
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS orders_b")
      spark.sql("DROP TABLE IF EXISTS lineitem_b")
    }
  }

  test("streaming ingest routes micro-batches into the shard layout") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dir = Files.createTempDirectory("graft-sstore").toString
    val emb = Tables.embeddings(spark, sf)
      .select(col("vec_id").as("id"), col("embedding").as("vector"))
    val vs = new VectorStore(spark, dir, numShards = 4)
    vs.build(emb.filter(col("id") < 400), iters = 2)
    val n0 = vs.listIds().agg(sum("n_vectors")).head().getLong(0)

    // stream the remaining vectors in as micro-batches
    val rest = emb.filter(col("id") >= 400)
      .select(col("id"), col("vector").cast("array<double>"))
      .as[(Long, Seq[Double])].collect()
    val input = MemoryStream[(Long, Seq[Double])]
    val q = vs.streamStore(input.toDF().toDF("id", "vector"),
      Files.createTempDirectory("graft-ckpt").toString)
    try {
      input.addData(rest.take(50))
      q.processAllAvailable()
      input.addData(rest.drop(50))
      q.processAllAvailable()
    } finally q.stop()

    assert(vs.listIds().agg(sum("n_vectors")).head().getLong(0) === n0 + rest.length)
    // streamed vectors are searchable
    val v = rest.head._2.toArray
    assert(vs.search(v, topK = 1, nprobe = 4).head().getLong(0) === rest.head._1)
  }

  test("centroid refresh re-routes mass that drifted in through the stream") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dir = Files.createTempDirectory("graft-refresh").toString
    // initial corpus: two tight clusters around (1,0) and (0,1)
    val init = (0 until 100).map { i =>
      val base = if (i % 2 == 0) Seq(1.0, 0.0) else Seq(0.0, 1.0)
      (i.toLong, base.map(_ + (i % 7) * 0.01))
    }
    val vs = new VectorStore(spark, dir, numShards = 2)
    vs.build(init.toDF("id", "vector"), iters = 3)

    // drifting stream: new mass arrives far from both centroids
    val drift = (100 until 200).map(i => (i.toLong, Seq(-1.0 - (i % 5) * 0.01, -1.0)))
    val input = MemoryStream[(Long, Seq[Double])]
    val q = vs.streamStore(input.toDF().toDF("id", "vector"),
      Files.createTempDirectory("graft-refresh-ckpt").toString)
    try { input.addData(drift); q.processAllAvailable() } finally q.stop()

    val (touched, moved) = vs.refreshCentroids(sampleFraction = 1.0, iters = 5)
    assert(moved > 0 && touched.nonEmpty, "drifted mass must re-route")

    // invariant: every stored vector sits in its nearest refreshed
    // centroid's shard — the index is routing-consistent again
    val cents = vs.centroids()
    val misrouted = spark.read.parquet(s"$dir/vectors")
      .withColumn("shard", col("shard").cast("long"))
      .withColumn("want", graft.vector.Centroids
        .nearestShard(col("vector").cast("array<double>"), cents))
      .filter(col("shard") =!= col("want")).count()
    assert(misrouted === 0)
    assert(vs.listIds().agg(sum("n_vectors")).head().getLong(0) === 200)

    // a drifted-region query at nprobe=1 now finds the drifted mass
    val top = vs.search(Array(-1.0, -1.0), topK = 5, nprobe = 1).collect()
    assert(top.nonEmpty && top.forall(_.getLong(0) >= 100))
  }
}
