package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.SaltedJoin
import graft.streaming.StreamingSearch

class OperatorsSpec extends AnyFunSuite {
  lazy val spark: SparkSession = GraftSession.local(4, "graft-test")
  val sf = "/root/testdata/sf0.001"

  test("salted join equals plain join on skewed data") {
    import spark.implicits._
    // heavily skewed: 90% of rows share one key
    val big = (1 to 2000).map(i => (if (i % 10 == 0) i.toLong % 7 else 1L, i)).toDF("k", "v")
    val small = Seq((1L, "hot"), (2L, "a"), (3L, "b"), (0L, "z")).toDF("k", "name")
    val plain = big.join(small, Seq("k")).select("k", "v", "name")
    val salted = SaltedJoin.join(big, small, "k", salts = 8).select("k", "v", "name")
    assert(salted.exceptAll(plain).count() === 0 && plain.exceptAll(salted).count() === 0)
  }

  test("population-adaptive salted join equals plain join under skew") {
    import spark.implicits._
    // one hot key (900 rows), several balanced keys (~25 each):
    // saltc(hot) = ceil(900/100) = 9, balanced keys stay saltc 1
    val big = (1 to 1000)
      .map(i => (if (i <= 900) 1L else (i % 4).toLong + 2L, i)).toDF("k", "v")
    val other = Seq((1L, "hot"), (2L, "a"), (3L, "b"), (9L, "unmatched"))
      .toDF("k", "name")
    val plain = big.join(other, Seq("k")).select("k", "v", "name")
    val salted = SaltedJoin.joinByPopulation(big, other, "k", maxRowsPerTask = 100)
      .select("k", "v", "name")
    assert(salted.exceptAll(plain).count() === 0 && plain.exceptAll(salted).count() === 0)
    // big-side-preserving left join: unmatched big rows survive exactly once
    val plainL = big.join(other, Seq("k"), "left").select("k", "v", "name")
    val saltedL = SaltedJoin.joinByPopulation(big, other, "k", 100, "left")
      .select("k", "v", "name")
    assert(saltedL.exceptAll(plainL).count() === 0 && plainL.exceptAll(saltedL).count() === 0)
  }

  test("population-adaptive salted join preserves null-key big-side rows") {
    import spark.implicits._
    // null keys must ride the big-side-preserving join types exactly
    // as a plain join would carry them: kept with null payload on
    // left, emitted on leftanti, dropped on inner
    val big = Seq((Option(1L), 1), (Option(1L), 2), (None, 3), (None, 4),
      (Option(2L), 5)).toDF("k", "v")
    val other = Seq((Option(1L), "a"), (Option(2L), "b")).toDF("k", "name")
    Seq("inner", "left", "leftanti").foreach { jt =>
      val plain = big.join(other, Seq("k"), jt)
      val salted = SaltedJoin.joinByPopulation(big, other, "k", maxRowsPerTask = 1,
        joinType = jt).select(plain.columns.map(col): _*)
      assert(salted.exceptAll(plain).count() === 0 &&
        plain.exceptAll(salted).count() === 0,
        s"$jt join must treat null keys exactly as a plain join")
    }
  }

  test("stale precomputed salts keep pairs for keys absent from the table") {
    import spark.implicits._
    // the serveStream regime: the salt table is materialized at
    // stream start, the static side later gains a new key — pairs on
    // that key must survive at salt 0 (an inner replica join would
    // silently drop them)
    val atStart = (1 to 200).map(i => (1L, i)).toDF("k", "v")
    val salts = SaltedJoin.populationSalts(atStart, "k", maxRowsPerTask = 50)
      .localCheckpoint(true)
    val bigNow = atStart.unionByName(Seq((2L, 1000), (2L, 1001)).toDF("k", "v"))
    val other = Seq((1L, "hot"), (2L, "new")).toDF("k", "name")
    val plain = bigNow.join(other, Seq("k")).select("k", "v", "name")
    val salted = SaltedJoin.joinByPopulation(bigNow, other, "k", 50,
        precomputedSalts = Some(salts)).select("k", "v", "name")
    assert(salted.exceptAll(plain).count() === 0 &&
      plain.exceptAll(salted).count() === 0,
      "a key missing from the stale salt table must still join (salt 0)")
  }

  test("as-of join carries a map payload (unhashable type skips the tie-break)") {
    import spark.implicits._
    val trades = Seq((1L, 100L, "t1")).toDF("k", "ts", "name")
    val quotes = Seq((1L, 90L, 10.0), (1L, 95L, 11.0)).toDF("k", "qts", "price")
    // xxhash64 rejects MapType: the join must still analyze and pick
    // the latest prior row (tie-break only matters for EQUAL ts)
    val got = graft.operators.AsOfJoin
      .join(trades, quotes, "k", "ts", "qts",
        map(lit("px"), col("price")))
      .select("name", "asof_value").collect()
    assert(got.length === 1)
    assert(got.head.getMap[String, Double](1).toMap === Map("px" -> 11.0))
  }

  test("topKPerQueryFused matches the window form and breaks ties deterministically") {
    import spark.implicits._
    import graft.streaming.StreamingSearch
    // distinct scores: heap and window must agree on rows AND ranks
    val scored = Seq(
      (1L, 10L, 0.9), (1L, 11L, 0.7), (1L, 12L, 0.8),
      (2L, 10L, 0.1), (2L, 13L, 0.5)).toDF("query_id", "id", "score")
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.select("query_id", "id", "score", "rank").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
        .toSet
    assert(canon(StreamingSearch.topKPerQueryFused(scored, 2)) ===
      canon(StreamingSearch.topKPerQuery(scored, 2)))
    // equal scores: the fused form ranks (score desc, id asc) —
    // deterministic where the window's tie order is engine whim
    val ties = Seq((1L, 20L, 0.5), (1L, 7L, 0.5), (1L, 9L, 0.5))
      .toDF("query_id", "id", "score")
    val got = StreamingSearch.topKPerQueryFused(ties, 2).orderBy("rank")
      .select("id").collect().map(_.getLong(0)).toSeq
    assert(got === Seq(7L, 9L))
  }

  test("streaming scoreIvf with maxRowsPerTask matches the unsalted scores") {
    import spark.implicits._
    import graft.vector.VectorStore
    val dir = java.nio.file.Files.createTempDirectory("graft-ssalt").toString
    val emb = Tables.embeddings(spark, sf)
      .select(col("vec_id").as("id"), col("embedding").as("vector"))
    val vs = new VectorStore(spark, dir, numShards = 4)
    vs.build(emb, iters = 2)
    val cents = vs.centroids()
    val corpus = spark.read.parquet(s"$dir/vectors")
    val qv = emb.filter(col("id") === 3)
      .select(col("vector").cast("array<double>")).head().getSeq[Double](0)

    // the salted plan must stay stream-static legal: the salt table is
    // a static broadcast, the stream side's replication is a projection
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Seq[Double])]
    input.addData((7L, qv), (8L, qv.map(-_)))
    // maxRowsPerTask = 10 forces saltc > 1 on every probed shard
    // (sf0.001 shards hold ~12 vectors each)
    val salted = StreamingSearch.scoreIvf(
      input.toDF().toDF("query_id", "qv"), corpus, cents, nprobe = 2,
      maxRowsPerTask = 10L)
    val sq = salted.writeStream.format("memory").queryName("ssalted")
      .outputMode("append").start()
    try sq.processAllAvailable() finally sq.stop()

    val plain = StreamingSearch.scoreIvf(
      Seq((7L, qv), (8L, qv.map(-_))).toDF("query_id", "qv"),
      corpus, cents, nprobe = 2)
    val got = spark.table("ssalted").select("query_id", "id", "score")
    assert(got.count() > 0)
    assert(got.exceptAll(plain.select("query_id", "id", "score")).count() === 0 &&
      plain.select("query_id", "id", "score").exceptAll(got).count() === 0)
  }

  test("as-of join picks the latest strictly-prior row per key") {
    import spark.implicits._
    val trades = Seq((1L, 100L, "t1"), (1L, 200L, "t2"), (2L, 150L, "t3"))
      .toDF("k", "ts", "name")
    val quotes = Seq((1L, 90L, 10.0), (1L, 100L, 11.0), (1L, 199L, 12.0), (2L, 150L, 20.0))
      .toDF("k", "qts", "price")
    val got = graft.operators.AsOfJoin
      .join(trades, quotes, "k", "ts", "qts", col("price"))
      .select("name", "asof_value").collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    // t1@100: quote@100 excluded (strict), quote@90 wins; t2@200: 199 wins
    assert(got === Map("t1" -> 10.0, "t2" -> 12.0))
    // t3@150 has only the same-instant quote -> dropped under strict,
    // matched under strict=false
    val loose = graft.operators.AsOfJoin
      .join(trades, quotes, "k", "ts", "qts", col("price"), strict = false)
      .select("name", "asof_value").collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(loose === Map("t1" -> 11.0, "t2" -> 12.0, "t3" -> 20.0))
  }

  test("streaming vector search: stream of queries against static corpus") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val corpus = Tables.embeddings(spark, sf)
      .select(col("vec_id").as("id"), col("embedding").as("vector"))

    val qv = corpus.filter(col("id") === 3)
      .select(col("vector").cast("array<double>")).head().getSeq[Double](0)
    val input = MemoryStream[(Long, Seq[Double])]
    input.addData((100L, qv))

    val queries = input.toDF().toDF("query_id", "qv")
    val scored = StreamingSearch.score(queries, corpus)
    val q = scored.writeStream.format("memory").queryName("sscore")
      .outputMode("append").start()
    try q.processAllAvailable() finally q.stop()

    val top = StreamingSearch.topKPerQuery(spark.table("sscore"), 3)
      .orderBy("rank").collect()
    assert(top.length === 3)
    // the query vector IS corpus vector 3: self-match ranks first
    assert(top.head.getLong(1) === 3L)
    assert(math.abs(top.head.getDouble(2) - 1.0) < 1e-9)
  }

  test("streaming search scans only the probed IVF shards") {
    import spark.implicits._
    import graft.vector.{Centroids, VectorStore}
    val dir = java.nio.file.Files.createTempDirectory("graft-ssearch").toString
    val emb = Tables.embeddings(spark, sf)
      .select(col("vec_id").as("id"), col("embedding").as("vector"))
    val vs = new VectorStore(spark, dir, numShards = 4)
    vs.build(emb, iters = 2)
    val cents = vs.centroids()
    val qv = emb.filter(col("id") === 3)
      .select(col("vector").cast("array<double>")).head().getSeq[Double](0)
    val probe = Centroids.nearestShardsOf(qv.toArray, cents, nprobe = 1).map(_.toLong)
    val corpus = spark.read.parquet(s"$dir/vectors")
    val shardIds = corpus.filter(col("shard").isin(probe: _*))
      .select("id").as[Long].collect().toSet
    assert(shardIds.size < emb.count(), "pruning must exclude some shards")

    // probeShards lands as a parquet PARTITION filter, before the
    // broadcast — same pruning VectorStore.search gets
    val queries = Seq((7L, qv)).toDF("query_id", "qv")
    val scored = StreamingSearch.score(queries, corpus, probeShards = probe)
    val plan = scored.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("shard"),
      s"expected shard partition filter in plan:\n$plan")
    assert(scored.select("id").as[Long].collect().toSet === shardIds)

    // scoreIvf routes each query itself; same probed candidate set, and
    // it works as a genuine stream-static join
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Seq[Double])]
    input.addData((7L, qv))
    val sivf = StreamingSearch.scoreIvf(
      input.toDF().toDF("query_id", "qv"), corpus, cents, nprobe = 1)
    val sq = sivf.writeStream.format("memory").queryName("sivf")
      .outputMode("append").start()
    try sq.processAllAvailable() finally sq.stop()
    assert(spark.table("sivf").select("id").as[Long].collect().toSet === shardIds)
    val top = StreamingSearch.topKPerQuery(spark.table("sivf"), 1).collect()
    assert(top.head.getLong(1) === 3L) // self-match tops its own shard
  }

  test("range join: exact pairs, inclusive bounds, no duplicate matches") {
    import spark.implicits._
    // intervals chosen to exercise bucket boundaries at width 10:
    //  A [5, 25]  spans 3 buckets; B [12, 14] inside one; C [30, 30] a
    //  degenerate instant; D [100, 101] matches nothing
    val intervals = Seq(("A", 5L, 25L), ("B", 12L, 14L), ("C", 30L, 30L),
      ("D", 100L, 101L)).toDF("name", "s", "e")
    val points = Seq((1L, 5L), (2L, 13L), (3L, 25L), (4L, 26L), (5L, 30L))
      .toDF("pid", "p")
    val got = graft.operators.RangeJoin
      .pointInInterval(intervals, points, "s", "e", "p", bucketWidth = 10L)
      .select("name", "pid").collect().map(r => (r.getString(0), r.getLong(1)))
    val expected = Set(
      ("A", 1L), ("A", 2L), ("A", 3L), // inclusive on both ends
      ("B", 2L), ("C", 5L))
    assert(got.toSet === expected)
    // a point inside an interval spanning several buckets matches ONCE
    assert(got.length === expected.size, s"duplicate pairs in ${got.toSeq}")

    // blocked result == naive cross-join result on the same data
    val naive = intervals.crossJoin(points)
      .filter(col("p") >= col("s") && col("p") <= col("e"))
      .select("name", "pid").collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(got.toSet === naive)
  }
}
