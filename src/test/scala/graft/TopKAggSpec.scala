package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.expressions.TopKAgg

class TopKAggSpec extends AnyFunSuite {
  lazy val spark: SparkSession = GraftSession.local(4, "graft-test")

  test("bounded-heap top-k matches window row_number across partitions and ties") {
    import spark.implicits._
    // ties on score: id ASC must win; spread over many partitions so
    // partial heaps really merge
    val rows = for (g <- 1 to 5; i <- 1 to 200) yield (g, i.toLong, (i % 7).toDouble)
    val df = rows.toDF("g", "id", "s").repartition(16)

    val viaAgg = df.groupBy("g")
      .agg(TopKAgg.topK(col("s"), col("id"), 3).as("t"))
      .select(col("g"), posexplode(col("t")).as(Seq("pos", "e")))
      .select(col("g"), (col("pos") + 1).as("rank"), col("e.id").as("id"), col("e.score").as("s"))

    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("g").orderBy(desc("s"), asc("id"))
    val viaWindow = df.withColumn("rank", row_number().over(w)).filter(col("rank") <= 3)
      .select(col("g"), col("rank").cast("long").as("rank"), col("id"), col("s"))

    assert(viaAgg.exceptAll(viaWindow).count() === 0)
    assert(viaWindow.exceptAll(viaAgg).count() === 0)
  }

  test("eval is non-destructive: repeated eval on one buffer agrees") {
    // window frames evaluate an accumulating buffer once per row — a
    // draining eval() would return empty on every call after the first
    import org.apache.spark.sql.graftshim.ColumnInterop
    val agg = TopKAgg(ColumnInterop.expression(lit(0.0)),
      ColumnInterop.expression(lit(0L)), k = 3)
    val buf = agg.createAggregationBuffer()
    Seq((0.9, 1L), (0.5, 2L), (0.7, 3L), (0.99, 4L))
      .foreach { case (s, i) => buf.offer(s, i) } // bounded: keeps best 3
    val first = agg.eval(buf)
    val second = agg.eval(buf)
    assert(buf.size === 3)
    assert(first.toString === second.toString)
  }

  test("groups smaller than k return all their rows, best-first") {
    import spark.implicits._
    val df = Seq((1, 10L, 0.5), (1, 11L, 0.9)).toDF("g", "id", "s")
    val got = df.groupBy("g").agg(TopKAgg.topK(col("s"), col("id"), 5).as("t"))
      .select(explode(col("t")).as("e")).select("e.id").as[Long].collect()
    assert(got.toSeq === Seq(11L, 10L))
  }
}
