package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.expressions.CountMinAgg

class CountMinSpec extends AnyFunSuite {
  lazy val spark: SparkSession = GraftSession.local(4, "graft-test")

  test("sketch never undercounts and overcounts within the e*N/width bound") {
    import spark.implicits._
    // zipf-ish synthetic stream: item k appears ~ 50000/k times
    val items = (1 to 200).flatMap(k => Seq.fill(50000 / (k * 25))(s"item$k"))
    val df = items.toDF("w").repartition(8) // force partial-agg merges
    val (depth, width) = (4, 1024)
    val sk = df.agg(CountMinAgg.sketch(col("w"), depth, width)).head().getSeq[Long](0)
    assert(sk.length === depth * width)
    val n = items.length.toLong
    assert(sk.grouped(width).map(_.sum).toSeq === Seq.fill(depth)(n),
      "every sketch row must sum to the total update count")

    val exact = items.groupBy(identity).map { case (w, g) => (w, g.size.toLong) }
    val ests = df.distinct()
      .withColumn("est", CountMinAgg.estimate(typedlit(sk), col("w"), depth, width))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    exact.foreach { case (w, c) =>
      assert(ests(w) >= c, s"$w undercounted: ${ests(w)} < $c")
      assert(ests(w) <= c + (math.E * n / width).toLong + 1,
        s"$w overcounted past the CM bound: ${ests(w)} vs exact $c")
    }
  }

  test("text_cms_topk: estimates dominate exact counts on the corpus top-20") {
    val df = SparkEntry.queries("text_cms_topk")(spark, "/root/testdata/sf0.001")
    val rows = df.collect()
    assert(rows.length === 20)
    rows.foreach { r =>
      assert(r.getLong(2) >= r.getLong(1),
        s"${r.getString(0)}: cms ${r.getLong(2)} < exact ${r.getLong(1)}")
    }
  }
}
