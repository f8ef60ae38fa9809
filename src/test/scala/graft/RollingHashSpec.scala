package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.expressions.{RollingHash, RollingHashKernel}

class RollingHashSpec extends AnyFunSuite {
  lazy val spark: SparkSession = GraftSession.local(4, "graft-test")

  test("expression matches the kernel and a direct mod computation") {
    import spark.implicits._
    val inputs = Seq("", "a", "abc", "hello world", "x" * 500)
    val got = inputs.toDF("s")
      .select(RollingHash.rollingHash(col("s"))).as[Long].collect()

    // reference computation with BigInt arithmetic
    def ref(s: String): Long = {
      val P = BigInt(RollingHashKernel.P)
      s.getBytes("UTF-8").foldLeft(BigInt(0))((h, b) => (h * 257 + (b & 0xFF)) mod P).toLong
    }
    assert(got.toSeq === inputs.map(ref))
  }

  test("distinct content yields distinct fingerprints on the corpus") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val n = docs.count()
    val distinctHashes = docs
      .select(RollingHash.rollingHash(col("text")).as("h"))
      .distinct().count()
    assert(distinctHashes === n) // all corpus texts are distinct
  }
}
