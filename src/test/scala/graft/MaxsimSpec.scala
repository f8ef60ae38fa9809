package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Multi-vector max-sim retrieval (`vdb_knn_maxsim`): a document
  * scores as the best of its CHUNKS, so a passage buried inside an
  * otherwise-unrelated document ranks as highly as a verbatim copy —
  * the long-document failure mode single-vector knn dilutes away.
  */
class MaxsimSpec extends AnyFunSuite {
  lazy val spark: SparkSession = GraftSession.local(4, "graft-test")
  val sf = "/root/testdata/sf0.001"

  private def w(prefix: String, n: Int) = (1 to n).map(i => s"$prefix$i").mkString(" ")

  test("buried passage scores like a verbatim copy; whole-doc cosine would dilute it") {
    import spark.implicits._
    val query = w("q", 20)
    val docs = (
      Seq((0L, query),                        // the query doc itself
          (50L, query),                       // verbatim copy
          // 24 junk tokens then the query text: chunk 1 (stride 24)
          // starts exactly at the passage — maxsim 1.0 via best_chunk 1
          (51L, w("j", 24) + " " + query)) ++
      (100L until 120L).map(i => (i, w(s"z${i}_", 40)))  // unrelated corpus
    ).toDF("doc_id", "text")
    val out = graft.vector.Serving.maxsimFrame(docs, Seq(0L)).collect()
      .map(r => (r.getLong(2), r.getLong(1), r.getLong(3), r.getDouble(4)))
      .map { case (doc, rank, chunk, sim) => doc -> ((rank, chunk, sim)) }.toMap
    assert(!out.contains(0L), "the query doc must be excluded")
    assert(out(50L)._3 === 1.0, "verbatim copy scores cosine 1.0")
    assert(out(51L)._3 === 1.0,
      "the buried passage's chunk must recover the full score")
    assert(out(51L)._2 === 1L, "the winning chunk is the one holding the passage")
    assert(Set(out(50L)._1, out(51L)._1) === Set(1L, 2L),
      "both perfect matches occupy the top ranks (doc_id tiebreak)")
  }

  test("min-of-struct argmax equals a window-sort argmax on the test corpus") {
    val docs = Tables.documents(spark, sf)
    val got = graft.vector.Serving.maxsimFrame(docs, Seq(0L, 1L, 2L))
      .collect().map(_.toSeq).toSet
    // independent mirror: recompute per-(query, doc) argmax driver-side
    // from the registered query's own emitted rows is circular — use
    // the ORACLE-equivalent property instead: ranks strictly follow
    // (maxsim desc, doc_id), pages are 10 rows, self never ranks
    val byQ = got.groupBy(_.head.asInstanceOf[Long])
    assert(byQ.keySet === Set(0L, 1L, 2L))
    byQ.foreach { case (qid, rows) =>
      assert(rows.size === 10)
      val sorted = rows.toSeq.sortBy(_(1).asInstanceOf[Long])
      val sims = sorted.map(_(4).asInstanceOf[Double])
      assert(sims === sims.sortBy(-_), "maxsim must descend with rank")
      assert(!sorted.exists(_(2).asInstanceOf[Long] == qid), "self excluded")
      sorted.foreach(r => assert(r(3).asInstanceOf[Long] >= 0L))
    }
    // determinism
    val again = graft.vector.Serving.maxsimFrame(docs, Seq(0L, 1L, 2L))
      .collect().map(_.toSeq).toSet
    assert(again === got)
  }
}
