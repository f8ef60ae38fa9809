package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §2 for the inventory.
  * Each module contributes (queries, oracleSql); keys are globally
  * unique (asserted at class-init so a collision fails fast).
  */
object SparkEntry {
  private val modules: Seq[QueryModule] = Seq(
    graft.analytics.Analytics,
    graft.vector.VectorQueries,
    graft.vector.AnnLsh,
    graft.vector.Serving,
    graft.dedup.Dedup,
    graft.text.TextAnalysis,
    graft.text.TopicCluster,
    graft.multimodal.Multimodal,
    graft.embed.HashEmbedder,
    graft.vector.Quantize,
    graft.vector.ProductQuantizer,
    graft.vector.Pca,
    graft.vector.Opq,
    graft.pipeline.PipelineOps)

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q1_pricing")(spark, "/root/testdata/sf0.001")

  val queries: Map[String, (SparkSession, String) => DataFrame] = {
    val all = modules.flatMap(_.queries)
    require(all.size == all.map(_._1).distinct.size, "duplicate query keys across modules")
    all.toMap
  }

  val oracleSql: Map[String, String] = modules.flatMap(_.oracleSql).toMap
}
