package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Cast, Expression, ExpressionInfo}
import org.apache.spark.sql.types.{ArrayType, DoubleType}

import graft.expressions.{CosineSim, DotProduct, L2Dist}

/** SQL-surface registration: `cosine_sim`, `l2_dist`, `dot_product`
  * become callable from `spark.sql(...)` in any session built with
  * these extensions (GraftSession wires them in), or via
  * `--conf spark.sql.extensions=graft.GraftExtensions` on a cluster.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def asDouble(e: Expression): Expression = Cast(e, ArrayType(DoubleType))

  private def register(ext: SparkSessionExtensions, name: String,
                       build: (Expression, Expression) => Expression): Unit =
    ext.injectFunction((
      FunctionIdentifier(name),
      new ExpressionInfo("graft.expressions", name),
      (es: Seq[Expression]) => {
        require(es.length == 2, s"$name expects 2 arguments")
        build(asDouble(es.head), asDouble(es(1)))
      }))

  override def apply(ext: SparkSessionExtensions): Unit = {
    register(ext, "cosine_sim", CosineSim.apply)
    register(ext, "l2_dist", L2Dist.apply)
    register(ext, "dot_product", DotProduct.apply)
    // whole-operator extension: the fused shard-join + bounded top-k
    // (graft.plans.ShardTopKJoinNode -> ...Exec) — the knn-JOIN
    // serving kernel
    ext.injectPlannerStrategy(_ => graft.plans.ShardTopKJoinStrategy)
    // its broadcast sibling: exact all-shards scoring for a tiny query
    // batch — corpus stays map-only (no exchange), probes broadcast
    ext.injectPlannerStrategy(_ => graft.plans.BroadcastTopKJoinStrategy)
  }
}
