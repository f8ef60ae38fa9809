package org.apache.spark.sql
package graftshim

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Bridge to Spark 4's `private[sql]` Dataset.ofRows — the only way to
  * hand a custom LogicalPlan node (planned by an injected strategy)
  * back to the public DataFrame API. Spark 4 moved the classic
  * implementation behind `org.apache.spark.sql.classic`; extension
  * libraries conventionally shim it from inside the sql namespace —
  * same convention as [[ColumnInterop]].
  */
object PlanInterop {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}
