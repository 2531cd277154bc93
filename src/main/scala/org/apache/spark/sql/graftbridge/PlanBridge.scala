package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.{DataFrame, SparkSession, classic}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Bridge into Spark's `private[sql] Dataset.ofRows`, used by
  * [[graft.ops.Par.widen]] to rebuild a DataFrame after inserting its
  * parallelism-floor repartition BELOW a narrow operator chain — the
  * public API can only stack a repartition on top, which leaves the
  * caller's (possibly expensive) projections evaluating on the
  * under-parallel scan splits the widen exists to escape.
  */
object PlanBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}
