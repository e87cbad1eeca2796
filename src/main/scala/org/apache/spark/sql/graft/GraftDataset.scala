package org.apache.spark.sql.graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** `private[sql]`-scoped shim: turn a LogicalPlan into a DataFrame
  * (`Dataset.ofRows`), needed by the order-aware candidate LABELING
  * path — a join-order variant is a rewritten logical plan, not a
  * conf assignment, so executing it for a latency label requires
  * planning that exact tree. The in-engine strategy does the same
  * through a nested QueryExecution; labeling wants a real DataFrame
  * so the label is `df.count()` wall time, identical to the knob
  * candidates' labels. */
object GraftDataset {
  def ofRows(spark: org.apache.spark.sql.SparkSession,
             plan: LogicalPlan): DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)
}
