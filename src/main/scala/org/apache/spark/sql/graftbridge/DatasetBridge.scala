package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.{DataFrame, SparkSession, classic}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Bridge into the `private[sql]` Dataset constructor — the standard
  * technique for libraries that add whole logical operators (the same
  * pattern third-party Spark extensions use): living in an
  * `org.apache.spark.sql` subpackage grants access to
  * `classic.Dataset.ofRows`, the only way to wrap a custom LogicalPlan
  * back into a public DataFrame.
  */
object DatasetBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  /** `Observation.getOrEmpty` is `private[sql]`; the public `get`
    * blocks forever if the observed action's listener never fires —
    * iterative drivers need the non-blocking probe to poll with a
    * bounded wait and fall back.
    */
  def observedOrEmpty(obs: org.apache.spark.sql.Observation): Map[String, Any] =
    obs.getOrEmpty
}
