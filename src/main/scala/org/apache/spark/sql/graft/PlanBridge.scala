package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.{DataFrame, SparkSession}

/** The one `org.apache.spark.sql.*` file in this repo (original code, NOT
  * copied from Spark): `classic.Dataset.ofRows` — the only constructor
  * that wraps a raw `LogicalPlan` into a `DataFrame` — is `private[sql]`,
  * so a library introducing its own logical operator (graft.plans.
  * AsOfJoinPlan) needs exactly this one-line package-visibility bridge.
  * Everything else lives under `graft.*`. */
object PlanBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)

  /** `NormalizeFloatingNumbers.normalize` is `private[sql]`; the as-of
    * operator needs it so float/double join keys get the same -0.0/NaN
    * canonicalization Spark applies to built-in join keys. */
  def normalizeFloats(e: org.apache.spark.sql.catalyst.expressions.Expression)
      : org.apache.spark.sql.catalyst.expressions.Expression =
    org.apache.spark.sql.catalyst.optimizer.NormalizeFloatingNumbers
      .normalize(e)
}
