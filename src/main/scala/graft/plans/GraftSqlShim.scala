// Lives in org.apache.spark.sql to reach the private[sql] Dataset.ofRows —
// the standard mechanism Spark libraries use to materialize a DataFrame
// from a custom LogicalPlan (there is no public constructor on purpose;
// extensions are expected to ship exactly this shim).
package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

object GraftSqlShim {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(
      spark.asInstanceOf[classic.SparkSession], plan)
}
