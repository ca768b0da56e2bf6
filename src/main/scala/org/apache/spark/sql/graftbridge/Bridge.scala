package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic.{Dataset, ExpressionUtils, SparkSession => ClassicSession}

/** Minimal accessors for `private[sql]` construction APIs, so graft's
  * custom logical plan can be wrapped back into a DataFrame. Lives under
  * `org.apache.spark.sql` solely for visibility — contains no logic.
  */
object Bridge {
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
  def ofRows(df: DataFrame, plan: LogicalPlan): DataFrame =
    Dataset.ofRows(df.sparkSession.asInstanceOf[ClassicSession], plan)
}
