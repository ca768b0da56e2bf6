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
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def ofRows(df: DataFrame, plan: LogicalPlan): DataFrame =
    Dataset.ofRows(df.sparkSession.asInstanceOf[ClassicSession], plan)

  /** `CatalogV2Util.applySchemaChanges` is `private[sql]`; ALTER TABLE
    * column changes route through it so positions, comments, and column
    * DEFAULT metadata land exactly as the analyzer reads them back. */
  def applySchemaChanges(schema: org.apache.spark.sql.types.StructType,
                         changes: Seq[org.apache.spark.sql.connector.catalog.TableChange])
      : org.apache.spark.sql.types.StructType =
    org.apache.spark.sql.connector.catalog.CatalogV2Util
      .applySchemaChanges(schema, changes,
        // the provider gates Spark's defaultColumn.allowedProviders
        // check — graft tables ARE parquet storage
        Some("parquet"), "ALTER TABLE")
}
