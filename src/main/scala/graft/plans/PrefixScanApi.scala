package graft.plans

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
import org.apache.spark.sql.catalyst.expressions.AttributeReference
import org.apache.spark.sql.functions.{coalesce, lit}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.LongType

/** Column-API entry for the native prefix-scan operator: appends a long
  * column holding the running sum of `value` in ASCENDING order of the
  * named key columns (which must form a total order). The value
  * expression is projected into the child first, so the logical node only
  * ever carries attribute references — no Column↔Expression conversion
  * edge cases. Requires the session to carry [[graft.GraftExtensions]]
  * (which injects [[PrefixScanStrategy]]); Verify/Bench/spec sessions all
  * do.
  */
object PrefixScan {
  def runningSum(df: DataFrame, orderCols: Seq[String], value: Column,
                 out: String): DataFrame = {
    val tmp = Iterator.from(0).map(i => s"_psval$i")
      .find(n => !df.columns.contains(n)).get
    val withVal = df.withColumn(tmp, coalesce(value.cast("long"), lit(0L)))
    val node = PrefixScanNode(
      orderCols.map(UnresolvedAttribute.quoted),
      UnresolvedAttribute.quoted(tmp),
      AttributeReference(out, LongType, nullable = false)(),
      withVal.queryExecution.analyzed)
    Bridge.ofRows(df, node).drop(tmp)
  }

  /** Global 1-based row rank over a total order (running count of ones). */
  def rank(df: DataFrame, orderCols: Seq[String], out: String): DataFrame =
    runningSum(df, orderCols, lit(1L), out)
}
