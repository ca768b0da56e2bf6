package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: for each left row, attach the most recent right row with
  * `right.ts <= left.ts` within the same key group (inner semantics — left
  * rows with no prior right row are dropped; `leftOuter=true` keeps them).
  *
  * Spark has no built-in as-of join. Rather than a per-key
  * join-then-aggregate (quadratic in group size), this uses the
  * union + last_value window formulation: tag both inputs, union them,
  * sort within each key by (ts, tag), and carry the latest right-side
  * values forward with `last_value(ignoreNulls)` over
  * `rowsBetween(unboundedPreceding, currentRow)`.
  *
  * Scale: exactly ONE shuffle (hash by key) + one per-partition sort —
  * the same cost as a sort-merge join, regardless of how many right rows
  * precede each left row. This survives 100 TB where the naive
  * range-join + max_by blows up on dense keys.
  *
  * Ties: at equal ts the right row sorts first (tag 0 < tag 1), so
  * `right.ts == left.ts` matches (>= semantics, like DuckDB ASOF JOIN).
  * Callers should pre-dedupe the right side to one row per (key, ts) to
  * make tie-breaks deterministic.
  */
object AsofJoin {
  def asof(left: DataFrame, right: DataFrame, key: Seq[String], tsCol: String,
           rightValueCols: Seq[String], prefix: String = "asof_",
           leftOuter: Boolean = false): DataFrame = {
    val leftCols = left.columns
    val l = left.withColumn("_tag", lit(1))
    val r = right.select((key.map(col) :+ col(tsCol)) ++ rightValueCols.map(col): _*)
      .withColumn("_tag", lit(0))
    // unionByName with missing columns nulled on each side
    val unioned = l.unionByName(r.select(r.columns.map(col): _*), allowMissingColumns = true)
    val w = Window.partitionBy(key.map(col): _*)
      .orderBy(col(tsCol).asc, col("_tag").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = rightValueCols.foldLeft(unioned) { (df, c) =>
      df.withColumn(prefix + c,
        last(when(col("_tag") === 0, col(c)), ignoreNulls = true).over(w))
    }
    // Dedicated matched flag: a left row that matched a right row whose value
    // columns are ALL NULL is still an inner match (value-NULL ≠ no-match).
      .withColumn("_matched", last(when(col("_tag") === 0, lit(1)), ignoreNulls = true).over(w))
    val matched = if (leftOuter) carried else carried.filter(col("_matched").isNotNull)
    matched.filter(col("_tag") === 1)
      .select(leftCols.map(col) ++ rightValueCols.map(c => col(prefix + c)): _*)
  }
}
