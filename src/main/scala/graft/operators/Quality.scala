package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality checks ("Deequ-lite"): each check contributes a
  * (check, violations, n_rows) report row.
  *
  * Scale shape: every ROW-LEVEL check (null / range / predicate) is one
  * conditional-sum aggregate expression, so ALL of them share a SINGLE
  * scan+aggregate of the table (the q87 one-pass discipline — at 100 TB,
  * one pass vs one-per-check is the difference between a report and a
  * day). Uniqueness adds one hash aggregate; a foreign-key check adds one
  * anti-join against the (broadcast when small) dimension's key column.
  */
object Quality {

  sealed trait Check { def name: String }
  /** Violations = rows where `col` IS NULL. */
  final case class NotNull(name: String, col: String) extends Check
  /** Violations = rows outside [lo, hi] (NULLs don't count — add NotNull). */
  final case class InRange(name: String, col: String, lo: Double, hi: Double) extends Check
  /** Violations = rows failing an arbitrary row predicate. */
  final case class Satisfies(name: String, predicate: Column) extends Check
  /** Violations = duplicate rows beyond the first per key = n − n_distinct. */
  final case class Unique(name: String, cols: Seq[String]) extends Check
  /** Violations = rows whose `keyCol` has no match in `dim.dimKey`
    * (NULL keys are not violations — add NotNull for that). */
  final case class ForeignKey(name: String, keyCol: String,
                              dim: DataFrame, dimKey: String) extends Check

  def report(df: DataFrame, checks: Seq[Check]): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val rowLevel = checks.collect {
      case NotNull(n, c) => n -> sum(when(col(c).isNull, 1).otherwise(0))
      case InRange(n, c, lo, hi) =>
        n -> sum(when(col(c).isNotNull && (col(c) < lo || col(c) > hi), 1).otherwise(0))
      case Satisfies(n, p) => n -> sum(when(!coalesce(p, lit(false)), 1).otherwise(0))
    }
    val base: Option[DataFrame] =
      if (rowLevel.isEmpty) None
      else Some {
        val agg = df.agg(count(lit(1)).as("_n"),
          rowLevel.map { case (n, e) => e.cast("long").as(s"_v_$n") }: _*)
        rowLevel.map { case (n, _) =>
          agg.select(lit(n).as("check"), col(s"_v_$n").as("violations"),
            col("_n").as("n_rows"))
        }.reduce(_.unionByName(_))
      }
    val extra = checks.collect {
      case Unique(n, cols) =>
        df.agg(count(lit(1)).as("_n"),
            countDistinct(cols.head, cols.tail: _*).as("_d"))
          .select(lit(n).as("check"), (col("_n") - col("_d")).as("violations"),
            col("_n").as("n_rows"))
      case ForeignKey(n, keyCol, dim, dimKey) =>
        val orphans = df.filter(col(keyCol).isNotNull)
          .join(broadcast(dim.select(col(dimKey).as(keyCol)).distinct()),
            Seq(keyCol), "left_anti")
          .agg(count(lit(1)).cast("long").as("violations"))
        orphans.crossJoin(df.agg(count(lit(1)).as("n_rows")))
          .select(lit(n).as("check"), col("violations"), col("n_rows"))
    }
    (base.toSeq ++ extra).reduce(_.unionByName(_)).orderBy(col("check"))
  }
}
