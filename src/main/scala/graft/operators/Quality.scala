package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality checks ("Deequ-lite"): each check contributes a
  * (check, violations, n_rows) report row.
  *
  * Scale shape: every ROW-LEVEL check (null / range / predicate) is one
  * conditional-sum aggregate expression in ONE scan+aggregate of the
  * table, and the single agg row is exploded into report rows — the
  * one-pass property is STRUCTURAL (one scan in the plan), not reliant on
  * optimizer exchange reuse across union branches (the q87 one-pass
  * discipline — at 100 TB, one pass vs one-per-check is the difference
  * between a report and a day). Uniqueness adds one hash aggregate (which
  * carries its own row count — no extra scan); foreign-key checks add one
  * anti-join each plus ONE shared, still-lazy row-count aggregate (all FK
  * branches union before a single crossJoin against it, so the count scan
  * appears exactly once in the plan).
  */
object Quality {

  sealed trait Check { def name: String }
  /** Violations = rows where `col` IS NULL. */
  final case class NotNull(name: String, col: String) extends Check
  /** Violations = rows outside [lo, hi] (NULLs don't count — add NotNull). */
  final case class InRange(name: String, col: String, lo: Double, hi: Double) extends Check
  /** Violations = rows failing an arbitrary row predicate (NULL = fail). */
  final case class Satisfies(name: String, predicate: Column) extends Check
  /** Violations = duplicate rows beyond the first per key. NULL key values
    * form a key group like any other (matching groupBy semantics). */
  final case class Unique(name: String, cols: Seq[String]) extends Check
  /** Violations = rows whose `keyCol` has no match in `dim.dimKey`
    * (NULL keys are not violations — add NotNull for that).
    * `broadcastDim` = false for dimensions too large to broadcast — the
    * anti-join then shuffles both sides and AQE picks the strategy. */
  final case class ForeignKey(name: String, keyCol: String,
                              dim: DataFrame, dimKey: String,
                              broadcastDim: Boolean = true) extends Check

  /** Row-level quarantine: the WRITE-side half of data quality (report
    * tells you the table is 0.3% bad; quarantine routes those rows OUT of
    * the pipeline with machine-readable reasons instead of failing the
    * load). Every row gains `_reasons` — the array of failed row-level
    * check names, in declaration order, empty = clean — and the split is
    * two filters over the same projection: ONE scan, zero shuffles, pure
    * codegen (the reasons array is a `when` per check + a null-filter
    * HOF). Only row-level checks apply (Unique/ForeignKey need global
    * state — they quarantine via an explicit anti-join, not per-row).
    * Returns (clean rows unchanged, quarantined rows + `_reasons`). */
  def quarantine(df: DataFrame, checks: Seq[Check]): (DataFrame, DataFrame) = {
    val rowLevel: Seq[(String, Column)] = checks.collect {
      case NotNull(n, c) => n -> col(c).isNull
      case InRange(n, c, lo, hi) =>
        n -> (col(c).isNotNull && (col(c) < lo || col(c) > hi))
      case Satisfies(n, p) => n -> !coalesce(p, lit(false))
    }
    require(rowLevel.nonEmpty, "Quality.quarantine: needs a row-level check")
    require(rowLevel.size == checks.size,
      "Quality.quarantine: Unique/ForeignKey are not row-local — quarantine them via an anti-join")
    val reasons = filter(array(rowLevel.map { case (n, p) =>
      when(p, lit(n)) }: _*), x => x.isNotNull)
    val marked = df.withColumn("_reasons", reasons)
    (marked.filter(size(col("_reasons")) === 0).drop("_reasons"),
      marked.filter(size(col("_reasons")) > 0))
  }

  /** Referential quarantine — the anti-join half [[quarantine]] refuses
    * (FK validity is not row-local): rows whose `keyCol` has no match in
    * the dimension are routed out, NULL keys pass (q97's FK contract —
    * add NotNull to catch those). One anti join + one semi join against
    * the same (broadcast) key set; at 100 TB the dimension's distinct
    * keys broadcast once and the fact never shuffles. Returns
    * (clean rows unchanged, orphans). */
  def quarantineFk(df: DataFrame, keyCol: String,
                   dim: DataFrame, dimKey: String,
                   broadcastDim: Boolean = true): (DataFrame, DataFrame) = {
    val dimKeys0 = dim.select(col(dimKey).as(keyCol)).distinct()
    val dimKeys = if (broadcastDim) broadcast(dimKeys0) else dimKeys0
    val nonNull = df.filter(col(keyCol).isNotNull)
    val clean = df.filter(col(keyCol).isNull)
      .unionByName(nonNull.join(dimKeys, Seq(keyCol), "left_semi"))
    val orphans = nonNull.join(dimKeys, Seq(keyCol), "left_anti")
    (clean, orphans)
  }

  def report(df: DataFrame, checks: Seq[Check]): DataFrame = {
    require(checks.nonEmpty, "Quality.report: no checks given")
    val rowLevel = checks.collect {
      case NotNull(n, c) => n -> sum(when(col(c).isNull, 1).otherwise(0))
      case InRange(n, c, lo, hi) =>
        n -> sum(when(col(c).isNotNull && (col(c) < lo || col(c) > hi), 1).otherwise(0))
      case Satisfies(n, p) => n -> sum(when(!coalesce(p, lit(false)), 1).otherwise(0))
    }
    val base: Option[DataFrame] =
      if (rowLevel.isEmpty) None
      else Some {
        // coalesce: sum() over an EMPTY table is NULL, and a quality gate
        // reading violations must see 0, not a surprise NULL
        val agg = df.agg(count(lit(1)).as("_n"),
          rowLevel.map { case (n, e) => coalesce(e, lit(0)).cast("long").as(s"_v_$n") }: _*)
        // the ONE agg row exploded into one report row per check: the
        // single-scan property is structural, not a best-effort
        // exchange-reuse across N union branches (which AQE may not honor)
        agg.select(explode(array(rowLevel.map { case (n, _) =>
            struct(lit(n).as("check"), col(s"_v_$n").as("violations")) }: _*)).as("_kv"),
          col("_n").as("n_rows"))
          .select(col("_kv.check").as("check"), col("_kv.violations").as("violations"),
            col("n_rows"))
      }
    val uniques = checks.collect {
      case Unique(n, cols) =>
        // per-key group counts: NULL keys group like values (countDistinct
        // would DROP them and flag every NULL-keyed row as a duplicate);
        // the same aggregate carries the row count — no extra scan
        df.groupBy(cols.map(col): _*).agg(count(lit(1)).as("_c"))
          .agg(coalesce(sum(col("_c") - 1), lit(0)).cast("long").as("violations"),
            coalesce(sum(col("_c")), lit(0)).cast("long").as("n_rows"))
          .select(lit(n).as("check"), col("violations"), col("n_rows"))
    }
    val fks = checks.collect {
      case ForeignKey(n, keyCol, dim, dimKey, bcast) =>
        val dimKeys = dim.select(col(dimKey).as(keyCol)).distinct()
        df.filter(col(keyCol).isNotNull)
          .join(if (bcast) broadcast(dimKeys) else dimKeys, Seq(keyCol), "left_anti")
          .agg(count(lit(1)).cast("long").as("violations"))
          .select(lit(n).as("check"), col("violations"))
    }
    // all FK branches union FIRST, then ONE crossJoin against the 1-row
    // count frame: the count scan appears once in the plan (structural,
    // like the row-level explode above), stays LAZY (no job at report-
    // construction time), and never goes stale relative to the plan's
    // other scans
    val fkRows =
      if (fks.isEmpty) None
      else Some(fks.reduce(_.unionByName(_))
        .crossJoin(broadcast(df.agg(count(lit(1)).as("n_rows")))))
    (base.toSeq ++ uniques ++ fkRows).reduce(_.unionByName(_)).orderBy(col("check"))
  }
}
