package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Spark 4 removed the public `new Column(Expression)` constructor; the
  * replacement `classic.ExpressionUtils` is `private[sql]`. This bridge
  * lives inside the `org.apache.spark.sql` namespace solely to expose
  * Expression↔Column conversion to graft's custom Catalyst expressions.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Per-conjunct (column, lo, hi) bounds implied by a Column predicate,
    * walked over the sql-api ColumnNode tree (Spark 4 Columns wrap
    * `private[sql]` ColumnNodes, not catalyst expressions — hence this
    * bridge). Conjunctions recurse; simple `<col> <op> <numeric literal>`
    * comparisons yield bounds; anything else yields none, so consumers
    * (ManifestTable.updateWhere's touch set) stay conservative. Strict
    * ops widen to closed bounds — conservative in the only direction
    * that matters. */
  def predicateIntervals(c: Column): Seq[(String, Double, Double)] =
    nodeBounds(c.node)

  private def nodeBounds(n: org.apache.spark.sql.internal.ColumnNode)
      : Seq[(String, Double, Double)] = {
    import org.apache.spark.sql.internal.{ColumnNode, UnresolvedAttribute => UA, UnresolvedFunction => UF, Literal => NL}
    def num(l: NL): Option[Double] = l.value match {
      case x: java.lang.Number => Some(x.doubleValue())
      // temporal literals map onto the SAME number line the manifest's
      // footer stats use: INT32 dates are epoch days, INT64 timestamps
      // are micros (UTC-adjusted for TimestampType, wall-clock for NTZ —
      // LocalDateTime.toInstant(UTC) reproduces exactly that). Epoch
      // micros stay under 2^53, so the double is exact — a rounded bound
      // here would mis-partition a touch set and lose data.
      case d: java.sql.Date       => Some(d.toLocalDate.toEpochDay.toDouble)
      case d: java.time.LocalDate => Some(d.toEpochDay.toDouble)
      case t: java.sql.Timestamp =>
        val i = t.toInstant
        Some(i.getEpochSecond * 1e6 + i.getNano / 1000.0)
      case i: java.time.Instant =>
        Some(i.getEpochSecond * 1e6 + i.getNano / 1000.0)
      case dt: java.time.LocalDateTime =>
        val i = dt.toInstant(java.time.ZoneOffset.UTC)
        Some(i.getEpochSecond * 1e6 + i.getNano / 1000.0)
      case _ => None // strings — off the stats number line
    }
    def attr(x: ColumnNode): Option[String] = x match {
      case a: UA => a.nameParts.lastOption
      case _ => None
    }
    def one(op: String, c0: String, v: Double, flipped: Boolean)
        : Seq[(String, Double, Double)] = op match {
      case ">=" | ">" =>
        if (flipped) Seq((c0, Double.NegativeInfinity, v))
        else Seq((c0, v, Double.PositiveInfinity))
      case "<=" | "<" =>
        if (flipped) Seq((c0, v, Double.PositiveInfinity))
        else Seq((c0, Double.NegativeInfinity, v))
      case "=" | "==" | "<=>" => Seq((c0, v, v))
      case _ => Seq.empty
    }
    n match {
      case f: UF if f.functionName == "and" => f.arguments.flatMap(nodeBounds)
      case f: UF => f.arguments match {
        case Seq(a, l: NL) =>
          (for (c0 <- attr(a); v <- num(l))
            yield one(f.functionName, c0, v, flipped = false)).getOrElse(Seq.empty)
        case Seq(l: NL, a) =>
          (for (c0 <- attr(a); v <- num(l))
            yield one(f.functionName, c0, v, flipped = true)).getOrElse(Seq.empty)
        case _ => Seq.empty
      }
      case _ => Seq.empty
    }
  }
}
