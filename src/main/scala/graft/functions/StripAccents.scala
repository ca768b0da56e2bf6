package graft.functions

import java.text.Normalizer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Accent normalization — the reference's T2 scalar function
  * (`src/kafka_client/transformations.py:44-48`, unidecode applied to 12
  * columns). Re-expressed as a native Catalyst `UnaryExpression` so it stays
  * inside whole-stage codegen (a Scala UDF would break the codegen span and
  * box every row).
  *
  * Semantics: Unicode NFD decomposition, then drop combining marks
  * (`\p{Mn}`) — exact for the reference's French corpus and identical to
  * DuckDB's `strip_accents`, which the oracle uses.
  */
case class StripAccents(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullSafeEval(input: Any): Any =
    UTF8String.fromString(StripAccents.strip(input.asInstanceOf[UTF8String].toString))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.unsafe.types.UTF8String.fromString(" +
        s"graft.functions.StripAccents.strip($c.toString()))")
  override protected def withNewChildInternal(newChild: Expression): StripAccents =
    copy(child = newChild)
  override def prettyName: String = "strip_accents"
}

object StripAccents {
  /** ASCII fast path: most of a 100 TB corpus is unaccented; skip the NFD
    * allocation unless a non-ASCII char is present. */
  def strip(s: String): String = {
    var i = 0
    var ascii = true
    while (ascii && i < s.length) { if (s.charAt(i) >= 0x80) ascii = false; i += 1 }
    if (ascii) s
    else {
      val d = Normalizer.normalize(s, Normalizer.Form.NFD)
      val sb = new java.lang.StringBuilder(d.length)
      var j = 0
      while (j < d.length) {
        val c = d.charAt(j)
        if (Character.getType(c) != Character.NON_SPACING_MARK) sb.append(c)
        j += 1
      }
      sb.toString
    }
  }

  /** Column API: `stripAccents($"name")`. */
  def stripAccents(c: Column): Column = ColumnBridge.column(StripAccents(ColumnBridge.expression(c)))
}
