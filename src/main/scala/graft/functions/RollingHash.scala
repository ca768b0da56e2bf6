package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Polynomial rolling hash over a string's bytes — the classic document
  * fingerprint (h ← (h·31 + b) mod 1000000007, seeded with the first
  * byte). A native codegen'd `Expression`, so fingerprinting a 100 TB
  * corpus stays inside whole-stage codegen with zero allocation.
  *
  * Cross-engine note: matches DuckDB's
  * `list_reduce(codepoints, (a,b) -> (a*31+b) % 1000000007)` exactly on
  * ASCII text (bytes == code points there); byte-based on purpose so it
  * also applies to `binary` payloads cast to string. Empty/null-safe:
  * empty string hashes to 0.
  */
case class RollingHash(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullSafeEval(input: Any): Any =
    java.lang.Long.valueOf(RollingHash.hash(input.asInstanceOf[UTF8String]))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.RollingHash.hash($c)")
  override protected def withNewChildInternal(newChild: Expression): RollingHash =
    copy(child = newChild)
  override def prettyName: String = "rolling_hash"
}

object RollingHash {
  val Mod = 1000000007L

  def hash(s: UTF8String): Long = {
    val bytes = s.getBytes
    if (bytes.length == 0) return 0L
    var h = (bytes(0) & 0xff).toLong
    var i = 1
    while (i < bytes.length) {
      h = (h * 31L + (bytes(i) & 0xff)) % Mod
      i += 1
    }
    h
  }

  def rollingHash(c: Column): Column = ColumnBridge.column(RollingHash(ColumnBridge.expression(c)))
}
