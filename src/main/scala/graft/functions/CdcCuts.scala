package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Content-defined chunk boundaries as a native expression: ONE O(n)
  * rolling pass over the string's bytes emits every 1-based position i
  * whose 8-byte window hash (the q55 polynomial, h·31+b mod 1e9+7)
  * satisfies h ≡ 0 (mod 64) — an expected chunk length of 64 bytes. The
  * roll drops the leading byte with a precomputed 31⁷ and appends the
  * trailing one, so cost is ~4 integer ops per byte; the HOF spelling
  * this replaces re-hashed all 8 bytes per position through interpreted
  * md5 (measured 50 s → 1.5 s on the 10× corpus for q300). Boundaries
  * depend only on the window's own bytes — the FastCDC property that an
  * edit shifts no boundary outside its own chunk (pinned by a property
  * test). Oracle-expressible: the same polynomial per position in SQL.
  */
case class CdcCuts(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(input: Any): Any =
    CdcCuts.cuts(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.CdcCuts.cuts($c)")
  override protected def withNewChildInternal(newChild: Expression): CdcCuts =
    copy(child = newChild)
  override def prettyName: String = "cdc_cuts"
}

object CdcCuts {
  val Mod = 1000000007L
  val Window = 8
  val Mask = 64L
  /** 31^(Window-1) mod Mod — the drop-leading-byte multiplier. */
  val Pow: Long = {
    var p = 1L
    (1 until Window).foreach(_ => p = p * 31L % Mod)
    p
  }

  def cuts(s: UTF8String): GenericArrayData = {
    val b = s.getBytes
    val n = b.length
    if (n < Window) return new GenericArrayData(Array.empty[Long])
    var out = new Array[Long](8)
    var m = 0
    var h = 0L
    var i = 0
    while (i < Window) { h = (h * 31L + (b(i) & 0xff)) % Mod; i += 1 }
    var pos = 1 // 1-based start of the current window
    while ({
      if (h % Mask == 0) {
        if (m == out.length) out = java.util.Arrays.copyOf(out, m * 2)
        out(m) = pos.toLong
        m += 1
      }
      pos + Window - 1 < n
    }) {
      h = (h - (b(pos - 1) & 0xff) * Pow) % Mod
      if (h < 0) h += Mod
      h = (h * 31L + (b(pos + Window - 1) & 0xff)) % Mod
      pos += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(out, m))
  }

  def cdcCuts(c: Column): Column =
    ColumnBridge.column(CdcCuts(ColumnBridge.expression(c)))
}
