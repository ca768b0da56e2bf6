package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Native dot product over two `array<double>` columns.
  *
  * The higher-order-function formulation (`aggregate(zip_with(a, b, _*_),
  * 0.0, _+_)`) allocates an intermediate array and evaluates its lambdas
  * interpreted, outside whole-stage codegen — measured ~20× slower per pair
  * on dim-64 vectors. This expression compiles to a bare primitive loop over
  * the two `ArrayData` buffers (no allocation, stays in the codegen span),
  * and its summation order (left fold) is identical to the HOF version, so
  * results are bit-for-bit unchanged.
  *
  * Contract: both inputs are `array<double>` with non-null elements (cast
  * upstream; embedding vectors are dense). Extra trailing elements on the
  * longer side are ignored (min-length semantics, same as `zip_with`'s
  * null-padding folded through `+` would NOT be — callers use equal-length
  * vectors).
  */
case class DotProduct(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) { s += x.getDouble(i) * y.getDouble(i); i += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("sum")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += $a.getDouble($i) * $b.getDouble($i);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "dot_product"
}

object DotProduct {
  /** Column API: `dotProduct(a, b)` — inputs must already be array<double>. */
  def dotProduct(a: Column, b: Column): Column =
    ColumnBridge.column(DotProduct(ColumnBridge.expression(a), ColumnBridge.expression(b)))
}

/** Native unit-norm int8 quantization of an `array<double>` vector:
  * `round(x / ‖v‖₂ * 127)` per element, in ONE pass over the buffer.
  *
  * Replaces the HOF spelling `transform(v, x -> round(x / l2Norm(v) *
  * 127).cast("int"))`, which (a) re-evaluates interpreted lambdas per
  * element and (b) needs a second full pass for the norm — profiled at
  * ~1.2 s/pass over the 10× corpus, the single hottest map step in the
  * ANN family (q86/q91/q99/q121/q258/q308/q314/q317 all quantize first).
  *
  * Bit-parity with the HOF version is load-bearing (every consumer is
  * oracle-hash-checked): the norm is the same left-fold Σx² as
  * [[DotProduct]] + `sqrt`; rounding mirrors Spark's `Round` on doubles
  * exactly — `BigDecimal.valueOf` (Double.toString repr) with HALF_UP,
  * NaN/Inf truncated via `toInt` like a non-ANSI int cast. One
  * deliberate divergence: a zero vector quantizes to all zeros, where
  * the ANSI-mode HOF chain would throw DIVIDE_BY_ZERO — an operator
  * shouldn't fail a 100 TB job on one degenerate row (none exist in
  * this corpus; q195's norm screen is the audit).
  *
  * Contract: input is `array<double>` with non-null elements (cast
  * upstream; embedding vectors are dense).
  */
case class QuantizeInt8(child: Expression) extends
    org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(
      org.apache.spark.sql.types.IntegerType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    QuantizeInt8.quantize(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.QuantizeInt8.quantize($c)")

  override protected def withNewChildInternal(newChild: Expression): QuantizeInt8 =
    copy(child = newChild)
  override def prettyName: String = "quantize_int8"
}

object QuantizeInt8 {
  def quantize(v: ArrayData): ArrayData = {
    val n = v.numElements()
    var ss = 0.0
    var i = 0
    while (i < n) { val x = v.getDouble(i); ss += x * x; i += 1 }
    val nrm = java.lang.Math.sqrt(ss)
    val out = new Array[Int](n)
    i = 0
    while (i < n) {
      val q = v.getDouble(i) / nrm * 127.0
      out(i) =
        if (java.lang.Double.isNaN(q) || java.lang.Double.isInfinite(q)) q.toInt
        else java.math.BigDecimal.valueOf(q)
          .setScale(0, java.math.RoundingMode.HALF_UP).doubleValue().toInt
      i += 1
    }
    // Unsafe primitive encoding, NOT GenericArrayData: the quantized
    // array is re-read per candidate PAIR by the ANN join stages, and a
    // boxed Integer[] there measured 1.5-2.5× slower end-to-end
    // (q314/q91/q99) than the HOF chain's unsafe output it replaced
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
      .fromPrimitiveArray(out)
  }

  /** Column API: input must already be array<double>. */
  def quantizeInt8(v: Column): Column =
    ColumnBridge.column(QuantizeInt8(ColumnBridge.expression(v)))
}
