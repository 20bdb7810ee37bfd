package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native dot product over two `array<float>` columns, in double.
  *
  * The one place built-ins genuinely can't express the semantics
  * efficiently: `aggregate(zip_with(a, b, _*_), 0d, _+_)` is correct but
  * higher-order functions are `CodegenFallback` — every element pays an
  * interpreted lambda call plus an intermediate array allocation per row,
  * which dominates the pairwise similarity operators (D5/X1/X2: one dot
  * per candidate PAIR, ~128 multiply-adds each). This expression
  * generates a tight primitive loop inside whole-stage codegen instead.
  *
  * Determinism contract (same as `VectorFunctions.dotD`, which this
  * replaces): strict LEFT-TO-RIGHT accumulation, each float widened to
  * double before the multiply — bit-identical to the DuckDB oracle's
  * `list_reduce` fold and invariant to partitioning, so results can sit
  * in hash-compared output. Arrays are expected dense (no null
  * elements — embedding vectors); a null ARRAY on either side yields
  * null. Mismatched lengths dot the common prefix (`zip_with` would pad
  * with null products and poison the sum; neither occurs in practice).
  */
case class FloatVecDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(FloatType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<float> inputs, got " +
        s"${left.dataType.simpleString} / ${right.dataType.simpleString}")
  }

  override def dataType: DataType = DoubleType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += x.getFloat(i).toDouble * y.getFloat(i).toDouble
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |final int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += (double) $a.getFloat($i) * (double) $b.getFloat($i);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): FloatVecDot =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "float_vec_dot"
}
