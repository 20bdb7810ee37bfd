package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, BinaryType, ByteType, DataType, IntegerType, LongType, ShortType}

/** Column helpers for the packed-SQ8 serving tier (x23/x24). */
object Sq8Expressions {

  /** Pack an `array<int>` of 0..255 SQ8 codes into ONE BinaryType value
    * (1 byte/dim — the at-rest Faiss `SQ8` code layout). */
  def packCodes(codes: Column): Column =
    GraftSqlBridge.column(PackCodes(GraftSqlBridge.expression(codes)))

  /** Symmetric-distance-computation fold over two packed code arrays:
    * `Σ_d (a_d − b_d)²` in unsigned-byte integer arithmetic. */
  def sq8SdcDist(a: Column, b: Column): Column =
    GraftSqlBridge.column(Sq8SdcDist(
      GraftSqlBridge.expression(a), GraftSqlBridge.expression(b)))
}

/** `array<integral>` of SQ8 codes → BinaryType, one byte per element
  * (`code & 0xFF` — callers guarantee 0..255, the quantizer's clamped
  * range, so the truncation is the identity).
  *
  * Why: the exploded (vec_id, d, code) frame x22 serves from is a
  * dims× (≈128×) row inflation of the 1-byte/dim at-rest codes table.
  * Packing restores the at-rest shape: one row per vector, dims bytes,
  * scanned and folded without any per-dim join key. A null element
  * poisons the pack to NULL (the HashedBowScore null discipline —
  * type-checked SQL input never throws).
  *
  * Codegen via [[UnaryKernel]]: the pack runs ONCE per vector at
  * index-build time, but the trait keeps the build stage's Project
  * inside whole-stage codegen (a CodegenFallback marker would evict
  * it); [[Sq8SdcDist]] on the per-pair serve path generates its loop
  * inline. */
case class PackCodes(child: Expression) extends UnaryExpression
    with UnaryKernel {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(ByteType | ShortType | IntegerType | LongType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<integral>, got ${other.simpleString}")
  }

  override def dataType: DataType = BinaryType

  override def nullable: Boolean = true

  @transient private lazy val readCode: (ArrayData, Int) => Long =
    child.dataType.asInstanceOf[ArrayType].elementType match {
      case LongType    => (a, i) => a.getLong(i)
      case IntegerType => (a, i) => a.getInt(i).toLong
      case ShortType   => (a, i) => a.getShort(i).toLong
      case ByteType    => (a, i) => a.getByte(i).toLong
      case other => throw new IllegalStateException(
        s"unreachable after checkInputDataTypes: $other")
    }

  override def kernel(input: Any): Any = {
    val a = input.asInstanceOf[ArrayData]
    val n = a.numElements()
    val out = new Array[Byte](n)
    var i = 0
    while (i < n) {
      if (a.isNullAt(i)) return null
      out(i) = (readCode(a, i) & 0xffL).toByte
      i += 1
    }
    out
  }

  override protected def withNewChildInternal(newChild: Expression): PackCodes =
    copy(child = newChild)

  override def prettyName: String = "pack_codes"
}

/** Squared SQ8 code-space distance over two PACKED code arrays —
  * `Σ_d (a_d − b_d)²` with each byte read UNSIGNED (codes are 0..255),
  * accumulated in long: exact integer arithmetic, so the ranking is
  * bit-stable under any partitioning or engine (x22's determinism
  * contract carried to the packed form).
  *
  * This is the serving-scale kernel x22's scaladoc promises: the
  * FloatVecDot pattern applied to the 1-byte/dim at-rest codes — a
  * tight primitive loop inside whole-stage codegen, vs the exploded
  * relational form's 128× row inflation + per-dim shuffle key. The
  * classic 256×256 LUT adds nothing for squared distance on a modern
  * core (the subtract-multiply IS one cycle); a trained nonuniform
  * quantizer would swap the multiply for the table read here.
  * Mismatched lengths fold the common prefix (FloatVecDot's rule;
  * never occurs — one quantizer emits all codes). Null on either side
  * yields null. */
case class Sq8SdcDist(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == BinaryType && right.dataType == BinaryType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two binary inputs, got " +
        s"${left.dataType.simpleString} / ${right.dataType.simpleString}")

  override def dataType: DataType = LongType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[Array[Byte]]
    val y = b.asInstanceOf[Array[Byte]]
    val n = math.min(x.length, y.length)
    var acc = 0L
    var i = 0
    while (i < n) {
      val d = (x(i) & 0xff) - (y(i) & 0xff)
      acc += (d * d).toLong
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val d = ctx.freshName("d")
      val acc = ctx.freshName("acc")
      s"""
         |final int $n = java.lang.Math.min($a.length, $b.length);
         |long $acc = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  final int $d = ($a[$i] & 0xff) - ($b[$i] & 0xff);
         |  $acc += (long) ($d * $d);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Sq8SdcDist =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "sq8_sdc_dist"
}
