package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodeGenerator, CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._

/** Codegen bridge for the compiled per-row kernels.
  *
  * The kernels (shingle hashing, minhash, simhash, token counting, …)
  * were written as `CodegenFallback` expressions: the per-row work is a
  * hand-compiled while-loop, so the interpreted expression-tree
  * dispatch per ROW costs almost nothing. What the trait marker DOES
  * cost is the enclosing operator's whole-stage codegen:
  * `CollapseCodegenStages.supportCodegen` rejects any operator whose
  * expression tree contains a `CodegenFallback`, so every Project /
  * Generate / Filter evaluating one of these kernels fell out of the
  * fused WSCG pipeline into row-at-a-time iterator mode — an extra
  * virtual-iterator hop and InternalRow materialization around exactly
  * the hottest scan stages (postings builds, signature passes).
  *
  * These traits emit the SAME per-row call CodegenFallback would (a
  * plan-bound reference invoking the kernel), minus the trait marker:
  * the operator stays inside WholeStageCodegen and the kernel runs as
  * one direct method call per row. Null discipline is preserved
  * exactly: null input → null output (the UnaryExpression/
  * BinaryExpression eval contract), and a kernel returning null (empty
  * minhash input, sub-k token arrays, …) sets the output null flag —
  * the same observable semantics as the interpreted path, which
  * remains live via `nullSafeEval` for non-codegen contexts. */
trait UnaryKernel extends UnaryExpression {

  /** The compiled per-row kernel — the former `nullSafeEval` body.
    * Public so generated code can invoke it directly. */
  def kernel(input: Any): Any

  override def nullSafeEval(input: Any): Any = kernel(input)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("kernelExpr", this, this.getClass.getName)
    val childGen = child.genCode(ctx)
    val obj = ctx.freshName("kernelRes")
    val javaType = CodeGenerator.javaType(dataType)
    val boxed = CodeGenerator.boxedType(dataType)
    ev.copy(code =
      code"""
        ${childGen.code}
        Object $obj = null;
        if (!${childGen.isNull}) {
          $obj = $ref.kernel(${childGen.value});
        }
        boolean ${ev.isNull} = ($obj == null);
        $javaType ${ev.value} = ${CodeGenerator.defaultValue(dataType)};
        if (!${ev.isNull}) {
          ${ev.value} = ($boxed) $obj;
        }""")
  }
}

/** Binary sibling of [[UnaryKernel]] — same contract, two children. */
trait BinaryKernel extends BinaryExpression {

  def kernel(a: Any, b: Any): Any

  override def nullSafeEval(a: Any, b: Any): Any = kernel(a, b)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("kernelExpr", this, this.getClass.getName)
    val leftGen = left.genCode(ctx)
    val rightGen = right.genCode(ctx)
    val obj = ctx.freshName("kernelRes")
    val javaType = CodeGenerator.javaType(dataType)
    val boxed = CodeGenerator.boxedType(dataType)
    ev.copy(code =
      code"""
        ${leftGen.code}
        ${rightGen.code}
        Object $obj = null;
        if (!${leftGen.isNull} && !${rightGen.isNull}) {
          $obj = $ref.kernel(${leftGen.value}, ${rightGen.value});
        }
        boolean ${ev.isNull} = ($obj == null);
        $javaType ${ev.value} = ${CodeGenerator.defaultValue(dataType)};
        if (!${ev.isNull}) {
          ${ev.value} = ($boxed) $obj;
        }""")
  }
}
