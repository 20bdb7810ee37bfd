package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Hashed bag-of-words linear score, compiled — the qf-tier inference
  * kernel: `Σ_tokens weights[md5Long(token) % weights.length]`.
  *
  * Semantically identical to the pure-`functions._` form
  * (`aggregate(toks, 0L, (acc, t) => acc + element_at(W, hash(t)+1))`),
  * which QualityFilterSpec keeps as the reference — but higher-order
  * functions are CodegenFallback with an INTERPRETED lambda invocation
  * per element (md5 → conv → cast → element_at as five expression-tree
  * evals per token), the same interpreter tax SimHashLong and the d2
  * trio were built to remove. Here the whole score is one expression
  * call per row with a compiled token loop; the weight table is the
  * second child (an array literal from the driver — a broadcast-sized
  * model, exactly how a real trained weight vector would arrive).
  *
  * The token hash reproduces `TextFunctions.md5Long` bit-for-bit (md5
  * of the UTF-8 bytes, first 15 hex nibbles base-16), so DuckDB oracle
  * parity is exact. Empty token arrays score 0, matching the fold's
  * zero element on both engines.
  */
case class HashedBowScore(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes with CodegenFallback {

  // ImplicitCastInputTypes (not bare ExpectsInputTypes) so a SQL caller
  // writing hashed_bow_score(toks, array(10, -3)) gets the array<int>
  // weight literal coerced to array<bigint> by Catalyst instead of a
  // type-check failure that forces per-element CASTs at the call site
  // (returns Seq[DataType] — covariant with the trait's AbstractDataType,
  // which is private[sql] in Spark 4 and so unnameable here)
  override def inputTypes: Seq[DataType] =
    Seq(ArrayType(StringType), ArrayType(LongType))

  override def dataType: DataType = LongType

  // nullable: beyond null inputs (BinaryExpression's default), a null
  // token element or a null weight slot yields NULL — matching the HOF
  // reference, where md5(NULL) / a null element_at slot poison the
  // fold to NULL. An EMPTY weight table is defined as NULL here (no
  // model, no verdict); the HOF restatement would instead raise
  // ANSI DIVIDE_BY_ZERO on its `% 0` — a crash is the one behavior a
  // SQL-registered function must not have on type-checked input
  override def nullable: Boolean = true

  // one digest per task thread, not per row — the JCA provider lookup
  // is constant overhead on exactly the per-row path this expression
  // exists to strip (thread-local because expression instances can be
  // shared; reset() re-arms it per token)
  @transient private lazy val mdLocal =
    ThreadLocal.withInitial[java.security.MessageDigest](() =>
      java.security.MessageDigest.getInstance("MD5"))

  override def nullSafeEval(tokensAny: Any, weightsAny: Any): Any = {
    val toks = tokensAny.asInstanceOf[ArrayData]
    val weights = weightsAny.asInstanceOf[ArrayData]
    val buckets = weights.numElements()
    if (buckets == 0) return null
    val md = mdLocal.get()
    var sum = 0L
    var t = 0
    val n = toks.numElements()
    while (t < n) {
      if (toks.isNullAt(t)) return null
      md.reset()
      val digest = md.digest(toks.getUTF8String(t).getBytes)
      // first 15 hex chars = 15 big-endian nibbles of the digest
      var h = 0L
      var k = 0
      while (k < 15) {
        val b = digest(k / 2) & 0xff
        h = (h << 4) | (if (k % 2 == 0) b >>> 4 else b & 0xf)
        k += 1
      }
      val idx = (h % buckets).toInt
      if (weights.isNullAt(idx)) return null
      sum += weights.getLong(idx)
      t += 1
    }
    sum
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): HashedBowScore =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "hashed_bow_score"
}
