package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, ByteType, DataType, IntegerType, LongType, NullType, ShortType, StringType}

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
    extends BinaryExpression with BinaryKernel {

  // NO implicit input coercion: under a non-ANSI session the legacy
  // coercion rules would silently narrow array<double> or parse-cast
  // array<string> weight tables to array<bigint> (truncating/nulling a
  // model) where this check fails loudly in EVERY session mode.
  // Integral widening — the one safe coercion a SQL caller actually
  // wants (hashed_bow_score(toks, array(10, -3)) is array<int>) — is
  // handled natively by the element reader instead of a cast.
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(_: StringType, _),
            ArrayType(ByteType | ShortType | IntegerType | LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      // a bare untyped empty/all-null literal (`array()` is
      // array<null>) stays legal as the degenerate no-model table: the
      // documented empty ⇒ NULL / null-slot ⇒ NULL semantics apply
      // before any weight is ever read, so no coercion is needed
      case (ArrayType(_: StringType, _), ArrayType(NullType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        "hashed_bow_score requires (array<string> tokens, array<integral> " +
          s"weights); got ($l, $r) — fractional or string weight tables " +
          "must be cast explicitly (a silent narrowing would corrupt the model)")
    }

  // the width-specific weight reader, resolved once per element type
  @transient private lazy val readWeight: (ArrayData, Int) => Long =
    right.dataType.asInstanceOf[ArrayType].elementType match {
      case LongType    => (a, i) => a.getLong(i)
      case IntegerType => (a, i) => a.getInt(i).toLong
      case ShortType   => (a, i) => a.getShort(i).toLong
      case ByteType    => (a, i) => a.getByte(i).toLong
      case other => throw new IllegalStateException(
        s"unreachable after checkInputDataTypes: $other")
    }

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

  override def kernel(tokensAny: Any, weightsAny: Any): Any = {
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
      sum += readWeight(weights, idx)
      t += 1
    }
    sum
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): HashedBowScore =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "hashed_bow_score"
}
