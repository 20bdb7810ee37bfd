package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** SimHash signature of a token array, compiled.
  *
  * Semantically identical to the pure-`functions._` form (for each bit
  * i: fold the per-token 60-bit md5 hashes summing ±1 on bit i; set bit
  * i of the signature iff the vote is positive) — but that form runs
  * `bits` SEPARATE interpreted `aggregate(transform(...))` folds per
  * row; at 60 bits × 5000 docs × ~50 tokens it was 17 s at sf0.1. Here
  * the whole signature is one expression call per row with a compiled
  * inner loop (~0.2 s). CodegenFallback is fine — the per-row cost is
  * the loop, not the call.
  *
  * The token hash reproduces `TextFunctions.md5Long` bit-for-bit: md5
  * of the UTF-8 bytes, first 15 hex chars (= 15 big-endian nibbles)
  * parsed base-16 — the same value DuckDB computes as
  * `('0x' || substr(md5(t),1,15))::BIGINT`, so oracle parity is exact.
  */
case class SimHashLong(child: Expression, bits: Int)
    extends UnaryExpression with UnaryKernel {

  require(bits >= 1 && bits <= 60, "signature width must be 1..60")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${other.simpleString}")
  }

  override def dataType: DataType = LongType

  override def kernel(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val votes = new Array[Int](bits)
    val md = java.security.MessageDigest.getInstance("MD5")
    var t = 0
    val n = arr.numElements()
    while (t < n) {
      val token = arr.getUTF8String(t)
      md.reset()
      val digest = md.digest(token.getBytes)
      // first 15 hex chars = 15 big-endian nibbles of the digest
      var h = 0L
      var k = 0
      while (k < 15) {
        val b = digest(k / 2) & 0xff
        val nibble = if (k % 2 == 0) b >>> 4 else b & 0xf
        h = (h << 4) | nibble
        k += 1
      }
      var i = 0
      while (i < bits) {
        if (((h >>> i) & 1L) == 1L) votes(i) += 1 else votes(i) -= 1
        i += 1
      }
      t += 1
    }
    var sig = 0L
    var i = 0
    while (i < bits) {
      if (votes(i) > 0) sig |= 1L << i
      i += 1
    }
    sig
  }

  override protected def withNewChildInternal(newChild: Expression): SimHashLong =
    copy(child = newChild)

  override def prettyName: String = "simhash_long"
}
