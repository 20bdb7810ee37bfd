package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over `array<float>` embedding columns, as pure
  * higher-order-function column expressions (codegen'd, no UDFs).
  *
  * Determinism contract with the DuckDB oracle: every reduction is an
  * explicit LEFT-TO-RIGHT fold over per-element products, with floats
  * cast to double BEFORE multiplying. IEEE-754 double ops are exact per
  * operation, so an identical fold order yields bit-identical doubles on
  * both engines — `cosine` values can therefore appear in hash-compared
  * output directly. (Engine-internal `list_cosine_similarity` /
  * SIMD-reordered sums would NOT give that guarantee.)
  */
object VectorFunctions {

  /** Left-to-right dot product of two float-array columns, in double —
    * the native codegen'd [[FloatVecDot]]. (The pure-`functions._` form,
    * `aggregate(zip_with(a, b, _*_), 0d, _+_)`, computes the identical
    * fold but higher-order functions are CodegenFallback: an interpreted
    * lambda per element plus an intermediate array per row, which
    * dominated the pairwise similarity operators.) */
  def dotD(a: Column, b: Column): Column = {
    import org.apache.spark.sql.GraftSqlBridge
    GraftSqlBridge.column(FloatVecDot(
      GraftSqlBridge.expression(a), GraftSqlBridge.expression(b)))
  }

  /** Cosine similarity with per-row norms (inputs need not be unit). */
  def cosine(a: Column, b: Column): Column =
    dotD(a, b) / (sqrt(dotD(a, a)) * sqrt(dotD(b, b)))

  /** DuckDB twin of [[dotD]]: `list_reduce` seeded by the first element
    * equals a 0.0-seeded fold for addition. */
  def dotDSql(a: String, b: String): String =
    s"""list_reduce(list_transform(list_zip($a, $b),
       |  s -> CAST(s[1] AS DOUBLE) * CAST(s[2] AS DOUBLE)), (acc, v) -> acc + v)""".stripMargin

  def cosineSql(a: String, b: String): String =
    s"(${dotDSql(a, b)} / (sqrt(${dotDSql(a, a)}) * sqrt(${dotDSql(b, b)})))"

  /** Sign-LSH bucket from the first `bits` dimensions: bit i set iff
    * `v[i] > 0`. A deterministic stand-in for random-hyperplane LSH —
    * on whitened/near-isotropic embeddings the coordinate hyperplanes
    * ARE random hyperplanes; production would rotate by a seeded random
    * matrix first (same plan shape, one extra matmul per row). */
  def signBucket(v: Column, bits: Int): Column =
    (0 until bits)
      .map(i => when(element_at(v, i + 1) > 0f, lit(1 << i)).otherwise(lit(0)))
      .reduce(_ + _)

  def signBucketSql(v: String, bits: Int): String =
    (0 until bits)
      .map(i => s"CASE WHEN $v[${i + 1}] > 0 THEN ${1 << i} ELSE 0 END")
      .mkString("(", " + ", ")")
}
