package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Column builders shared by the text-analysis / dedup operator families
  * (TextOps, DedupOps, SimilarityOps) and mirrored 1:1 by DuckDB SQL
  * fragments so the driver's hash-compare is byte-stable.
  *
  * Hashing contract: every hash is `md5 → first 15 hex chars → long`
  * (60 bits, non-negative — fits a signed 64-bit cast on both engines),
  * optionally reduced mod [[HashMod]]. md5 is bit-identical across
  * engines, unlike Spark's murmur3 `hash()` which DuckDB cannot
  * reproduce. All arithmetic stays in non-negative BIGINT range so
  * Spark's silent wrap and DuckDB's checked overflow never diverge:
  * values are < 2^31 after the mod, multipliers are ≤ 2^10, so every
  * intermediate is < 2^42.
  *
  * Everything here is a pure `org.apache.spark.sql.functions` column
  * expression — codegen'd, no UDFs, stays inside whole-stage codegen.
  */
object TextFunctions {

  /** Modulus for all rolling/band hashes (largest prime < 2^30 ·…; the
    * classic 1e9+7 — keeps products with multipliers ≤ 1024 far below
    * 2^63 on both engines). */
  val HashMod: Long = 1000000007L

  /** Whitespace tokens. Texts are single-space separated; a literal-space
    * split behaves identically in Spark (`split`, regex " ") and DuckDB
    * (`string_split(text, ' ')`), including empty-string runs. */
  def tokens(text: Column): Column = split(text, " ")

  /** SQL fragment twin of [[tokens]]. */
  def tokensSql(text: String): String = s"string_split($text, ' ')"

  /** md5-based 60-bit hash of a string column.
    * Oracle: `CAST(('0x' || substr(md5(x),1,15)) AS BIGINT)`. */
  def md5Long(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  def md5LongSql(x: String): String =
    s"CAST(('0x' || substr(md5($x),1,15)) AS BIGINT)"

  /** [[md5Long]] reduced mod [[HashMod]] — the per-token / per-shingle
    * hash used by fingerprints, simhash and minhash. */
  def tokHash(c: Column): Column = md5Long(c) % HashMod

  def tokHashSql(x: String): String = s"(${md5LongSql(x)} % $HashMod)"

  /** Word k-grams ("shingles") of a token array, k fixed at call site.
    *
    * HOT-PATH WARNING: the lambda reads `element_at(toks, i)`, so if
    * `toks` is a projected `split(...)`, `CollapseProject` inlines the
    * split into the lambda body and the text is re-split PER ELEMENT —
    * O(tokens²) per row. Operators must use the compiled
    * [[graft.functions.HashedShingleSet]] instead; this form remains as
    * the spec-side reference implementation only.
    *
    * Spark arrays are 0-indexed; the DuckDB twin is 1-indexed — both
    * yield `size - k + 1` shingles joined with single spaces. Fewer
    * than k tokens → empty array on BOTH engines (DuckDB's
    * `generate_series(1, len-1)` is naturally empty there; Spark's
    * `sequence(0, size-k)` would instead count DOWN through negative
    * indices and crash on `element_at(toks, 0)`, so it needs the
    * guard). */
  def shingles(toks: Column, k: Int): Column =
    when(size(toks) >= k,
      transform(
        sequence(lit(0), size(toks) - k),
        i => concat_ws(" ", (0 until k).map(d => element_at(toks, i + d + 1)): _*)))
      .otherwise(array().cast("array<string>"))

  def shinglesSql(toks: String, k: Int): String = {
    val parts = (0 until k).map(d => s"$toks[i + $d]").mkString(" || ' ' || ")
    s"list_transform(generate_series(1, len($toks) - ${k - 1}), i -> $parts)"
  }
}
