package graft

import org.apache.spark.sql.functions._
import graft.operators.DedupOps

/** The banding schemes' DETERMINISTIC guarantees (probabilistic recall
  * is measured by x5; these are the cases where the math promises 100%):
  *
  *   - d2: identical shingle sets → identical MinHash signatures → all
  *     four bands collide → the pair IS a candidate. So every
  *     exact-duplicate pair must appear with Jaccard 1.
  *   - d3b: 4 bands × 15 bits over a 60-bit SimHash; hamming ≤ 3 can
  *     touch at most 3 bands, so one band always matches (pigeonhole)
  *     → EXACT recall at the threshold, verified against brute force.
  */
class DedupGuaranteesSpec extends SparkSpec {

  test("d2's bucket join finds EXACTLY the brute-force band-collision pairs") {
    // ground truth: all-pairs over the collected signatures — any of
    // the 4 band values equal ⇒ the pair must be a d2 candidate, and
    // nothing else may be
    GraftExtensions.register(spark)
    val sigRows = spark.sql(
      s"""SELECT doc_id, minhash_sig(hashed_shingle_set(split(text, ' '), 2)) AS mh
         |FROM parquet.`$Sf/documents.parquet`""".stripMargin)
      .collect()
      .filter(!_.isNullAt(1))
      .map(r => (r.getLong(0), r.getSeq[Long](1).toArray))
    val M = graft.functions.TextFunctions.HashMod
    def bands(mh: Array[Long]): Array[Long] =
      Array.tabulate(DedupOps.Bands)(b => mh(2 * b) * M + mh(2 * b + 1))
    val truth = (for {
      i <- sigRows.indices.iterator
      j <- (i + 1) until sigRows.length
      if bands(sigRows(i)._2).zip(bands(sigRows(j)._2)).exists(p => p._1 == p._2)
    } yield {
      val (a, b) = (sigRows(i)._1, sigRows(j)._1)
      if (a < b) (a, b) else (b, a)
    }).toSet
    assert(truth.nonEmpty) // non-vacuous on harness data
    val found = DedupOps.minhashLsh(spark, Sf)
      .select(col("a"), col("b")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(found === truth,
      s"candidate sets diverge: missed=${(truth -- found).take(3)} extra=${(found -- truth).take(3)}")
  }

  test("d3b achieves EXACT recall at hamming <= 3 (pigeonhole), vs brute force") {
    // brute-force ground truth on the collected 60-bit signatures
    GraftExtensions.register(spark)
    val sigRows = spark.sql(
      s"""SELECT doc_id, simhash_long(split(text, ' '), 60) AS sig
         |FROM parquet.`$Sf/documents.parquet`""".stripMargin)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val truth = (for {
      i <- sigRows.indices.iterator
      j <- (i + 1) until sigRows.length
      if java.lang.Long.bitCount(sigRows(i)._2 ^ sigRows(j)._2) <= DedupOps.SimhashMaxHamming
    } yield {
      val (a, b) = (sigRows(i), sigRows(j))
      if (a._1 < b._1) (a._1, b._1) else (b._1, a._1)
    }).toSet
    assert(truth.nonEmpty) // non-vacuous on harness data
    val found = DedupOps.simhashNearDup(spark, Sf)
      .filter(col("is_near_dup") === 1)
      .select(col("a"), col("b")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(truth.subsetOf(found),
      s"pigeonhole violated: ${(truth -- found).take(3)} missed")
    // and no false positives below the threshold flag
    assert(found.subsetOf(truth), "a pair flagged near-dup exceeds the hamming bound")
  }
}
