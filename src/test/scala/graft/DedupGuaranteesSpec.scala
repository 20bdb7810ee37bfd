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

  test("d7 verdict precedence: corpus-dup beats batch-dup beats new") {
    val out = DedupOps.incrementalDedup(spark, Sf).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[String]("head_key"), r.getAs[String]("verdict"))).toMap
    // every verdicted doc is from the incoming batch
    assert(out.keys.forall(_ % DedupOps.IncomingMod == 0))
    // recompute ground truth from the raw table with an independent
    // key derivation (plain Scala string ops, not the Column expr)
    val all = graft.sources.Tables.documents(spark, Sf)
      .select(col("doc_id"), col("text")).collect()
      .map { r =>
        val head = r.getAs[String]("text").split(" ", -1)
          .take(DedupOps.HeadKeyTokens).mkString(" ")
        r.getAs[Long]("doc_id") -> head
      }
    val corpusKeys = all.collect {
      case (id, m) if id % DedupOps.IncomingMod != 0 => m
    }.toSet
    val firstInBatch = all.filter(_._1 % DedupOps.IncomingMod == 0)
      .groupBy(_._2).map { case (m, xs) => m -> xs.map(_._1).min }
    out.foreach { case (id, (_, verdict)) =>
      val m = all.find(_._1 == id).get._2
      val expected =
        if (corpusKeys(m)) "dup_of_corpus"
        else if (firstInBatch(m) != id) "dup_in_batch"
        else "new"
      assert(verdict === expected, s"doc $id")
    }
    // the fixture exercises all three verdicts
    assert(out.values.map(_._2).toSet ===
      Set("new", "dup_in_batch", "dup_of_corpus"))
  }

  test("d8's plan broadcasts the eval shingle set; corpus side never shuffles pre-agg") {
    val plan = DedupOps.decontaminate(spark, Sf)
      .queryExecution.executedPlan.toString()
    assert(plan.contains("BroadcastHashJoin"), s"eval side not broadcast:\n$plan")
    // the corpus leg reaches its per-doc aggregate through exactly one
    // doc_id exchange; the only other hash exchange allowed is the
    // tiny eval-side distinct (and the presentation sort's range
    // exchange, which partitions on doc_id but is not hash)
    val docEx = "Exchange hashpartitioning\\(doc_id".r.findAllIn(plan).length
    assert(docEx === 1, s"corpus side shuffled more than the agg:\n$plan")
  }
}
