package graft

import org.apache.spark.sql.functions._
import graft.operators.{DedupOps, TextOps}
import graft.sources.Tables

/** The point of the training-data block: the operators COMPOSE into a
  * corpus-curation pipeline. documents → near-dup clusters → keepers →
  * quality filter → stratified sample, each stage narrowing the set,
  * with the invariants a curation run must guarantee. */
class TrainingPipelineE2ESpec extends SparkSpec {

  test("dedup → cluster → keep → quality → sample composes and narrows monotonically") {
    val docs = Tables.documents(spark, Sf)
    val total = docs.count()

    // stage 1: near-dup clusters → canonical keepers
    val clusters = DedupOps.dedupClusters(spark, Sf).cache()
    assert(clusters.count() === total) // every doc is assigned
    val keepers = clusters.filter(col("is_keeper") === 1)
    val nKeep = keepers.count()
    assert(nKeep > 0 && nKeep <= total)
    // exactly one keeper per cluster, and it IS the cluster id
    assert(clusters.select("cluster_id").distinct().count() === nKeep)
    assert(keepers.filter(col("doc_id") =!= col("cluster_id")).count() === 0)
    // exact duplicates can never both be kept: same text → same shingle
    // set → same band signatures → near-dup pair → same cluster
    val keptDocs = docs.join(keepers.select("doc_id"), "doc_id").cache()
    val dupTexts = keptDocs.groupBy(md5(col("text"))).count()
      .filter(col("count") > 1).count()
    assert(dupTexts === 0)

    // stage 2: quality filter on the surviving docs
    val quality = TextOps.quality(spark, Sf).select(col("doc_id"), col("quality_bucket"))
    val good = keptDocs.join(quality, "doc_id")
      .filter(col("quality_bucket") === "ok")
    val nGood = good.count()
    assert(nGood > 0 && nGood <= nKeep)

    // stage 3: deterministic stratified sample of the survivors
    val sampled = good.join(
      TextOps.stratifiedSample(spark, Sf).select("doc_id"), "doc_id")
    val nSampled = sampled.count()
    assert(nSampled > 0 && nSampled <= nGood)
    // determinism: the same composition yields the same set
    val again = good.join(
      TextOps.stratifiedSample(spark, Sf).select("doc_id"), "doc_id")
    assert(sampled.select("doc_id").exceptAll(again.select("doc_id")).count() === 0)
    assert(again.select("doc_id").exceptAll(sampled.select("doc_id")).count() === 0)

    clusters.unpersist(); keptDocs.unpersist()
  }
}
