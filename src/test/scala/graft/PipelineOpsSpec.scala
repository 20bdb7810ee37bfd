package graft

import org.apache.spark.sql.functions._
import graft.operators.{DedupOps, SimilarityOps, TextOps, MultimodalOps}

/** Training-data-pipeline operator invariants (TX/D/X/M families). */
class PipelineOpsSpec extends SparkSpec {

  test("TX4 fingerprint: equal token sequences collide, others don't (mod aside)") {
    val fp = TextOps.fingerprint(spark, Sf)
    // texts are all distinct in the harness → fingerprints must be too
    assert(fp.select("fingerprint").distinct().count() === fp.count())
  }

  test("D2 MinHash: candidate pairs verify against exact Jaccard counts") {
    val d = DedupOps.minhashLsh(spark, Sf).cache()
    assert(d.filter(col("inter_cnt") > col("union_cnt")).count() === 0)
    // flag is exactly the integer-Jaccard threshold
    assert(d.filter((col("inter_cnt") * DedupOps.JaccardNum >= col("union_cnt"))
      =!= (col("is_near_dup") === 1)).count() === 0)
    d.unpersist()
  }

  test("D5/X2/X3: ANN neighbors never beat the brute-force best") {
    val brute = SimilarityOps.knnBrute(spark, Sf)
      .filter(col("rank") === 1)
      .select(col("query_id"), col("cos").as("best"))
    val ann = SimilarityOps.annLsh(spark, Sf)
      .join(brute, "query_id")
    assert(ann.filter(col("cos") > col("best") + 1e-12).count() === 0)
    val ivf = SimilarityOps.annIvf(spark, Sf)
      .join(brute, "query_id")
    assert(ivf.filter(col("cos") > col("best") + 1e-12).count() === 0)
  }

  test("X4 multi-probe dominates single-probe LSH per query") {
    val single = SimilarityOps.annLsh(spark, Sf).filter(col("rank") === 1)
      .select(col("query_id"), col("cos").as("single_best"))
    val multi = SimilarityOps.annMultiProbe(spark, Sf).filter(col("rank") === 1)
      .select(col("query_id"), col("cos").as("multi_best"))
    // every single-probe query also has a multi-probe result, never better
    val joined = single.join(multi, Seq("query_id"), "left")
    assert(joined.filter(col("multi_best").isNull ||
      col("multi_best") < col("single_best") - 1e-12).count() === 0)
  }

  test("X1: ranks are dense 1..K and cosines non-increasing per query") {
    val x = SimilarityOps.knnBrute(spark, Sf)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id").orderBy("rank")
    val bad = x.withColumn("prev", lag("cos", 1).over(w))
      .filter(col("prev").isNotNull && col("cos") > col("prev"))
    assert(bad.count() === 0)
    assert(x.groupBy("query_id").count().filter(col("count") =!= SimilarityOps.K)
      .count() === 0)
  }

  test("M4 downsample: payloads cap at maxBytes, stride keeps first byte") {
    val cap = 16
    val ds = MultimodalOps.downsampleBytes(spark, Sf, cap).cache()
    assert(ds.filter(col("new_bytes") > cap).count() === 0)
    assert(ds.filter(col("new_bytes") === 0 && col("orig_bytes") > 0).count() === 0)
    // stride sampling always keeps byte 0 → payload head survives
    val media = MultimodalOps.media(spark, Sf)
      .select(col("media_id"), col("payload").as("orig"))
    val joined = ds.join(media, "media_id")
    assert(joined.filter(substring(col("payload"), 1, 1) =!=
      substring(col("orig"), 1, 1)).count() === 0)
    ds.unpersist()
  }

  test("M3 decode stub: plumbing preserves row count and byte checksums") {
    val feats = MultimodalOps.decodeFeatures(spark, Sf).cache()
    val media = MultimodalOps.media(spark, Sf)
    assert(feats.count() === media.count())
    // checksum recomputed relationally must match the codec's
    val expected = media.select(col("media_id"),
      aggregate(transform(split(col("payload").cast("string"), ""),
          c => ascii(c).cast("long")), lit(0L), (a, b) => a + b).as("exp"))
    val joined = feats.toDF().join(expected, "media_id")
    assert(joined.filter(col("checksum") =!= col("exp")).count() === 0)
    feats.unpersist()
  }
}
