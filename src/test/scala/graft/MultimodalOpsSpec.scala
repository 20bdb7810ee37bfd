package graft

import org.apache.spark.sql.functions._
import graft.operators.MultimodalOps
import graft.operators.MultimodalOps.{MediaCodec, MediaFeature}

/** The multimodal plumbing contracts the oracle can't check: the codec
  * interface shape, per-partition decode execution, the byte-level
  * downsample cap, and resize aspect-fit invariants. */
class MultimodalOpsSpec extends SparkSpec {

  test("StubCodec: deterministic checksum/feature from raw bytes") {
    val f = MultimodalOps.StubCodec.decode(7L, "image", Array[Byte](1, 2, 3, -1))
    assert(f.media_id === 7L)
    assert(f.n_bytes === 4)
    assert(f.checksum === 1 + 2 + 3 + 255)
    assert(f.feature.toSeq === Seq(1 / 256.0f, 2 / 256.0f, 3 / 256.0f, 255 / 256.0f))
    // decode twice → identical (the determinism the oracle compare rests on)
    assert(MultimodalOps.StubCodec.decode(7L, "image", Array[Byte](1, 2, 3, -1))
      .checksum === f.checksum)
  }

  test("decodeFeatures: a swapped-in codec runs once per row, partition-parallel") {
    // a codec that tags output with its partition's identity proves the
    // mapPartitions shape: one codec instance serving many rows
    val counting = new MediaCodec {
      @transient lazy val instanceTag = System.identityHashCode(this).toLong
      def decode(id: Long, kind: String, payload: Array[Byte]): MediaFeature =
        MediaFeature(id, kind, payload.length, instanceTag, Array.empty)
    }
    val out = MultimodalOps.decodeFeatures(spark, Sf, counting)
    val n = graft.sources.Tables.events(spark, Sf).count()
    assert(out.count() === n) // one feature row per media row
    // every row decoded (payload lengths all positive)
    assert(out.filter(col("n_bytes") <= 0).count() === 0)
  }

  test("downsampleBytes: caps payloads, keeps every stride-th byte, small ones intact") {
    val capped = MultimodalOps.downsampleBytes(spark, Sf, maxBytes = 4)
    // cap honored everywhere
    assert(capped.filter(col("new_bytes") > 4).count() === 0)
    // nothing dropped below the cap when the original already fits
    assert(capped.filter(col("orig_bytes") <= 4 &&
      col("new_bytes") =!= col("orig_bytes")).count() === 0)
    // stride semantics: first byte always kept
    val row = capped.head()
    val orig = graft.sources.Tables.events(spark, Sf)
      .select(encode(col("props"), "UTF-8").as("p"), col("event_id"))
      .filter(col("event_id") === row.getAs[Long]("media_id"))
      .head().getAs[Array[Byte]]("p")
    assert(row.getAs[Array[Byte]]("payload").head === orig.head)
  }

  test("resizePlan: aspect-fit — longest edge capped at FitEdge, small images untouched") {
    val plan = MultimodalOps.resizePlan(spark, Sf).cache()
    val E = MultimodalOps.FitEdge
    assert(plan.filter(col("target_w") > E || col("target_h") > E).count() === 0)
    assert(plan.filter(col("width") <= E && col("height") <= E &&
      (col("target_w") =!= col("width") || col("target_h") =!= col("height")))
      .count() === 0)
    // downscale preserves which edge is longest
    assert(plan.filter(col("width") > col("height") &&
      col("target_w") < col("target_h")).count() === 0)
    plan.unpersist()
  }

  test("frameSample: stride 30 from frame 0, never beyond n_frames") {
    val fs = MultimodalOps.frameSample(spark, Sf).cache()
    assert(fs.filter(col("frame_idx") % MultimodalOps.FrameStep =!= 0).count() === 0)
    assert(fs.filter(col("frame_idx") >= col("n_frames")).count() === 0)
    assert(fs.filter(col("sample_seq") === 0 && col("frame_idx") =!= 0).count() === 0)
    fs.unpersist()
  }
}
