package graft

import org.apache.spark.sql.functions._
import graft.operators.{MultimodalOps, SimilarityOps}
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

  test("m7: the at-rest pHash audit is bit-identical to m6's in-memory pipeline") {
    spark.sharedState.cacheManager.clearCache()
    val served = MultimodalOps.phashAtRest(spark, Sf).collect().toSeq
    graft.operators.CacheScope.drain()
    val scan = MultimodalOps.mediaNearDup(spark, Sf).collect().toSeq
    assert(scan.nonEmpty && served == scan,
      "at-rest pHash audit drifted from m6")
  }

  test("m7: the incremental probe DPP-prunes the frozen bands and matches the full audit's cross pairs") {
    import org.apache.spark.sql.functions._
    spark.sharedState.cacheManager.clearCache()
    // build chunks ONCE over all media, split reps by id parity so the
    // standing/batch rep sets are disjoint by construction
    val root = SimilarityOps.indexRoot(spark, Sf) + "/phashidx-probe"
    val chunks = MultimodalOps.phashChunks(spark, Sf)
      .persist()
    try {
      val standing = chunks.filter(col("rep_id") % 4 =!= 0)
      val batch = chunks.filter(col("rep_id") % 4 === 0)
      standing
        .withColumn("chunk_bucket",
          pmod(col("chunk") + col("band"), lit(MultimodalOps.ChunkBuckets))
            .cast("int"))
        .write.mode("overwrite").partitionBy("chunk_bucket")
        .parquet(s"$root/bands")
      val probed = MultimodalOps.phashProbeFrom(spark, root,
        batch.filter(col("rep_id") >= 0))
      // plan pin: the bands scan carries DPP on chunk_bucket
      val plan = probed.queryExecution.executedPlan match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          a.executedPlan
        case other => other
      }
      def scansOf(p: org.apache.spark.sql.execution.SparkPlan)
          : Seq[org.apache.spark.sql.execution.FileSourceScanExec] =
        p.collect { case s: org.apache.spark.sql.execution.FileSourceScanExec => s } ++
          p.subqueries.flatMap(scansOf)
      val bandScans = scansOf(plan).filter(_.relation.location.rootPaths
        .exists(_.toString.contains("phashidx-probe/bands")))
      assert(bandScans.nonEmpty &&
        bandScans.exists(_.partitionFilters.exists(
          _.toString.toLowerCase.contains("dynamicpruning"))),
        "pHash probe lost its chunk_bucket dynamic partition pruning")
      // correctness: probe verdicts == the full audit's pairs with
      // exactly one side in the batch (normalized to a<b)
      val got = probed.collect().map(r =>
        (r.getAs[String]("kind"),
          math.min(r.getAs[Long]("a"), r.getAs[Long]("b")),
          math.max(r.getAs[Long]("a"), r.getAs[Long]("b")),
          r.getAs[Int]("hamming"), r.getAs[Int]("is_near_dup"))).toSet
      val full = MultimodalOps.mediaNearDup(spark, Sf).collect().map(r =>
        (r.getAs[String]("kind"), r.getAs[Long]("a"), r.getAs[Long]("b"),
          r.getAs[Int]("hamming"), r.getAs[Int]("is_near_dup")))
        .filter(t => (t._2 % 4 == 0) != (t._3 % 4 == 0)).toSet
      assert(full.nonEmpty, "fixture regression: no cross pairs")
      assert(got == full, "probe pairs diverged from the full audit's cross pairs")
    } finally { chunks.unpersist(); () }
  }

  test("streaming media ingest: stateful digest dedup drops byte-identical assets within and across batches") {
    // m5's rule as a STREAM — re-crawled/mirrored media arrive in later
    // micro-batches; only the (kind, digest) dedup state can know to
    // drop them. Only the 32-char digest enters state: the payload
    // bytes are dropped before the stateful operator, the same
    // hash-before-group discipline m5's batch shuffle uses at 100 TB.
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val in = MemoryStream[(Long, String, Array[Byte])]
    val deduped = in.toDF().toDF("media_id", "kind", "payload")
      .withColumn("digest", MultimodalOps.mediaDigest) // m5's shared key
      .select(col("media_id"), col("kind"), col("digest"))
      .dropDuplicates("kind", "digest")
    val q = deduped.writeStream.format("memory")
      .queryName("media_dedup_stream").outputMode("append").start()
    try {
      val a = Array[Byte](1, 2, 3, 4)
      val b = Array[Byte](9, 9, 9)
      in.addData((1L, "image", a), (2L, "image", b),
        (3L, "image", a.clone())) // same bytes, same batch
      q.processAllAvailable()
      in.addData((4L, "image", a.clone()), // same bytes, later batch
        (5L, "audio", a.clone()), // same bytes, DIFFERENT modality → kept
        (6L, "image", Array[Byte](7)))
      q.processAllAvailable()
      val kept = spark.table("media_dedup_stream")
        .collect().map(_.getLong(0)).toSet
      assert(kept == Set(1L, 2L, 5L, 6L),
        s"expected first-copy-per-(kind, digest) survivors, got $kept")
    } finally q.stop()
  }

  private def rmRoot(root: String): Unit = {
    org.apache.hadoop.fs.FileSystem.get(spark.sparkContext.hadoopConfiguration)
      .delete(new org.apache.hadoop.fs.Path(root), true)
    ()
  }

  private def bandRows(root: String): Set[(String, Long, Long, Long, Int, Long, Int)] =
    spark.read.parquet(s"$root/bands")
      .select(col("kind"), col("rep_id"), col("n_copies"), col("phash"),
        col("band"), col("chunk"), col("chunk_bucket").cast("int"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getInt(4), r.getLong(5), r.getInt(6))).toSet

  private def memberRows(root: String): Set[(String, String, Long)] =
    spark.read.parquet(s"$root/members")
      .select(col("kind"), col("digest"), col("media_id"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet

  /** Planted copy groups exercising every takedown outcome: group A
    * loses its MIN-ID copy (relabel + decrement), group B vanishes
    * (last copies removed), group C is untouched, group D loses a
    * non-rep copy (decrement only). */
  private def plantedMedia = {
    import spark.implicits._
    Seq(
      (1L, "aaa quick brown fox body"), (2L, "aaa quick brown fox body"),
      (3L, "aaa quick brown fox body"),                       // A: 3 copies
      (10L, "bbb lazy dog jumps over"), (11L, "bbb lazy dog jumps over"), // B: 2
      (20L, "ccc entirely different words here"),             // C: single
      (30L, "ddd yet another payload text"),
      (31L, "ddd yet another payload text"))                  // D: 2
      .toDF("media_id", "text")
      .withColumn("kind", lit("image"))
      .withColumn("payload", encode(col("text"), "UTF-8"))
      .drop("text")
  }

  test("m8: takedown relabels reps, decrements counts, vanishes last-copy groups — == rebuild over survivors; rerun a no-op") {
    val mm = graft.operators.MultimodalOps
    val med = plantedMedia
    val delIds = Set(1L, 10L, 11L, 31L) // A's rep, all of B, D's non-rep
    val isDel = col("media_id").isin(delIds.toSeq: _*)
    val root = "target/graft-index/spec-m8-takedown"
    val rootB = "target/graft-index/spec-m8-rebuild"
    rmRoot(root); rmRoot(rootB)
    mm.writePhashStore(spark, root, med)
    mm.takedownPhash(spark, root, med.filter(isDel))
    mm.writePhashStore(spark, rootB, med.filter(!isDel))
    assert(bandRows(root) == bandRows(rootB),
      "takedown-maintained bands != rebuild over survivors")
    assert(memberRows(root) == memberRows(rootB),
      "takedown-maintained members != rebuild over survivors")
    // the semantics visibly happened: A relabeled to rep 2 with 2
    // copies, B gone, D decremented with rep 30 kept
    val reps = spark.read.parquet(s"$root/bands")
      .select(col("rep_id"), col("n_copies")).distinct()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(reps == Map(2L -> 2L, 20L -> 1L, 30L -> 1L),
      s"unexpected surviving groups: $reps")
    // retried request: facts recompute to the same fixed point
    mm.takedownPhash(spark, root, med.filter(isDel))
    assert(bandRows(root) == bandRows(rootB) &&
      memberRows(root) == memberRows(rootB),
      "retried takedown moved the store")
    rmRoot(root); rmRoot(rootB)
  }

  test("m8: the bands-done/members-stale crash point serves correctly and converges by rerun") {
    val mm = graft.operators.MultimodalOps
    val med = plantedMedia
    val isDel = col("media_id").isin(1L, 10L, 11L, 31L)
    val root = "target/graft-index/spec-m8-crash"
    val rootB = "target/graft-index/spec-m8-crash-rebuild"
    rmRoot(root); rmRoot(rootB)
    mm.writePhashStore(spark, root, med)
    val staleMembers = spark.read.parquet(s"$root/members").collect()
    val schema = spark.read.parquet(s"$root/members").schema
    mm.takedownPhash(spark, root, med.filter(isDel))
    mm.writePhashStore(spark, rootB, med.filter(!isDel))
    val doneBands = bandRows(root)
    assert(doneBands == bandRows(rootB))
    // simulate the crash between stage 3 and stage 4: bands already
    // rewritten, members reverted to their pre-takedown rows
    spark.createDataFrame(
        new java.util.ArrayList(java.util.Arrays.asList(staleMembers: _*)),
        schema)
      .write.mode("overwrite").partitionBy("dg_bucket")
      .parquet(s"$root/members")
    // the VISIBLE artifact is already correct at this crash point
    assert(bandRows(root) == doneBands)
    // and the rerun converges both artifacts (the both-keys anti-join:
    // stale members yield the ORIGINAL old reps while bands hold the
    // relabeled ones — without dropping both generations this would
    // duplicate group A's rows)
    mm.takedownPhash(spark, root, med.filter(isDel))
    assert(bandRows(root) == bandRows(rootB),
      "crash-rerun duplicated or lost band rows")
    assert(memberRows(root) == memberRows(rootB),
      "crash-rerun left members stale")
    rmRoot(root); rmRoot(rootB)
  }

  test("m8: untouched chunk and digest buckets keep their files byte-identical") {
    val mm = graft.operators.MultimodalOps
    val med = mm.media(spark, Sf)
    val isDel = col("media_id") % graft.operators.TextOps.ForgetMod ===
      graft.operators.TextOps.ForgetRem
    val root = "target/graft-index/spec-m8-buckets"
    rmRoot(root)
    mm.writePhashStore(spark, root, med)
    def sig(table: String, pcol: String): Map[Int, Seq[(String, Long, Long)]] =
      new java.io.File(s"$root/$table").listFiles()
        .filter(f => f.isDirectory && f.getName.startsWith(s"$pcol="))
        .map { d =>
          d.getName.stripPrefix(s"$pcol=").toInt ->
            d.listFiles().filter(_.getName.endsWith(".parquet"))
              .map(f => (f.getName, f.length, f.lastModified)).sortBy(_._1).toSeq
        }.toMap
    val (bb, mb) = (sig("bands", "chunk_bucket"), sig("members", "dg_bucket"))
    // the sweep's own target lists, derived the operator's way
    val req = med.filter(isDel)
    val dB = req.select(md5(col("payload")).as("digest"))
      .select(mm.digestBucketCol.as("b")).distinct()
      .collect().map(_.getInt(0)).toSet
    mm.takedownPhash(spark, root, req)
    val (ba, ma) = (sig("bands", "chunk_bucket"), sig("members", "dg_bucket"))
    mb.keySet.filterNot(dB).foreach { b =>
      assert(ma.get(b) == mb.get(b), s"untouched digest bucket $b rewritten")
    }
    // band buckets: anything outside the swept set must be untouched
    val swept = bb.keySet.filter(b => ba.get(b) != bb.get(b))
    val expected = req
      .select(col("media_id"), col("kind"), col("payload")).distinct()
      .select(mm.phashCol.as("phash")).distinct()
      .collect().map(_.getLong(0)).toSet
      .flatMap { ph: Long =>
        (0 until 4).map(i => (((ph >> (15 * i)) & 0x7fff) + i) % 16)
          .map(_.toInt)
      }
    assert(swept.subsetOf(expected),
      s"bands buckets outside the request's key space were rewritten: ${swept -- expected}")
    rmRoot(root)
  }
}
