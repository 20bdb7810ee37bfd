package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.operators.DedupOps
import graft.sources.Tables

/** D25's at-rest band probe bound as a STREAMING ingest monitor: each
  * micro-batch of re-crawled documents signs in-scan and probes the
  * corpus's FROZEN at-rest band index through the same core the
  * registered query uses (`DedupOps.bandProbeAgainst` — the DPP-pruned
  * two-stage fetch), accumulated via `foreachBatch` — the
  * StreamingWinnowSpec convention with the standing side genuinely ON
  * DISK. Every verdict row depends only on its own document and the
  * frozen files, so the accumulated streamed verdicts must equal the
  * batch d25 over the unioned input REGARDLESS of arrival order or
  * micro-batch cuts — asserted across 3 fuzz seeds. */
object StreamingBandSpec {
  case class Doc(doc_id: Long, text: String)
  case class Rep(kind: String, rep_id: Long, n_copies: Long, phash: Long)
}

class StreamingBandSpec extends SparkSpec {
  import StreamingBandSpec.Doc

  private def keyed(rows: Array[org.apache.spark.sql.Row]) =
    rows.map { r =>
      (r.getAs[Long]("doc_id"), r.getAs[Long]("n_cand"),
        r.getAs[Long]("n_dup"),
        Option(r.getAs[java.lang.Long]("dup_of")).map(_.toLong),
        r.getAs[String]("verdict"))
    }.sortBy(_._1).toSeq

  test("streamed band-probe verdicts == batch d25 over the unioned input, across 3 fuzz seeds") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    spark.sharedState.cacheManager.clearCache()
    val docs = Tables.documents(spark, Sf)
    val isNew = col("doc_id") % DedupOps.IncomingMod === 0
    val root = "target/graft-index/spec-streaming-band"
    DedupOps.writeBandIndex(spark, root, docs.filter(!isNew))
    graft.operators.CacheScope.drain()
    val expected = keyed(
      DedupOps.bandProbeAgainst(spark, root, docs.filter(isNew),
        cacheBatch = false).collect())
    assert(expected.nonEmpty, "fixture regression: empty incoming batch")
    assert(expected.exists(_._5 == "near_dup_of_corpus") &&
      expected.exists(_._5 == "new"),
      "fixture regression: both verdicts should occur")
    val batchDocs = docs.filter(isNew)
      .select(col("doc_id"), col("text")).as[Doc].collect().toVector

    for (seed <- Seq(1, 7, 42)) {
      val rnd = new scala.util.Random(seed)
      val in = MemoryStream[Doc]
      val acc = new scala.collection.mutable.ArrayBuffer[org.apache.spark.sql.Row]
      val q = in.toDF().writeStream
        .foreachBatch { (batch: DataFrame, _: Long) =>
          val rows = DedupOps
            .bandProbeAgainst(spark, root, batch, cacheBatch = false)
            .collect()
          acc.synchronized { acc ++= rows }
          ()
        }
        .start()
      try {
        var rest = rnd.shuffle(batchDocs)
        while (rest.nonEmpty) {
          val (chunk, tail) = rest.splitAt(1 + rnd.nextInt(10))
          rest = tail
          in.addData(chunk: _*)
          q.processAllAvailable() // stateless foreachBatch — safe to drain
        }
      } finally q.stop()
      assert(keyed(acc.toArray) === expected,
        s"seed $seed: streamed verdicts diverged from the batch probe")
    }
  }

  test("streamed simhash probes == batch d28 probe against the frozen index, across 3 fuzz seeds") {
    // d28's incremental probe as a STREAM: each micro-batch signs
    // itself (the compiled SimHashLong in-scan) and probes the FROZEN
    // at-rest chunk rows through the same DPP core; every verdict
    // depends only on its own document + the files → batch-cut
    // independent.
    implicit val sq = spark.sqlContext
    import spark.implicits._
    spark.sharedState.cacheManager.clearCache()
    val docs = Tables.documents(spark, Sf)
    val isNew = col("doc_id") % DedupOps.IncomingMod === 0
    val root = "target/graft-index/spec-streaming-simhash"
    DedupOps.writeSimhashIndex(spark, root, docs.filter(!isNew))
    val expected = keyed(
      DedupOps.simhashProbeAgainst(spark, root, docs.filter(isNew),
        cacheBatch = false).collect())
    assert(expected.nonEmpty, "fixture regression: empty incoming batch")
    assert(expected.exists(_._5 == "near_dup_of_corpus") &&
      expected.exists(_._5 == "new"),
      "fixture regression: both verdicts should occur")
    val batchDocs = docs.filter(isNew)
      .select(col("doc_id"), col("text")).as[Doc].collect().toVector
    for (seed <- Seq(2, 13, 31)) {
      val rnd = new scala.util.Random(seed)
      val in = MemoryStream[Doc]
      val acc = new scala.collection.mutable.ArrayBuffer[org.apache.spark.sql.Row]
      val q = in.toDF().writeStream
        .foreachBatch { (batch: DataFrame, _: Long) =>
          val rows = DedupOps
            .simhashProbeAgainst(spark, root, batch, cacheBatch = false)
            .collect()
          acc.synchronized { acc ++= rows }
          ()
        }
        .start()
      try {
        var rest = rnd.shuffle(batchDocs)
        while (rest.nonEmpty) {
          val (chunk, tail) = rest.splitAt(1 + rnd.nextInt(10))
          rest = tail
          in.addData(chunk: _*)
          q.processAllAvailable() // stateless foreachBatch — safe to drain
        }
      } finally q.stop()
      assert(keyed(acc.toArray) === expected,
        s"seed $seed: streamed simhash verdicts diverged from the batch probe")
    }
  }

  test("streamed pHash probes == the one-shot probe against the frozen media index, across 3 fuzz seeds") {
    // m7's incremental probe as a STREAM: representative rows (already
    // digest-collapsed — the collapse is ingest-side state, m5's
    // streaming dedup) arrive in micro-batches, expand to their 4
    // pigeonhole band rows, and probe the frozen at-rest index through
    // the same DPP core the spec-pinned batch probe uses. Each rep's
    // pairs depend only on its own phash + the files → batch-cut
    // independent.
    import graft.operators.MultimodalOps
    import StreamingBandSpec.Rep
    implicit val sq = spark.sqlContext
    import spark.implicits._
    spark.sharedState.cacheManager.clearCache()
    val root = "target/graft-index/spec-streaming-phash"
    val chunks = MultimodalOps.phashChunks(spark, Sf).persist()
    try {
      val standing = chunks.filter(col("rep_id") % 4 =!= 0)
      standing
        .withColumn("chunk_bucket",
          pmod(col("chunk") + col("band"), lit(MultimodalOps.ChunkBuckets))
            .cast("int"))
        .write.mode("overwrite").partitionBy("chunk_bucket")
        .parquet(s"$root/bands")
      val batchReps = chunks.filter(col("rep_id") % 4 === 0)
        .select(col("kind"), col("rep_id"), col("n_copies"), col("phash"))
        .distinct().as[Rep].collect().toVector
      assert(batchReps.nonEmpty, "fixture regression: empty probe rep set")
      def keyedPairs(rows: Array[org.apache.spark.sql.Row]) = rows.map { r =>
        (r.getAs[String]("kind"), r.getAs[Long]("a"), r.getAs[Long]("b"),
          r.getAs[Int]("hamming"), r.getAs[Int]("is_near_dup"),
          r.getAs[Long]("n_copies_a"), r.getAs[Long]("n_copies_b"))
      }.sortBy(t => (t._1, t._2, t._3)).toSeq
      val expected = keyedPairs(MultimodalOps.phashProbeFrom(spark, root,
        MultimodalOps.repChunks(batchReps.toDF())
          .filter(col("rep_id") >= 0)).collect())
      assert(expected.nonEmpty, "fixture regression: no probe pairs")
      for (seed <- Seq(3, 11, 29)) {
        val rnd = new scala.util.Random(seed)
        val in = MemoryStream[Rep]
        val acc = new scala.collection.mutable.ArrayBuffer[org.apache.spark.sql.Row]
        val q = in.toDF().writeStream
          .foreachBatch { (batch: DataFrame, _: Long) =>
            val rows = MultimodalOps.phashProbeFrom(spark, root,
              MultimodalOps.repChunks(batch).filter(col("rep_id") >= 0))
              .collect()
            acc.synchronized { acc ++= rows }
            ()
          }
          .start()
        try {
          var rest = rnd.shuffle(batchReps)
          while (rest.nonEmpty) {
            val (chunk, tail) = rest.splitAt(1 + rnd.nextInt(7))
            rest = tail
            in.addData(chunk: _*)
            q.processAllAvailable() // stateless foreachBatch — safe to drain
          }
        } finally q.stop()
        assert(keyedPairs(acc.toArray) === expected,
          s"seed $seed: streamed media probes diverged from the one-shot probe")
      }
    } finally { chunks.unpersist(); () }
  }
}
