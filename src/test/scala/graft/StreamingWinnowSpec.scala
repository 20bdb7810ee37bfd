package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.operators.DedupOps
import graft.sources.Tables

/** D18's winnowing probe bound as a STREAMING ingest monitor: each
  * micro-batch of re-crawled documents winnows in-scan and probes the
  * corpus's FROZEN fingerprint index through the same core the
  * registered batch query uses (`DedupOps.winnowingIncrementalAgainst`),
  * accumulated via `foreachBatch` — the StreamingIndexSpec convention
  * (shared core, frozen standing side). Because every verdict row
  * depends only on its own document and the frozen index, the
  * accumulated streamed verdicts must equal the batch d18 over the
  * unioned input REGARDLESS of arrival order or micro-batch cuts —
  * asserted across 3 fuzz seeds. */
object StreamingWinnowSpec {
  case class Doc(doc_id: Long, text: String)
}

class StreamingWinnowSpec extends SparkSpec {
  import StreamingWinnowSpec.Doc

  private def keyed(rows: Array[org.apache.spark.sql.Row]) =
    rows.map { r =>
      (r.getAs[Long]("doc_id"), r.getAs[Long]("nfp"),
        r.getAs[Long]("n_cand"),
        Option(r.getAs[java.lang.Long]("match_doc")).map(_.toLong),
        r.getAs[Long]("n_shared"),
        Option(r.getAs[java.lang.Double]("overlap")).map(_.toDouble),
        r.getAs[String]("verdict"))
    }.sortBy(_._1).toSeq

  test("streamed winnowing verdicts == batch d18 over the unioned input, across 3 fuzz seeds") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val docs = Tables.documents(spark, Sf)
    val isNew = col("doc_id") % DedupOps.IncomingMod === 0
    // the frozen standing side: built once, persisted — at 100 TB this
    // is the at-rest table bucketed on h; here the persist plays it
    val idx = DedupOps.winnowingIndex(docs.filter(!isNew)).persist()
    try {
      val expected = keyed(
        DedupOps.winnowingIncrementalAgainst(docs.filter(isNew), idx)
          .collect())
      assert(expected.nonEmpty, "fixture regression: empty incoming batch")
      assert(expected.exists(_._7 == "overlaps_corpus") &&
        expected.exists(_._7 == "new"),
        "fixture regression: both verdicts should occur at sf0.001")
      val batchDocs = docs.filter(isNew)
        .select(col("doc_id"), col("text")).as[Doc].collect().toVector

      for (seed <- Seq(1, 7, 42)) {
        val rnd = new scala.util.Random(seed)
        val in = MemoryStream[Doc]
        val acc = new scala.collection.mutable.ArrayBuffer[org.apache.spark.sql.Row]
        val q = in.toDF().writeStream
          .foreachBatch { (batch: DataFrame, _: Long) =>
            val rows = DedupOps
              .winnowingIncrementalAgainst(batch, idx, cacheBatch = false)
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
    } finally idx.unpersist()
  }

  test("streamed index maintenance: per-batch d19 folds == full rebuild, 3 fuzz seeds") {
    // the MAINTENANCE binding: each micro-batch of fresh documents
    // folds into the standing (fingerprints, DF stats) pair through
    // the same core the registered d19 uses — append==rebuild per step
    // makes the SEQUENTIAL fold equal a fresh rebuild over everything,
    // regardless of how arrivals are cut into batches
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val docs = Tables.documents(spark, Sf)
    val isNew = col("doc_id") % DedupOps.IncomingMod === 0
    val expected = DedupOps.winnowingIndex(docs).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("h"))).sorted.toSeq
    val freshDocs = docs.filter(isNew)
      .select(col("doc_id"), col("text")).as[Doc].collect().toVector

    for (seed <- Seq(4, 19, 37)) {
      val rnd = new scala.util.Random(seed)
      val (k0, d0) = DedupOps.winnowingIndexWithStats(docs.filter(!isNew))
      // fold state crosses micro-batches — localCheckpoint truncates
      // the growing lineage exactly as StarComponents' loop does
      var kept = k0.localCheckpoint()
      var dfStats = d0.localCheckpoint()
      val in = MemoryStream[Doc]
      val q = in.toDF().writeStream
        .foreachBatch { (batch: DataFrame, _: Long) =>
          val (k, d) = DedupOps.winnowingAppendCore(kept, dfStats, batch,
            cacheBatch = false) // per-batch persists must not accumulate
          kept = k.localCheckpoint()
          dfStats = d.localCheckpoint()
          ()
        }
        .start()
      try {
        var rest = rnd.shuffle(freshDocs)
        while (rest.nonEmpty) {
          val (chunk, tail) = rest.splitAt(1 + rnd.nextInt(10))
          rest = tail
          in.addData(chunk: _*)
          q.processAllAvailable() // stateless foreachBatch — safe to drain
        }
      } finally q.stop()
      val got = kept.collect()
        .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("h"))).sorted.toSeq
      assert(got === expected,
        s"seed $seed: streamed index folds diverged from the full rebuild")
    }
  }

  test("streamed at-rest probes == batch d26 against the frozen written index, across 3 fuzz seeds") {
    // d26's DPP probe as the per-micro-batch monitor: the standing
    // index is genuinely ON DISK (not a persisted frame), each batch
    // winnows in-scan and probes the written serving table through
    // the same partition-pruned core the registered query uses.
    implicit val sq = spark.sqlContext
    import spark.implicits._
    spark.sharedState.cacheManager.clearCache()
    val docs = Tables.documents(spark, Sf)
    val isNew = col("doc_id") % DedupOps.IncomingMod === 0
    val root = "target/graft-index/spec-streaming-winnow26"
    DedupOps.writeWinnowIndex(spark, root, docs.filter(!isNew))
    graft.operators.CacheScope.drain()
    def keyed26(rows: Array[org.apache.spark.sql.Row]) = rows.map { r =>
      (r.getAs[Long]("doc_id"), r.getAs[Long]("nfp"),
        r.getAs[Long]("n_cand"),
        Option(r.getAs[java.lang.Long]("match_doc")).map(_.toLong),
        r.getAs[Long]("n_shared"),
        Option(r.getAs[java.lang.Double]("overlap")).map(_.toDouble),
        r.getAs[String]("verdict"))
    }.sortBy(_._1).toSeq
    val expected = keyed26(
      DedupOps.winnowProbeAgainst(spark, root, docs.filter(isNew),
        cacheBatch = false).collect())
    assert(expected.nonEmpty &&
      expected.exists(_._7 == "overlaps_corpus") &&
      expected.exists(_._7 == "new"),
      "fixture regression: both verdicts should occur")
    val batchDocs = docs.filter(isNew)
      .select(col("doc_id"), col("text")).as[Doc].collect().toVector
    for (seed <- Seq(2, 13, 37)) {
      val rnd = new scala.util.Random(seed)
      val in = MemoryStream[Doc]
      val acc = new scala.collection.mutable.ArrayBuffer[org.apache.spark.sql.Row]
      val q = in.toDF().writeStream
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
          val rows = DedupOps
            .winnowProbeAgainst(spark, root, batch, cacheBatch = false)
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
      assert(keyed26(acc.toArray) === expected,
        s"seed $seed: streamed at-rest probes diverged from the batch probe")
    }
  }
}
