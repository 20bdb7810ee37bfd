package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.operators.{DedupOps, TextOps}

/** The curation operators as a STREAMING ingest path: a document
  * stream flows through exact dedup (stateful, on the content hash),
  * quality scoring and the leakage-safe split assignment — the same
  * sort-free cores the batch queries register, bound unchanged to a
  * MemoryStream. This is the "re-crawl arrives as a stream" deployment
  * shape of d1/tx2/d10: the narrow projections stream as-is, and the
  * only state is the dedup key set (at 100 TB:
  * dropDuplicatesWithinWatermark bounds it by event time — the
  * unbounded form here matches d1's whole-corpus semantics).
  */
class StreamingCurationSpec extends SparkSpec {

  test("dedup state survives a restart: pre-restart content still dedups after resume") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val ckpt = java.nio.file.Files.createTempDirectory("cur_ckpt").toString
    val out = java.nio.file.Files.createTempDirectory("cur_out").toString
    val in = MemoryStream[(Long, String)]
    def start() = in.toDF().toDF("doc_id", "text")
      .withColumn("tm", md5(col("text"))).dropDuplicates("tm").drop("tm")
      .writeStream.format("parquet")
      .option("path", out).option("checkpointLocation", ckpt)
      .outputMode("append").start()
    val q1 = start()
    in.addData(1L -> "alpha text one", 2L -> "beta text two")
    q1.processAllAvailable(); q1.stop()
    // dup of doc 1 arrives AFTER the restart — only the checkpointed
    // dedup state can know to drop it
    in.addData(3L -> "alpha text one", 4L -> "gamma text three")
    val q2 = start()
    try {
      q2.processAllAvailable()
      val ids = spark.read.parquet(out).select("doc_id")
        .collect().map(_.getLong(0)).toSet
      assert(ids == Set(1L, 2L, 4L))
    } finally q2.stop()
  }

  test("document stream: dedup by content hash, score quality, assign cluster-coherent splits") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val in = MemoryStream[(Long, String)]
    val deduped = in.toDF().toDF("doc_id", "text")
      .withColumn("tm", md5(col("text"))).dropDuplicates("tm").drop("tm")
    val q1 = TextOps.qualityCore(deduped).writeStream.format("memory")
      .queryName("curated_quality").outputMode("append").start()
    val q2 = DedupOps.clusterSplitCore(deduped).writeStream.format("memory")
      .queryName("curated_split").outputMode("append").start()
    try {
      val long = ("tok " * 40).trim
      in.addData(
        1L -> s"alpha beta $long",
        2L -> "short text",
        3L -> s"alpha beta $long")   // exact dup of doc 1 in the same batch
      q1.processAllAvailable(); q2.processAllAvailable()
      in.addData(
        4L -> s"alpha beta $long",   // exact dup of doc 1, next batch
        5L -> s"gamma delta $long")
      q1.processAllAvailable(); q2.processAllAvailable()

      val quality = spark.table("curated_quality").collect()
      // exact dups dropped WITHIN and ACROSS batches by the stateful dedup
      assert(quality.map(_.getAs[Long]("doc_id")).toSet == Set(1L, 2L, 5L))
      val byId = quality.map(r => r.getAs[Long]("doc_id") -> r).toMap
      assert(byId(2L).getAs[String]("quality_bucket") == "too_short")
      // 42 tokens, only ~4 distinct -> diversity flag fires
      assert(byId(1L).getAs[String]("quality_bucket") == "repetitive")

      val split = spark.table("curated_split").collect()
      assert(split.map(_.getAs[Long]("doc_id")).toSet == Set(1L, 2L, 5L))
      assert(split.forall(r => Set("train", "val", "test")(r.getAs[String]("split"))))
      // the assignment is the deterministic batch rule: same key -> same
      // split regardless of arrival order or batch boundary
      val batch = DedupOps.clusterSplitCore(
        Seq(1L -> s"alpha beta $long", 2L -> "short text",
          5L -> s"gamma delta $long").toDF("doc_id", "text")).collect()
      assert(batch.map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("split")).toMap ==
        split.map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("split")).toMap)
    } finally { q1.stop(); q2.stop() }
  }

  test("tx19 streamed against the frozen dup-chunk set == batch scoring, 2 seeds") {
    // the boilerplate-bounce monitor: each micro-batch of re-crawled
    // docs scores against the corpus's FROZEN duplicated-chunk digest
    // set; per-doc independence given the frozen set makes the
    // accumulated streamed scores equal the batch call over the
    // unioned input regardless of batch cuts
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val docs = graft.sources.Tables.documents(spark, Sf)
    val isNew = col("doc_id") % DedupOps.IncomingMod === 0
    val frozen = TextOps.dupChunkSet(docs.filter(!isNew)).persist()
    try {
      val keyed = (rows: Array[org.apache.spark.sql.Row]) => rows.map { r =>
        (r.getAs[Long]("doc_id"), r.getAs[Long]("n_chunks"),
          r.getAs[Long]("n_dup_chunks"), r.getAs[Long]("n_chars_chunked"),
          r.getAs[Long]("n_dup_chars"),
          Option(r.getAs[java.lang.Double]("dup_char_fraction")).map(_.toDouble),
          r.getAs[Int]("is_dup_heavy"))
      }.sortBy(_._1).toSeq
      val expected = keyed(
        TextOps.dupFractionAgainst(docs.filter(isNew), frozen).collect())
      assert(expected.nonEmpty)
      val incoming = docs.filter(isNew)
        .select(col("doc_id"), col("text")).as[(Long, String)].collect().toVector
      for (seed <- Seq(6, 21)) {
        val rnd = new scala.util.Random(seed)
        val in = MemoryStream[(Long, String)]
        val acc = new scala.collection.mutable.ArrayBuffer[org.apache.spark.sql.Row]
        val q = in.toDF().toDF("doc_id", "text").writeStream
          .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
            val rows = TextOps.dupFractionAgainst(b, frozen).collect()
            acc.synchronized { acc ++= rows }
            ()
          }
          .start()
        try {
          var rest = rnd.shuffle(incoming)
          while (rest.nonEmpty) {
            val (chunk, tail) = rest.splitAt(1 + rnd.nextInt(15))
            rest = tail
            in.addData(chunk: _*)
            q.processAllAvailable() // stateless foreachBatch — safe to drain
          }
        } finally q.stop()
        assert(keyed(acc.toArray) === expected,
          s"seed $seed: streamed dup scores diverged from the batch call")
      }
    } finally frozen.unpersist()
  }
}
