package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.operators.RetrievalOps

/** ir16's maintenance half bound as a STREAM (the StreamingIndexSpec
  * convention on the text index): document micro-batches FOLD into the
  * at-rest postings index through the same `appendPostingsIndex` core
  * the registered batch query uses. Every artifact merges
  * associatively (postings/doclen are per-doc facts behind an
  * exactly-once anti-join; blockmeta by max/min/sum; dict rolled up
  * from blockmeta; consts recounted), so the maintained index after
  * ANY arrival order / micro-batch cut equals a one-shot build over
  * the union, artifact-for-artifact — and serving from it reproduces
  * ir2's exhaustive answer bit-exactly. Asserted across 3 fuzz
  * seeds. */
object StreamingPostingsSpec {
  case class Doc(doc_id: Long, text: String)
}

class StreamingPostingsSpec extends SparkSpec {
  import StreamingPostingsSpec.Doc

  test("streamed document batches fold into the at-rest postings index == one-shot build, 3 seeds") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val rootRef = "target/graft-index/spec-streaming-postings-ref"
    val docsDf = graft.sources.Tables.documents(spark, Sf)
    RetrievalOps.writePostingsIndex(spark, rootRef, docsDf)
    val exhaustive = RetrievalOps.bm25TopK(spark, Sf).collect().toSeq
    assert(exhaustive.nonEmpty)
    val docs = docsDf.selectExpr("doc_id", "text").as[Doc].collect().toVector

    for (seed <- Seq(1, 7, 42)) {
      val root = s"target/graft-index/spec-streaming-postings-$seed"
      val rnd = new scala.util.Random(seed)
      val in = MemoryStream[Doc]
      var first = true
      val q = in.toDF().writeStream
        .foreachBatch { (batch: DataFrame, _: Long) =>
          // the first batch bootstraps the index; every later batch is
          // the ir16 append — postings anti-joined exactly-once,
          // metadata merged/recounted (parquet reads need ≥1 file, so
          // an empty bootstrap is out of contract — real ingests
          // create indexes from their first batch too)
          if (first) { RetrievalOps.writePostingsIndex(spark, root, batch); first = false }
          else RetrievalOps.appendPostingsIndex(spark, root, batch)
          ()
        }
        .start()
      try {
        var rest = rnd.shuffle(docs)
        while (rest.nonEmpty) {
          val (chunk, tail) = rest.splitAt(50 + rnd.nextInt(200))
          rest = tail
          in.addData(chunk: _*)
          q.processAllAvailable() // stateless foreachBatch — safe to drain
        }
      } finally q.stop()
      // the maintained artifacts equal the one-shot build, row-exact
      for (art <- Seq("postings", "blockmeta", "dict", "consts", "doclen")) {
        val a = spark.read.parquet(s"$root/$art")
        val b = spark.read.parquet(s"$rootRef/$art")
        assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty,
          s"seed $seed: streamed $art != one-shot build")
      }
      // and the streamed-maintained index serves ir2's exact answer
      val served = RetrievalOps.rankedTopK(
        RetrievalOps.blockmaxSurvivorsFrom(spark, root)).collect().toSeq
      assert(served == exhaustive,
        s"seed $seed: serve from the streamed index drifted from ir2")
      spark.sharedState.cacheManager.clearCache()
    }
  }
}
