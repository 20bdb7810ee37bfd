package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.operators.RetrievalOps
import graft.sources.Tables

/** The IR tier's streaming twin: queries arrive as a STREAM and each
  * micro-batch is served against the frozen postings index
  * ([[RetrievalOps.serveQueryBatch]] in a foreachBatch, the
  * index-serving shape of StreamingIndexSpec applied to text).
  *
  * Claims:
  *   1. serving is stateless per query, so the accumulated streamed
  *      results equal the one-shot batch serve of the same query set —
  *      for ANY arrival order / micro-batch cut (3 fuzz seeds);
  *   2. the generalized (term-as-data) scorer agrees bit-exactly with
  *      the pivoted compile-time form: serving the [[RetrievalOps.QueryTerms]]
  *      triple reproduces ir2's ranking and scores (the contribution
  *      trees are identical node-for-node, so this is equality, not
  *      tolerance).
  */
object StreamingRetrievalSpec {
  case class Query(query_id: Long, t1: String, t2: String, t3: String)
}

class StreamingRetrievalSpec extends SparkSpec {
  import StreamingRetrievalSpec.Query

  private lazy val docs = Tables.documents(spark, Sf)
  private lazy val index = RetrievalOps.allPostings(docs).cache()
  private lazy val dictConsts = {
    val (d, c) = RetrievalOps.termDict(docs)
    (d.cache(), c.cache())
  }

  private def serve(queries: DataFrame): Array[(Long, Int, Long, Double)] = {
    val (dict, consts) = dictConsts
    RetrievalOps.serveQueryBatch(queries, index, dict, consts)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
      .sortBy(t => (t._1, t._2))
  }

  test("generalized serve of the fixed query == ir2's pivoted ranking, bit-exact") {
    import spark.implicits._
    val Seq(t1, t2, t3) = RetrievalOps.QueryTerms
    val one = Seq(Query(0L, t1, t2, t3)).toDF()
    val served = serve(one)
    val ir2 = RetrievalOps.bm25TopK(spark, Sf).collect()
      .map(r => (0L, r.getInt(0), r.getLong(1), r.getDouble(2)))
      .sortBy(t => (t._1, t._2))
    assert(served.toSeq == ir2.toSeq,
      "the term-as-data scorer drifted from the compile-time BM25 tree")
  }

  test("streamed query batches == one-shot batch serve across 3 fuzz seeds") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val vocab = Seq("dup", "merge", "spark", "window", "hash", "vector",
      "batch", "query", "nosuchterm", "customer")
    for (seed <- Seq(2, 11, 23)) {
      val rnd = new scala.util.Random(seed)
      val queries = (0 until 12).map { i =>
        Query(i.toLong, vocab(rnd.nextInt(vocab.size)),
          vocab(rnd.nextInt(vocab.size)), vocab(rnd.nextInt(vocab.size)))
      }
      val expected = serve(queries.toDF()).toSeq

      val got = new scala.collection.mutable.ArrayBuffer[(Long, Int, Long, Double)]
      val in = MemoryStream[Query]
      val q = in.toDF().writeStream
        .foreachBatch { (batch: DataFrame, _: Long) =>
          val res = serve(batch)
          got.synchronized { got ++= res }
          ()
        }
        .start()
      try {
        var rest = rnd.shuffle(queries)
        while (rest.nonEmpty) {
          val (chunk, tail) = rest.splitAt(1 + rnd.nextInt(5))
          rest = tail
          in.addData(chunk: _*)
          q.processAllAvailable() // stateless serve — safe to drain
        }
      } finally q.stop()

      assert(got.sortBy(t => (t._1, t._2)).toSeq == expected,
        s"seed $seed: streamed serving diverged from the batch serve")
    }
  }

  test("streamed postings metadata == batch stats; serve from it == ir2, across 3 fuzz seeds") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val docsDf = docs.select("doc_id", "text")
    // the batch truth: the one-row stats aggregate over the whole corpus
    val batchRow = {
      val r = graft.operators.RetrievalOps
        .statsRow(graft.operators.RetrievalOps.perDoc(docsDf)).collect()(0)
      (r.getLong(r.fieldIndex("n_docs")), r.getLong(r.fieldIndex("total_tokens")),
        RetrievalOps.QueryTerms.map(t => t -> r.getLong(r.fieldIndex(s"df_$t"))).toMap,
        RetrievalOps.QueryTerms.map(t => t -> r.getLong(r.fieldIndex(s"cf_$t"))).toMap)
    }
    val ir2 = RetrievalOps.bm25TopK(spark, Sf).collect().toSeq
    val rows = docsDf.as[(Long, String)].collect().toVector

    for (seed <- Seq(3, 17, 31)) {
      val rnd = new scala.util.Random(seed)
      val mon = new RetrievalOps.PostingsMonitor
      val drift = new scala.collection.mutable.ArrayBuffer[(String, Long, Long)]
      val in = MemoryStream[(Long, String)]
      val q = in.toDF().toDF("doc_id", "text").writeStream
        .foreachBatch { (batch: DataFrame, _: Long) =>
          val obs = mon.observe(batch)
          drift.synchronized { drift ++= obs }
          ()
        }
        .start()
      try {
        var rest = rnd.shuffle(rows)
        while (rest.nonEmpty) {
          val (chunk, tail) = rest.splitAt(1 + rnd.nextInt(60))
          rest = tail
          in.addData(chunk: _*)
          q.processAllAvailable() // stateless foreachBatch — safe to drain
        }
      } finally q.stop()

      assert(mon.standing == batchRow,
        s"seed $seed: streamed standing metadata != batch stats aggregate")
      // df telemetry only ever grows (sums over disjoint doc sets)
      drift.groupBy(_._1).foreach { case (t, obs) =>
        obs.foreach { case (_, b, a) => assert(a >= b, s"$t df shrank") }
      }
      // serving from the streamed metadata reproduces ir2 bit-exactly
      val served = RetrievalOps
        .serveWithStats(docsDf, mon.statsFrame(spark)).collect().toSeq
      assert(served == ir2,
        s"seed $seed: serve from streamed metadata drifted from ir2")
    }
  }
}
