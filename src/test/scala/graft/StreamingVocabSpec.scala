package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.operators.ApproxOps

/** AP5's streaming twin: the KMV vocabulary-novelty monitor. Because
  * [[ApproxOps.kmvMerge]] is associative and commutative, the standing
  * sketch after streaming the corpus in ANY arrival order / micro-batch
  * cut must equal the batch [[ApproxOps.kmvSketch]] over the whole
  * corpus — fuzzed across 3 seeds, the StreamingIndexSpec convention.
  * The novelty telemetry is pinned alongside: per-lang estimates never
  * decrease, and the final estimate equals the batch estimator. */
object StreamingVocabSpec {
  case class Doc(doc_id: Long, text: String, lang: String)
}

class StreamingVocabSpec extends SparkSpec {
  import StreamingVocabSpec.Doc

  test("streamed standing sketch == batch sketch across 3 fuzz seeds; novelty monotone") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val docsDf = graft.sources.Tables.documents(spark, Sf)
    val expected = ApproxOps.kmvSketch(docsDf).collect()
      .map(r => r.getString(0) -> r.getSeq[Long](1).toList).toMap
    assert(expected.nonEmpty)
    val docs = docsDf.select("doc_id", "text", "lang").as[Doc].collect().toVector

    for (seed <- Seq(1, 7, 42)) {
      val rnd = new scala.util.Random(seed)
      val mon = new ApproxOps.KmvVocabMonitor
      val novelty = new scala.collection.mutable.ArrayBuffer[(String, Double, Double)]
      val in = MemoryStream[Doc]
      val q = in.toDF().writeStream
        .foreachBatch { (batch: DataFrame, _: Long) =>
          val obs = mon.observe(batch)
          novelty.synchronized { novelty ++= obs }
          ()
        }
        .start()
      try {
        var rest = rnd.shuffle(docs)
        while (rest.nonEmpty) {
          val (chunk, tail) = rest.splitAt(1 + rnd.nextInt(40))
          rest = tail
          in.addData(chunk: _*)
          q.processAllAvailable() // stateless foreachBatch — safe to drain
        }
      } finally q.stop()

      val streamed = mon.sketches.map { case (l, s) => l -> s.toList }
      assert(streamed === expected,
        s"seed $seed: streamed standing sketch diverged from the batch sketch")
      // telemetry: per-lang estimates never decrease (merging only adds
      // evidence), and the last est_after equals the batch estimator
      novelty.groupBy(_._1).foreach { case (lang, obs) =>
        obs.foreach { case (_, before, after) =>
          assert(after >= before, s"seed $seed $lang: estimate decreased")
        }
        obs.sliding(2).foreach {
          case Seq((_, _, a1), (_, b2, _)) =>
            assert(b2 === a1, s"seed $seed $lang: before/after chain broken")
          case _ => ()
        }
        assert(obs.last._3 === ApproxOps.kmvEstimate(expected(lang)),
          s"seed $seed $lang: final estimate != batch estimator")
      }
    }
  }
}
