package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions.dotD
import graft.operators.{DedupOps, SimilarityOps}

/** X15's append manifest bound as a STREAMING index-maintenance job:
  * each micro-batch of new vectors encodes and cell-routes against the
  * FROZEN standing index through the same core the registered batch
  * query uses (`SimilarityOps.appendManifest`), accumulated via
  * `foreachBatch` — the StreamingCdf convention (shared core, monitor
  * wiring). Because every manifest row depends only on its own vector
  * and the at-rest index, the accumulated streamed manifests must
  * equal the batch x15 over the unioned input REGARDLESS of arrival
  * order or micro-batch cuts — asserted across 3 fuzz seeds. */
object StreamingIndexSpec {
  case class Vec(vec_id: Long, embedding: Seq[Float])
}

class StreamingIndexSpec extends SparkSpec {
  import StreamingIndexSpec.Vec

  private def keyed(rows: Array[org.apache.spark.sql.Row]) =
    rows.map { r =>
      (r.getAs[Long]("vec_id"), r.getAs[Long]("cell"),
        (r.getAs[Long]("code0"), r.getAs[Long]("code1"),
          r.getAs[Long]("code2"), r.getAs[Long]("code3")),
        r.getAs[Double]("qerr"), r.getAs[Long]("n_cell_existing"),
        Option(r.getAs[java.lang.Long]("nn_id")).map(_.toLong),
        Option(r.getAs[java.lang.Double]("nn_adc")).map(_.toDouble))
    }.sortBy(_._1).toSeq

  test("streamed append manifests == batch x15 over the unioned input, across 3 fuzz seeds") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val root = "target/graft-index/spec-streaming"
    val c = SimilarityOps.corpus(spark, Sf)
    val isNew = col("vec_id") % DedupOps.IncomingMod === 0
    SimilarityOps.buildIndex(spark, root, c.filter(!isNew),
      SimilarityOps.coarseCentroids(c), SimilarityOps.pqSeedCents(c))
    val expected = keyed(
      SimilarityOps.appendManifest(spark, root, c.filter(isNew)).collect())
    assert(expected.nonEmpty, "fixture regression: empty append batch")
    val batchVecs = graft.sources.Tables.embeddings(spark, Sf)
      .filter(isNew).select(col("vec_id"), col("embedding"))
      .as[Vec].collect().toVector

    for (seed <- Seq(1, 7, 42)) {
      val rnd = new scala.util.Random(seed)
      val in = MemoryStream[Vec]
      val acc = new scala.collection.mutable.ArrayBuffer[org.apache.spark.sql.Row]
      val q = in.toDF().writeStream
        .foreachBatch { (batch: DataFrame, _: Long) =>
          // the same corpus projection SimilarityOps.corpus applies —
          // the monitor sees raw (id, embedding) rows off the wire
          val inc = batch.select(col("vec_id"),
              col("embedding").cast("array<float>").as("v"))
            .withColumn("nrm", sqrt(dotD(col("v"), col("v"))))
          // cacheBatch = false: each micro-batch is a fresh plan, so a
          // long-running monitor must not accumulate per-batch persists
          val rows = SimilarityOps
            .appendManifest(spark, root, inc, cacheBatch = false).collect()
          acc.synchronized { acc ++= rows }
          ()
        }
        .start()
      try {
        var rest = rnd.shuffle(batchVecs)
        while (rest.nonEmpty) {
          val (chunk, tail) = rest.splitAt(1 + rnd.nextInt(10))
          rest = tail
          in.addData(chunk: _*)
          q.processAllAvailable() // stateless foreachBatch — safe to drain
        }
      } finally q.stop()
      assert(keyed(acc.toArray) === expected,
        s"seed $seed: streamed manifests diverged from the batch append")
    }
  }

  test("streamed query serving == batch serve from the frozen index, across 3 fuzz seeds") {
    // the SERVING half of the lifecycle as a stream: queries arrive as
    // micro-batches and each batch probes the at-rest index through the
    // same serveFrom core x11 uses — per-query independence + a frozen
    // index make the accumulated streamed top-k equal the batch serve
    // regardless of arrival order or batch cuts
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val root = "target/graft-index/spec-serving"
    val c = SimilarityOps.corpus(spark, Sf)
    SimilarityOps.buildIndex(spark, root, c,
      SimilarityOps.coarseCentroids(c), SimilarityOps.pqSeedCents(c))
    val isQuery = col("vec_id") < SimilarityOps.NumQueries
    def served(rows: Array[org.apache.spark.sql.Row]) =
      rows.map { r =>
        (r.getAs[Long]("query_id"), r.getAs[Int]("rank"),
          r.getAs[Long]("neighbor_id"), r.getAs[Long]("cell"),
          r.getAs[Double]("adc"))
      }.sortBy(t => (t._1, t._2)).toSeq
    val expected = served(SimilarityOps
      .serveFrom(spark, root, c.filter(isQuery), nProbe = 2).collect())
    assert(expected.nonEmpty, "fixture regression: batch serve returned nothing")
    val queryVecs = graft.sources.Tables.embeddings(spark, Sf)
      .filter(isQuery).select(col("vec_id"), col("embedding"))
      .as[Vec].collect().toVector

    for (seed <- Seq(1, 7, 42)) {
      val rnd = new scala.util.Random(seed)
      val in = MemoryStream[Vec]
      val acc = new scala.collection.mutable.ArrayBuffer[org.apache.spark.sql.Row]
      val q = in.toDF().writeStream
        .foreachBatch { (batch: DataFrame, _: Long) =>
          val inc = batch.select(col("vec_id"),
              col("embedding").cast("array<float>").as("v"))
            .withColumn("nrm", sqrt(dotD(col("v"), col("v"))))
          val rows = SimilarityOps.serveFrom(spark, root, inc, nProbe = 2).collect()
          acc.synchronized { acc ++= rows }
          ()
        }
        .start()
      try {
        var rest = rnd.shuffle(queryVecs)
        while (rest.nonEmpty) {
          val (chunk, tail) = rest.splitAt(1 + rnd.nextInt(3))
          rest = tail
          in.addData(chunk: _*)
          q.processAllAvailable() // stateless foreachBatch — safe to drain
        }
      } finally q.stop()
      assert(served(acc.toArray) === expected,
        s"seed $seed: streamed serving diverged from the batch serve")
    }
  }
}
