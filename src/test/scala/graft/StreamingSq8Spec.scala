package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.operators.SimilarityOps

/** The packed-SQ8 serving tier bound as a STREAM (the d19/tx19/ts8
  * frozen-index convention applied to x24): pre-encoded query rows
  * arrive as micro-batches and each batch probes the frozen
  * cell-partitioned packed-codes index through the SAME
  * `sq8CellServeAgainst` core the registered batch query (x24) uses —
  * per-query independence + a frozen index make the accumulated
  * streamed top-k equal the one-shot batch serve regardless of arrival
  * order or micro-batch cuts, asserted across 3 fuzz seeds. No new
  * oracle: the shared core IS x24's oracle-gated serve. */
object StreamingSq8Spec {
  case class QRow(query_id: Long, qcodes: Array[Byte], q_cell: Int)
}

class StreamingSq8Spec extends SparkSpec {
  import StreamingSq8Spec.QRow

  test("streamed packed-SQ8 query batches == batch serve from the frozen cell index, across 3 fuzz seeds") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val root = "target/graft-index/spec-streaming-sq8"
    SimilarityOps.buildSq8CellIndex(spark, Sf, root)
    val index = spark.read.parquet(s"$root/codes")
    // the frozen pre-encoded query workload (a production query arrives
    // already encoded by the frozen quantizer — x24's convention)
    val queryRows = spark.read.parquet(s"$root/queries")
      .select(col("vec_id").as("query_id"), col("codes").as("qcodes"),
        col("cell_id").as("q_cell"))
      .as[QRow].collect().toVector
    assert(queryRows.nonEmpty, "fixture regression: no pre-encoded queries")
    def served(rows: Array[org.apache.spark.sql.Row]) =
      rows.map { r =>
        (r.getAs[Long]("query_id"), r.getAs[Int]("rank"),
          r.getAs[Long]("neighbor_id"), r.getAs[Long]("cell"),
          r.getAs[Long]("code_d2"))
      }.sortBy(t => (t._1, t._2)).toSeq
    val expected = served(SimilarityOps.sq8CellServeAgainst(index,
      queryRows.toDF()).collect())
    assert(expected.nonEmpty, "fixture regression: batch serve returned nothing")

    for (seed <- Seq(1, 7, 42)) {
      val rnd = new scala.util.Random(seed)
      val in = MemoryStream[QRow]
      val acc = new scala.collection.mutable.ArrayBuffer[org.apache.spark.sql.Row]
      val q = in.toDF().writeStream
        .foreachBatch { (batch: DataFrame, _: Long) =>
          val rows = SimilarityOps.sq8CellServeAgainst(index, batch).collect()
          acc.synchronized { acc ++= rows }
          ()
        }
        .start()
      try {
        var rest = rnd.shuffle(queryRows)
        while (rest.nonEmpty) {
          val (chunk, tail) = rest.splitAt(1 + rnd.nextInt(3))
          rest = tail
          in.addData(chunk: _*)
          q.processAllAvailable() // stateless foreachBatch — safe to drain
        }
      } finally q.stop()
      assert(served(acc.toArray) === expected,
        s"seed $seed: streamed packed-SQ8 serving diverged from the batch serve")
    }
  }
}
