package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.streaming.StreamingScd2
import graft.streaming.StreamingScd2.{Change, Scd2Row}

/** StreamingScd2's changelog contract: compacting its emissions
  * ("closed supersedes open per (user, version)") reconstructs EXACTLY
  * the batch SCD-2 table ScanOps.scd2 computes over the same changes —
  * across multiple micro-batches, shuffled intra-batch arrival order,
  * and a checkpoint restart. */
class StreamingScd2Spec extends SparkSpec {

  /** The harness events as Change records — normalized-to-µs ts,
    * ordered by (tsMicros, event_id): the same full-precision order
    * the batch operator versions by (ScanOps.eventsTs normalizes both
    * paths identically, whatever the parquet physical type). */
  private def allChanges: Seq[Change] = {
    graft.operators.ScanOps.eventsTs(spark, Sf)
      .select(col("user_id"), col("event_id"),
        col("ts"), col("event_type"), col("value"))
      .collect()
      .map(r => Change(r.getLong(0), r.getLong(1),
        us(r.getAs[java.sql.Timestamp](2)),
        r.getString(3), r.getDouble(4)))
      .sortBy(c => (c.tsMicros, c.eventId))
      .toSeq
  }

  /** Closed-supersedes-open compaction of the emission log. */
  private def reconstruct(rows: Seq[Scd2Row]): Set[Scd2Row] =
    rows.groupBy(r => (r.userId, r.version)).values.map { vs =>
      vs.find(_.validToMicros.isDefined).getOrElse(vs.head)
    }.toSet

  /** Full-precision epoch micros (Timestamp.getTime alone truncates to
    * millis; the fractional second lives in getNanos). */
  private def us(t: java.sql.Timestamp): Long =
    t.getTime / 1000 * 1000000 + t.getNanos / 1000

  /** The batch operator's rows, converted to the Scd2Row shape. */
  private def batchRows: Set[Scd2Row] =
    graft.operators.ScanOps.scd2(spark, Sf).collect().map { r =>
      Scd2Row(r.getAs[Long]("user_id"), r.getAs[Int]("version"),
        r.getAs[String]("state"), r.getAs[Double]("value"),
        us(r.getAs[java.sql.Timestamp]("valid_from")),
        Option(r.getAs[java.sql.Timestamp]("valid_to")).map(us),
        r.getAs[Int]("is_current"))
    }.toSet

  test("changelog compaction == batch SCD-2 across batches and shuffled arrival") {
    withRocksDBStateStore {
      implicit val sq = spark.sqlContext
      import spark.implicits._
      val in = MemoryStream[Change]
      val q = StreamingScd2(in.toDS()).writeStream.format("memory")
        .queryName("scd2_stream").outputMode("append").start()
      try {
        // three ts-ordered batches; WITHIN each batch the arrival order
        // is deterministically scrambled — the processor must sort
        val chunks = allChanges.grouped((allChanges.size + 2) / 3).toSeq
        chunks.foreach { chunk =>
          in.addData(chunk.sortBy(c => c.eventId % 7): _*)
          q.processAllAvailable()
        }
        val emitted = spark.table("scd2_stream").as[Scd2Row].collect().toSeq
        // at most two emissions (open, closed) per (user, version)
        emitted.groupBy(r => (r.userId, r.version)).foreach { case (k, vs) =>
          assert(vs.size <= 2, s"$k emitted ${vs.size} rows")
          assert(vs.count(_.validToMicros.isDefined) <= 1, k)
        }
        assert(reconstruct(emitted) == batchRows)
      } finally q.stop()
    }
  }

  test("history survives a checkpoint restart mid-stream") {
    withRocksDBStateStore {
      implicit val sq = spark.sqlContext
      import spark.implicits._
      val ckpt = java.nio.file.Files.createTempDirectory("scd2_ckpt").toString
      val out = java.nio.file.Files.createTempDirectory("scd2_out").toString
      val in = MemoryStream[Change]
      def start() = StreamingScd2(in.toDS()).writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", ckpt)
        .outputMode("append").start()
      val (first, rest) = allChanges.splitAt(allChanges.size / 2)
      val q1 = start()
      in.addData(first: _*)
      q1.processAllAvailable(); q1.stop()
      // the open intervals at the cut live only in checkpointed state —
      // closing them correctly after resume proves recovery
      in.addData(rest: _*)
      val q2 = start()
      try {
        q2.processAllAvailable()
        val emitted = spark.read.parquet(out)
          .as[Scd2Row].collect().toSeq
        assert(reconstruct(emitted) == batchRows)
      } finally q2.stop()
    }
  }
}
