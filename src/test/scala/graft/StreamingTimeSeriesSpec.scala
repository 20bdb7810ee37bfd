package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.operators.TimeSeriesOps

/** The ts family's streaming binding: the (user, day) activity counts
  * ARE streaming-aggregation state (counts are associative, so the
  * standing state after any arrival order / micro-batch cut equals the
  * batch collapse — the StreamingSnapshotSpec shape with a count
  * instead of max_by), and ts1 SERVES from that state unchanged
  * ([[TimeSeriesOps.seriesKnnCore]] over the state table). Integer
  * throughout, so both claims are exact equality, fuzzed across 3
  * seeds. */
class StreamingTimeSeriesSpec extends SparkSpec {

  test("streamed day-count state == batch collapse; ts1 served from it == batch ts1, 3 seeds") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val batchCounts = TimeSeriesOps.dayCounts(spark, Sf)
    val expected = batchCounts.collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val ts1 = TimeSeriesOps.seriesKnn(spark, Sf).collect().toSeq
    // the stream carries per-EVENT (user_id, day) rows — the same grid
    // projection the batch collapse aggregates
    val events = {
      val ev = graft.sources.Tables.events(spark, Sf)
      ev.select(col("user_id"),
          TimeSeriesOps.dayOf(ev)
            .as("day"))
        .as[(Long, Long)].collect().toVector
    }

    for (seed <- Seq(5, 13, 29)) {
      val rnd = new scala.util.Random(seed)
      val in = MemoryStream[(Long, Long)]
      val counts = in.toDF().toDF("user_id", "day")
        .groupBy(col("user_id"), col("day"))
        .agg(count(lit(1)).as("cnt"))
      val name = s"ts_counts_state_$seed"
      val q = counts.writeStream.format("memory")
        .queryName(name).outputMode("complete").start()
      try {
        var rest = rnd.shuffle(events)
        while (rest.nonEmpty) {
          val (chunk, tail) = rest.splitAt(1 + rnd.nextInt(500))
          rest = tail
          in.addData(chunk: _*)
          q.processAllAvailable() // plain streaming agg — safe to drain
        }
        val stateRows = spark.table(name).collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
        val got = stateRows.map { case (u, d, c) => (u, d) -> c }.toMap
        assert(got == expected,
          s"seed $seed: streamed count state diverged from the batch collapse")
        // a MemorySink view keeps ONE attribute set, so ts1's self-join
        // over it hits conflicting-reference resolution — rebuild the
        // state as a local frame (what a foreachBatch write-out would
        // yield) before serving from it
        val state = stateRows.toDF("user_id", "day", "cnt")
        val served = TimeSeriesOps.seriesKnnCore(state).collect().toSeq
        assert(served == ts1,
          s"seed $seed: ts1 served from streamed state drifted from batch ts1")
        // the SAX index + banded-candidate verify serve from the SAME
        // standing state: streamed ts5 == batch ts5
        val servedSax = TimeSeriesOps.saxKnnCore(spark, state).collect().toSeq
        assert(servedSax == ts5,
          s"seed $seed: ts5 served from streamed state drifted from batch ts5")
        val servedLag = TimeSeriesOps.leadLagCore(state).collect().toSeq
        assert(servedLag == ts6,
          s"seed $seed: ts6 served from streamed state drifted from batch ts6")
        // the discord word table maintains off the same counts state
        val servedDiscord =
          TimeSeriesOps.saxDiscordCore(state).collect().toSeq
        assert(servedDiscord == ts8,
          s"seed $seed: ts8 served from streamed state drifted from batch ts8")
      } finally q.stop()
    }
  }

  private lazy val ts5 = TimeSeriesOps.saxKnn(spark, Sf).collect().toSeq
  private lazy val ts6 = TimeSeriesOps.leadLag(spark, Sf).collect().toSeq
  private lazy val ts8 = TimeSeriesOps.saxDiscord(spark, Sf).collect().toSeq

  test("streamed (event_type, day) count state serves ts3 and ts7 == their batch twins, 3 seeds") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val ts3 = TimeSeriesOps.seasonality(spark, Sf).collect().toSeq
    val ts7 = TimeSeriesOps.changepoint(spark, Sf).collect().toSeq
    val events = {
      val ev = graft.sources.Tables.events(spark, Sf)
      ev.select(col("event_type"),
          TimeSeriesOps.dayOf(ev)
            .as("day"))
        .as[(String, Long)].collect().toVector
    }
    for (seed <- Seq(3, 17, 31)) {
      val rnd = new scala.util.Random(seed)
      val in = MemoryStream[(String, Long)]
      val counts = in.toDF().toDF("event_type", "day")
        .groupBy(col("event_type"), col("day"))
        .agg(count(lit(1)).as("cnt"))
      val name = s"ts_typedaily_state_$seed"
      val q = counts.writeStream.format("memory")
        .queryName(name).outputMode("complete").start()
      try {
        var rest = rnd.shuffle(events)
        while (rest.nonEmpty) {
          val (chunk, tail) = rest.splitAt(1 + rnd.nextInt(700))
          rest = tail
          in.addData(chunk: _*)
          q.processAllAvailable()
        }
        // rebuild as a local frame (the MemorySink single-attribute-set
        // caveat above) before serving both analytics from it
        val state = spark.table(name).collect()
          .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
          .toDF("event_type", "day", "cnt")
        assert(TimeSeriesOps.seasonalityCore(state).collect().toSeq == ts3,
          s"seed $seed: ts3 from streamed state drifted")
        assert(TimeSeriesOps.changepointCore(state).collect().toSeq == ts7,
          s"seed $seed: ts7 from streamed state drifted")
      } finally q.stop()
    }
  }
}
