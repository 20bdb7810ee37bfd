package graft

import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
import graft.operators.ScanOps
import graft.sources.Tables

/** Pins the harness `events` schema contract so a testdata regeneration
  * fails HERE with a readable message instead of as dozens of
  * downstream AnalysisExceptions (round 8 shipped `ts` as
  * timestamp[us] where round 7 had TIMESTAMP(NANOS); every consumer
  * now goes through the ScanOps.eventsTs / tsMicros dispatch, and THIS
  * spec is the early-warning tripwire for the next physical-type
  * change). */
class EventsSchemaSpec extends SparkSpec {

  test("events.ts physical type is in the supported dispatch set") {
    val dt = Tables.events(spark, Sf).schema("ts").dataType
    assert(dt == TimestampType || dt == TimestampNTZType || dt == LongType,
      s"events.ts regenerated as $dt — extend ScanOps.eventsTs/" +
        "tsMicrosSql to normalize it (every ts consumer dispatches " +
        "through those two helpers)")
  }

  test("eventsTs normalizes ts to TimestampType whatever arrives") {
    assert(ScanOps.eventsTs(spark, Sf).schema("ts").dataType == TimestampType)
  }

  test("tsMicros agrees with the normalized timestamp at full precision") {
    import org.apache.spark.sql.functions._
    val raw = Tables.events(spark, Sf)
    val viaMicros = raw
      .select(col("event_id"), ScanOps.tsMicros(raw).as("us"))
    val viaTs = ScanOps.eventsTs(spark, Sf)
      .select(col("event_id"), unix_micros(col("ts")).as("us"))
    assert(viaMicros.exceptAll(viaTs).isEmpty && viaTs.exceptAll(viaMicros).isEmpty)
  }

  test("events carries the full expected column set") {
    val fields = Tables.events(spark, Sf).schema.fieldNames.toSet
    val expected = Set("event_id", "user_id", "event_type", "value", "props", "ts")
    assert(expected.subsetOf(fields),
      s"events lost columns: ${expected -- fields}")
  }
}
