package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.operators.AuditOps

/** The dq1 events-audit core as a per-micro-batch data-quality monitor:
  * the same fused aggregate runs in foreachBatch over each batch and
  * appends (batch_id, constraint, counters) — the commit gate every
  * streaming ingest runs before publishing a batch. Planted violations
  * must surface in the right batch with the right counts. */
class StreamingAuditSpec extends SparkSpec {

  case class Ev(event_id: Long, ts: Long, user_id: java.lang.Long,
      event_type: String, value: java.lang.Double, props: String)

  test("per-batch monitor: planted violations land in their batch's counters") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val in = MemoryStream[Ev]
    val results = new scala.collection.mutable.ArrayBuffer[(Long, String, Long, Long)]
    val q = in.toDF().writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, id: Long) =>
        AuditOps.eventsAuditCore(batch).collect().foreach { r =>
          results.synchronized {
            results += ((id, r.getAs[String]("constraint_name"),
              r.getAs[Long]("n_rows"), r.getAs[Long]("n_violations")))
          }
        }
        ()
      }
      .start()
    try {
      // batch 0: clean
      in.addData(
        Ev(1, 10, 7L, "click", 1.0, "{}"),
        Ev(2, 11, 8L, "view", 2.0, "{}"))
      q.processAllAvailable()
      // batch 1: planted — null user, negative value, duplicate id
      in.addData(
        Ev(3, 12, null, "click", 3.0, "{}"),
        Ev(4, 13, 9L, "error", -5.0, "{}"),
        Ev(4, 14, 9L, "error", 4.0, "{}"))
      q.processAllAvailable()
      val byBatch = results.groupBy(_._1)
      val b0 = byBatch(0L).map(t => t._2 -> t._4).toMap
      assert(byBatch(0L).forall(_._3 == 2))
      assert(b0.values.forall(_ == 0L), b0.toString)
      val b1 = byBatch(1L).map(t => t._2 -> t._4).toMap
      assert(byBatch(1L).forall(_._3 == 3))
      assert(b1("events.user_id_not_null") == 1L)
      assert(b1("events.value_non_negative") == 1L)
      assert(b1("events.event_id_unique") == 1L)
      assert(b1("events.props_not_null") == 0L)
    } finally q.stop()
  }
}
