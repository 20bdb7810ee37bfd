package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}

/** Streaming maintenance of S7's SCD Type-2 history
  * (`graft.operators.ScanOps.scd2`): as changes arrive, each entity's
  * OPEN interval closes at the new change's timestamp and a new open
  * version begins — the CDC-consumer side of the reference's MySQL
  * state tables, kept as a warehouse-style history instead of
  * overwritten rows.
  *
  * Emission contract (append-mode changelog): every change emits the
  * CLOSED predecessor row (valid_to = the new change's ts,
  * is_current = 0) and the new OPEN row (valid_to = None,
  * is_current = 1). A (user, version) pair sees at most two emissions
  * — its open row, then its closure — so the downstream reconstruction
  * is "closed supersedes open per (user, version)": exactly the
  * latest-wins compaction every CDC sink (or S6's snapshot query)
  * already performs, and StreamingScd2Spec pins the reconstructed
  * table equal to the batch operator row-for-row.
  *
  * State per entity is ONE open-row record (O(1), RocksDB-backed —
  * unbounded entity counts spill off-heap); no timers. Within a batch,
  * rows sort by (ts, event_id) before folding so intra-batch order
  * cannot depend on shuffle arrival; across batches the source is
  * assumed in-order per key (the reference's poll scans guarantee it —
  * id-watermark ordering; a production deployment handles stragglers
  * with an event-time watermark + retraction, which this changelog
  * contract already supports downstream). */
object StreamingScd2 {

  /** One CDC change record. `tsMicros` is the event time at the full
    * precision the source delivers (µs — the batch operator
    * ScanOps.scd2 orders by the same normalized-to-µs ts, so versions
    * agree; ties break on eventId on both paths). */
  case class Change(userId: Long, eventId: Long, tsMicros: Long,
      state: String, value: Double)

  /** One history row of the changelog. */
  case class Scd2Row(userId: Long, version: Int, state: String,
      value: Double, validFromMicros: Long, validToMicros: Option[Long],
      isCurrent: Int)

  class Scd2Processor extends StatefulProcessor[Long, Change, Scd2Row] {

    @transient private var open: ValueState[Scd2Row] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      open = getHandle.getValueState[Scd2Row]("open",
        Encoders.product[Scd2Row], TTLConfig.NONE)

    override def handleInputRows(key: Long, rows: Iterator[Change],
        timerValues: TimerValues): Iterator[Scd2Row] = {
      val ordered = rows.toList.sortBy(c => (c.tsMicros, c.eventId))
      if (ordered.isEmpty) Iterator.empty
      else {
        var cur = if (open.exists()) Option(open.get()) else None
        val out = List.newBuilder[Scd2Row]
        ordered.foreach { c =>
          cur.foreach { o =>
            out += o.copy(validToMicros = Some(c.tsMicros), isCurrent = 0)
          }
          val next = Scd2Row(key, cur.map(_.version).getOrElse(0) + 1,
            c.state, c.value, c.tsMicros, None, 1)
          out += next
          cur = Some(next)
        }
        open.update(cur.get)
        out.result().iterator
      }
    }

    override def handleExpiredTimer(key: Long, timerValues: TimerValues,
        expiredTimerInfo: ExpiredTimerInfo): Iterator[Scd2Row] =
      Iterator.empty // no timers registered
  }

  def apply(ds: Dataset[Change]): Dataset[Scd2Row] = {
    import ds.sparkSession.implicits._
    ds.groupByKey(_.userId)
      .transformWithState(new Scd2Processor,
        TimeMode.None(), OutputMode.Append())
  }
}
