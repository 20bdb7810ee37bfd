package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, ListState, OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}
import graft.streaming.MicroBatcher.{Packet, Rec}

/** G2 on Spark 4's `transformWithState` — the successor API of
  * `flatMapGroupsWithState` (what [[MicroBatcher]] uses) and the one
  * new stateful work should target:
  *
  *   - TYPED state handles (ListState buffer / ValueState counter)
  *     instead of one monolithic case-class blob: the buffer appends
  *     without rewriting the whole state value, and each handle can
  *     carry its own TTL;
  *   - explicit, durable timers (`registerTimer`/`deleteTimer`/
  *     `listTimers`) instead of the implicit re-armed
  *     `setTimeoutDuration` — this class sweeps-and-re-arms to keep
  *     v1's one-deadline-per-key semantics, but the API supports
  *     several in-flight deadlines when an operator wants them;
  *   - RocksDB-backed only — state lives off-heap/on-disk, the 100 TB
  *     deployment posture (StreamingDurabilitySpec pins the backend).
  *
  * Same contract as [[MicroBatcher]]: flush a full packet per
  * `batchSize` buffered rows immediately (count path), flush the
  * remainder when the per-key timer expires (timeout path), dedup
  * within the current buffer, and keep (apiType, seq) a unique packet
  * identity across the key's lifetime. The force-flush safety net is
  * unnecessary here: timers are durable state, not a per-call re-arm,
  * so a delayed micro-batch cannot lose one.
  */
object MicroBatcherV2 {

  class BatcherProcessor(batchSize: Int, timeoutMs: Long)
      extends StatefulProcessor[Int, Rec, Packet] {

    @transient private var pending: ListState[Rec] = _
    @transient private var seq: ValueState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      pending = getHandle.getListState[Rec]("pending", Encoders.product[Rec], TTLConfig.NONE)
      seq = getHandle.getValueState[Long]("seq", Encoders.scalaLong, TTLConfig.NONE)
    }

    private def seq0: Long = if (seq.exists()) seq.get() else 0L

    override def handleInputRows(key: Int, rows: Iterator[Rec],
        timerValues: TimerValues): Iterator[Packet] = {
      val prior = pending.get().toList
      val seen = prior.map(_.recordKey).toSet
      val fresh = rows.filterNot(r => seen(r.recordKey)).toList.distinctBy(_.recordKey)
      val all = prior ++ fresh
      val (full, rest) = all.grouped(batchSize).toList.partition(_.size == batchSize)
      val s0 = seq0
      val packets = full.zipWithIndex.map { case (chunk, i) =>
        Packet(key, s0 + i, chunk.size, chunk.map(_.payload), "count")
      }
      val remainder = rest.flatten
      pending.clear()
      // v1-equivalent re-arm semantics: ONE live deadline per key,
      // reset by every input call — without the sweep, a timer armed
      // before a count flush would fire the NEXT remainder early
      getHandle.listTimers().foreach(t =>
        getHandle.deleteTimer(t.asInstanceOf[Long]))
      if (remainder.nonEmpty) {
        pending.put(remainder.toArray)
        getHandle.registerTimer(timerValues.getCurrentProcessingTimeInMs + timeoutMs)
      }
      seq.update(s0 + full.size)
      packets.iterator
    }

    override def handleExpiredTimer(key: Int, timerValues: TimerValues,
        expiredTimerInfo: ExpiredTimerInfo): Iterator[Packet] = {
      val prior = pending.get().toList
      if (prior.isEmpty) Iterator.empty // stale timer after a count flush
      else {
        pending.clear()
        val s0 = seq0
        seq.update(s0 + 1)
        Iterator.single(Packet(key, s0, prior.size, prior.map(_.payload), "timeout"))
      }
    }
  }

  def apply(ds: Dataset[Rec], batchSize: Int, timeoutMs: Long): Dataset[Packet] = {
    import ds.sparkSession.implicits._
    ds.groupByKey(_.apiType)
      .transformWithState(new BatcherProcessor(batchSize, timeoutMs),
        TimeMode.ProcessingTime(), OutputMode.Append())
  }
}
