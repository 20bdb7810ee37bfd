package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.{OutputMode, Trigger}
import graft.streaming.{MicroBatcher, StreamingScd2}
import graft.streaming.MicroBatcher.{Packet, Rec}
import graft.streaming.StreamingScd2.{Change, Scd2Row}

/** Seed-randomized equivalence fuzz for the stateful streaming layer —
  * the planted-scenario specs (StreamingScd2Spec, MicroBatcherSpec)
  * pin chosen corners; these drive RANDOM inputs through the same
  * processors and compare against independently-computed references,
  * several fixed seeds each (`new Random(seed)` — deterministic, no
  * wall-clock randomness):
  *
  *   - StreamingScd2 over a random change log, split at random batch
  *     boundaries and shuffled within batch, must compact to exactly
  *     the plain-Scala SCD-2 of the log (sort per user, version by
  *     ordinal, valid_to = next change's ts) — the s7 rule stated
  *     WITHOUT Spark, so a shared-bug between the batch and streaming
  *     DataFrame programs can't self-confirm.
  *   - MicroBatcher under random per-key bursts with duplicate record
  *     keys must flush exactly the g2 count-trigger arithmetic:
  *     floor(deduped/batchSize) full packets per key with contiguous
  *     seq numbers and no cross-packet payload repeats (asserted on
  *     totals, which are invariant to micro-batch coalescing).
  */
object StreamingFuzzSpec {
  case class KeyPlan(apiType: Int, distinct1: Int, dup1: Int, distinct2: Int)
}

class StreamingFuzzSpec extends SparkSpec {
  import StreamingFuzzSpec.KeyPlan

  /** Default 3 seeds keep the suite fast; the round-close widened
    * sweep sets SPARK_GRAFT_FUZZ_SEEDS=1,2,…,8 and reruns this suite
    * — the discipline the per-round "seeds re-verified on the final
    * registry" notes refer to, now a knob instead of a code edit. */
  private val Seeds: Seq[Int] =
    sys.env.get("SPARK_GRAFT_FUZZ_SEEDS")
      .map(_.split(",").toSeq.map(_.trim.toInt))
      .getOrElse(Seq(11, 23, 47))

  /** Plain-Scala s7: the SCD-2 of a change log, no Spark involved. */
  private def scd2Reference(log: Seq[Change]): Set[Scd2Row] =
    log.groupBy(_.userId).flatMap { case (u, cs) =>
      val ordered = cs.sortBy(c => (c.tsMicros, c.eventId))
      ordered.zipWithIndex.map { case (c, i) =>
        val next = if (i + 1 < ordered.size) Some(ordered(i + 1).tsMicros) else None
        Scd2Row(u, i + 1, c.state, c.value, c.tsMicros, next,
          if (next.isEmpty) 1 else 0)
      }
    }.toSet

  /** Closed-supersedes-open compaction (as StreamingScd2Spec). */
  private def reconstruct(rows: Seq[Scd2Row]): Set[Scd2Row] =
    rows.groupBy(r => (r.userId, r.version)).values.map { vs =>
      vs.find(_.validToMicros.isDefined).getOrElse(vs.head)
    }.toSet

  test("fuzz: StreamingScd2 compaction == plain-Scala SCD-2 over random logs, 3 seeds") {
    withRocksDBStateStore {
      implicit val sq = spark.sqlContext
      import spark.implicits._
      Seeds.foreach { seed =>
        val rnd = new scala.util.Random(seed)
        val states = Vector("click", "view", "purchase", "error")
        val log = (1 to 60).map { id =>
          Change(rnd.nextInt(8).toLong + 1, id.toLong,
            // coarse grid → deliberate same-user ts ties exercise the
            // (ts, event_id) tie-break on both sides
            rnd.nextInt(40) * 1000000L,
            states(rnd.nextInt(states.size)),
            math.round(rnd.nextDouble() * 100) / 10.0)
        }
        // arrival: globally ts-ordered chunks at random cut points
        // (per-entity cross-batch order is the streaming contract, as
        // in the reference's CDC source), shuffled WITHIN each chunk
        val ordered = log.sortBy(c => (c.tsMicros, c.eventId))
        val cuts = (Seq(0, ordered.size) ++
          Seq.fill(3)(rnd.nextInt(ordered.size))).distinct.sorted
        val chunks = cuts.sliding(2).map { case Seq(a, b) =>
          rnd.shuffle(ordered.slice(a, b))
        }.filter(_.nonEmpty).toSeq
        val in = MemoryStream[Change]
        val q = StreamingScd2(in.toDS()).writeStream.format("memory")
          .queryName(s"scd2_fuzz_$seed").outputMode("append").start()
        try {
          chunks.foreach { chunk =>
            in.addData(chunk: _*)
            q.processAllAvailable()
          }
          val emitted = spark.table(s"scd2_fuzz_$seed").as[Scd2Row]
            .collect().toSeq
          assert(reconstruct(emitted) === scd2Reference(log),
            s"seed $seed diverged from the plain-Scala SCD-2")
        } finally q.stop()
      }
    }
  }

  test("fuzz: MicroBatcher flushes exactly the g2 count-trigger arithmetic, 3 seeds") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val B = 7
    Seeds.foreach { seed =>
      val rnd = new scala.util.Random(seed)
      // per key: wave 1 with duplicate record keys (dedup must collapse
      // them), wave 2 all-fresh keys (so expected totals are exact
      // whatever the remainder's key set is)
      val plans = (0 until 3).map { i =>
        KeyPlan(100 * seed + i, 5 + rnd.nextInt(30), rnd.nextInt(10),
          5 + rnd.nextInt(30))
      }
      def wave1(p: KeyPlan): Seq[Rec] = rnd.shuffle(
        (0 until p.distinct1 + p.dup1).map(j =>
          Rec(p.apiType, s"w1_${j % p.distinct1}", s"p${j % p.distinct1}")))
      def wave2(p: KeyPlan): Seq[Rec] =
        (0 until p.distinct2).map(j => Rec(p.apiType, s"w2_$j", s"q$j"))
      // g2's rule: floor(deduped/B) full buckets per key — coalescing
      // micro-batches never changes the total (full batches first,
      // remainder carries)
      val expect = plans.map(p =>
        p.apiType -> (p.distinct1 + p.distinct2) / B).toMap
      val in = MemoryStream[Rec]
      val q = MicroBatcher(in.toDS(), batchSize = B, timeoutMs = 600000L)
        .writeStream.format("memory")
        .queryName(s"mb_fuzz_$seed").outputMode(OutputMode.Append)
        .trigger(Trigger.ProcessingTime(50)).start()
      try {
        in.addData(rnd.shuffle(plans.flatMap(wave1)))
        in.addData(plans.flatMap(wave2))
        val deadline = System.currentTimeMillis() + 30000
        var out = Seq.empty[Packet]
        while (System.currentTimeMillis() < deadline && {
          out = spark.table(s"mb_fuzz_$seed").as[Packet].collect().toSeq
          out.count(_.reason == "count") < expect.values.sum
        }) Thread.sleep(100)
        plans.foreach { p =>
          val mine = out.filter(_.apiType == p.apiType)
          assert(mine.forall(_.reason == "count"),
            s"seed $seed key ${p.apiType}: non-count flush ${mine.map(_.reason)}")
          assert(mine.size === expect(p.apiType),
            s"seed $seed key ${p.apiType}: ${mine.size} packets, " +
              s"expected ${expect(p.apiType)} (d1=${p.distinct1} d2=${p.distinct2})")
          assert(mine.forall(_.size === B))
          // packet identity: contiguous seq from 0
          assert(mine.map(_.seq).sorted === (0 until mine.size).map(_.toLong),
            s"seed $seed key ${p.apiType}: seq gap ${mine.map(_.seq).sorted}")
          // dedup: no payload ever flushes twice
          val flushed = mine.flatMap(_.items)
          assert(flushed.distinct.size === flushed.size,
            s"seed $seed key ${p.apiType}: duplicate payload flushed")
        }
      } finally q.stop()
    }
  }
}
