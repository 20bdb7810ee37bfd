package graft

import org.apache.spark.sql.functions._
import graft.operators.ScanOps

/** S11's contract: applying the I/U/D feed between two snapshots onto
  * the first snapshot reproduces the second EXACTLY — the composition
  * invariant a MERGE consumer relies on — plus the planted edge
  * semantics a coalesce-style merge gets wrong. */
class CdfApplySpec extends SparkSpec {

  private def keyed(rows: Array[org.apache.spark.sql.Row]) =
    rows.map { r =>
      (r.getAs[Long]("user_id"), r.getAs[String]("state"),
        Option(r.getAs[java.lang.Double]("value")).map(_.toDouble))
    }.sortBy(_._1).toSeq

  test("applyCdf(state1, diff(state1, state2)) == state2 on the fixture log") {
    val s1 = ScanOps.stateAtCutoff(spark, Sf, ScanOps.DiffCutoff1)
    val s2 = ScanOps.stateAtCutoff(spark, Sf, ScanOps.DiffCutoff2)
    val applied = keyed(ScanOps.cdfApply(spark, Sf).collect())
    val expected = keyed(s2.collect())
    assert(applied === expected, "round trip must reproduce the target snapshot")
    // non-vacuity: the feed between the cutoffs must actually contain
    // work, or the invariant is trivially true
    val ops = ScanOps.snapshotDiffAgainst(s1, s2)
      .select(col("op")).collect().map(_.getString(0)).toSet
    assert(ops.contains("I") || ops.contains("U"),
      "fixture regression: empty change feed between the s8 cutoffs")
  }

  test("planted merge semantics: carry, upsert (incl. null image), delete; base side never shuffles") {
    import spark.implicits._
    val base = Seq(
      (1L, "click", Option(1.0)), // untouched → carries verbatim
      (2L, "view", Option(2.0)),  // updated → takes the new image
      (3L, "click", Option(3.0)), // deleted → vanishes
      (4L, "view", Option(4.0))   // updated to a NULL value → must
                                  // become null, not resurrect 4.0
    ).toDF("user_id", "state", "value")
    val cdf = Seq(
      (2L, "U", Option("buy"), Option(9.0)),
      (3L, "D", None: Option[String], None: Option[Double]),
      (4L, "U", Option("view"), None: Option[Double]),
      (5L, "I", Option("click"), Option(5.0))
    ).toDF("user_id", "op", "new_state", "new_value")
    val out = ScanOps.applyCdf(base, cdf)
    assert(keyed(out.collect()) === Seq(
      (1L, "click", Some(1.0)),
      (2L, "buy", Some(9.0)),
      (4L, "view", None),
      (5L, "click", Some(5.0))))
    // the 100 TB claim: the merge plans a broadcast anti-join + union —
    // ZERO non-broadcast exchanges, the base streams scan-bound
    val plan = out.queryExecution.executedPlan.toString
    val exchanges = plan.linesIterator.count(l =>
      l.contains("Exchange") && !l.contains("BroadcastExchange"))
    assert(exchanges === 0,
      s"merge must not shuffle the base:\n" +
        plan.linesIterator.filter(_.contains("Exchange")).mkString("\n"))
  }

  test("replaying the per-batch CDF through applyCdf tracks the upstream table, 3 seeds") {
    // the downstream-REPLICA invariant a CDF subscriber relies on:
    // start from the empty table, apply each micro-batch's feed in
    // order — after EVERY batch the replica equals the upstream
    // visible state, under any event arrival order (advanceState's
    // tombstone-keeping compaction absorbs late arrivals)
    import spark.implicits._
    val events = ScanOps.eventsTs(spark, Sf).limit(600)
      .select(col("user_id"), col("event_type"), col("value"),
        col("ts"), col("event_id"))
      .collect().map(r => (r.getLong(0), r.getString(1),
        Option(r.getAs[java.lang.Double]("value")).map(_.toDouble),
        r.getTimestamp(3), r.getLong(4))).toVector
    assert(events.nonEmpty)
    for (seed <- Seq(1, 9, 27)) {
      val rnd = new scala.util.Random(seed)
      var state = Seq.empty[(Long, String, Option[Double],
          java.sql.Timestamp, Long)]
        .toDF("user_id", "state", "value", "ts", "event_id")
      var replica = Seq.empty[(Long, String, Option[Double])]
        .toDF("user_id", "state", "value")
      var rest = rnd.shuffle(events)
      val chunkSz = math.max(1, rest.length / 5)
      while (rest.nonEmpty) {
        val (chunk, tail) = rest.splitAt(chunkSz)
        rest = tail
        val batch = chunk
          .toDF("user_id", "event_type", "value", "ts", "event_id")
        val next = ScanOps.advanceState(state, batch).localCheckpoint()
        val feed = ScanOps.snapshotDiffAgainst(
          ScanOps.visibleState(state), ScanOps.visibleState(next))
        replica = ScanOps.applyCdf(replica, feed).localCheckpoint()
        state = next
        assert(keyed(replica.collect()) ===
          keyed(ScanOps.visibleState(state).collect()),
          s"seed $seed: replica diverged mid-stream")
      }
    }
  }
}
