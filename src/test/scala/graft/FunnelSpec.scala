package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.operators.WindowOps

/** W6 funnel-ordering semantics on crafted rows: a later stage counts
  * only when it happens STRICTLY after the previous stage's first hit —
  * the property the sf-scale oracle can confirm but not isolate. */
class FunnelSpec extends SparkSpec {

  private def ts(min: Long) = new Timestamp(min * 60000L)

  private def run(rows: Seq[(Long, String, Timestamp)]) = {
    import spark.implicits._
    WindowOps.funnelCore(rows.toDF("user_id", "event_type", "ts"))
      .collect().map(r => r.getAs[Long]("user_id") -> r.getAs[Int]("funnel_stage"))
      .toMap
  }

  test("full view→click→purchase path reaches stage 3") {
    val stages = run(Seq(
      (1L, "view", ts(0)), (1L, "click", ts(10)), (1L, "purchase", ts(20))))
    assert(stages(1L) === 3)
  }

  test("purchase before the first qualifying click does not count") {
    // user 2: purchase at t=5 precedes the click at t=10 → stage stops at 2
    val stages = run(Seq(
      (2L, "view", ts(0)), (2L, "purchase", ts(5)), (2L, "click", ts(10))))
    assert(stages(2L) === 2)
  }

  test("click before the first view does not open the funnel") {
    val stages = run(Seq(
      (3L, "click", ts(0)), (3L, "view", ts(5)),
      (4L, "click", ts(0)), (4L, "view", ts(5)), (4L, "click", ts(9))))
    assert(stages(3L) === 1) // click preceded the view; no later click
    assert(stages(4L) === 2) // the SECOND click (after the view) qualifies
  }

  test("same-timestamp events are strict: equal ts does not advance") {
    val stages = run(Seq((5L, "view", ts(0)), (5L, "click", ts(0))))
    assert(stages(5L) === 1)
  }

  test("no view at all is stage 0") {
    val stages = run(Seq((6L, "purchase", ts(0)), (6L, "error", ts(1))))
    assert(stages(6L) === 0)
  }

  test("w11: trigram paths == plain-Scala sliding recount on the fixture; tails drop; crafted order respected") {
    // crafted rows: user streams never mix, a 2-event user yields no
    // trigram, and the path follows (ts, event_id) order
    import spark.implicits._
    val crafted = Seq(
      (1L, 1L, ts(0), "a"), (1L, 2L, ts(1), "b"), (1L, 3L, ts(2), "c"),
      (1L, 4L, ts(3), "d"), // a,b,c + b,c,d
      (2L, 5L, ts(0), "x"), (2L, 6L, ts(1), "y")) // too short
      .toDF("user_id", "event_id", "ts", "event_type")
    val got = WindowOps.pathNgramsCore(crafted).collect()
      .map(r => (r.getAs[String]("step1"), r.getAs[String]("step2"),
        r.getAs[String]("step3"), r.getAs[Long]("n_paths"))).toSet
    assert(got == Set(("a", "b", "c", 1L), ("b", "c", "d", 1L)))
    // fixture recount: every user's chronological trigram multiset
    val ev = graft.operators.ScanOps.eventsTs(spark, Sf)
      .select(col("user_id"), col("event_id"), col("ts"), col("event_type"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getTimestamp(2).getTime,
        r.getString(3)))
    val paths = ev.groupBy(_._1).toSeq.flatMap { case (_, rows) =>
      rows.sortBy(r => (r._3, r._2)).map(_._4).sliding(3)
        .filter(_.length == 3).map(g => (g(0), g(1), g(2))).toSeq
    }
    val counts = paths.groupBy(identity).view.mapValues(_.length.toLong).toSeq
    val expected = counts
      .sortBy { case ((a, b, c), n) => (-n, a, b, c) }
      .take(WindowOps.PathTopK).zipWithIndex
      .map { case (((a, b, c), n), i) => (i + 1, a, b, c, n) }
    val fixture = WindowOps.pathNgrams(spark, Sf).collect()
      .map(r => (r.getAs[Int]("rank"), r.getAs[String]("step1"),
        r.getAs[String]("step2"), r.getAs[String]("step3"),
        r.getAs[Long]("n_paths"))).toSeq
    assert(fixture == expected,
      "window path mining drifted from the dense sliding recount")
  }

  test("funnel plan shuffles once: a single exchange under the window chain") {
    import spark.implicits._
    val df = WindowOps.funnelCore(
      Seq((1L, "view", ts(0))).toDF("user_id", "event_type", "ts"))
    val plan = df.queryExecution.executedPlan.toString()
    val exchanges = "(?i)Exchange hashpartitioning".r
      .findAllIn(plan).length
    // one hash exchange on user_id feeds windows + agg; the final
    // orderBy adds a range exchange, which is the oracle-determinism
    // sort, not a data shuffle
    assert(exchanges === 1, s"expected 1 hash exchange, plan:\n$plan")
  }
}
