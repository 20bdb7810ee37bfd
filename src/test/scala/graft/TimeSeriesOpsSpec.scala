package graft

import graft.operators.TimeSeriesOps

/** The ts family against dense plain-Scala references: the sparse
  * algebra (`Σcu²+Σcp²−2·dot`; the motif delta identity) must equal a
  * literal dense evaluation over the materialized day grid — including
  * the zero days the relational form never generates. */
class TimeSeriesOpsSpec extends SparkSpec {

  private lazy val counts: Map[Long, Map[Long, Long]] =
    TimeSeriesOps.dayCounts(spark, Sf).collect()
      .groupBy(_.getLong(0))
      .map { case (u, rs) =>
        u -> rs.map(r => r.getLong(1) -> r.getLong(2)).toMap }

  test("ts1: sparse sse identity == dense reference; top-k set and order exact") {
    val probe = counts(TimeSeriesOps.ProbeUser)
    def sse(u: Map[Long, Long]): Long =
      (u.keySet ++ probe.keySet).toSeq.map { d =>
        val diff = u.getOrElse(d, 0L) - probe.getOrElse(d, 0L)
        diff * diff
      }.sum
    val expected = counts.keys.filter(_ != TimeSeriesOps.ProbeUser).toSeq
      .map(u => (u, sse(counts(u))))
      .sortBy { case (u, s) => (s, u) }
      .take(TimeSeriesOps.TopK)
    val got = TimeSeriesOps.seriesKnn(spark, Sf).collect()
      .map(r => (r.getLong(1), r.getLong(2))).toSeq
    assert(got == expected, "sparse SSE drifted from the dense reference")
  }

  test("ts3: lag autocovariance == dense reference; exactly one peak per type") {
    import org.apache.spark.sql.functions.{col, expr, count, lit}
    val ev = graft.sources.Tables.events(spark, Sf)
    val daily = ev.select(col("event_type"),
        expr(s"(${graft.operators.ScanOps.tsMicrosSql(ev)}) div ${graft.operators.WindowOps.DayMicros}")
          .as("day"))
      .groupBy(col("event_type"), col("day")).agg(count(lit(1)).as("cnt"))
      .collect().groupBy(_.getString(0))
      .map { case (t, rs) => t -> rs.map(r => r.getLong(1) -> r.getLong(2)).toMap }
    val rows = TimeSeriesOps.seasonality(spark, Sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (t, lag) = (r.getString(0), r.getInt(1))
      val series = daily(t)
      val expect = series.toSeq.map { case (d, c) =>
        c * series.getOrElse(d + lag, 0L) }.sum
      assert(r.getLong(2) == expect, s"$t lag $lag rnum drift")
    }
    rows.groupBy(_.getString(0)).foreach { case (t, rs) =>
      assert(rs.map(_.getInt(4)).sum == 1, s"$t: peak flag count != 1")
      val peak = rs.find(_.getInt(4) == 1).get
      assert(rs.forall(r => r.getLong(2) < peak.getLong(2) ||
        (r.getLong(2) == peak.getLong(2) && r.getInt(1) >= peak.getInt(1))),
        s"$t: peak is not the max-rnum smallest-lag row")
    }
  }

  test("ts2: best motif window == dense sliding reference") {
    val probe = counts(TimeSeriesOps.ProbeUser)
    val pmax = probe.keys.max
    val m = (0 until TimeSeriesOps.MotifLen).map(i =>
      probe.getOrElse(pmax - (TimeSeriesOps.MotifLen - 1 - i), 0L))
    def best(u: Map[Long, Long]): (Long, Long) = {
      // candidate starts: any window overlapping at least one active day
      val starts = u.keySet.flatMap(d =>
        (0 until TimeSeriesOps.MotifLen).map(i => d - i))
      starts.toSeq.map { w =>
        val s = (0 until TimeSeriesOps.MotifLen).map { i =>
          val diff = u.getOrElse(w + i, 0L) - m(i)
          diff * diff
        }.sum
        (s, w)
      }.min match { case (s, w) => (w, s) }
    }
    val expected = counts.keys.filter(_ != TimeSeriesOps.ProbeUser).toSeq
      .map { u => val (w, s) = best(counts(u)); (u, w, s) }
      .sortBy { case (u, _, s) => (s, u) }
      .take(TimeSeriesOps.TopK)
    val got = TimeSeriesOps.motifMatch(spark, Sf).collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got == expected, "motif best-window drifted from the dense slide")
  }

  /** Plain-Scala SAX reference: per-user (word, symbols by segment). */
  private lazy val saxRef: Map[Long, (Long, IndexedSeq[Long])] = {
    val dmin = counts.values.flatMap(_.keys).min
    counts.map { case (u, series) =>
      val syms = (0 until TimeSeriesOps.NumSegs).map { seg =>
        val ssum = series.collect {
          case (d, c) if (d - dmin) / TimeSeriesOps.SegDays == seg => c
        }.sum
        if (ssum == 0L) 0L
        else if (ssum >= TimeSeriesOps.BpHigh) 3L
        else if (ssum >= TimeSeriesOps.BpMid) 2L else 1L
      }
      val word = syms.zipWithIndex.map { case (s, i) => s << (2 * i) }.sum
      u -> (word, syms)
    }
  }

  test("ts4: packed SAX words, bucket occupancy and probe flag == scalar reference") {
    val rows = TimeSeriesOps.saxIndex(spark, Sf).collect()
    assert(rows.length == counts.size)
    val words = saxRef.view.mapValues(_._1).toMap
    val occupancy = words.values.groupBy(identity).view.mapValues(_.size).toMap
    val probeWord = words(TimeSeriesOps.ProbeUser)
    rows.foreach { r =>
      val u = r.getLong(0)
      assert(r.getLong(1) == words(u), s"user $u word")
      assert(r.getLong(2) == saxRef(u)._2.count(_ != 0L), s"user $u n_active_segs")
      assert(r.getLong(3) == occupancy(words(u)).toLong, s"user $u n_bucket")
      assert(r.getInt(4) == (if (words(u) == probeWord) 1 else 0))
    }
  }

  test("ts5: candidates are exactly the hamming<=1 words; sse values match ts1's exact distances") {
    def hamming(a: IndexedSeq[Long], b: IndexedSeq[Long]): Int =
      a.zip(b).count { case (x, y) => x != y }
    val probeSyms = saxRef(TimeSeriesOps.ProbeUser)._2
    val expectedCand = saxRef.collect {
      case (u, (_, syms)) if u != TimeSeriesOps.ProbeUser &&
        hamming(syms, probeSyms) <= 1 => u
    }.toSet
    val probe = counts(TimeSeriesOps.ProbeUser)
    def sse(u: Map[Long, Long]): Long =
      (u.keySet ++ probe.keySet).toSeq.map { d =>
        val diff = u.getOrElse(d, 0L) - probe.getOrElse(d, 0L)
        diff * diff
      }.sum
    val expected = expectedCand.toSeq.map(u => (u, sse(counts(u))))
      .sortBy { case (u, s) => (s, u) }
      .take(TimeSeriesOps.TopK)
    val got = TimeSeriesOps.saxKnn(spark, Sf).collect()
      .map(r => (r.getLong(1), r.getLong(2))).toSeq
    assert(got == expected,
      "index-served knn drifted from the banded-candidate dense reference")
    assert(got.nonEmpty, "probe bucket degenerate at fixture scale")
  }
}
