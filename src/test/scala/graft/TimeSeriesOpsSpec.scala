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

  test("ts8: discord ranking == dense plain-Scala sliding recount (words, occupancy, order)") {
    val ts = TimeSeriesOps
    val allDays = counts.values.flatMap(_.keys)
    val (d0, d1) = (allDays.min, allDays.max)
    val span = d1 - d0
    // dense reference: EVERY window position of every user, symbol 0
    // for inactive days, windows with no active day dropped (the
    // not-active-not-indexed rule)
    def sym(c: Option[Long]): Long = c match {
      case None => 0L
      case Some(v) if v >= ts.DayBpHigh => 3L
      case Some(v) if v >= ts.DayBpMid => 2L
      case Some(_) => 1L
    }
    val windows = for {
      (u, ds) <- counts.toSeq
      w <- 0L to (span - (ts.DiscordLen - 1))
      slots = (0 until ts.DiscordLen).map(i => ds.get(d0 + w + i))
      if slots.exists(_.isDefined)
    } yield {
      val word = slots.zipWithIndex.map { case (c, i) => sym(c) << (2 * i) }.sum
      (u, w, word, slots.map(_.getOrElse(0L)))
    }
    val occ = windows.groupBy(_._3).view.mapValues(_.size.toLong).toMap
    val expected = windows
      .map { case (u, w, word, cs) => (occ(word), word, u, w, cs) }
      .sortBy { case (n, word, u, w, _) => (n, word, u, w) }
      .take(ts.TopK).zipWithIndex
      .map { case ((n, word, u, w, cs), i) =>
        (i + 1, u, w, word, n, cs(0), cs(1), cs(2)) }
    val got = TimeSeriesOps.saxDiscord(spark, Sf).collect()
      .map(r => (r.getAs[Int]("rank"), r.getAs[Long]("user_id"),
        r.getAs[Long]("wstart"), r.getAs[Long]("word"),
        r.getAs[Long]("n_bucket"), r.getAs[Long]("c0"),
        r.getAs[Long]("c1"), r.getAs[Long]("c2"))).toSeq
    assert(got == expected,
      "sparse discord pipeline drifted from the dense sliding reference")
    // the ranking is non-vacuous: the top discord's word is strictly
    // rarer than the modal word
    assert(occ.values.max > got.head._5,
      "fixture regression: all words equally common — retune breakpoints")
  }

  test("ts3: lag autocovariance == dense reference; exactly one peak per type") {
    import org.apache.spark.sql.functions.{col, expr, count, lit}
    val ev = graft.sources.Tables.events(spark, Sf)
    val daily = ev.select(col("event_type"),
        TimeSeriesOps.dayOf(ev)
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

  test("ts6: best alignment lag per user == dense cross-covariance reference") {
    val probe = counts(TimeSeriesOps.ProbeUser)
    val expected = counts.keys.filter(_ != TimeSeriesOps.ProbeUser).toSeq
      .sorted.flatMap { u =>
        val series = counts(u)
        val byLag = (-TimeSeriesOps.MaxLag to TimeSeriesOps.MaxLag).flatMap { lag =>
          val overlap = series.keys.toSeq
            .filter(d => probe.contains(d + lag))
          if (overlap.isEmpty) None
          else Some((lag,
            overlap.map(d => series(d) * probe(d + lag)).sum,
            overlap.size.toLong))
        }
        if (byLag.isEmpty) None
        else {
          val (lag, dot, n) = byLag.minBy { case (l, d, _) =>
            (-d, math.abs(l), l) }
          Some((u, lag, dot, n))
        }
      }
    val got = TimeSeriesOps.leadLag(spark, Sf).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got == expected, "lead/lag alignment drifted from the dense reference")
    assert(got.nonEmpty)
  }

  test("ts7: peak scaled-CUSUM day == scalar replay over the active-day sequence") {
    import org.apache.spark.sql.functions.{col, expr, count, lit}
    val ev = graft.sources.Tables.events(spark, Sf)
    val daily = ev.select(col("event_type"),
        TimeSeriesOps.dayOf(ev)
          .as("day"))
      .groupBy(col("event_type"), col("day")).agg(count(lit(1)).as("cnt"))
      .collect().groupBy(_.getString(0))
      .map { case (t, rs) => t -> rs.map(r => r.getLong(1) -> r.getLong(2)).toMap }
    val rows = TimeSeriesOps.changepoint(spark, Sf).collect()
    assert(rows.map(_.getString(0)).toSet == daily.keySet)
    rows.foreach { r =>
      val series = daily(r.getString(0)).toSeq.sortBy(_._1)
      val n = series.length.toLong
      val total = series.map(_._2).sum
      var c = 0L
      val cusums = series.map { case (d, cnt) =>
        c += cnt * n - total; (d, c) }
      val (wantDay, wantCusum) = cusums.minBy { case (d, cu) =>
        (-math.abs(cu), d) }
      assert(r.getLong(1) == wantDay, s"${r.getString(0)} peak day")
      assert(r.getLong(2) == wantCusum, s"${r.getString(0)} peak cusum")
      assert(r.getLong(3) == n && r.getLong(4) == total)
      // the scaled statistic telescopes to 0 at the series end — the
      // invariant that proves the deviations are against the true mean
      assert(cusums.last._2 == 0L, s"${r.getString(0)} cusum must end at 0")
    }
  }

  test("ts4/ts5 fuzz: random sparse series — packed words and banded candidates == scalar reference, 3 seeds") {
    import spark.implicits._
    for (seed <- Seq(7, 23, 41)) {
      val rnd = new scala.util.Random(seed)
      // random sparse counts: ~40 users, days drawn over ~5 segments'
      // span so clipping (seg >= NumSegs) and absent segments both occur
      val span = TimeSeriesOps.SegDays * (TimeSeriesOps.NumSegs + 1)
      val base = 1000L + rnd.nextInt(500)
      val rows = (0L until 40L).flatMap { u =>
        val days = rnd.shuffle((0 until span).toList)
          .take(1 + rnd.nextInt(span - 1))
        days.map(d => (u, base + d, 1L + rnd.nextInt(9)))
      }
      val c = rows.toDF("user_id", "day", "cnt")
      val dmin = rows.map(_._2).min
      // a user whose every active day falls beyond the indexed window
      // (seg >= NumSegs after clipping) has NO word row — "not active
      // in the window → not indexed", same rule on both engines; the
      // reference must mirror it, not invent an all-zero word
      def indexed(u: Long): Boolean = rows.exists { case (uu, d, _) =>
        uu == u && (d - dmin) / TimeSeriesOps.SegDays < TimeSeriesOps.NumSegs
      }
      def symsOf(u: Long): IndexedSeq[Long] =
        (0 until TimeSeriesOps.NumSegs).map { seg =>
          val ssum = rows.collect {
            case (uu, d, cn) if uu == u &&
              (d - dmin) / TimeSeriesOps.SegDays == seg => cn
          }.sum
          if (ssum == 0L) 0L
          else if (ssum >= TimeSeriesOps.BpHigh) 3L
          else if (ssum >= TimeSeriesOps.BpMid) 2L else 1L
        }
      val words = TimeSeriesOps.saxWords(c).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(words.keySet == (0L until 40L).filter(indexed).toSet,
        s"seed $seed: indexed-user set drifted")
      words.keys.foreach { u =>
        val want = symsOf(u).zipWithIndex.map { case (s, i) => s << (2 * i) }.sum
        assert(words(u) == want, s"seed $seed user $u word")
      }
      val probeSyms = symsOf(TimeSeriesOps.ProbeUser)
      val wantCand =
        if (!indexed(TimeSeriesOps.ProbeUser)) Set.empty[Long]
        else (1L until 40L).filter(u => indexed(u) &&
          symsOf(u).zip(probeSyms).count { case (a, b) => a != b } <= 1).toSet
      val got = TimeSeriesOps.saxKnnCore(spark, c).collect()
        .map(_.getLong(1)).toSet
      // served rows are the top-K of the candidate set ranked by SSE —
      // membership check suffices here (exact ranking is the fixture
      // test's job); with ≤40 users the bucket fits inside TopK rarely,
      // so assert subset + that every candidate beyond TopK was ranked
      assert(got.subsetOf(wantCand),
        s"seed $seed: served a non-candidate (hamming > 1)")
      assert(got.size == math.min(wantCand.size, TimeSeriesOps.TopK),
        s"seed $seed: served ${got.size} of ${wantCand.size} candidates")
    }
  }

  test("ts11: the probe-0 slice of the multi-probe serve == ts5's single-probe answer row-for-row") {
    // ProbeUser (0) is a member of the ts11 cohort, so the workload
    // serve must contain ts5's entire answer verbatim — rank order,
    // distances, energies — and per-probe row counts stay within
    // top-k
    val single = TimeSeriesOps.saxKnn(spark, Sf).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSeq
    val multi = TimeSeriesOps.saxMultiProbe(spark, Sf).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6))).toSeq
    val slice0 = multi.filter(_._1 == TimeSeriesOps.ProbeUser)
      .map { case (_, rank, u, sse, dot, ss, nd) =>
        (rank, u, sse, dot, ss, nd) }
    assert(slice0 == single,
      s"probe-0 slice diverged from ts5: $slice0 vs $single")
    val perProbe = multi.groupBy(_._1).view.mapValues(_.size)
    assert(perProbe.values.forall(_ <= TimeSeriesOps.TopK))
    assert(perProbe.keySet.subsetOf(
      (0L until TimeSeriesOps.NumProbes.toLong).toSet),
      s"unexpected probe ids: ${perProbe.keySet}")
  }
}
