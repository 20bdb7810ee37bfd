package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.plans.AsofJoin

/** Edge semantics + plan shape of the custom as-of join (value parity
  * with DuckDB's native ASOF JOIN is driver-checked via jx5). */
class AsofJoinSpec extends SparkSpec {

  private def ts(s: Long) = new Timestamp(s * 1000L)

  private def mk(rows: Seq[(java.lang.Long, Timestamp, String)], pfx: String) = {
    import scala.jdk.CollectionConverters._
    import org.apache.spark.sql.types._
    spark.createDataFrame(
      rows.map { case (k, t, v) => org.apache.spark.sql.Row(k, t, v) }.asJava,
      StructType(Seq(
        StructField(s"${pfx}k", LongType),
        StructField(s"${pfx}ts", TimestampType),
        StructField(s"${pfx}v", StringType))))
  }

  private def asof(l: org.apache.spark.sql.DataFrame, r: org.apache.spark.sql.DataFrame) =
    AsofJoin.asof(l, r, Seq(l("lk")), Seq(r("rk")), l("lts"), r("rts"))

  test("matches latest right at-or-before each left row; inclusive tie; unmatched dropped") {
    val l = mk(Seq((1L, ts(10), "a"), (1L, ts(20), "b"), (1L, ts(15), "t"),
      (2L, ts(5), "c"), (3L, ts(9), "d")), "l")
    val r = mk(Seq((1L, ts(8), "X"), (1L, ts(15), "Y"), (2L, ts(99), "Z")), "r")
    val got = asof(l, r).select("lv", "rv").collect()
      .map(x => (x.getString(0), x.getString(1))).toSet
    // a@10 -> X@8; t@15 -> Y@15 (inclusive); b@20 -> Y@15;
    // c@5 has only a future right row; d has no right key at all
    assert(got === Set(("a", "X"), ("t", "Y"), ("b", "Y")))
  }

  test("null keys and null timestamps never match") {
    val l = mk(Seq((null, ts(10), "a"), (1L, null, "b"), (1L, ts(10), "c")), "l")
    val r = mk(Seq((null, ts(1), "N"), (1L, null, "M"), (1L, ts(2), "X")), "r")
    val got = asof(l, r).select("lv", "rv").collect()
      .map(x => (x.getString(0), x.getString(1))).toSet
    assert(got === Set(("c", "X")))
  }

  test("empty right side yields empty result; empty left side too") {
    val l = mk(Seq((1L, ts(10), "a")), "l")
    val e = mk(Seq.empty, "r")
    assert(asof(l, e).count() === 0)
    val r = mk(Seq((1L, ts(1), "X")), "r")
    assert(asof(mk(Seq.empty, "l"), r).count() === 0)
  }

  test("survives multi-partition shuffles and agrees with the window restatement") {
    // derive many keys/rows from events so rows genuinely cross the
    // 4 shuffle partitions of the shared session
    val jx4 = graft.operators.JoinOps.asofWindow(spark, Sf)
    val jx5 = graft.operators.JoinOps.asofNative(spark, Sf)
    assert(jx4.count() > 0)
    assert(jx4.exceptAll(jx5).count() === 0)
    assert(jx5.exceptAll(jx4).count() === 0)
  }

  test("jx8: matched state is the LATEST change at or before each click") {
    import org.apache.spark.sql.functions._
    val rows = graft.operators.JoinOps.pitScd2(spark, Sf).collect()
    assert(rows.nonEmpty)
    // brute-force reference: all (user, change-ts) pairs
    val changes = graft.operators.ScanOps.eventsTs(spark, Sf)
      .filter(col("event_type").isin("signup", "purchase"))
      .select(col("user_id"), col("ts")).collect()
      .groupBy(_.getLong(0)).view
      .mapValues(_.map(_.getTimestamp(1).getTime).sorted).toMap
    rows.foreach { r =>
      val u = r.getAs[Long]("user_id")
      val lTs = r.getAs[java.sql.Timestamp]("l_ts").getTime
      val since = r.getAs[java.sql.Timestamp]("state_since").getTime
      assert(since <= lTs)
      val expected = changes(u).filter(_ <= lTs).max
      assert(since == expected, s"user $u at $lTs")
      // version ordinal counts the changes up to the match
      assert(r.getAs[Int]("state_version") ==
        changes(u).count(_ <= since))
    }
  }

  test("d14: containment bounds and self-containment on duplicated text") {
    import org.apache.spark.sql.functions._
    val rows = graft.operators.DedupOps.containment(spark, Sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (sa, sb, inter) = (r.getAs[Long]("size_a"),
        r.getAs[Long]("size_b"), r.getAs[Long]("inter_cnt"))
      assert(inter <= math.min(sa, sb))
      val (ca, cb) = (r.getAs[Double]("cont_a_in_b"), r.getAs[Double]("cont_b_in_a"))
      assert(ca >= 0.0 && ca <= 1.0 && cb >= 0.0 && cb <= 1.0)
      assert(ca == inter.toDouble / sa && cb == inter.toDouble / sb)
      assert((r.getAs[Int]("is_subset") == 1) == (ca >= 0.8 || cb >= 0.8))
      // exact-duplicate shingle sets contain each other fully
      if (inter == sa && sa == sb) assert(ca == 1.0 && cb == 1.0)
    }
    // the harness corpus DOES contain duplicated texts in-block: at
    // least one pair is mutually contained
    assert(rows.exists(r => r.getAs[Double]("cont_a_in_b") == 1.0))
  }

  test("plan: one exchange per side, no union/window, merge exec present") {
    val executed = graft.operators.JoinOps.asofNative(spark, Sf)
      .queryExecution.executedPlan
    val plan = executed.toString
    assert(plan.contains("AsofJoin"), plan.linesIterator.take(8).mkString("\n"))
    assert(!plan.contains("Window"), "native form must not fall back to the window restatement")
    // exchanges: one per join side + the presentation orderBy's range
    // exchange — nothing else (counted on plan NODES, not rendered text)
    val exchanges = executed.collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
    }.length
    assert(exchanges <= 3, s"unexpected exchange count $exchanges:\n" +
      plan.linesIterator.filter(_.contains("Exchange")).mkString("\n"))
  }

  test("fuzz: random frames == plain-Scala as-of reference across partitionings, 3 seeds") {
    // the custom exec is the riskiest code here — drive random key
    // cardinalities, dense ts ties, sparse keys, and random physical
    // partitioning through it and compare against the as-of rule
    // stated in plain Scala (no Spark on the reference side)
    Seq(5, 17, 31).foreach { seed =>
      val rnd = new scala.util.Random(seed)
      def rows(n: Int, keys: Int, pfx: String) = (0 until n).map { i =>
        (java.lang.Long.valueOf(rnd.nextInt(keys).toLong),
          ts(rnd.nextInt(50).toLong), s"$pfx$i")
      }
      val lRows = rows(300, 12, "l")
      // unique (key, ts) on the right: a duplicate right (k, ts) has no
      // defined winner in the as-of contract, so the generator dedups
      val rRows = rows(200, 12, "r")
        .groupBy(r => (r._1, r._2)).values.map(_.head).toSeq
      val expected = lRows.flatMap { case (lk, lts, lv) =>
        rRows.filter(r => r._1 == lk && !r._2.after(lts))
          .sortBy(_._2.getTime).lastOption.map(r => (lv, r._3))
      }.toSet
      val l = mk(lRows, "l").repartition(1 + rnd.nextInt(5))
      val r = mk(rRows, "r").repartition(1 + rnd.nextInt(5))
      val got = asof(l, r).select("lv", "rv").collect()
        .map(x => (x.getString(0), x.getString(1))).toSet
      assert(got === expected,
        s"seed $seed: ${(got -- expected).take(5)} unexpected, " +
          s"${(expected -- got).take(5)} missing")
    }
  }
}
