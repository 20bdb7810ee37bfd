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

  case class Doc(doc_id: Long, lang: String, n_chars: Long)

  test("per-batch drift monitor: a skewed batch flags against the broadcast reference") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    // accepted corpus profile: 2 langs, balanced, one length bucket each
    val reference = Seq(
      ("en", 0, 100L), ("en", 1, 100L),
      ("zh", 0, 100L), ("zh", 1, 100L))
      .toDF("lang", "len_bucket", "n_ref")
    val in = MemoryStream[Doc]
    val results =
      new scala.collection.mutable.ArrayBuffer[(Long, String, Int, Long, Int)]
    val q = in.toDF().writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, id: Long) =>
        graft.operators.AuditOps.driftAgainst(batch, reference)
          .collect().foreach { r =>
            results.synchronized {
              results += ((id, r.getAs[String]("lang"), r.getAs[Int]("len_bucket"),
                r.getAs[Long]("n_batch"), r.getAs[Int]("drift")))
            }
          }
        ()
      }
      .start()
    try {
      // batch 0 mirrors the reference mix exactly → no flags
      in.addData((1 to 8).map(i => Doc(i,
        if (i % 2 == 0) "en" else "zh", if (i % 4 < 2) 50L else 150L)): _*)
      q.processAllAvailable()
      // batch 1: all-zh, all-short, plus a bucket the reference never
      // saw (fr) → zh/0 over-shares, en cells vanish, fr flags as new
      in.addData((9 to 16).map(i => Doc(i, "zh", 50L)): _*)
      in.addData(Doc(17, "fr", 950L))
      q.processAllAvailable()
      val byBatch = results.groupBy(_._1)
      assert(byBatch(0L).forall(_._5 == 0), byBatch(0L).toString)
      val b1 = byBatch(1L).map(t => ((t._2, t._3), t._5)).toMap
      assert(b1(("zh", 0)) == 1, "over-shared cell must flag")
      assert(b1(("en", 0)) == 1 && b1(("en", 1)) == 1, "vanished cells must flag")
      assert(b1(("fr", 9)) == 1, "never-seen bucket must flag")
    } finally q.stop()
  }

  test("dq3 served from streamed QI-cell count state == batch audit, 3 seeds") {
    // the StreamingTimeSeriesSpec discipline: counts are associative,
    // so the standing streaming-aggregation state over (lang, source,
    // len_bucket) equals the batch collapse under ANY arrival order /
    // micro-batch cut — and dq3's verdict rule (kAnonCells) serves
    // from that state with zero operator changes
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val keyed = (rows: Array[org.apache.spark.sql.Row]) => rows.map { r =>
      (r.getAs[String]("lang"), r.getAs[String]("source"),
        r.getAs[Int]("len_bucket"), r.getAs[Long]("n_docs"),
        r.getAs[Int]("is_k_anon"), r.getAs[Double]("reident_risk"))
    }.sortBy(t => (t._1, t._2, t._3)).toSeq
    val expected = keyed(graft.operators.AuditOps.kAnonymity(spark, Sf).collect())
    val docs = {
      val d = graft.sources.Tables.documents(spark, Sf)
      d.select(col("lang"), col("source"),
          graft.operators.AuditOps.lenBucket.as("len_bucket"))
        .as[(String, String, Int)].collect().toVector
    }
    for (seed <- Seq(3, 11, 23)) {
      val rnd = new scala.util.Random(seed)
      val in = MemoryStream[(String, String, Int)]
      val cells = in.toDF().toDF("lang", "source", "len_bucket")
        .groupBy(col("lang"), col("source"), col("len_bucket"))
        .agg(count(lit(1)).as("n_docs"))
      val name = s"dq3_cells_state_$seed"
      val q = cells.writeStream.format("memory")
        .queryName(name).outputMode("complete").start()
      try {
        var rest = rnd.shuffle(docs)
        while (rest.nonEmpty) {
          val (chunk, tail) = rest.splitAt(1 + rnd.nextInt(100))
          rest = tail
          in.addData(chunk: _*)
          q.processAllAvailable() // plain streaming agg — safe to drain
        }
        val served = keyed(graft.operators.AuditOps
          .kAnonCells(spark.table(name)).collect())
        assert(served == expected,
          s"seed $seed: dq3 served from streamed state drifted from batch")
      } finally q.stop()
    }
  }

  test("dq4 served from streamed (QI, source) count state == batch audit, 3 seeds") {
    // dq3's discipline one level down: the (lang, len_bucket, source)
    // counts are associative standing state, and dq4's rollup+verdict
    // (lDivCells) serves from that state unchanged under any arrival
    // order / micro-batch cut
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val keyed = (rows: Array[org.apache.spark.sql.Row]) => rows.map { r =>
      (r.getAs[String]("lang"), r.getAs[Int]("len_bucket"),
        r.getAs[Long]("n_docs"), r.getAs[Long]("n_sources"),
        r.getAs[Int]("is_l_diverse"), r.getAs[Double]("top_share"))
    }.sortBy(t => (t._1, t._2)).toSeq
    val expected = keyed(graft.operators.AuditOps.lDiversity(spark, Sf).collect())
    val docs = {
      val d = graft.sources.Tables.documents(spark, Sf)
      d.select(col("lang"),
          graft.operators.AuditOps.lenBucket.as("len_bucket"), col("source"))
        .as[(String, Int, String)].collect().toVector
    }
    for (seed <- Seq(5, 13, 29)) {
      val rnd = new scala.util.Random(seed)
      val in = MemoryStream[(String, Int, String)]
      val cells = in.toDF().toDF("lang", "len_bucket", "source")
        .groupBy(col("lang"), col("len_bucket"), col("source"))
        .agg(count(lit(1)).as("n_src"))
      val name = s"dq4_cells_state_$seed"
      val q = cells.writeStream.format("memory")
        .queryName(name).outputMode("complete").start()
      try {
        var rest = rnd.shuffle(docs)
        while (rest.nonEmpty) {
          val (chunk, tail) = rest.splitAt(1 + rnd.nextInt(100))
          rest = tail
          in.addData(chunk: _*)
          q.processAllAvailable()
        }
        val served = keyed(graft.operators.AuditOps
          .lDivCells(spark.table(name)).collect())
        assert(served == expected,
          s"seed $seed: dq4 served from streamed state drifted from batch")
      } finally q.stop()
    }
  }

  test("dq6 served from streamed (QI, source) count state == batch audit, 3 seeds") {
    // the same associative standing state dq4 serves from feeds dq6's
    // rollup + domain completion + integer TV numerator unchanged —
    // the numerator is a SUM of exact integers, so arrival order and
    // micro-batch cuts cannot move a single bit of the output
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val keyed = (rows: Array[org.apache.spark.sql.Row]) => rows.map { r =>
      (r.getAs[String]("lang"), r.getAs[Int]("len_bucket"),
        r.getAs[Long]("n_docs"), r.getAs[Long]("tv_num"),
        r.getAs[Double]("tv_dist"), r.getAs[Int]("is_t_close"))
    }.sortBy(t => (t._1, t._2)).toSeq
    val expected = keyed(graft.operators.AuditOps.tCloseness(spark, Sf).collect())
    val docs = {
      val d = graft.sources.Tables.documents(spark, Sf)
      d.select(col("lang"),
          graft.operators.AuditOps.lenBucket.as("len_bucket"), col("source"))
        .as[(String, Int, String)].collect().toVector
    }
    for (seed <- Seq(7, 17, 31)) {
      val rnd = new scala.util.Random(seed)
      val in = MemoryStream[(String, Int, String)]
      val cells = in.toDF().toDF("lang", "len_bucket", "source")
        .groupBy(col("lang"), col("len_bucket"), col("source"))
        .agg(count(lit(1)).as("n_cv"))
      val name = s"dq6_cells_state_$seed"
      val q = cells.writeStream.format("memory")
        .queryName(name).outputMode("complete").start()
      try {
        var rest = rnd.shuffle(docs)
        while (rest.nonEmpty) {
          val (chunk, tail) = rest.splitAt(1 + rnd.nextInt(100))
          rest = tail
          in.addData(chunk: _*)
          q.processAllAvailable()
        }
        val served = keyed(graft.operators.AuditOps
          .tCloseCells(spark.table(name)).collect())
        assert(served == expected,
          s"seed $seed: dq6 served from streamed state drifted from batch")
      } finally q.stop()
    }
  }

  test("dq7 served from streamed (QI, in_release) count state == batch audit, 3 seeds") {
    // dq7's standing state is the (QI, in_release) doc counts — an
    // associative streaming aggregation; the rollup + integer
    // cross-multiplied presence window ride it unchanged, so arrival
    // order and batch cuts cannot move a bit
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val keyed = (rows: Array[org.apache.spark.sql.Row]) => rows.map { r =>
      (r.getAs[String]("lang"), r.getAs[Int]("len_bucket"),
        r.getAs[Long]("n_world"), r.getAs[Long]("n_released"),
        r.getAs[Double]("delta"), r.getAs[Int]("is_delta_present"))
    }.sortBy(t => (t._1, t._2)).toSeq
    val expected = keyed(graft.operators.AuditOps.deltaPresence(spark, Sf).collect())
    val docs = {
      val d = graft.sources.Tables.documents(spark, Sf)
      d.select(col("lang"),
          graft.operators.AuditOps.lenBucket.as("len_bucket"),
          when(graft.operators.DedupOps.splitCol === "train", 1L)
            .otherwise(0L).as("in_release"))
        .as[(String, Int, Long)].collect().toVector
    }
    for (seed <- Seq(5, 23, 41)) {
      val rnd = new scala.util.Random(seed)
      val in = MemoryStream[(String, Int, Long)]
      val cells = in.toDF().toDF("lang", "len_bucket", "in_release")
        .groupBy(col("lang"), col("len_bucket"), col("in_release"))
        .agg(count(lit(1)).as("n"))
      val name = s"dq7_cells_state_$seed"
      val q = cells.writeStream.format("memory")
        .queryName(name).outputMode("complete").start()
      try {
        var rest = rnd.shuffle(docs)
        while (rest.nonEmpty) {
          val (chunk, tail) = rest.splitAt(1 + rnd.nextInt(100))
          rest = tail
          in.addData(chunk: _*)
          q.processAllAvailable()
        }
        val served = keyed(graft.operators.AuditOps
          .deltaPresCells(spark.table(name)).collect())
        assert(served == expected,
          s"seed $seed: dq7 served from streamed state drifted from batch")
      } finally q.stop()
    }
  }
}
