package graft

import org.apache.spark.sql.functions._
import graft.operators.{ScanOps, TextOps, WindowOps}
import graft.sources.Tables

/** Structural contracts for the round-6 log/text reshaping operators:
  * TX14 chunk geometry, S7 SCD-2 interval algebra, W9 island algebra.
  * Each is checked against the source table it derives from, not
  * against itself. */
class HistoryOpsSpec extends SparkSpec {

  test("tx14: chunks tile each doc on the stride grid and digest the real slice") {
    val docs = Tables.documents(spark, Sf)
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val chunks = TextOps.chunk(spark, Sf).collect()
    assert(chunks.nonEmpty)
    val byDoc = chunks.groupBy(_.getAs[Long]("doc_id"))
    assert(byDoc.keySet == docs.keySet, "every doc chunks, even empty ones")
    byDoc.foreach { case (id, cs) =>
      val text = docs(id)
      val sorted = cs.sortBy(_.getAs[Int]("chunk_idx"))
      // dense idx from 0; starts on the stride grid
      assert(sorted.map(_.getAs[Int]("chunk_idx")).toSeq ==
        sorted.indices.toSeq)
      sorted.foreach { c =>
        val start = c.getAs[Int]("chunk_start")
        assert(start == c.getAs[Int]("chunk_idx") * TextOps.ChunkStride)
        val slice = text.substring(math.min(start, text.length),
          math.min(start + TextOps.ChunkSize, text.length))
        assert(c.getAs[Int]("chunk_len") == slice.length)
        val md = java.security.MessageDigest.getInstance("MD5")
        val hex = md.digest(slice.getBytes("UTF-8"))
          .map("%02x".format(_)).mkString
        assert(c.getAs[String]("chunk_md5") == hex)
      }
      // coverage: last chunk reaches the end of the doc
      val last = sorted.last
      assert(last.getAs[Int]("chunk_start") + last.getAs[Int]("chunk_len") ==
        text.length || text.isEmpty)
      // every char position is inside some chunk (stride ≤ size)
      assert(TextOps.ChunkStride <= TextOps.ChunkSize)
    }
  }

  test("tx19: dup fraction == brute-force recount; planted mirrored docs flag heavy") {
    // brute-force reference off the raw texts, same slicing rule
    def md5hex(s: String): String = java.security.MessageDigest
      .getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    def chunksOf(text: String): Seq[(String, Int)] =
      (0 to math.max(text.length - 1, 0) by TextOps.ChunkStride).map { st =>
        val sl = text.substring(math.min(st, text.length),
          math.min(st + TextOps.ChunkSize, text.length))
        (md5hex(sl), sl.length)
      }
    val docs = Tables.documents(spark, Sf)
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1))
    val allChunks = docs.flatMap { case (id, t) => chunksOf(t).map(c => (id, c._1, c._2)) }
    val dupSet = allChunks.groupBy(_._2).view
      .mapValues(_.map(_._1).distinct.size).filter(_._2 >= 2).keySet
    val ref = allChunks.groupBy(_._1).view.mapValues { cs =>
      val dupChars = cs.filter(c => dupSet(c._2)).map(_._3.toLong).sum
      val total = cs.map(_._3.toLong).sum
      (cs.length.toLong, cs.count(c => dupSet(c._2)).toLong, total, dupChars)
    }.toMap
    val got = TextOps.dupFraction(spark, Sf).collect()
    assert(got.length == ref.size)
    got.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      val (n, nd, tot, dch) = ref(id)
      assert(r.getAs[Long]("n_chunks") == n, s"doc $id n_chunks")
      assert(r.getAs[Long]("n_dup_chunks") == nd, s"doc $id n_dup_chunks")
      assert(r.getAs[Long]("n_chars_chunked") == tot, s"doc $id chars")
      assert(r.getAs[Long]("n_dup_chars") == dch, s"doc $id dup chars")
      if (tot > 0)
        assert(r.getAs[Double]("dup_char_fraction") == dch.toDouble / tot.toDouble)
      assert((r.getAs[Int]("is_dup_heavy") == 1) ==
        (dch * TextOps.DupHeavyDen > tot * TextOps.DupHeavyNum), s"doc $id flag")
    }
    // non-vacuous on the fixture: some cross-doc duplication exists
    assert(got.exists(_.getAs[Long]("n_dup_chunks") > 0),
      "fixture regression: no cross-doc duplicate chunks at this SF")
    // planted: two byte-identical docs are 100% duplicated prose (heavy),
    // an unrelated doc is 0% (clean) — driven through the core
    import spark.implicits._
    val mirrored = ("x" * 500)
    val planted = Seq((1L, mirrored), (2L, mirrored), (3L, "y" * 500))
      .toDF("doc_id", "text")
    val out = TextOps.dupFractionCore(planted).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Double]("dup_char_fraction"), r.getAs[Int]("is_dup_heavy"))).toMap
    assert(out(1L) == ((1.0, 1)) && out(2L) == ((1.0, 1)))
    assert(out(3L) == ((0.0, 0)))
  }

  test("s7: SCD-2 intervals chain per user with one open current row") {
    val rows = ScanOps.scd2(spark, Sf).collect()
    val n = Tables.events(spark, Sf).count()
    assert(rows.length == n, "every change becomes a version row")
    rows.groupBy(_.getAs[Long]("user_id")).foreach { case (u, vs) =>
      val sorted = vs.sortBy(_.getAs[Int]("version"))
      // versions dense from 1
      assert(sorted.map(_.getAs[Int]("version")).toSeq ==
        (1 to sorted.length).toSeq, s"user $u")
      // exactly one open (current) interval, and it is the last
      assert(sorted.count(_.getAs[Int]("is_current") == 1) == 1)
      assert(sorted.last.getAs[Int]("is_current") == 1)
      assert(sorted.last.isNullAt(sorted.last.fieldIndex("valid_to")))
      // intervals chain: each closed row's valid_to == successor's valid_from
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(a.getAs[java.sql.Timestamp]("valid_to") ==
            b.getAs[java.sql.Timestamp]("valid_from"), s"user $u gap")
          assert(!a.getAs[java.sql.Timestamp]("valid_from")
            .after(a.getAs[java.sql.Timestamp]("valid_to")), s"user $u order")
        case _ =>
      }
    }
  }

  test("s9: vacuum audit == replay of the retention rule over s7; current rows always survive") {
    // parse as UTC — the query's to_timestamp runs in the UTC session
    // timezone, but Timestamp.valueOf would use the JVM default and
    // shift the cutoff instant on a non-UTC host
    val cutoff = java.sql.Timestamp.from(
      java.time.LocalDateTime.parse(ScanOps.VacuumCutoff.replace(' ', 'T'))
        .toInstant(java.time.ZoneOffset.UTC))
    val history = ScanOps.scd2(spark, Sf).collect()
      .groupBy(_.getAs[Long]("user_id"))
    val rows = ScanOps.historyVacuum(spark, Sf).collect()
    assert(rows.map(_.getAs[Long]("user_id")).toSet == history.keySet)
    rows.foreach { r =>
      val vs = history(r.getAs[Long]("user_id"))
      val dropped = vs.filter { v =>
        v.getAs[Int]("is_current") == 0 &&
          !v.getAs[java.sql.Timestamp]("valid_to").after(cutoff)
      }
      assert(r.getAs[Long]("n_before") == vs.length)
      assert(r.getAs[Long]("n_dropped") == dropped.length)
      assert(r.getAs[Long]("n_after") == vs.length - dropped.length)
      // the invariant the audit exists to gate: the open row survives
      // every retention policy
      assert(r.getAs[Int]("has_current") == 1)
      val retainedFroms = vs.filterNot(dropped.contains)
        .map(_.getAs[java.sql.Timestamp]("valid_from"))
      assert(r.getAs[java.sql.Timestamp]("oldest_retained_from") ==
        retainedFroms.min((a: java.sql.Timestamp, b: java.sql.Timestamp) =>
          a.compareTo(b)))
    }
    // the policy is non-vacuous at fixture scale: something drops,
    // nothing drops everything
    assert(rows.map(_.getAs[Long]("n_dropped")).sum > 0L)
    assert(rows.forall(_.getAs[Long]("n_after") >= 1L))
  }

  test("w9: island algebra matches a plain-Scala reference") {
    val evRaw = Tables.events(spark, Sf)
    val days = evRaw
      .select(col("user_id"),
        expr(s"(${operators.ScanOps.tsMicrosSql(evRaw)}) div ${WindowOps.DayMicros}")
          .as("day"))
      .distinct().collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).sorted).toMap
    val rows = WindowOps.streaks(spark, Sf).collect()
    assert(rows.map(_.getAs[Long]("user_id")).toSet == days.keySet)
    rows.foreach { r =>
      val ds = days(r.getAs[Long]("user_id"))
      // reference: split the sorted day list at gaps > 1
      val runs = ds.foldLeft(List.empty[List[Long]]) {
        case (acc @ (run :: rest), d) if run.head == d - 1 => (d :: run) :: rest
        case (acc, d) => List(d) :: acc
      }.map(_.length)
      assert(r.getAs[Long]("n_active_days") == ds.length)
      assert(r.getAs[Long]("n_islands") == runs.length)
      assert(r.getAs[Long]("longest_streak") == runs.max)
      assert(r.getAs[Long]("longest_streak") <= r.getAs[Long]("n_active_days"))
    }
  }
}
