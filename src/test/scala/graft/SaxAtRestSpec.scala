package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.{CacheScope, TimeSeriesOps => TS}

/** The at-rest SAX index lifecycle (ts9/ts10) — the first MAINTAINED-
  * UPDATE family: words are derived per-user facts that CHANGE when a
  * user's series extends, so maintenance rewrites (not appends) the
  * touched users' buckets. Pins: serve == in-memory bit-exact,
  * update == rebuild row-exact on all four artifacts, retried update
  * no-op, the origin-shift wholesale path, torn-update heal-by-
  * recount, bucket-scoped file minimality, and the beyond-window
  * nobody-touched invariant. */
class SaxAtRestSpec extends SparkSpec {

  private val Artifacts = Seq("counts", "consts", "words", "bands")

  private def rmRoot(root: String): Unit = {
    org.apache.hadoop.fs.FileSystem.get(spark.sparkContext.hadoopConfiguration)
      .delete(new org.apache.hadoop.fs.Path(root), true)
    ()
  }

  private def assertSameRows(rootA: String, rootB: String): Unit =
    for (art <- Artifacts) {
      val a = spark.read.parquet(s"$rootA/$art")
      val b = spark.read.parquet(s"$rootB/$art")
      assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty,
        s"update != rebuild on $art")
    }

  /** Per-bucket (name, size, mtime) signatures of a partitioned
    * artifact's data files. */
  private def fileSig(root: String, art: String, pcol: String)
      : Map[Int, Seq[(String, Long, Long)]] =
    new java.io.File(s"$root/$art").listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith(s"$pcol="))
      .map { d =>
        d.getName.stripPrefix(s"$pcol=").toInt ->
          d.listFiles().filter(_.getName.endsWith(".parquet"))
            .map(f => (f.getName, f.length, f.lastModified)).sortBy(_._1).toSeq
      }.toMap

  /** ts10's day split over any (user_id, day, cnt) frame — min day
    * pinned to the standing side. */
  private def daySplit(c: DataFrame): (DataFrame, DataFrame) = {
    val dmin = c.agg(min(col("day")).as("dmin0"))
    (c.crossJoin(broadcast(dmin))
        .filter(col("day") === col("dmin0") || pmod(col("day"), lit(5L)) =!= 0)
        .select(col("user_id"), col("day"), col("cnt")),
      c.crossJoin(broadcast(dmin))
        .filter(col("day") =!= col("dmin0") && pmod(col("day"), lit(5L)) === 0)
        .select(col("user_id"), col("day"), col("cnt")))
  }

  test("ts9: the at-rest serve is bit-identical to ts5's in-memory probe") {
    spark.sharedState.cacheManager.clearCache()
    val served = TS.saxKnnAtRest(spark, Sf).collect().toSeq
    CacheScope.drain()
    val mem = TS.saxKnn(spark, Sf).collect().toSeq
    CacheScope.drain()
    assert(served == mem, "at-rest SAX serve drifted from ts5")
  }

  test("ts10: update == rebuild row-exact on all four artifacts; a retried update is a no-op") {
    spark.sharedState.cacheManager.clearCache()
    val c = TS.dayCounts(spark, Sf)
    val (standing, batch) = daySplit(c)
    val rootA = "target/graft-index/spec-ts10-update"
    val rootB = "target/graft-index/spec-ts10-rebuild"
    Seq(rootA, rootB).foreach(rmRoot)
    TS.writeSaxIndex(spark, rootA, standing)
    TS.updateSaxIndex(spark, rootA, batch)
    TS.writeSaxIndex(spark, rootB, c)
    assertSameRows(rootA, rootB)
    def canon(art: String) = spark.read.parquet(s"$rootA/$art")
      .collect().map(_.toString).sorted.toSeq
    val once = Artifacts.map(a => a -> canon(a)).toMap
    TS.updateSaxIndex(spark, rootA, batch)
    once.foreach { case (art, rows) =>
      assert(canon(art) === rows, s"retry changed $art — update not idempotent")
    }
  }

  test("ts10: a batch behind the grid origin takes the wholesale path and still equals the rebuild") {
    spark.sharedState.cacheManager.clearCache()
    val c = TS.dayCounts(spark, Sf)
    val dmin = c.agg(min(col("day")).as("dmin0"))
    // the ADVERSARIAL split: the batch holds exactly the oldest day's
    // rows, so the update must shift d0 and rebuild every word
    val standing = c.crossJoin(broadcast(dmin))
      .filter(col("day") =!= col("dmin0"))
      .select(col("user_id"), col("day"), col("cnt"))
    val batch = c.crossJoin(broadcast(dmin))
      .filter(col("day") === col("dmin0"))
      .select(col("user_id"), col("day"), col("cnt"))
    val rootA = "target/graft-index/spec-ts10-shift"
    val rootB = "target/graft-index/spec-ts10-shiftref"
    Seq(rootA, rootB).foreach(rmRoot)
    TS.writeSaxIndex(spark, rootA, standing)
    val d0Before = spark.read.parquet(s"$rootA/consts").collect()(0).getLong(0)
    TS.updateSaxIndex(spark, rootA, batch)
    val d0After = spark.read.parquet(s"$rootA/consts").collect()(0).getLong(0)
    assert(d0After < d0Before, "fixture regression: the origin never shifted")
    TS.writeSaxIndex(spark, rootB, c)
    assertSameRows(rootA, rootB)
  }

  test("ts10 crash point: a shift update dies before the consts write — the RERUN re-enters the rebuild (batch-min re-check)") {
    spark.sharedState.cacheManager.clearCache()
    val c = TS.dayCounts(spark, Sf)
    val dmin = c.agg(min(col("day")).as("dmin0"))
    val standing = c.crossJoin(broadcast(dmin))
      .filter(col("day") =!= col("dmin0"))
      .select(col("user_id"), col("day"), col("cnt"))
    val batch = c.crossJoin(broadcast(dmin))
      .filter(col("day") === col("dmin0"))
      .select(col("user_id"), col("day"), col("cnt"))
    val rootA = "target/graft-index/spec-ts10-shiftcrash"
    val rootB = "target/graft-index/spec-ts10-shiftcrashref"
    Seq(rootA, rootB).foreach(rmRoot)
    TS.writeSaxIndex(spark, rootA, standing)
    val d0Before = spark.read.parquet(s"$rootA/consts").collect()(0).getLong(0)
    // plant the r17 ADVICE crash: base landed, derived rebuilt, consts
    // never written — the stored origin is stale
    TS.updateSaxIndex(spark, rootA, batch, crashBeforeConsts = true)
    assert(spark.read.parquet(s"$rootA/consts").collect()(0)
        .getLong(0) == d0Before,
      "fixture regression: the crash state must hold the STALE consts")
    // the recovery is a plain rerun of the same update: the landed
    // delta is empty (anti-join), but the shift test reads the BATCH's
    // min against the stale origin and re-enters the rebuild — a
    // landed-min test would no-op here and strand the stale consts
    TS.updateSaxIndex(spark, rootA, batch)
    assert(spark.read.parquet(s"$rootA/consts").collect()(0)
        .getLong(0) < d0Before,
      "the rerun must commit the shifted origin")
    TS.writeSaxIndex(spark, rootB, c)
    assertSameRows(rootA, rootB)
  }

  test("ts10: stale derived tables after a torn base append heal by recount") {
    spark.sharedState.cacheManager.clearCache()
    val c = TS.dayCounts(spark, Sf)
    val (standing, batch) = daySplit(c)
    val rootT = "target/graft-index/spec-ts10-torn"
    val rootF = "target/graft-index/spec-ts10-tornref"
    Seq(rootT, rootF).foreach(rmRoot)
    TS.writeSaxIndex(spark, rootT, standing)
    TS.writeSaxIndex(spark, rootF, c)
    // the torn update: the batch's count rows landed, the crash hit
    // before the words/bands rewrites
    batch.select(col("user_id"), col("day"), col("cnt"),
        TS.userBucketCol(col("user_id")).as("u_bucket"))
      .write.mode("append").partitionBy("u_bucket")
      .parquet(s"$rootT/counts")
    // recovery: rerun the update (row-level no-op on the base) + heal
    TS.updateSaxIndex(spark, rootT, batch)
    TS.healSaxIndex(spark, rootT)
    assertSameRows(rootT, rootF)
  }

  test("ts10: an update rewrites ONLY the touched users' buckets") {
    import spark.implicits._
    spark.sharedState.cacheManager.clearCache()
    // 32 users spread over all 16 user buckets, one active window
    // segment each; the batch extends ONE user (17 → u_bucket 1) far
    // enough to flip its first symbol
    val root = "target/graft-index/spec-ts10-minimal"
    rmRoot(root)
    val standing = (0L until 32L).map(u => (u, 1000L + u % 3, 1L))
      .toDF("user_id", "day", "cnt")
    val batch = Seq((17L, 1005L, 20L)).toDF("user_id", "day", "cnt")
    TS.writeSaxIndex(spark, root, standing)
    val wBefore = fileSig(root, "words", "u_bucket")
    val cBefore = fileSig(root, "counts", "u_bucket")
    val bBefore = fileSig(root, "bands", "bb_bucket")
    val wordBefore = spark.read.parquet(s"$root/words")
      .filter(col("user_id") === 17L).collect()(0).getLong(1)
    TS.updateSaxIndex(spark, root, batch)
    val wAfter = fileSig(root, "words", "u_bucket")
    val cAfter = fileSig(root, "counts", "u_bucket")
    val bAfter = fileSig(root, "bands", "bb_bucket")
    val wordAfter = spark.read.parquet(s"$root/words")
      .filter(col("user_id") === 17L).collect()(0).getLong(1)
    assert(wordAfter !== wordBefore,
      "fixture regression: the touched user's word never changed")
    // words: exactly the touched user's bucket rewrote
    assert(wAfter(1) != wBefore(1), "touched words bucket was not rewritten")
    (wBefore.keySet - 1).foreach { b =>
      assert(wAfter(b) == wBefore(b), s"update rewrote untouched words bucket $b")
    }
    // counts: append-only — untouched buckets' standing files intact
    (cBefore.keySet - 1).foreach { b =>
      assert(cAfter(b) == cBefore(b), s"update rewrote untouched counts bucket $b")
    }
    // bands: at most the touched user's old ∪ new key buckets rewrote
    val changed = bBefore.keySet.filter(b => bAfter.get(b) != bBefore.get(b))
    assert(changed.size <= 2 * TS.NumSegs,
      s"bands rewrite exceeded the touched key buckets: $changed")
  }

  test("ts10: a batch beyond the indexed window touches no derived bucket at all") {
    import spark.implicits._
    spark.sharedState.cacheManager.clearCache()
    val root = "target/graft-index/spec-ts10-beyond"
    rmRoot(root)
    val standing = (0L until 32L).map(u => (u, 1000L + u % 3, 1L))
      .toDF("user_id", "day", "cnt")
    // day 1040 is past seg NumSegs-1 (window = d0 .. d0+31): the
    // count lands, but no word can change — daily ingest beyond the
    // window must touch NOBODY
    val batch = Seq((17L, 1040L, 2L)).toDF("user_id", "day", "cnt")
    TS.writeSaxIndex(spark, root, standing)
    val wBefore = fileSig(root, "words", "u_bucket")
    val bBefore = fileSig(root, "bands", "bb_bucket")
    TS.updateSaxIndex(spark, root, batch)
    assert(fileSig(root, "words", "u_bucket") == wBefore,
      "beyond-window ingest rewrote the words table")
    assert(fileSig(root, "bands", "bb_bucket") == bBefore,
      "beyond-window ingest rewrote the bands table")
    assert(spark.read.parquet(s"$root/counts")
        .filter(col("user_id") === 17L && col("day") === 1040L).count() === 1L,
      "the beyond-window count row must still land in the base")
  }

  /** Planted counts for the ts12 forget tests: user 0 owns the min
    * day (the grid origin); every user is active in every segment so
    * all four artifacts carry rows for everyone. */
  private def plantedCounts: DataFrame = {
    import spark.implicits._
    (for (u <- 0L until 16L; seg <- 0 until TS.NumSegs)
      yield (u, 1000L + u + TS.SegDays * seg, 1L + (u + seg) % 3))
      .toDF("user_id", "day", "cnt")
  }

  test("ts12: forget == rebuild over survivors (origin intact); only the cohort's buckets rewrite; rerun a no-op") {
    import spark.implicits._
    val c = plantedCounts
    val delIds = Seq(3L, 7L) // neither owns day 1000 — origin survives
    val isDel = col("user_id").isin(delIds: _*)
    val root = "target/graft-index/spec-ts12-forget"
    val rootB = "target/graft-index/spec-ts12-rebuild"
    rmRoot(root); rmRoot(rootB)
    TS.writeSaxIndex(spark, root, c)
    val wBefore = fileSig(root, "words", "u_bucket")
    TS.forgetSaxIndex(spark, root, delIds.toDF("user_id"))
    TS.writeSaxIndex(spark, rootB, c.filter(!isDel))
    assertSameRows(root, rootB)
    // untouched user buckets' words files never moved (the sweep is
    // request-scoped; 3 % 16 and 7 % 16 are the only touched buckets)
    val wAfter = fileSig(root, "words", "u_bucket")
    wBefore.keySet.filterNot(Set(3, 7)).foreach { b =>
      assert(wAfter.get(b) == wBefore.get(b),
        s"untouched words bucket $b rewritten by the forget")
    }
    TS.forgetSaxIndex(spark, root, delIds.toDF("user_id"))
    assertSameRows(root, rootB)
    rmRoot(root); rmRoot(rootB)
  }

  test("ts12 crash point: rebuild done, consts never written — the rerun repeats the rebuild and converges") {
    import spark.implicits._
    val c = plantedCounts
    val isDel = col("user_id") === 0L // user 0 owns day 1000 == d0
    val root = "target/graft-index/spec-ts12-crash"
    val rootB = "target/graft-index/spec-ts12-crash-rebuild"
    rmRoot(root); rmRoot(rootB)
    TS.writeSaxIndex(spark, root, c)
    val d0 = spark.read.parquet(s"$root/consts").collect()(0).getLong(0)
    // the planted crash: the shift path rebuilt words/bands to the NEW
    // origin but died before persisting consts — the window where the
    // old ordering's rerun would spuriously pass the shift check and
    // leave words keyed to an origin consts no longer matches
    TS.forgetSaxIndex(spark, root, Seq(0L).toDF("user_id"),
      crashBeforeConsts = true)
    assert(spark.read.parquet(s"$root/consts").collect()(0).getLong(0) == d0,
      "fixture regression: the crash point must leave consts at the OLD origin")
    assert(spark.read.parquet(s"$root/counts").agg(min(col("day")))
        .collect()(0).getLong(0) > d0,
      "fixture regression: the swept base must disagree with consts")
    // recovery = rerun the same forget: the sweep is a no-op, the
    // consts-vs-base mismatch re-fires the (idempotent) rebuild, and
    // consts persists — all four artifacts == rebuild over survivors
    TS.forgetSaxIndex(spark, root, Seq(0L).toDF("user_id"))
    TS.writeSaxIndex(spark, rootB, c.filter(!isDel))
    assertSameRows(root, rootB)
    rmRoot(root); rmRoot(rootB)
  }

  test("ts12: forgetting EVERY user empties the store (zero-row consts, no NULL origin) and the next update re-seeds it") {
    import spark.implicits._
    val c = plantedCounts
    val root = "target/graft-index/spec-ts12-emptied"
    val rootB = "target/graft-index/spec-ts12-emptied-reseed"
    rmRoot(root); rmRoot(rootB)
    TS.writeSaxIndex(spark, root, c)
    TS.forgetSaxIndex(spark, root,
      (0L until 16L).toDF("user_id"))
    // the emptied marker: consts holds ZERO rows — never a NULL d0 a
    // later maintenance read would NPE over — and saxOrigin sees it
    assert(spark.read.parquet(s"$root/consts").count() == 0L,
      "an emptied store must write zero-row consts")
    assert(TS.saxOrigin(spark, root).isEmpty,
      "saxOrigin must read the emptied marker as no-origin")
    // a second forget of the emptied store is a no-op, not a crash
    TS.forgetSaxIndex(spark, root, Seq(1L).toDF("user_id"))
    // the next batch re-seeds: update == fresh build, all artifacts
    val batch = plantedCounts.filter(col("user_id") < 4L)
    TS.updateSaxIndex(spark, root, batch)
    TS.writeSaxIndex(spark, rootB, batch)
    assertSameRows(root, rootB)
    rmRoot(root); rmRoot(rootB)
  }

  test("ts12: forgetting the origin's owner shifts d0 forward and takes the wholesale path — still == rebuild") {
    import spark.implicits._
    val c = plantedCounts
    val isDel = col("user_id") === 0L // user 0 owns day 1000 == d0
    val root = "target/graft-index/spec-ts12-shift"
    val rootB = "target/graft-index/spec-ts12-shift-rebuild"
    rmRoot(root); rmRoot(rootB)
    TS.writeSaxIndex(spark, root, c)
    val d0 = spark.read.parquet(s"$root/consts").collect()(0).getLong(0)
    TS.forgetSaxIndex(spark, root, Seq(0L).toDF("user_id"))
    val d0After = spark.read.parquet(s"$root/consts").collect()(0).getLong(0)
    assert(d0After > d0, "forgetting the origin's owner must shift d0 forward")
    TS.writeSaxIndex(spark, rootB, c.filter(!isDel))
    assertSameRows(root, rootB)
    rmRoot(root); rmRoot(rootB)
  }
}
