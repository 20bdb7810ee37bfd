package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.operators.{CacheScope, DedupOps, TimeSeriesOps}
import graft.sources.Tables

/** The two round-16 MAINTAINED at-rest families bound as STREAMING
  * maintenance — the StreamingWinnowSpec convention applied to the
  * update-not-append tiers: micro-batches of arrivals fold into the
  * written index through the registered queries' own maintenance
  * cores, and the final at-rest state must equal a one-shot rebuild
  * over the unioned input REGARDLESS of how arrivals are cut into
  * batches.
  *
  * - ts10 (SAX): batches of WHOLE closed days (the family's ingest
  *   grain) update derived per-user words — the fold's fixed point is
  *   a pure function of the base counts, so any cut converges.
  * - d29 (clusters): batches of crawled docs append the band index
  *   and merge the maintained cluster assignment — the min-label
  *   star invariant is restored per update, so sequential folds land
  *   on the same components as the all-at-once build.
  */
object StreamingMaintenanceSpec {
  case class Cnt(user_id: Long, day: Long, cnt: Long)
  case class Doc(doc_id: Long, text: String)
}

class StreamingMaintenanceSpec extends SparkSpec {
  import StreamingMaintenanceSpec.{Cnt, Doc}

  private def rmRoot(root: String): Unit = {
    org.apache.hadoop.fs.FileSystem.get(spark.sparkContext.hadoopConfiguration)
      .delete(new org.apache.hadoop.fs.Path(root), true)
    ()
  }

  private def rows(root: String, art: String, cols: Seq[String]) =
    spark.read.parquet(s"$root/$art").select(cols.map(col): _*)
      .collect().map(_.toSeq).toSet

  test("streamed SAX maintenance == one-shot rebuild, whole-day micro-batches, 2 fuzz seeds") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val c = TimeSeriesOps.dayCounts(spark, Sf)
    CacheScope.persist(c)
    // ts10's own whole-day split, origin pinned to the standing side
    val dmin = c.agg(min(col("day")).as("dmin0"))
    val standing = c.crossJoin(broadcast(dmin))
      .filter(col("day") === col("dmin0") || pmod(col("day"), lit(5L)) =!= 0)
      .select(col("user_id"), col("day"), col("cnt"))
    val batch = c.crossJoin(broadcast(dmin))
      .filter(col("day") =!= col("dmin0") && pmod(col("day"), lit(5L)) === 0)
      .select(col("user_id"), col("day"), col("cnt")).as[Cnt]
      .collect().toVector
    val days = batch.map(_.day).distinct.sorted
    assert(days.size >= 3, s"fixture regression: need ≥3 ingest days, got $days")
    val rootR = "target/graft-index/spec-stream-sax-rebuild"
    rmRoot(rootR)
    TimeSeriesOps.writeSaxIndex(spark, rootR,
      standing.unionByName(batch.toDF()))
    CacheScope.drain()

    for (seed <- Seq(3, 11)) {
      val rnd = new scala.util.Random(seed)
      val rootS = s"target/graft-index/spec-stream-sax-$seed"
      rmRoot(rootS)
      TimeSeriesOps.writeSaxIndex(spark, rootS, standing)
      val in = MemoryStream[Cnt]
      val q = in.toDF().writeStream
        .foreachBatch { (b: DataFrame, _: Long) =>
          TimeSeriesOps.updateSaxIndex(spark, rootS,
            b.select(col("user_id"), col("day"), col("cnt")))
          ()
        }
        .start()
      try {
        // whole closed days per micro-batch (the ingest contract); the
        // DAY order is shuffled, the cut sizes random
        var rest = rnd.shuffle(days)
        while (rest.nonEmpty) {
          val (chunk, tail) = rest.splitAt(1 + rnd.nextInt(3))
          rest = tail
          val dset = chunk.toSet
          in.addData(batch.filter(r => dset.contains(r.day)): _*)
          q.processAllAvailable() // sequential folds — drain per batch
        }
      } finally q.stop()
      for ((art, cols) <- Seq(
          "counts" -> Seq("user_id", "day", "cnt"),
          "words" -> Seq("user_id", "word", "n_active_segs"),
          "bands" -> Seq("user_id", "b", "bk"),
          "consts" -> Seq("d0"))) {
        assert(rows(rootS, art, cols) == rows(rootR, art, cols),
          s"seed $seed: streamed $art diverged from the one-shot rebuild")
      }
      CacheScope.drain()
    }
  }

  test("streamed cluster maintenance == one-shot build, random doc micro-batches, 2 fuzz seeds") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val docs = Tables.documents(spark, Sf)
    val isNew = col("doc_id") % DedupOps.IncomingMod === 0
    val incoming = docs.filter(isNew)
      .select(col("doc_id"), col("text")).as[Doc].collect().toVector
    assert(incoming.size >= 20, "fixture regression: thin incoming slice")
    val rootR = "target/graft-index/spec-stream-d29-rebuild"
    rmRoot(rootR)
    DedupOps.writeBandIndex(spark, rootR, docs)
    DedupOps.buildClusterTables(spark, rootR)
    CacheScope.drain()
    val expect = Seq("clusters", "members")
      .map(a => a -> rows(rootR, a, Seq("doc_id", "cluster_id"))).toMap
    assert(expect("clusters").nonEmpty,
      "fixture regression: no clustered members at sf0.001")

    for (seed <- Seq(5, 23)) {
      val rnd = new scala.util.Random(seed)
      val rootS = s"target/graft-index/spec-stream-d29-$seed"
      rmRoot(rootS)
      DedupOps.writeBandIndex(spark, rootS, docs.filter(!isNew))
      DedupOps.buildClusterTables(spark, rootS)
      CacheScope.drain()
      val in = MemoryStream[Doc]
      val q = in.toDF().writeStream
        .foreachBatch { (b: DataFrame, _: Long) =>
          val pinned = b.select(col("doc_id"), col("text")).localCheckpoint()
          DedupOps.appendBandIndex(spark, rootS, pinned)
          DedupOps.updateClusters(spark, rootS, pinned)
          ()
        }
        .start()
      try {
        var rest = rnd.shuffle(incoming)
        while (rest.nonEmpty) {
          val (chunk, tail) = rest.splitAt(1 + rnd.nextInt(8))
          rest = tail
          in.addData(chunk: _*)
          q.processAllAvailable() // sequential folds — drain per batch
        }
      } finally q.stop()
      for (art <- Seq("clusters", "members")) {
        assert(rows(rootS, art, Seq("doc_id", "cluster_id")) == expect(art),
          s"seed $seed: streamed $art diverged from the one-shot build")
      }
      CacheScope.drain()
    }
  }
}
