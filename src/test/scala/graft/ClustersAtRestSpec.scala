package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.{CacheScope, DedupOps}

/** The at-rest cluster assignment (d29) — the first maintained GRAPH
  * family: update == rebuild bit-exact (d13's star-contraction
  * argument at the file level), retried update a row-level no-op,
  * heal-by-recount from the index, and bucket-scoped minimality
  * including the relabel-away directory drop. */
class ClustersAtRestSpec extends SparkSpec {

  private val Tables29 = Seq("clusters", "members")

  private def rmRoot(root: String): Unit = {
    org.apache.hadoop.fs.FileSystem.get(spark.sparkContext.hadoopConfiguration)
      .delete(new org.apache.hadoop.fs.Path(root), true)
    ()
  }

  private def buildAll(root: String, docs: DataFrame): Unit = {
    DedupOps.writeBandIndex(spark, root, docs)
    DedupOps.buildClusterTables(spark, root)
  }

  private def assertSameRows(rootA: String, rootB: String): Unit =
    for (art <- Tables29) {
      val a = spark.read.parquet(s"$rootA/$art")
        .select(col("doc_id"), col("cluster_id"))
      val b = spark.read.parquet(s"$rootB/$art")
        .select(col("doc_id"), col("cluster_id"))
      assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty,
        s"update != rebuild on $art")
    }

  private def fileSig(root: String, art: String, pcol: String)
      : Map[Int, Seq[(String, Long, Long)]] =
    new java.io.File(s"$root/$art").listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith(s"$pcol="))
      .map { d =>
        d.getName.stripPrefix(s"$pcol=").toInt ->
          d.listFiles().filter(_.getName.endsWith(".parquet"))
            .map(f => (f.getName, f.length, f.lastModified)).sortBy(_._1).toSeq
      }.toMap

  test("d29: update == rebuild row-exact on both projections; a retried update is a no-op") {
    spark.sharedState.cacheManager.clearCache()
    val docs = graft.sources.Tables.documents(spark, Sf)
    val standing = docs.filter(col("doc_id") % DedupOps.IncomingMod =!= 0)
    val batch = docs.filter(col("doc_id") % DedupOps.IncomingMod === 0)
    val rootA = "target/graft-index/spec-d29-update"
    val rootB = "target/graft-index/spec-d29-rebuild"
    Seq(rootA, rootB).foreach(rmRoot)
    buildAll(rootA, standing)
    DedupOps.appendBandIndex(spark, rootA, batch)
    DedupOps.updateClusters(spark, rootA, batch)
    CacheScope.drain()
    buildAll(rootB, docs)
    CacheScope.drain()
    assertSameRows(rootA, rootB)
    def canon(art: String) = spark.read.parquet(s"$rootA/$art")
      .select(col("doc_id"), col("cluster_id"))
      .collect().map(_.toString).sorted.toSeq
    val once = Tables29.map(a => a -> canon(a)).toMap
    DedupOps.updateClusters(spark, rootA, batch)
    CacheScope.drain()
    once.foreach { case (art, rows) =>
      assert(canon(art) === rows, s"retry changed $art — update not idempotent")
    }
  }

  test("d29: an inconsistent projection pair heals by recount from the index") {
    spark.sharedState.cacheManager.clearCache()
    val docs = graft.sources.Tables.documents(spark, Sf)
    val standing = docs.filter(col("doc_id") % DedupOps.IncomingMod =!= 0)
    val batch = docs.filter(col("doc_id") % DedupOps.IncomingMod === 0)
    val rootT = "target/graft-index/spec-d29-torn"
    val rootF = "target/graft-index/spec-d29-tornref"
    Seq(rootT, rootF).foreach(rmRoot)
    buildAll(rootT, standing)
    // freeze the pre-update members projection
    val oldMembers = spark.read.parquet(s"$rootT/members").localCheckpoint()
    DedupOps.appendBandIndex(spark, rootT, batch)
    DedupOps.updateClusters(spark, rootT, batch)
    CacheScope.drain()
    // the crash state: clusters/ merged, members/ never rewritten
    oldMembers.write.mode("overwrite").partitionBy("d_bucket")
      .parquet(s"$rootT/members")
    // recovery: wholesale recount from the (intact, maintained) index
    DedupOps.buildClusterTables(spark, rootT)
    CacheScope.drain()
    buildAll(rootF, docs)
    CacheScope.drain()
    assertSameRows(rootT, rootF)
  }

  test("d29: a merge rewrites ONLY the affected buckets, dropping a bucket relabeled away") {
    import spark.implicits._
    spark.sharedState.cacheManager.clearCache()
    // four planted clusters of identical-text triples, cluster ids
    // 1/101/201/301 → c_buckets 1/5/9/13 (all distinct, each alone in
    // its bucket). The batch: doc 50 joins cluster 101 and LOWERS its
    // label (50 < 101 → the cluster relabels into bucket 2, bucket 5
    // empties and must DROP); doc 9999 joins cluster 301 (label keeps,
    // bucket 13 rewrites in place). Clusters 1 and 201 are untouched.
    val root = "target/graft-index/spec-d29-minimal"
    rmRoot(root)
    def gtext(g: Int) = (0 until 8).map(i => s"g${g}w$i").mkString(" ")
    val standing = (0 until 4).flatMap(g =>
      (1 to 3).map(m => (100L * g + m, gtext(g)))).toDF("doc_id", "text")
    val batch = Seq((50L, gtext(1)), (9999L, gtext(3))).toDF("doc_id", "text")
    buildAll(root, standing)
    CacheScope.drain()
    val cBefore = fileSig(root, "clusters", "c_bucket")
    assert(cBefore.keySet == Set(1, 5, 9, 13),
      s"fixture regression: clusters landed in ${cBefore.keySet}")
    DedupOps.appendBandIndex(spark, root, batch)
    DedupOps.updateClusters(spark, root, batch)
    CacheScope.drain()
    val cAfter = fileSig(root, "clusters", "c_bucket")
    // untouched clusters' buckets byte-identical
    Seq(1, 9).foreach { b =>
      assert(cAfter(b) == cBefore(b), s"merge rewrote untouched bucket $b")
    }
    // the lowered label moved its cluster out of bucket 5 → dropped
    assert(!cAfter.contains(5),
      "bucket 5 must DROP when its only cluster relabels away")
    assert(cAfter.contains(2), "the lowered label's bucket must appear")
    // the assignment itself is the d13 expectation
    val got = spark.read.parquet(s"$root/clusters")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val expected = Map(
      1L -> 1L, 2L -> 1L, 3L -> 1L,
      50L -> 50L, 101L -> 50L, 102L -> 50L, 103L -> 50L,
      201L -> 201L, 202L -> 201L, 203L -> 201L,
      301L -> 301L, 302L -> 301L, 303L -> 301L, 9999L -> 301L)
    assert(got == expected, s"merged assignment wrong: $got")
  }
}
