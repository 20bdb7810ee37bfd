package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.{CacheScope, DedupOps}

/** d30 — forget against the maintained cluster assignment: the first
  * maintenance direction that SPLITS components (d29's update only
  * merges). Pins: a planted bridge document's removal splits its
  * 5-node cluster into two relabeled 2-clusters; forget ==
  * rebuild-over-survivors row-exact on all four artifacts at fixture
  * scale; a retried forget is a no-op; and after a crash between the
  * two projection writes, a rerun still scrubs the deleted ids from
  * members (the compliance half) and buildClusterTables — the
  * documented heal — restores full projection consistency. */
class ClusterForgetSpec extends SparkSpec {

  private def rmRoot(root: String): Unit = {
    org.apache.hadoop.fs.FileSystem.get(spark.sparkContext.hadoopConfiguration)
      .delete(new org.apache.hadoop.fs.Path(root), true)
    ()
  }

  private def rows(root: String, art: String, cols: String*): Set[Seq[Any]] =
    spark.read.parquet(s"$root/$art").select(cols.map(col): _*)
      .collect().map(_.toSeq).toSet

  private def assignment(root: String, art: String): Set[(Long, Long)] =
    spark.read.parquet(s"$root/$art")
      .select(col("doc_id"), col("cluster_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  /** A chain corpus A1—A2—B—C1—C2 where B bridges two near-identical
    * pairs: the A side and C side share no vocabulary, B is half of
    * each. LSH banding is md5-deterministic but not construction-
    * guaranteed to surface the bridge candidates, so the fixture
    * self-calibrates: try seeded word pools until the build clusters
    * all five nodes together (then removing B MUST split it). */
  private def plantedChain(): (DataFrame, String) = {
    import spark.implicits._
    val root = "target/graft-index/spec-d30-plant"
    for (seed <- 0 until 24) {
      val aw = (1 to 24).map(i => s"aa${seed}w$i")
      val cw = (1 to 24).map(i => s"cc${seed}w$i")
      val docs = Seq(
        (1L, aw.mkString(" ")),
        (2L, (aw.take(23) :+ s"xx${seed}tail").mkString(" ")),
        (5L, (aw.take(12) ++ cw.take(12)).mkString(" ")),
        (10L, cw.mkString(" ")),
        (11L, (cw.take(23) :+ s"yy${seed}tail").mkString(" ")))
        .toDF("doc_id", "text")
      rmRoot(root)
      DedupOps.writeBandIndex(spark, root, docs)
      DedupOps.buildClusterTables(spark, root)
      CacheScope.drain()
      val a = assignment(root, "clusters")
      if (a == Set((1L, 1L), (2L, 1L), (5L, 1L), (10L, 1L), (11L, 1L)))
        return (docs, root)
    }
    fail("no seed produced the 5-node bridge cluster — recalibrate the fixture")
  }

  test("d30: removing the bridge splits the cluster into two relabeled halves; the index forgets the doc") {
    import spark.implicits._
    val (_, root) = plantedChain()
    DedupOps.forgetClusters(spark, root, Seq(5L).toDF("doc_id"))
    CacheScope.drain()
    // the split: A half keeps label 1, C half RELABELS to its own min
    val expect = Set((1L, 1L), (2L, 1L), (10L, 10L), (11L, 10L))
    assert(assignment(root, "clusters") == expect,
      "bridge removal did not split/relabel the cluster")
    assert(assignment(root, "members") == expect,
      "members projection disagrees after the split")
    // the index itself holds no trace of doc 5
    assert(spark.read.parquet(s"$root/bands")
      .filter(col("doc_id") === 5L).count() == 0L, "bands kept the doc")
    assert(spark.read.parquet(s"$root/docsets")
      .filter(col("doc_id") === 5L).count() == 0L, "docsets kept the doc")
    rmRoot(root)
  }

  test("d30: forget == rebuild-over-survivors row-exact on all four artifacts; rerun a no-op") {
    val docs = graft.sources.Tables.documents(spark, Sf)
    val isDel = col("doc_id") % graft.operators.TextOps.ForgetMod ===
      graft.operators.TextOps.ForgetRem
    val rootA = "target/graft-index/spec-d30-forget"
    val rootB = "target/graft-index/spec-d30-rebuild"
    rmRoot(rootA); rmRoot(rootB)
    DedupOps.writeBandIndex(spark, rootA, docs)
    DedupOps.buildClusterTables(spark, rootA)
    CacheScope.drain()
    DedupOps.forgetClusters(spark, rootA, docs.filter(isDel).select(col("doc_id")))
    CacheScope.drain()
    DedupOps.writeBandIndex(spark, rootB, docs.filter(!isDel))
    DedupOps.buildClusterTables(spark, rootB)
    CacheScope.drain()
    def arts(r: String) = Seq(
      rows(r, "bands", "doc_id", "band", "sig", "band_bucket"),
      rows(r, "docsets", "doc_id", "bg"),
      rows(r, "clusters", "doc_id", "cluster_id"),
      rows(r, "members", "doc_id", "cluster_id"))
    arts(rootA).zip(arts(rootB)).zipWithIndex.foreach { case ((a, b), i) =>
      assert(a == b, s"artifact $i diverged from the survivor rebuild")
    }
    DedupOps.forgetClusters(spark, rootA, docs.filter(isDel).select(col("doc_id")))
    CacheScope.drain()
    arts(rootA).zip(arts(rootB)).zipWithIndex.foreach { case ((a, b), i) =>
      assert(a == b, s"artifact $i drifted under a retried forget")
    }
    rmRoot(rootA); rmRoot(rootB)
  }

  test("d30: after a crash between the projection writes, a rerun scrubs the deleted ids and the heal restores consistency") {
    import spark.implicits._
    val (_, root) = plantedChain()
    // keep the pre-forget members rows to restore as the crash state
    val stale = spark.read.parquet(s"$root/members").collect()
    val schema = spark.read.parquet(s"$root/members").schema
    DedupOps.forgetClusters(spark, root, Seq(5L).toDF("doc_id"))
    CacheScope.drain()
    val doneClusters = assignment(root, "clusters")
    // crash simulation: clusters/bands/docsets done, members reverted
    spark.createDataFrame(
        new java.util.ArrayList(java.util.Arrays.asList(stale: _*)), schema)
      .write.mode("overwrite").partitionBy("d_bucket")
      .parquet(s"$root/members")
    // rerun: the removal key's delIds arm scrubs the deleted row even
    // though the clusters projection no longer names its old cluster
    DedupOps.forgetClusters(spark, root, Seq(5L).toDF("doc_id"))
    CacheScope.drain()
    assert(!assignment(root, "members").exists(_._1 == 5L),
      "a deleted doc survived in members after the crash-rerun")
    assert(assignment(root, "clusters") == doneClusters,
      "the rerun disturbed the completed clusters projection")
    // full projection consistency restores via the documented heal
    DedupOps.buildClusterTables(spark, root)
    CacheScope.drain()
    assert(assignment(root, "members") == doneClusters,
      "heal-by-recount did not restore the members projection")
    rmRoot(root)
  }
}
