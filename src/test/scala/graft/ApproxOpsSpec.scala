package graft

import org.apache.spark.sql.functions._
import graft.operators.ApproxOps

/** Accuracy contract for the oracle-less sketch aggregates: estimates
  * must sit within the published error bounds of the exact values
  * computed on the same rows. */
class ApproxOpsSpec extends SparkSpec {

  test("AP1: HLL++ distinct estimate within 3x the default 5% relative SD") {
    val rows = ApproxOps.hllDistinct(spark, Sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val approx = r.getAs[Long]("approx_users").toDouble
      val exact = r.getAs[Long]("exact_users").toDouble
      assert(exact > 0)
      assert(math.abs(approx - exact) / exact <= 0.15,
        s"${r.getAs[String]("event_type")}: approx=$approx exact=$exact")
    }
  }

  test("AP2: percentile_approx estimates honor the RANK error bound") {
    // the sketch guarantee is on rank, not value (tail gaps make value
    // distance unbounded): the fraction of group rows ≤ the estimate
    // must sit within rank error (1/accuracy) plus small-group
    // discreteness (one sample = 1/n of rank) of the target quantile
    import graft.sources.Tables
    val vals = Tables.events(spark, Sf)
      .select(col("event_type"), col("value"))
      .collect()
      .groupBy(_.getString(0)).view.mapValues(_.map(_.getDouble(1)).sorted).toMap
    val rows = ApproxOps.quantiles(spark, Sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val vs = vals(r.getAs[String]("event_type"))
      val n = vs.length.toDouble
      Seq(0.50 -> "p50", 0.95 -> "p95", 0.99 -> "p99").foreach { case (p, name) =>
        val approx = r.getAs[Double](s"approx_$name")
        val frac = vs.count(_ <= approx) / n
        assert(frac >= p - 1e-4 - 1.0 / n && frac <= p + 1e-4 + 1.5 / n,
          s"${r.getAs[String]("event_type")} $name: est=$approx rank-frac=$frac")
        // and the estimate is an actual sample, not an interpolation
        assert(vs.contains(approx))
      }
    }
  }

  test("AP5: KMV distinct/union estimates within 3 relative SD of exact") {
    val rows = ApproxOps.kmvOverlap(spark, Sf).collect()
    assert(rows.nonEmpty)
    val k = ApproxOps.KmvK
    val sigma = 1.0 / math.sqrt(k - 1.0) // KMV relative SD
    rows.foreach { r =>
      val exactA = r.getAs[Long]("exact_a").toDouble
      val exactB = r.getAs[Long]("exact_b").toDouble
      val exactI = r.getAs[Long]("exact_inter").toDouble
      val exactU = exactA + exactB - exactI
      def ck(est: Double, exact: Double, label: String): Unit =
        if (exact < k) assert(est === exact, s"$label: under-full sketch must be exact")
        else assert(math.abs(est - exact) / exact <= 3 * sigma,
          s"$label: est=$est exact=$exact")
      ck(r.getAs[Double]("est_a"), exactA, "est_a")
      ck(r.getAs[Double]("est_b"), exactB, "est_b")
      ck(r.getAs[Double]("est_union"), exactU, "est_union")
      // intersection: ρ's additive error ≤ 0.5/√k scaled by the union,
      // plus the union estimate's own relative error scaled by the
      // intersection — the standard theta-sketch composition
      val bound = 3 * (0.5 / math.sqrt(k.toDouble)) * exactU + 3 * sigma * exactI
      assert(math.abs(r.getAs[Double]("est_inter") - exactI) <= bound + 1.0,
        s"est_inter=${r.getAs[Double]("est_inter")} exact=$exactI bound=$bound")
    }
  }

  test("AP5: under-full sketches collapse every estimate to the exact value") {
    // crafted corpus: two langs, far fewer distinct tokens than KmvK —
    // the k-min set IS the distinct set, so union/intersection
    // estimates must equal exact set sizes, not approximate them
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("kmv-underfull").toString
    val docs = Seq(
      (0L, "alpha beta gamma delta", "aa", "s0"),
      (1L, "beta gamma epsilon", "aa", "s0"),
      (2L, "gamma delta zeta", "bb", "s0"),
      (3L, "eta theta", "bb", "s0"))
      .toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length(col("text")).cast("long"))
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = ApproxOps.kmvOverlap(spark, dir).collect()
    assert(rows.length === 1)
    val r = rows.head
    // aa = {alpha beta gamma delta epsilon} (5), bb = {gamma delta zeta eta theta} (5),
    // inter = {gamma delta} (2), union = 8
    assert(r.getAs[Long]("exact_a") === 5L)
    assert(r.getAs[Long]("exact_b") === 5L)
    assert(r.getAs[Long]("exact_inter") === 2L)
    assert(r.getAs[Double]("est_a") === 5.0)
    assert(r.getAs[Double]("est_b") === 5.0)
    assert(r.getAs[Double]("est_union") === 8.0)
    assert(r.getAs[Double]("est_inter") === 2.0)
  }

  test("AP1/AP2 stay deterministic across runs (driver reruns hash outputs)") {
    val a1 = ApproxOps.hllDistinct(spark, Sf).collect().toSeq
    val a2 = ApproxOps.hllDistinct(spark, Sf).collect().toSeq
    assert(a1 === a2)
    val q1 = ApproxOps.quantiles(spark, Sf).collect().toSeq
    val q2 = ApproxOps.quantiles(spark, Sf).collect().toSeq
    assert(q1 === q2)
  }

  private def rmRoot(root: String): Unit = {
    org.apache.hadoop.fs.FileSystem.get(spark.sparkContext.hadoopConfiguration)
      .delete(new org.apache.hadoop.fs.Path(root), true)
    ()
  }

  private def storeRows(root: String): Set[(String, Long, Int)] =
    spark.read.parquet(s"$root/kmv")
      .select(col("lang"), col("h"), col("h_bucket").cast("int"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getInt(2))).toSet

  test("AP6: append == rebuild row-exact on the partials; retried append bit-stable; serve == driver estimator") {
    val docs = graft.sources.Tables.documents(spark, Sf)
    val isNew = col("doc_id") % graft.operators.DedupOps.IncomingMod === 0
    val rootA = "target/graft-index/spec-ap6-append"
    val rootB = "target/graft-index/spec-ap6-rebuild"
    rmRoot(rootA); rmRoot(rootB)
    ApproxOps.writeSketchStore(spark, rootA, docs.filter(!isNew))
    ApproxOps.appendSketchStore(spark, rootA, docs.filter(isNew))
    ApproxOps.writeSketchStore(spark, rootB, docs)
    val expect = storeRows(rootB)
    assert(storeRows(rootA) == expect,
      "append-maintained partials != one-shot rebuild")
    // union ∘ bottom-k is idempotent — a RETRIED batch (the crash-
    // rerun case) merges the same hashes to the same sets, no
    // anti-join guard needed, and the rows prove it
    ApproxOps.appendSketchStore(spark, rootA, docs.filter(isNew))
    assert(storeRows(rootA) == expect, "retried append moved a partial")
    // the serve's estimate equals the driver-side estimator over the
    // GLOBAL bottom-k of the corpus vocabulary (per-bucket partials
    // reconstruct the global k-min set exactly)
    val served = ApproxOps.sketchServe(spark, rootA).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val toks = docs
      .select(col("lang"),
        explode(graft.functions.TextFunctions.tokens(col("text"))).as("tok"))
      .select(col("lang"),
        graft.functions.TextFunctions.tokHash(col("tok")).as("h"))
      .distinct().collect().map(r => (r.getString(0), r.getLong(1)))
    val byLang = toks.groupBy(_._1)
    assert(served.keySet == byLang.keySet)
    byLang.foreach { case (lang, hs) =>
      val sk = hs.map(_._2).distinct.sorted.take(ApproxOps.KmvK)
      assert(served(lang)._1 == sk.length.toLong, s"$lang n_kept")
      assert(served(lang)._2 == ApproxOps.kmvEstimate(sk), s"$lang estimate")
    }
    rmRoot(rootA); rmRoot(rootB)
  }

  test("AP6: a one-token delta rewrites only its own hash bucket; the other 15 stay byte-identical") {
    import spark.implicits._
    val docs = graft.sources.Tables.documents(spark, Sf)
    val root = "target/graft-index/spec-ap6-delta"
    rmRoot(root)
    ApproxOps.writeSketchStore(spark, root, docs)
    def sig(): Map[Int, Seq[(String, Long, Long)]] =
      new java.io.File(s"$root/kmv").listFiles()
        .filter(f => f.isDirectory && f.getName.startsWith("h_bucket="))
        .map { d =>
          d.getName.stripPrefix("h_bucket=").toInt ->
            d.listFiles().filter(_.getName.endsWith(".parquet"))
              .map(f => (f.getName, f.length, f.lastModified)).sortBy(_._1).toSeq
        }.toMap
    val before = sig()
    // one planted doc, one token — its hash bucket is the ONLY
    // partition the merge may touch (derived from the operator's own
    // hash, not restated by hand)
    val batch = Seq((900001L, "zxqjvw")).toDF("doc_id", "text")
      .withColumn("lang", lit("en"))
    val b = batch.select((graft.functions.TextFunctions.tokHash(lit("zxqjvw"))
      % ApproxOps.SketchBuckets).cast("int")).collect().head.getInt(0)
    ApproxOps.appendSketchStore(spark, root, batch)
    val after = sig()
    (0 until ApproxOps.SketchBuckets).filter(_ != b).foreach { k =>
      assert(after.get(k) == before.get(k),
        s"bucket $k rewritten by a delta that never touched it")
    }
    assert(after(b) != before(b), "the delta's own bucket did not change")
    rmRoot(root)
  }
}
