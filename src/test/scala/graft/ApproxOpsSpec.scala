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
}
