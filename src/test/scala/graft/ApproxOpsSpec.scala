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

  test("AP1/AP2 stay deterministic across runs (driver reruns hash outputs)") {
    val a1 = ApproxOps.hllDistinct(spark, Sf).collect().toSeq
    val a2 = ApproxOps.hllDistinct(spark, Sf).collect().toSeq
    assert(a1 === a2)
    val q1 = ApproxOps.quantiles(spark, Sf).collect().toSeq
    val q2 = ApproxOps.quantiles(spark, Sf).collect().toSeq
    assert(q1 === q2)
  }
}
