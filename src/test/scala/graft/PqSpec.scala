package graft

import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions.dotD
import graft.operators.SimilarityOps

/** Product-quantization contracts x8/x9's oracle parity can't state:
  * the encode is lossless exactly on codebook vectors, and the ADC
  * identity — an ADC distance IS the exact distance to the
  * RECONSTRUCTED (quantized) vector, so for zero-error vectors it
  * equals the true distance. */
class PqSpec extends SparkSpec {

  private def emb = graft.sources.Tables.embeddings(spark, Sf)
    .select(col("vec_id"), col("embedding").cast("array<float>").as("v"))

  test("seeds encode to themselves with exactly zero quantization error") {
    val enc = SimilarityOps.pqEncode(spark, Sf)
      .filter(col("vec_id") >= SimilarityOps.NumQueries &&
        col("vec_id") < SimilarityOps.NumQueries + SimilarityOps.NumCentroids)
      .collect()
    assert(enc.length === SimilarityOps.NumCentroids)
    enc.foreach { r =>
      val id = r.getLong(0)
      // each seed's nearest sub-centroid in every subspace is itself
      assert((1 to 4).map(r.getLong) === Seq.fill(4)(id),
        s"seed $id not self-coded: $r")
      // d2(x,x) = xx - 2*xx + xx is exactly 0.0 in double arithmetic
      assert(r.getDouble(5) === 0.0, s"seed $id has nonzero qerr")
    }
  }

  test("ADC identity: against zero-error vectors, ADC == true squared L2") {
    val zeroErr = SimilarityOps.pqEncode(spark, Sf)
      .filter(col("qerr") === 0.0).select(col("vec_id"))
    // the full pre-top-k distance frame: every (query, zero-error vec)
    // pair, whether or not it would make a top-k cut
    val adc = SimilarityOps.pqAdcDistances(spark, Sf)
      .join(zeroErr, Seq("vec_id"))
      .withColumnRenamed("vec_id", "neighbor_id")
    // exact squared L2 between query and neighbor from the raw vectors
    val q = emb.select(col("vec_id").as("query_id"), col("v").as("qv"))
    val n = emb.select(col("vec_id").as("neighbor_id"), col("v").as("nv"))
    val d2 = dotD(col("qv"), col("qv")) -
      lit(2.0) * dotD(col("qv"), col("nv")) + dotD(col("nv"), col("nv"))
    val rows = adc.join(q, Seq("query_id")).join(n, Seq("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"), col("adc"), d2.as("exact"))
      .collect()
    assert(rows.nonEmpty, "no zero-error vectors reached any query's top-k")
    rows.foreach { r =>
      val (a, e) = (r.getDouble(2), r.getDouble(3))
      // ADC sums 4 subspace folds; the full-vector fold groups the same
      // doubles differently — equal to fp association error only
      assert(math.abs(a - e) <= 1e-9 * math.max(1.0, math.abs(e)),
        s"ADC ${a} != exact ${e} for $r")
    }
  }
}
