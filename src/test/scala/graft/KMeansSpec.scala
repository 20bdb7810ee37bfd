package graft

import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions.dotD
import graft.operators.SimilarityOps

/** x7's refinement contract on crafted clusters: a bad seed placement
  * is corrected by one Lloyd's iteration — vectors near a cluster mass
  * re-assign to the refined (mean) centroid even when their nearest
  * SEED was the other one. */
class KMeansSpec extends SparkSpec {

  private def corpusOf(rows: Seq[(Long, Seq[Float])]) = {
    import spark.implicits._
    rows.toDF("vec_id", "v")
      .withColumn("v", col("v").cast("array<float>"))
      .withColumn("nrm", sqrt(dotD(col("v"), col("v"))))
  }

  test("clean clusters: nobody moves, cos2 is a valid cosine") {
    // two tight clusters around the two seeds (ids 0 and 1)
    val a = Seq(1f, 0f, 0f, 0f)
    val b = Seq(0f, 1f, 0f, 0f)
    def jitter(base: Seq[Float], eps: Float) =
      base.map(x => if (x == 0f) eps else x)
    val rows = Seq[(Long, Seq[Float])](
      0L -> a, 1L -> b,
      10L -> jitter(a, 0.01f), 11L -> jitter(a, 0.02f),
      20L -> jitter(b, 0.01f), 21L -> jitter(b, 0.02f))
    val out = SimilarityOps.kmeansRefineCore(corpusOf(rows), col("vec_id") < 2)
      .collect()
    assert(out.length == rows.length)
    assert(out.forall(_.getAs[Int]("moved") == 0))
    assert(out.forall { r =>
      val c = r.getAs[Double]("cos2"); c >= -1.0001 && c <= 1.0001
    })
    // cluster membership follows the dominant axis
    val byId = out.map(r => r.getAs[Long]("vec_id") -> r.getAs[Long]("c2")).toMap
    assert(byId(10L) == 0L && byId(11L) == 0L)
    assert(byId(20L) == 1L && byId(21L) == 1L)
  }

  test("one refinement corrects a bad seed: the mean pulls the boundary vector over") {
    // seeds: 0 at the x-axis (0°), 1 at the y-axis (90°). A cluster
    // mass sits at 50° — closer to seed 1 (40°) than seed 0 (50°), so
    // it drags centroid 1's mean down to ~58°. The boundary vector m
    // at 40° starts with seed 0 (40° < 50° to seed 1); after the
    // update it is 34.6° from the refined centroid 0 (~5.4°) but only
    // 17.7° from the refined centroid 1 (~57.7°) — it flips.
    val rows = Seq[(Long, Seq[Float])](
      0L -> Seq(1f, 0f, 0f, 0f),
      1L -> Seq(0f, 1f, 0f, 0f),
      10L -> Seq(1f, 0f, 0f, 0f), 11L -> Seq(1f, 0f, 0f, 0f),
      12L -> Seq(1f, 0f, 0f, 0f), 13L -> Seq(1f, 0f, 0f, 0f),
      14L -> Seq(1f, 0f, 0f, 0f),
      20L -> Seq(0.643f, 0.766f, 0f, 0f), 21L -> Seq(0.643f, 0.766f, 0f, 0f),
      22L -> Seq(0.643f, 0.766f, 0f, 0f), 23L -> Seq(0.643f, 0.766f, 0f, 0f),
      30L -> Seq(0.766f, 0.643f, 0f, 0f)) // the boundary vector m at 40°
    val out = SimilarityOps.kmeansRefineCore(corpusOf(rows), col("vec_id") < 2)
      .collect()
    val m = out.find(_.getAs[Long]("vec_id") == 30L).get
    assert(m.getAs[Long]("c1") == 0L, "boundary vector starts with the x seed")
    assert(m.getAs[Long]("c2") == 1L, "refined 58-degree mean centroid wins it")
    assert(m.getAs[Int]("moved") == 1)
    // the tight masses do not move
    assert(out.filter(r => r.getAs[Long]("vec_id") >= 10 && r.getAs[Long]("vec_id") < 30)
      .forall(_.getAs[Int]("moved") == 0))
  }
}
