package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.sources.Tables
import graft.functions.VectorFunctions._

/** Similarity search over the `embeddings` table (builder brief; no
  * reference analog). Two tiers:
  *
  *   - X1 brute-force top-k: the exact baseline. The query set is tiny
  *     and BROADCAST; the corpus scan stays partition-parallel with no
  *     shuffle until the per-query top-k (a window over ≤ |Q| key
  *     partitions carrying only (query, neighbor, cos) rows — at 100 TB
  *     you'd swap the window for a per-partition top-k + driver merge,
  *     i.e. the TakeOrderedAndProject shape, per query).
  *   - X2 LSH-bucketed ANN: the scale path. Corpus is pre-bucketed by
  *     sign-LSH; each query probes ONLY its own bucket, so compute and
  *     shuffle drop by the bucket fan-out (16× here; at 100 TB the bit
  *     count tunes bucket size and the corpus side would be WRITTEN
  *     bucket-partitioned so a probe is a partition-pruned scan, not a
  *     join at all). Same output shape as X1, so recall is directly
  *     measurable against the brute-force baseline.
  *
  * Cosine math follows the VectorFunctions left-fold contract: doubles
  * are bit-identical to the DuckDB oracle, so raw cosines appear in
  * hash-compared output.
  */
object SimilarityOps {

  val K = 5
  val NumQueries = 8
  val BucketBits = 4

  private def corpus(s: SparkSession, dir: String): DataFrame =
    Tables.embeddings(s, dir)
      .select(col("vec_id"), col("embedding").as("v"),
        signBucket(col("embedding"), BucketBits).as("bucket"))
      .withColumn("nrm", sqrt(dotD(col("v"), col("v"))))

  /** X1 — brute-force cosine top-k for queries vec_id < [[NumQueries]],
    * self-match excluded. */
  def knnBrute(s: SparkSession, dir: String): DataFrame = {
    val c = corpus(s, dir)
    val q = c.filter(col("vec_id") < NumQueries)
      .select(col("vec_id").as("query_id"), col("v").as("qv"), col("nrm").as("qn"))
    val cos = dotD(col("qv"), col("v")) / (col("qn") * col("nrm"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id"))
    c.join(broadcast(q), col("query_id") =!= col("vec_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"), cos.as("cos"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= K)
      .select(col("query_id"), col("rank"), col("neighbor_id"), col("cos"))
      .orderBy(col("query_id"), col("rank"))
  }

  /** X2 — ANN: identical contract to X1 but each query probes only its
    * sign-LSH bucket. */
  def annLsh(s: SparkSession, dir: String): DataFrame = {
    val c = corpus(s, dir)
    val q = c.filter(col("vec_id") < NumQueries)
      .select(col("vec_id").as("query_id"), col("v").as("qv"),
        col("nrm").as("qn"), col("bucket").as("qb"))
    val cos = dotD(col("qv"), col("v")) / (col("qn") * col("nrm"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id"))
    c.join(broadcast(q),
        col("qb") === col("bucket") && col("query_id") =!= col("vec_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"), cos.as("cos"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= K)
      .select(col("query_id"), col("rank"), col("neighbor_id"), col("cos"))
      .orderBy(col("query_id"), col("rank"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "x1_knn_brute" -> (knnBrute _),
    "x2_ann_lsh" -> (annLsh _))

  private def corpusSql =
    s"""SELECT vec_id, embedding AS v,
       |       ${signBucketSql("embedding", BucketBits)} AS bucket,
       |       sqrt(${dotDSql("embedding", "embedding")}) AS nrm
       |FROM embeddings""".stripMargin

  val oracles: Map[String, String] = Map(
    "x1_knn_brute" ->
      s"""WITH c AS ($corpusSql),
         |q AS (SELECT vec_id AS query_id, v AS qv, nrm AS qn FROM c WHERE vec_id < $NumQueries),
         |p AS (SELECT query_id, c.vec_id AS neighbor_id,
         |             ${dotDSql("qv", "v")} / (qn * nrm) AS cos
         |      FROM c CROSS JOIN q WHERE query_id <> c.vec_id)
         |SELECT query_id,
         |       CAST(row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS INT) AS rank,
         |       neighbor_id, cos
         |FROM p
         |QUALIFY rank <= $K
         |ORDER BY query_id, rank""".stripMargin,
    "x2_ann_lsh" ->
      s"""WITH c AS ($corpusSql),
         |q AS (SELECT vec_id AS query_id, v AS qv, nrm AS qn, bucket AS qb
         |      FROM c WHERE vec_id < $NumQueries),
         |p AS (SELECT query_id, c.vec_id AS neighbor_id,
         |             ${dotDSql("qv", "v")} / (qn * nrm) AS cos
         |      FROM c JOIN q ON qb = c.bucket WHERE query_id <> c.vec_id)
         |SELECT query_id,
         |       CAST(row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS INT) AS rank,
         |       neighbor_id, cos
         |FROM p
         |QUALIFY rank <= $K
         |ORDER BY query_id, rank""".stripMargin)
}
