package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.GraftSqlBridge.{column, expression}
import graft.functions.{Cms, CmsBuildAgg, CmsEstimate}

/** Count-min sketch contracts: the distributed build is bit-identical
  * to a plain-Scala serial build (merge = elementwise add, exactly
  * associative), estimates never under-count, and the SQL-registered
  * probe matches the library expression inside codegen. */
class CmsSpec extends SparkSpec {
  import spark.implicits._

  /** Deterministic key multiset with repeats and a heavy hitter. */
  private def keys: Seq[Long] = {
    var seed = 0xBEEFL
    def next(): Long = {
      seed = seed * 6364136223846793005L + 1442695040888963407L
      math.floorMod(seed >>> 17, 500L)
    }
    Seq.fill(4000)(next()) ++ Seq.fill(800)(42L) // 42 is the heavy hitter
  }

  private def referenceCms(ks: Seq[Long]): Array[Long] = {
    val m = new Array[Long](Cms.Depth * Cms.Width)
    ks.foreach { k =>
      (0 until Cms.Depth).foreach(r => m(r * Cms.Width + Cms.slot(k, r)) += 1L)
    }
    m
  }

  test("distributed build == serial reference, bit for bit, under repartition") {
    val df = keys.toDF("k").repartition(8) // force partial-agg merging
    val bytes = df.agg(column(
      CmsBuildAgg(expression(col("k"))).toAggregateExpression()).as("cms"))
      .head().getAs[Array[Byte]](0)
    val agg = new CmsBuildAgg(expression(lit(0L)))
    assert(agg.deserialize(bytes).toSeq === referenceCms(keys).toSeq)
  }

  test("estimates never under-count; the heavy hitter reads exactly (or above) its count") {
    val df = keys.toDF("k")
    val bytes = df.agg(column(
      CmsBuildAgg(expression(col("k"))).toAggregateExpression()))
      .head().getAs[Array[Byte]](0)
    val truth = keys.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val est = column(CmsEstimate(expression(lit(bytes)), expression(col("k"))))
    val rows = truth.keys.toSeq.toDF("k").withColumn("est", est)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    truth.foreach { case (k, t) =>
      assert(rows(k) >= t, s"key $k under-counted: ${rows(k)} < $t")
    }
    assert(rows(42L) >= 800L)
    // with 500 keys over width 1024 × depth 5, gross over-counts are
    // collision artifacts bounded well under the ap4 slack
    val n = keys.size.toLong
    truth.foreach { case (k, t) =>
      assert((rows(k) - t) * Cms.Width <= 24L * n, s"key $k over bound")
    }
  }

  test("SQL-registered cms functions match the library path end-to-end") {
    GraftExtensions.register(spark)
    keys.toDF("k").createOrReplaceTempView("cms_keys")
    val bytes = spark.sql("SELECT cms_build(k) FROM cms_keys")
      .head().getAs[Array[Byte]](0)
    val sqlEst = spark.sql(
      s"SELECT cms_estimate(X'${bytes.map("%02x".format(_)).mkString}', CAST(42 AS BIGINT))")
      .head().getLong(0)
    val libEst = Cms.estimate(new CmsBuildAgg(expression(lit(0L)))
      .deserialize(bytes), 42L)
    assert(sqlEst === libEst && sqlEst >= 800L)
  }
}
