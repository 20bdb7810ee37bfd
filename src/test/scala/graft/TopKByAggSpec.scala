package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Prop, Test => SCTest}

/** TopKByAgg (x6's UDAF): heap vs sort-based reference, tie rules,
  * small groups, SQL surface, and the partial-merge plan shape. */
class TopKByAggSpec extends SparkSpec {

  private def reference(rows: Seq[(Double, Long)], k: Int): Seq[Long] =
    rows.sortBy { case (s, i) => (-s, i) }.take(k).map(_._2)

  test("property: agg == sort-take reference over random groups (merge incl.)") {
    import graft.functions.{TopKBuffer, TopKByAgg}
    val prop = Prop.forAll { (xs: List[(Double, Long)], splitAt: Byte, kRaw: Byte) =>
      val rows = xs.filterNot { case (s, _) => s.isNaN }
      val k = math.max(1, math.abs(kRaw % 7))
      // exercise the MERGE path: fill two buffers, merge via serialize
      // round trip like a shuffle would
      val cut = if (rows.isEmpty) 0 else math.abs(splitAt % (rows.size + 1))
      val (a, b) = rows.splitAt(cut)
      val fn = TopKByAgg(org.apache.spark.sql.GraftSqlBridge.expression(lit(0.0)), org.apache.spark.sql.GraftSqlBridge.expression(lit(0L)), k)
      val b1 = new TopKBuffer(k)
      a.foreach { case (s, i) => b1.insert(s, i) }
      val b2 = fn.deserialize(fn.serialize {
        val t = new TopKBuffer(k)
        b.foreach { case (s, i) => t.insert(s, i) }
        t
      })
      val merged = fn.merge(b1, b2)
      merged.sortedIds.toSeq == reference(rows, k)
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(300), prop)
    assert(res.passed, res.status.toString)
  }

  test("ties at the boundary keep the smallest id; groups smaller than k keep all") {
    import graft.functions.{TopKBuffer, TopKByAgg}
    val b = new TopKBuffer(2)
    Seq((1.0, 30L), (1.0, 10L), (1.0, 20L)).foreach { case (s, i) => b.insert(s, i) }
    assert(b.sortedIds.toSeq === Seq(10L, 20L))
    val small = new TopKBuffer(5)
    small.insert(2.0, 7L)
    assert(small.sortedIds.toSeq === Seq(7L))
    assert(TopKByAgg(org.apache.spark.sql.GraftSqlBridge.expression(lit(0.0)), org.apache.spark.sql.GraftSqlBridge.expression(lit(0L)), 3).deserialize(
      TopKByAgg(org.apache.spark.sql.GraftSqlBridge.expression(lit(0.0)), org.apache.spark.sql.GraftSqlBridge.expression(lit(0L)), 3).serialize(small)).sortedIds.toSeq === Seq(7L))
  }

  test("SQL surface and partial-merge plan") {
    GraftExtensions.register(spark)
    import scala.jdk.CollectionConverters._
    import org.apache.spark.sql.types._
    val df = spark.createDataFrame(
      Seq((1L, 1.0, 100L), (1L, 3.0, 101L), (1L, 2.0, 102L), (2L, 9.0, 200L))
        .map { case (g, s, i) => org.apache.spark.sql.Row(g, s, i) }.asJava,
      StructType(Seq(StructField("g", LongType), StructField("s", DoubleType),
        StructField("id", LongType))))
    df.createOrReplaceTempView("topk_in")
    val out = spark.sql(
      "SELECT g, topk_by(s, id, 2) AS top FROM topk_in GROUP BY g ORDER BY g")
    val rows = out.collect()
    assert(rows(0).getSeq[Long](1) === Seq(101L, 102L))
    assert(rows(1).getSeq[Long](1) === Seq(200L))
    // TypedImperativeAggregate → ObjectHashAggregate with a partial stage
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("ObjectHashAggregate"), plan.linesIterator.take(6).mkString("\n"))
  }
}
