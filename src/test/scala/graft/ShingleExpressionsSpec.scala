package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.TextFunctions._
import graft.functions.ShingleExpressions._
import graft.operators.DedupOps

/** The compiled d2 hot-path expressions must be drop-in equivalents of
  * the HOF pipelines they replaced (same hashes, same sets, same mins)
  * — the DuckDB oracle still computes the HOF form. */
class ShingleExpressionsSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", 4)
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val dir = "/root/testdata/sf0.001"

  test("HashedShingleSet == sort(array_distinct(transform(array_distinct(shingles), tokHash)))") {
    val docs = graft.sources.Tables.documents(spark, dir)
    val both = docs.select(
      sort_array(array_distinct(
        transform(array_distinct(shingles(tokens(col("text")), 2)), sh => tokHash(sh)))).as("hof"),
      hashedShingleSet(tokens(col("text")), 2).as("compiled"))
    assert(both.filter(not(col("hof") === col("compiled"))).count() === 0)
  }

  test("MinHashSig == the 8 array_min(transform(...)) legs") {
    val docs = graft.sources.Tables.documents(spark, dir)
    val hs = docs.select(col("doc_id"),
      hashedShingleSet(tokens(col("text")), 2).as("hs"))
    val legs = DedupOps.MinHashAB.zipWithIndex.map { case ((a, b), j) =>
      array_min(transform(col("hs"), h => (h * a + b) % HashMod)).as(s"m$j")
    }
    val both = hs.select(col("doc_id"),
      minhashSig(col("hs"), DedupOps.MinHashAB).as("sig"), array(legs: _*).as("hof"))
    // empty token sets: compiled form is null, HOF legs are [null,...] —
    // both fall out of the band join; compare only non-null rows and
    // count nulls agree with empty inputs
    assert(both.filter(col("sig").isNotNull && not(col("sig") === col("hof"))).count() === 0)
    val nulls = both.filter(col("sig").isNull).count()
    val empties = hs.filter(size(col("hs")) === 0).count()
    assert(nulls === empties)
  }

  test("SortedIntersectCount == size(array_intersect) on sorted distinct arrays") {
    val docs = graft.sources.Tables.documents(spark, dir).limit(60)
    val hs = docs.select(col("doc_id"), hashedShingleSet(tokens(col("text")), 2).as("hs"))
    val pairs = hs.as("x").crossJoin(hs.as("y"))
      .filter(col("x.doc_id") < col("y.doc_id"))
    val cmp = pairs.select(
      sortedIntersectCount(col("x.hs"), col("y.hs")).as("merged"),
      size(array_intersect(col("x.hs"), col("y.hs"))).as("hashed"))
    assert(cmp.filter(col("merged") =!= col("hashed")).count() === 0)
    assert(cmp.filter(col("merged") > 0).count() > 0) // non-vacuous
  }

  test("null handling on the SQL surface (code-review regressions)") {
    GraftExtensions.register(spark)
    // null token elements contribute nothing (concat_ws semantics), no NPE
    val withNull = spark.sql(
      """SELECT hashed_shingle_set(array('a', CAST(NULL AS STRING), 'b'), 2) AS hs,
        |       hashed_shingle_set(array('a', 'b'), 2) AS plain""".stripMargin).head()
    assert(withNull.getSeq[Long](0).nonEmpty)
    // ('a', null) → "a", (null, 'b') → "b": shingles exist but differ from "a b"
    assert(withNull.getSeq[Long](0).toSet !== withNull.getSeq[Long](1).toSet)
    // minhash_sig is nullable even over a non-nullable child: empty set → null
    val nullSig = spark.sql(
      "SELECT minhash_sig(hashed_shingle_set(split('one', ' '), 2)) AS sig").head()
    assert(nullSig.isNullAt(0))
    // sorted_intersect_count ACCEPTS nullable-element types (Spark's
    // file sources force every read-back schema nullable, and the
    // at-rest set reads d24/d25 arrive that way) but an ACTUAL null
    // element fails loudly at runtime instead of miscounting as 0
    val err = intercept[Exception](spark.sql(
      "SELECT sorted_intersect_count(array(CAST(1 AS BIGINT)), array(CAST(NULL AS BIGINT)))")
      .collect())
    assert(err.getMessage.contains("null element") ||
      Option(err.getCause).exists(_.getMessage.contains("null element")))
  }

  test("edge cases: short docs, empty, exact dup") {
    import scala.jdk.CollectionConverters._
    val df = spark.createDataFrame(
      Seq("one", "", "a b", "a b c", "a b c").map(org.apache.spark.sql.Row(_)).asJava,
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("text", org.apache.spark.sql.types.StringType))))
    val r = df.select(hashedShingleSet(tokens(col("text")), 2).as("hs"))
      .collect().map(_.getSeq[Long](0))
    assert(r(0).isEmpty) // 1 token < k
    assert(r(1).isEmpty) // split("", " ") = [""] → 1 token
    assert(r(2).length === 1) // "a b" → one bigram
    assert(r(3).length === 2)
    assert(r(3) === r(4)) // identical text → identical set
    assert(r(2).head === r(3).min || r(2).head === r(3).max) // "a b" shared
  }
}
